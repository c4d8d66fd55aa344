"""Packed fused (v2) physics-attention kernels vs the XLA path.

Runs in pallas interpret mode on the CPU test mesh; the same code compiles
with Mosaic on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformerbasednavierstokesolver_tpu.ops.attention import (
    slice_attention_bnhd,
)
from transformerbasednavierstokesolver_tpu.ops.pallas_attention_v2 import (
    _fused_v2,
    slice_attention_fused_v2,
)


def _inputs(B=2, N=300, H=4, D=16, G=8, temp_scalar=None):
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (B, N, H, D))
    f = jax.random.normal(ks[1], (B, N, H, D))
    kern = jax.random.normal(ks[2], (D, G)) * 0.3
    bias = jax.random.normal(ks[3], (G,)) * 0.3
    if temp_scalar is None:
        temp = jnp.abs(jax.random.normal(ks[7], (1, H, 1, 1))) * 0.5 + 0.2
    else:
        temp = jnp.full((1, H, 1, 1), temp_scalar)
    wq, wk, wv = (jax.random.normal(k, (D, D)) * 0.1 for k in ks[4:7])
    return x, f, kern, bias, temp, wq, wk, wv


@pytest.mark.parametrize("N", [256, 300, 1000])
def test_forward_parity(N):
    args = _inputs(N=N)
    out_ref, _, otok_ref = slice_attention_bnhd(
        *args, clamp_temperature=True, precision="highest"
    )
    out_v2, _, otok_v2 = slice_attention_fused_v2(
        *args, clamp_temperature=True, block_n=128
    )
    np.testing.assert_allclose(
        np.asarray(otok_v2), np.asarray(otok_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_v2), np.asarray(out_ref), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("H,D,G", [(8, 16, 64), (8, 32, 32), (1, 32, 16)])
def test_forward_parity_benchmark_shapes(H, D, G):
    """Head/width combos of the canonical configs (darcy/NS/encoder)."""
    args = _inputs(N=300, H=H, D=D, G=G)
    out_ref, _, _ = slice_attention_bnhd(
        *args, clamp_temperature=True, precision="highest"
    )
    out_v2, _, _ = slice_attention_fused_v2(
        *args, clamp_temperature=True, block_n=128
    )
    np.testing.assert_allclose(
        np.asarray(out_v2), np.asarray(out_ref), rtol=1e-4, atol=1e-5
    )


def test_unclamped_temperature():
    args = _inputs(temp_scalar=7.0)  # beyond the clamp range
    out_c, _, _ = slice_attention_fused_v2(*args, clamp_temperature=True)
    out_u, _, _ = slice_attention_fused_v2(*args, clamp_temperature=False)
    assert not np.allclose(np.asarray(out_c), np.asarray(out_u))
    ref_u, _, _ = slice_attention_bnhd(
        *args, clamp_temperature=False, precision="highest"
    )
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(ref_u), rtol=1e-4, atol=1e-5
    )


def test_perhead_softmax_underflow_robust():
    """A huge logit offset in ONE head must not NaN the others' softmax.

    The packed layout shares one [nb, H*G] lane; a row-global max shift would
    underflow every other head's exp() to 0 (denominator 0 -> NaN).  The
    kernel computes a per-head max, matching jax.nn.softmax's robustness.
    """
    x, f, kern, bias, temp, wq, wk, wv = _inputs(B=1, N=256, H=4, D=16, G=8)
    # bias shifts apply to every head identically; offset head 0 through x:
    # scale one head's x rows so its logits sit ~200 above the others
    x = x.at[:, :, 0, :].mul(200.0)
    args = (x, f, kern, bias, temp, wq, wk, wv)
    out_v2, _, otok_v2 = slice_attention_fused_v2(
        *args, clamp_temperature=True, block_n=128
    )
    assert np.isfinite(np.asarray(out_v2)).all()
    assert np.isfinite(np.asarray(otok_v2)).all()
    out_ref, _, _ = slice_attention_bnhd(
        *args, clamp_temperature=True, precision="highest"
    )
    np.testing.assert_allclose(
        np.asarray(out_v2), np.asarray(out_ref), rtol=1e-4, atol=1e-5
    )
    # gradient path recomputes the softmax in the backward kernels
    g = jax.grad(lambda a: _fused_v2(*a, True)[0].sum())(args)
    assert all(np.isfinite(np.asarray(t)).all() for t in g)


def test_gradients_match_xla():
    args = _inputs(N=256)

    def loss_fused(a):
        out, otok = _fused_v2(*a, True)
        return (out**2).sum() + (otok**2).sum()

    def loss_ref(a):
        out, _, otok = slice_attention_bnhd(
            *a, clamp_temperature=True, precision="highest"
        )
        return (out**2).sum() + (otok**2).sum()

    g1 = jax.grad(loss_fused)(args)
    g2 = jax.grad(loss_ref)(args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )
