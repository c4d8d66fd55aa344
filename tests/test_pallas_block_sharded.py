"""GSPMD partitioning of the fused Pallas block megakernel.

The mega path wraps itself in shard_map over the trainers' ('data', 'space')
mesh (ops/pallas_block.py sharded path) instead of letting GSPMD replicate
the custom calls.  These tests pin forward and gradient numerics of the
sharded path against the single-device kernel and the plain-XLA block on a
virtual 8-device CPU mesh (interpret mode).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformerbasednavierstokesolver_tpu.models import Transolver
from transformerbasednavierstokesolver_tpu.ops import pallas_block
from transformerbasednavierstokesolver_tpu.parallel import (
    make_mesh,
    replicate_params,
    set_active_mesh,
    shard_batch,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

H = W = 16
C = 32
HEADS = 4
G = 8
M = 32  # mlp hidden
B = 8


def _params(key):
    ks = jax.random.split(key, 16)
    n = lambda i, shape, s=0.2: jax.random.normal(ks[i], shape, jnp.float32) * s
    D = C // HEADS
    return {
        "ln1_scale": jnp.ones((C,)) + n(0, (C,), 0.05),
        "ln1_bias": n(1, (C,), 0.05),
        "conv_kernel": n(2, (3, 3, C, 2 * C), 0.1),
        "conv_bias": n(3, (2 * C,), 0.05),
        "slice_kernel": n(4, (D, G)),
        "slice_bias": n(5, (G,), 0.05),
        "temperature": jnp.full((1, HEADS, 1, 1), 0.5),
        "wq": n(6, (D, D)),
        "wk": n(7, (D, D)),
        "wv": n(8, (D, D)),
        "out_kernel": n(9, (C, C)),
        "out_bias": n(10, (C,), 0.05),
        "ln2_scale": jnp.ones((C,)) + n(11, (C,), 0.05),
        "ln2_bias": n(12, (C,), 0.05),
        "w1": n(13, (C, M)),
        "b1": n(14, (M,), 0.05),
        "w2": n(15, (M, C)),
        "b2": jnp.zeros((C,)),
    }


def _call(fx, params):
    return pallas_block.fused_transolver_block(
        fx, params, grid_shape=(H, W), heads=HEADS, slice_num=G,
        mlp_hidden=M, clamp_temperature=True,
    )


def _loss(fx, params, tgt):
    out = _call(fx, params)
    return jnp.sum((out - tgt) ** 2)


@pytest.mark.parametrize("dxs", ["4x2", "2x4", "8x1", "1x8"])
def test_sharded_block_matches_single_device(dxs):
    """fwd + grads of the shard_map'd megakernel == single-device kernel."""
    d, s = (int(v) for v in dxs.split("x"))
    rng = np.random.default_rng(0)
    fx = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)
    params = _params(jax.random.PRNGKey(1))

    set_active_mesh(None)
    ref_out = jax.jit(_call)(fx, params)
    ref_gfx, ref_gp = jax.jit(jax.grad(_loss, argnums=(0, 1)))(fx, params, tgt)

    mesh = make_mesh(data=d, space=s)
    set_active_mesh(mesh)
    try:
        fxs = shard_batch(mesh, fx)
        tgts = shard_batch(mesh, tgt)
        pr = replicate_params(mesh, params)
        out = jax.jit(_call)(fxs, pr)
        gfx, gp = jax.jit(jax.grad(_loss, argnums=(0, 1)))(fxs, pr, tgts)
    finally:
        set_active_mesh(None)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(gfx), np.asarray(ref_gfx), rtol=2e-4, atol=2e-4
    )
    for k in params:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(ref_gp[k]),
            rtol=5e-4, atol=5e-4, err_msg=k,
        )


def test_model_mega_sharded_matches_xla():
    """Full Transolver fwd with impl='mega' under a 2x2 sub-mesh == XLA impl."""
    t_in = 4
    kwargs = dict(
        space_dim=2, n_layers=2, n_hidden=C, n_head=HEADS, fun_dim=t_in,
        out_dim=1, slice_num=G, ref=4, unified_pos=True, geometry="grid2d",
        H=H, W=W,
    )
    rng = np.random.default_rng(2)
    x = jnp.zeros((B, H * W, 2))
    fx = jnp.asarray(rng.normal(size=(B, H * W, t_in)), jnp.float32)

    xla = Transolver(impl="xla", **kwargs)
    params = xla.init(jax.random.PRNGKey(0), x[:1], fx[:1])["params"]
    ref = jax.jit(lambda p, a, b: xla.apply({"params": p}, a, b))(params, x, fx)

    mega = Transolver(impl="mega", **kwargs)
    mesh = make_mesh(data=4, space=2)
    set_active_mesh(mesh)
    try:
        xs, fxs = shard_batch(mesh, x), shard_batch(mesh, fx)
        pr = replicate_params(mesh, params)
        got = jax.jit(lambda p, a, b: mega.apply({"params": p}, a, b))(
            pr, xs, fxs
        )
    finally:
        set_active_mesh(None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-5, atol=5e-5
    )
