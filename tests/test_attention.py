"""Physics-attention invariants and encoder-variant consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformerbasednavierstokesolver_tpu.ops.attention import (
    PhysicsAttention,
    aggregate_slice_tokens,
    compute_slice_weights,
    deslice,
    slice_attention,
)


def _mk(geometry, grid_shape=(), dim=32, heads=4, slice_num=8, **kw):
    return PhysicsAttention(
        dim=dim,
        heads=heads,
        dim_head=dim // heads,
        slice_num=slice_num,
        geometry=geometry,
        grid_shape=grid_shape,
        **kw,
    )


@pytest.mark.parametrize(
    "geometry,grid_shape,n",
    [("irregular", (), 40), ("grid2d", (6, 7), 42), ("grid3d", (3, 4, 5), 60)],
)
def test_forward_shape_and_finite(geometry, grid_shape, n):
    attn = _mk(geometry, grid_shape)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, n, 32))
    params = attn.init(jax.random.PRNGKey(1), x)
    out = attn.apply(params, x)
    assert out.shape == (2, n, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_slice_weights_rows_sum_to_one():
    key = jax.random.PRNGKey(0)
    x_mid = jax.random.normal(key, (2, 4, 40, 8))
    kern = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    bias = jnp.zeros((16,))
    temp = jnp.full((1, 4, 1, 1), 0.5)
    w = compute_slice_weights(x_mid, kern, bias, temp, clamp_temperature=True)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)
    assert (np.asarray(w) >= 0).all()


def test_temperature_clamp_only_for_grids():
    """Clamp active: extreme temperature must saturate at 5.0 for grids."""
    x_mid = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 10, 8))
    kern = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
    bias = jnp.zeros((4,))
    big_temp = jnp.full((1, 1, 1, 1), 100.0)
    clamped5 = jnp.full((1, 1, 1, 1), 5.0)
    w_clamped = compute_slice_weights(x_mid, kern, bias, big_temp, True)
    w_at5 = compute_slice_weights(x_mid, kern, bias, clamped5, False)
    np.testing.assert_allclose(np.asarray(w_clamped), np.asarray(w_at5), atol=1e-6)
    w_raw = compute_slice_weights(x_mid, kern, bias, big_temp, False)
    assert not np.allclose(np.asarray(w_clamped), np.asarray(w_raw))


def test_aggregation_of_constant_field_is_constant():
    """If fx is constant across points, every slice token equals that constant."""
    const = 3.0
    fx_mid = jnp.full((1, 2, 50, 8), const)
    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (1, 2, 50, 16)), -1)
    tok = aggregate_slice_tokens(fx_mid, w)
    # slice_norm >= ~1 for at least some slices; tokens of populated slices ~const
    norm = np.asarray(w.sum(2))
    tok = np.asarray(tok)
    populated = norm > 0.5
    scale = norm / (norm + 1e-5)  # the +1e-5 norm regularizer
    expect = np.broadcast_to(const * scale[..., None], tok.shape)
    np.testing.assert_allclose(tok[populated], expect[populated], rtol=1e-4)


def test_deslice_of_constant_tokens_is_constant():
    """Deslicing identical tokens through any row-stochastic weights is constant."""
    tok = jnp.broadcast_to(jnp.arange(8.0), (1, 2, 16, 8))
    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (1, 2, 30, 16)), -1)
    out = deslice(tok, w)  # [1, 30, 16]
    expect = np.tile(np.arange(8.0), 2)
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(expect, (1, 30, 16)), atol=1e-5
    )


def test_core_matches_manual_composition():
    B, H, N, D, G = 2, 2, 20, 8, 6
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x_mid = jax.random.normal(ks[0], (B, H, N, D))
    fx_mid = jax.random.normal(ks[1], (B, H, N, D))
    kern = jax.random.normal(ks[2], (D, G))
    bias = jax.random.normal(ks[3], (G,))
    temp = jnp.full((1, H, 1, 1), 0.5)
    wq = jax.random.normal(ks[4], (D, D))
    wk = jax.random.normal(ks[5], (D, D))
    wv = jax.random.normal(ks[6], (D, D))

    out, w, tok = slice_attention(
        x_mid, fx_mid, kern, bias, temp, wq, wk, wv, clamp_temperature=True
    )

    # manual numpy recomputation
    logits = np.einsum("bhnd,dg->bhng", x_mid, kern) + np.asarray(bias)
    wref = np.exp(logits / 0.5)
    wref = wref / wref.sum(-1, keepdims=True)
    tokref = np.einsum("bhnd,bhng->bhgd", fx_mid, wref)
    tokref = tokref / (wref.sum(2) + 1e-5)[..., None]
    q = tokref @ np.asarray(wq)
    k = tokref @ np.asarray(wk)
    v = tokref @ np.asarray(wv)
    dots = np.einsum("bhgd,bhkd->bhgk", q, k) * D**-0.5
    attn = np.exp(dots - dots.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    otok = np.einsum("bhgk,bhkd->bhgd", attn, v)
    oref = np.einsum("bhgd,bhng->bhnd", otok, wref)
    oref = oref.transpose(0, 2, 1, 3).reshape(B, N, H * D)

    np.testing.assert_allclose(np.asarray(w), wref, rtol=1e-4, atol=1e-5)
    # `tok` is the post-attention slice token
    np.testing.assert_allclose(np.asarray(tok), otok, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out), oref, rtol=1e-3, atol=1e-4)


def test_encoder_encode_decode_shapes():
    attn = _mk("grid2d", (6, 7), autoencoder=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 42, 32))

    def init_all(module, x_):
        out = module(x_)
        tok_, w_ = module.encode(x_)
        module.reconstruct_fx(tok_, w_)
        return out

    params = attn.init(jax.random.PRNGKey(1), x, method=init_all)
    tok, w = attn.apply(params, x, method="encode")
    assert tok.shape == (2, 4, 8, 8)  # B, H, G, D
    assert w.shape == (2, 4, 42, 8)  # B, H, N, G
    out = attn.apply(params, tok, w, method="decode")
    assert out.shape == (2, 42, 32)
    rec, projected = attn.apply(params, tok, w, method="reconstruct_fx")
    assert rec.shape == (2, 42, 32)
    assert projected.shape == w.shape


def test_merged_projection_equals_separate_convs():
    """The fused single-conv projection must equal two separate convs."""
    from flax import linen as nn

    attn = _mk("grid2d", (6, 7))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 42, 32))
    params = attn.init(jax.random.PRNGKey(4), x)

    x_mid, fx_mid = attn.apply(params, x, method="_project_and_split")
    p = params["params"]
    xg = x.reshape(2, 6, 7, 32)
    ref_x = jax.lax.conv_general_dilated(
        xg, p["in_project_x"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["in_project_x"]["bias"]
    ref_f = jax.lax.conv_general_dilated(
        xg, p["in_project_fx"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["in_project_fx"]["bias"]
    np.testing.assert_allclose(
        np.asarray(x_mid.reshape(2, 42, -1)), np.asarray(ref_x.reshape(2, 42, -1)),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(fx_mid.reshape(2, 42, -1)), np.asarray(ref_f.reshape(2, 42, -1)),
        rtol=1e-5, atol=1e-5,
    )
