"""Model-level forward tests across geometries / variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformerbasednavierstokesolver_tpu.models import (
    SOLTransolver,
    Transolver,
    get_model,
)


def small_2d(**kw):
    cfg = dict(
        space_dim=2, n_layers=3, n_hidden=32, n_head=4, fun_dim=1, out_dim=1,
        slice_num=8, geometry="grid2d", H=8, W=8, mlp_ratio=1,
    )
    cfg.update(kw)
    return Transolver(**cfg)


def test_forward_2d_shape():
    model = small_2d()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 2))
    fx = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 1))
    params = model.init(jax.random.PRNGKey(2), x, fx)
    out = model.apply(params, x, fx)
    assert out.shape == (2, 64, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_forward_2d_unified_pos():
    model = small_2d(unified_pos=True, ref=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 2))
    fx = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 1))
    params = model.init(jax.random.PRNGKey(2), x, fx)
    out = model.apply(params, x, fx)
    assert out.shape == (2, 64, 1)
    # preprocess input dim must be fun_dim + ref^2
    k = params["params"]["preprocess"]["linear_pre"]["kernel"]
    assert k.shape[0] == 1 + 16


def test_forward_fx_none_uses_placeholder():
    model = small_2d(fun_dim=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 2))
    params = model.init(jax.random.PRNGKey(2), x, None)
    out = model.apply(params, x, None)
    assert out.shape == (2, 64, 1)


def test_forward_irregular():
    model = Transolver(
        space_dim=2, n_layers=2, n_hidden=32, n_head=4, fun_dim=0, out_dim=1,
        slice_num=8, geometry="irregular",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 57, 2))  # ragged N
    params = model.init(jax.random.PRNGKey(1), x, None)
    out = model.apply(params, x, None)
    assert out.shape == (2, 57, 1)


def test_forward_irregular_unified_pos():
    model = Transolver(
        space_dim=2, n_layers=2, n_hidden=32, n_head=4, fun_dim=0, out_dim=1,
        slice_num=8, geometry="irregular", unified_pos=True, ref=4,
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 57, 2))
    params = model.init(jax.random.PRNGKey(1), x, None)
    assert model.apply(params, x, None).shape == (2, 57, 1)


def test_forward_3d():
    model = Transolver(
        space_dim=3, n_layers=2, n_hidden=32, n_head=4, fun_dim=0, out_dim=4,
        slice_num=8, geometry="grid3d", H=4, W=4, D=4, use_checkpoint=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 3))
    params = model.init(jax.random.PRNGKey(1), x, None)
    assert model.apply(params, x, None).shape == (1, 64, 4)


def test_time_input():
    model = small_2d(Time_Input=True, fun_dim=4, out_dim=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 2))
    fx = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 4))
    T = jnp.array([[0.3], [0.7]])
    params = model.init(jax.random.PRNGKey(2), x, fx, T)
    out = model.apply(params, x, fx, T)
    assert out.shape == (2, 64, 4)
    # different T must change the output
    out2 = model.apply(params, x, fx, jnp.array([[0.9], [0.1]]))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_encoder_variant_roundtrip_shapes():
    model = Transolver(
        space_dim=2, n_layers=3, n_hidden=32, n_head=1, fun_dim=1, out_dim=1,
        slice_num=16, geometry="grid2d", variant="encoder", H=8, W=8,
        unified_pos=True, ref=4,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 2))
    fx = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 1))
    params = model.init(jax.random.PRNGKey(2), x, fx)
    out = model.apply(params, x, fx)
    assert out.shape == (2, 64, 1)
    code, w = model.apply(params, x, fx, method="encode")
    assert code.shape == (2, 1, 16, 32)
    assert w.shape == (2, 1, 64, 16)
    dec, projected = model.apply(params, code, w, method="decode")
    assert dec.shape == (2, 64, 1)
    # forward == decode(encode(.)) by construction
    np.testing.assert_allclose(np.asarray(out), np.asarray(dec), rtol=1e-4, atol=1e-5)


def test_registry():
    factory = get_model("Transolver_Structured_Mesh_2D")
    model = factory(
        space_dim=2, n_layers=2, n_hidden=32, n_head=4, fun_dim=1, out_dim=1,
        slice_num=8, H=8, W=8,
    )
    assert model.geometry == "grid2d"
    with pytest.raises(KeyError):
        get_model("nope")


def test_sol_unroll():
    model = SOLTransolver(
        look_ahead=3, step=1, space_dim=2, n_layers=2, n_hidden=32, n_head=4,
        fun_dim=5, out_dim=1, slice_num=8, H=8, W=8,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 2))
    fx = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 5))
    params = model.init(jax.random.PRNGKey(2), x, fx)
    out = model.apply(params, x, fx)
    assert out.shape == (2, 64, 1)

    # unrolling once == plain inner forward
    model1 = SOLTransolver(
        look_ahead=1, step=1, space_dim=2, n_layers=2, n_hidden=32, n_head=4,
        fun_dim=5, out_dim=1, slice_num=8, H=8, W=8,
    )
    out1 = model1.apply(params, x, fx)
    inner = Transolver(
        space_dim=2, n_layers=2, n_hidden=32, n_head=4, fun_dim=5, out_dim=1,
        slice_num=8, geometry="grid2d", H=8, W=8,
    )
    inner_params = {
        "params": params["params"]["unroll"]["transolver_model"]
    }
    ref = inner.apply(inner_params, x, fx)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref), rtol=1e-5, atol=1e-6)
