"""Native checkpoint save/restore, train-state resume, mismatch errors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformerbasednavierstokesolver_tpu.models import Transolver
from transformerbasednavierstokesolver_tpu.train.checkpoint import (
    restore_params,
    restore_train_state,
    save_params,
    save_train_state,
)
from transformerbasednavierstokesolver_tpu.train.loop import create_train_state
from transformerbasednavierstokesolver_tpu.train.optim import make_optimizer


def _model(n_head=4):
    return Transolver(
        space_dim=2, n_layers=2, n_hidden=32, n_head=n_head, fun_dim=1,
        out_dim=1, slice_num=8, geometry="grid2d", H=8, W=8,
    )


def _params(model):
    return model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 2)), jnp.zeros((1, 64, 1))
    )["params"]


def test_params_roundtrip(tmp_path):
    model = _model()
    params = _params(model)
    path = str(tmp_path / "m.ckpt")
    save_params(path, params, step=7)
    restored = restore_params(path, params)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shape_mismatch_raises_clearly(tmp_path):
    params = _params(_model(n_head=4))
    path = str(tmp_path / "m.ckpt")
    save_params(path, params)
    other = _params(_model(n_head=8))
    with pytest.raises(ValueError, match="different architecture"):
        restore_params(path, other)


def test_train_state_resume_continues_schedule(tmp_path):
    model = _model()
    tx = make_optimizer(1e-3, 100, 1e-5, None)
    state = create_train_state(
        jax.random.PRNGKey(0), model,
        (jnp.zeros((1, 64, 2)), jnp.zeros((1, 64, 1))), tx,
    )

    def update(state):
        grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
        return state.apply_gradients(grads=grads)

    for _ in range(3):
        state = update(state)
    path = str(tmp_path / "s.state")
    save_train_state(path, state)

    fresh = create_train_state(
        jax.random.PRNGKey(1), model,
        (jnp.zeros((1, 64, 2)), jnp.zeros((1, 64, 1))), tx,
    )
    resumed = restore_train_state(path, fresh)
    assert int(resumed.step) == 3
    # params and optimizer moments restored exactly
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(resumed.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a further update from the resumed state matches continuing the original
    s1, s2 = update(state), update(resumed)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
