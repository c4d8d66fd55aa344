"""Chunked scan epochs == one-dispatch epochs (cli/autoreg.py chunking).

The relay transport rejects >~300 MB compile payloads and hangs on >1 min
dispatches, so benchmark-scale epochs run as equal-shaped sub-dispatches
with the dataset threaded through as explicit jit args (train/loop.py
``make_epoch_fn`` ``*data``).  Both must be numerically identical to the
single full-epoch dispatch.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from transformerbasednavierstokesolver_tpu.train.loop import (
    create_train_state,
    make_epoch_fn,
)


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, fx):
        return nn.Dense(1)(jnp.concatenate([x, fx], -1))


def _loss_fn(params, apply_fn, x, fx, y):
    out = apply_fn({"params": params}, x, fx)
    loss = jnp.mean((out - y) ** 2)
    return loss, {"step_loss": loss, "full_loss": 2.0 * loss}


def _state():
    model = _Tiny()
    sample = (jnp.zeros((1, 5, 2)), jnp.zeros((1, 5, 3)))
    tx = optax.sgd(1e-2)
    return create_train_state(jax.random.PRNGKey(0), model, sample, tx)


def test_chunked_epoch_matches_full_dispatch():
    rng = np.random.default_rng(0)
    n, bsz = 16, 2
    pos = jnp.asarray(rng.normal(size=(1, 5, 2)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(n, 5, 3)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(n, 5, 1)).astype(np.float32))

    def gather(idx, pos_c, a_c, u_c):
        xb = jnp.broadcast_to(pos_c, (idx.shape[0],) + pos_c.shape[1:])
        return xb, a_c[idx], u_c[idx]

    idx_mat = np.arange(n).reshape(-1, bsz)

    # full-epoch single dispatch (donate off so states stay comparable)
    epoch_fn = make_epoch_fn(_loss_fn, gather, donate=False)
    s_full, (_, aux_full) = epoch_fn(_state(), jnp.asarray(idx_mat), pos, a, u)

    # chunked dispatches threading the same state through
    s_c = _state()
    sums = 0.0
    for c in range(0, idx_mat.shape[0], 2):
        s_c, (_, aux) = epoch_fn(s_c, jnp.asarray(idx_mat[c : c + 2]), pos, a, u)
        sums += float(aux["step_loss"].sum())

    for pf, pc in zip(
        jax.tree_util.tree_leaves(s_full.params),
        jax.tree_util.tree_leaves(s_c.params),
    ):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pc), rtol=1e-6)
    np.testing.assert_allclose(sums, float(aux_full["step_loss"].sum()), rtol=1e-6)

    # closure-style gather (no *data) still works for the small callers
    pos_c, a_c, u_c = pos, a, u
    epoch_legacy = make_epoch_fn(
        _loss_fn,
        lambda idx: (
            jnp.broadcast_to(pos_c, (idx.shape[0],) + pos_c.shape[1:]),
            a_c[idx], u_c[idx],
        ),
        donate=False,
    )
    s_l, _ = epoch_legacy(_state(), jnp.asarray(idx_mat))
    for pf, pl in zip(
        jax.tree_util.tree_leaves(s_full.params),
        jax.tree_util.tree_leaves(s_l.params),
    ):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pl), rtol=1e-6)
