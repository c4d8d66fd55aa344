"""OneCycle schedule parity against torch.optim.lr_scheduler.OneCycleLR,
and the phase-gated subtree freeze (SequenSolver's freeze_attention)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from transformerbasednavierstokesolver_tpu.train.optim import (
    freeze_subtrees,
    onecycle_lr,
    onecycle_momentum,
)


@pytest.mark.parametrize("total_steps", [50, 400])
def test_lr_matches_torch(total_steps):
    max_lr = 1e-3
    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=max_lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=max_lr, total_steps=total_steps
    )
    ours = onecycle_lr(max_lr, total_steps)
    torch_lrs, our_lrs = [], []
    for step in range(total_steps):
        torch_lrs.append(opt.param_groups[0]["lr"])
        our_lrs.append(float(ours(step)))
        opt.step()
        sched.step()
    np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-4, atol=1e-9)


@pytest.mark.parametrize("total_steps", [50, 400])
def test_momentum_matches_torch(total_steps):
    max_lr = 1e-3
    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=max_lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=max_lr, total_steps=total_steps
    )
    ours = onecycle_momentum(total_steps)
    torch_b1, our_b1 = [], []
    for step in range(total_steps):
        torch_b1.append(opt.param_groups[0]["betas"][0])
        our_b1.append(float(ours(step)))
        opt.step()
        sched.step()
    np.testing.assert_allclose(our_b1, torch_b1, rtol=1e-4, atol=1e-6)


def test_phase_gated_freeze():
    """`block` trains during phase 1 and is bit-frozen from the phase step on
    (reference ``SequenSolver.py:576-579``: freeze_attention after epoch 5
    while the slice head keeps training)."""
    params = {
        "encoder": {"w": jnp.ones((3,))},
        "block": {"w": jnp.ones((3,))},
        "head": {"w": jnp.ones((3,))},
    }
    tx = freeze_subtrees(
        optax.adamw(1e-2, weight_decay=1e-2),
        {"encoder"},
        phase_frozen_keys={"block"},
        phase_start_step=2,
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    history = []
    for _ in range(4):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        history.append(jax.tree_util.tree_map(np.asarray, params))
    # encoder never moves
    for h in history:
        np.testing.assert_array_equal(h["encoder"]["w"], np.ones((3,)))
    # block moves during steps 0-1, bit-frozen from step 2 on (incl. wd)
    assert not np.allclose(history[0]["block"]["w"], np.ones((3,)))
    assert not np.allclose(history[1]["block"]["w"], history[0]["block"]["w"])
    np.testing.assert_array_equal(
        history[2]["block"]["w"], history[1]["block"]["w"]
    )
    np.testing.assert_array_equal(
        history[3]["block"]["w"], history[1]["block"]["w"]
    )
    # the head keeps training through phase 2
    assert not np.allclose(history[3]["head"]["w"], history[1]["head"]["w"])
