"""OneCycle schedule parity against torch.optim.lr_scheduler.OneCycleLR."""

import numpy as np
import pytest
import torch

from transformerbasednavierstokesolver_tpu.train.optim import (
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
