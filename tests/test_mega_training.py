"""Training-agreement test: `--impl mega` vs `--impl xla` loss curves.

Gradient parity at init (test_pallas_block.py) is necessary but not
sufficient for the hand-derived 5-kernel VJP to TRAIN correctly; this
trains the full Transolver model with both implementations from identical
initialization on identical data and asserts the loss trajectories agree
(round-2 VERDICT weak 3 / next-round item 3).  Scaled-down shapes keep the
interpret-mode Pallas kernels suite-friendly; the canonical-shape agreement
run lives in the TPU round logs (logs/).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformerbasednavierstokesolver_tpu.models import Transolver
from transformerbasednavierstokesolver_tpu.train.loop import (
    create_train_state,
    make_update_fn,
)
from transformerbasednavierstokesolver_tpu.train.optim import make_optimizer
from transformerbasednavierstokesolver_tpu.utils.losses import rel_lp


N_STEPS = 25


def _losses(impl, fx, y, x):
    model = Transolver(
        space_dim=2, n_layers=2, n_hidden=32, n_head=4, fun_dim=fx.shape[-1],
        out_dim=1, slice_num=8, ref=8, unified_pos=False, geometry="grid2d",
        H=16, W=16, impl=impl,
    )
    tx = make_optimizer(1e-3, N_STEPS, 1e-5, None)
    state = create_train_state(jax.random.PRNGKey(0), model, (x[:1], fx[:1]), tx)

    def loss_fn(params, apply_fn, xb, fxb, yb):
        out = apply_fn({"params": params}, xb, fxb)
        b = xb.shape[0]
        return rel_lp(out.reshape(b, -1), yb.reshape(b, -1), reduction="sum"), {}

    update = make_update_fn(loss_fn, donate=False)
    losses = []
    for _ in range(N_STEPS):
        state, (loss, _) = update(state, x, fx, y)
        losses.append(float(loss))
    return np.array(losses)


def test_mega_xla_loss_curve_agreement():
    rng = np.random.default_rng(0)
    B, H, W = 2, 16, 16
    x = jnp.asarray(
        np.stack(
            np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W)), -1
        ).reshape(1, -1, 2).repeat(B, 0),
        jnp.float32,
    )
    fx = jnp.asarray(rng.normal(size=(B, H * W, 4)), jnp.float32)
    # smooth target correlated with the input so the loss actually descends
    y = jnp.asarray(
        fx[..., :1] * 0.5 + np.sin(2 * np.pi * np.asarray(x[..., :1])), jnp.float32
    )

    l_xla = _losses("xla", fx, y, x)
    l_mega = _losses("mega", fx, y, x)

    assert l_xla[-1] < l_xla[0] * 0.9, "training did not descend"
    # identical init + identical data: trajectories must agree to f32
    # accumulation noise, growing modestly as the trajectories diverge
    np.testing.assert_allclose(l_mega[:5], l_xla[:5], rtol=2e-3)
    assert abs(l_mega[-1] - l_xla[-1]) / l_xla[-1] < 0.05, (
        l_mega[-1], l_xla[-1],
    )
