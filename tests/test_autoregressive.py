"""Scan-based rollout loops vs explicit Python-loop recomputation."""

import jax
import jax.numpy as jnp
import numpy as np

from transformerbasednavierstokesolver_tpu.train.autoregressive import (
    closed_loop_rollout,
    make_teacher_forced_loss,
    teacher_forced_rollout,
)
from transformerbasednavierstokesolver_tpu.utils.losses import rel_lp


def _linear_forward(w):
    """A toy 'model': next frame = W-weighted mix of history channels."""

    def forward(x, fx):
        return jnp.einsum("bnc,cd->bnd", fx, w)

    return forward


def _setup(step=1, t_in=4, t_out=6):
    rng = np.random.default_rng(0)
    B, N = 2, 5
    x = jnp.asarray(rng.normal(size=(B, N, 2)).astype(np.float32))
    fx = jnp.asarray(rng.normal(size=(B, N, t_in * step)).astype(np.float32))
    yy = jnp.asarray(rng.normal(size=(B, N, t_out * step)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(t_in * step, step)).astype(np.float32) * 0.3)
    return x, fx, yy, w


def test_teacher_forced_matches_python_loop():
    for step in (1, 2):
        x, fx, yy, w = _setup(step=step)
        forward = _linear_forward(w)
        loss, pred = teacher_forced_rollout(forward, x, fx, yy, step)

        f = fx
        ref_loss, preds = 0.0, []
        T = yy.shape[-1]
        for t in range(0, T, step):
            y = yy[..., t : t + step]
            im = forward(x, f)
            ref_loss += float(
                rel_lp(im.reshape(2, -1), y.reshape(2, -1), reduction="sum")
            )
            preds.append(np.asarray(im))
            f = jnp.concatenate([f[..., step:], y], axis=-1)
        ref_pred = np.concatenate(preds, axis=-1)
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(pred), ref_pred, rtol=1e-5)


def test_closed_loop_matches_python_loop():
    for step in (1, 2):
        x, fx, yy, w = _setup(step=step)
        forward = _linear_forward(w)
        n_steps = yy.shape[-1] // step
        pred = closed_loop_rollout(forward, x, fx, n_steps, step)

        f = fx
        preds = []
        for _ in range(n_steps):
            im = forward(x, f)
            preds.append(np.asarray(im))
            f = jnp.concatenate([f[..., step:], im], axis=-1)
        np.testing.assert_allclose(
            np.asarray(pred), np.concatenate(preds, axis=-1), rtol=1e-5
        )


def test_remat_loss_grad_equivalence():
    """remat=True must not change the loss value or gradients."""
    x, fx, yy, w = _setup()

    def apply_fn(variables, x_, fx_):
        return jnp.einsum("bnc,cd->bnd", fx_, variables["params"]["w"])

    params = {"w": w}
    for remat in (False, True, "half"):
        loss_fn = make_teacher_forced_loss(1, remat=remat)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, apply_fn, x, fx, yy
        )
        if remat:
            np.testing.assert_allclose(float(loss), loss0, rtol=1e-6)
            np.testing.assert_allclose(
                np.asarray(grads["w"]), g0, rtol=1e-5
            )
            np.testing.assert_allclose(np.asarray(aux["full_loss"]), full0,
                                       rtol=1e-6)
        else:
            loss0, g0 = float(loss), np.asarray(grads["w"])
            full0 = np.asarray(aux["full_loss"])
