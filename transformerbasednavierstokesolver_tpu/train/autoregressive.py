"""Autoregressive rollout loops as ``lax.scan``.

TPU-native form of the reference's Python-loop BPTT:

* ``teacher_forced_rollout`` == the exp_ns train loop (``exp_ns.py:198-208``):
  at every step the model sees the ground-truth history (teacher forcing),
  per-step relative-L2 losses are summed, gradients flow through all T
  forward passes;
* ``closed_loop_rollout`` == the eval loop (``exp_ns.py:230-238``): the
  prediction is fed back into the history.

Both operate on channel-stacked frame histories ``fx [B, N, T_in*step]`` and
targets ``yy [B, N, T*step]``, sliding by ``step`` channels per frame like
``fx = cat(fx[..., step:], y)``.
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.losses import rel_lp


def _stack_preds(preds_tbnc):
    """[T, B, N, step] scan stack -> [B, N, T*step] channel concatenation."""
    t, b, n, s = preds_tbnc.shape
    return preds_tbnc.transpose(1, 2, 0, 3).reshape(b, n, t * s)


def _teacher_forced_scan(forward, x, fx, yy, step, unroll=1, track_full=True,
                         forward2=None):
    """Shared teacher-forced unroll body: returns (loss_sum, preds or None).

    ``forward2``: optional second forward applied to every other step.  Used
    by the 'half' remat policy: steps through ``forward`` (rematted) recompute
    their activations in the backward, steps through ``forward2`` (plain)
    save theirs -- halving the backward's re-forward cost for ~half the
    no-remat activation memory.
    """
    T = yy.shape[-1]
    n_steps = T // step
    bsz = x.shape[0]

    def one(fwd, fx_, loss, t):
        y = lax.dynamic_slice_in_dim(yy, t, step, axis=-1)
        im = fwd(x, fx_)
        loss = loss + rel_lp(
            im.reshape(bsz, -1), y.reshape(bsz, -1), reduction="sum"
        )
        fx_ = jnp.concatenate([fx_[..., step:], y], axis=-1)
        return fx_, loss, im

    if forward2 is None:
        def body(carry, t):
            fx_, loss = carry
            fx_, loss, im = one(forward, fx_, loss, t)
            return (fx_, loss), (im if track_full else None)

        (_, loss), preds = lax.scan(
            body, (fx, 0.0), jnp.arange(n_steps) * step, unroll=unroll
        )
        return loss, (_stack_preds(preds) if track_full else None)

    if n_steps % 2 != 0:
        # pairwise body needs an even trip count; fall back to per-step
        # remat instead of crashing (step=2 trainers have n_steps=5)
        import warnings

        warnings.warn(
            f"'half' remat needs an even step count (got {n_steps}); "
            "falling back to per-step remat"
        )
        return _teacher_forced_scan(
            forward, x, fx, yy, step,  # already the checkpointed fn
            unroll=unroll, track_full=track_full, forward2=None,
        )

    def body2(carry, t):
        fx_, loss = carry
        fx_, loss, im1 = one(forward, fx_, loss, t)
        fx_, loss, im2 = one(forward2, fx_, loss, t + step)
        out = jnp.concatenate([im1, im2], axis=-1) if track_full else None
        return (fx_, loss), out

    (_, loss), preds = lax.scan(
        body2, (fx, 0.0), jnp.arange(n_steps // 2) * 2 * step, unroll=unroll
    )
    return loss, (_stack_preds(preds) if track_full else None)


def teacher_forced_rollout(forward, x, fx, yy, step: int = 1):
    """Teacher-forced unroll; returns (loss_sum, pred [B, N, T]).

    ``forward(x, fx) -> [B, N, step]``; ``loss_sum`` is the sum over steps of
    per-step ``rel_lp(..., reduction='sum')``, matching the reference's
    accumulated step loss.
    """
    return _teacher_forced_scan(forward, x, fx, yy, step)


def closed_loop_rollout(forward, x, fx, n_steps: int, step: int = 1):
    """Feed predictions back autoregressively; returns pred [B, N, n_steps*step]."""

    def body(fx, _):
        im = forward(x, fx)
        fx = jnp.concatenate([fx[..., step:], im], axis=-1)
        return fx, im

    _, preds = lax.scan(body, fx, None, length=n_steps)
    return _stack_preds(preds)


def make_teacher_forced_loss(step: int = 1, remat=False,
                             unroll: int = 1, track_full: bool = True):
    """Loss for ``make_update_fn``: full teacher-forced scan under one grad.

    ``remat``: ``True``/'step' rematerializes each rollout step's forward in
    the backward pass (10x BPTT activation-memory reduction -- the HBM lever
    that lets the flagship config train at full batch on a single chip);
    ``'half'`` remats every other step (half the backward re-forward cost for
    ~half the no-remat activation memory); falsy saves everything.
    ``track_full=False`` drops the stacked-predictions full-trajectory metric
    (loss-only scan carry -- less residual traffic when only the step loss is
    needed).
    """

    def loss_fn(params, apply_fn, x, fx, yy):
        def forward(x_, fx_):
            return apply_fn({"params": params}, x_, fx_)

        forward2 = None
        if remat == "half":
            forward2 = forward
            forward = jax.checkpoint(forward)
        elif remat:
            forward = jax.checkpoint(forward)

        loss, pred = _teacher_forced_scan(
            forward, x, fx, yy, step, unroll=unroll, track_full=track_full,
            forward2=forward2,
        )
        if pred is None:
            # track_full=False: no stacked predictions, so there is no
            # full-trajectory metric -- report NaN rather than aliasing the
            # (differently-scaled) step-loss sum under the full_loss name
            return loss, {"step_loss": loss,
                          "full_loss": jnp.full_like(loss, jnp.nan)}
        bsz = x.shape[0]
        full = rel_lp(
            pred.reshape(bsz, -1), yy.reshape(bsz, -1), reduction="sum"
        )
        return loss, {"step_loss": loss, "full_loss": full}

    return loss_fn
