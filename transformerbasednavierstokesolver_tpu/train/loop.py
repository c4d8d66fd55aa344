"""Generic jitted training-step machinery.

The reference's per-benchmark Python loops (`exp_*.py`) become: a
``TrainState`` (params + optimizer state), a jit-compiled ``update`` built
from a task loss function, and host-side epoch loops in the CLI modules.
"""

from typing import Any, Callable

import jax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """Standard flax TrainState (apply_fn, params, tx, opt_state, step)."""


def create_train_state(rng, model, sample_args, tx, method=None):
    """Initialize parameters from sample inputs and wrap them in a TrainState."""
    variables = model.init(rng, *sample_args, method=method)
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )


def make_update_fn(loss_fn: Callable, donate: bool = True):
    """Build ``update(state, *batch) -> (state, aux)`` with value_and_grad + jit.

    ``loss_fn(params, apply_fn, *batch)`` must return ``(loss, aux)``.
    """

    def update(state: TrainState, *batch) -> Any:
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.apply_fn, *batch
        )
        state = state.apply_gradients(grads=grads)
        return state, (loss, aux)

    return jax.jit(update, donate_argnums=(0,) if donate else ())
