"""Activation registry.

Mirrors the ``ACTIVATION`` dict the reference re-declares in every model file
(e.g. ``model/Transolver_Structured_Mesh_2D.py:9-10``), defined once here.

Note: torch ``nn.GELU`` is the exact (erf) form, so we pin
``jax.nn.gelu(approximate=False)`` for numerical parity.
"""

import functools

import jax
import jax.numpy as jnp


def _leaky_relu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.1)


ACTIVATION = {
    "gelu": functools.partial(jax.nn.gelu, approximate=False),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "leaky_relu": _leaky_relu,
    "softplus": jax.nn.softplus,
    "ELU": jax.nn.elu,
    "silu": jax.nn.silu,
}


def get_activation(name):
    if name not in ACTIVATION:
        raise NotImplementedError(f"activation {name!r}; known: {sorted(ACTIVATION)}")
    return ACTIVATION[name]
