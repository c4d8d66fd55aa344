"""Initializers matching the reference's effective init scheme.

The reference models call ``self.apply(_init_weights)`` after construction
(``model/Transolver_Structured_Mesh_2D.py:171-181``), which sets

* every ``nn.Linear`` weight to timm ``trunc_normal_(std=0.02)``, bias 0
  (this *overwrites* the orthogonal init of ``in_project_slice`` that the
  attention constructor applied first -- see ``model/Physics_Attention.py:21-22``);
* ``nn.LayerNorm`` to weight 1, bias 0;
* leaves ``nn.Conv2d/3d`` at the torch default (kaiming-uniform a=sqrt(5),
  i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias).

Standalone attention modules (used directly, e.g. the fork's SliceLearner)
keep the orthogonal slice init, so both are provided.
"""

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

# Effective Linear-weight init of the full models: truncated normal, std 0.02.
# timm truncates at absolute [-2, 2] while jax truncates at +/-2 std; with
# std=0.02 the absolute bounds are never hit, so the two coincide.
trunc_normal_002 = nn.initializers.truncated_normal(stddev=0.02)

zeros = nn.initializers.zeros_init()
ones = nn.initializers.ones_init()

# Orthogonal init used by standalone physics-attention slice projections.
orthogonal = nn.initializers.orthogonal()


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """Torch Conv default: U(-b, b), b = 1/sqrt(fan_in), fan_in = in_ch * prod(kernel).

    Flax conv kernel shape is (*window, in_features, out_features).
    """
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def make_torch_conv_bias_init(fan_in):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """Torch Linear default init (kaiming-uniform a=sqrt(5)): U(-1/sqrt(fan_in), .)."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def placeholder_init(n_hidden):
    """Reference: ``(1/n_hidden) * torch.rand(n_hidden)`` (uniform [0, 1/n_hidden))."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype) / n_hidden

    return init
