"""Experimental convolutional slice attention.

The fork's ``My_Physics_Attention`` (``model/Physics_Attention.py:291-347``):
slices are produced by a Conv2d mapping to ``slice_num * dim`` channels and
summed per slice; the deslice is a learned ``Linear(slice_num, N)``.  It is
imported but never instantiated by any reference model
(``Transolver_Structured_Mesh_2D.py:6``) -- kept here as the documented
alternative, off the critical path.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from .initializers import (
    make_torch_conv_bias_init,
    torch_conv_kernel_init,
    torch_linear_kernel_init,
)


class ConvSliceAttention(nn.Module):
    """Single-head attention over conv-derived slices (My_Physics_Attention)."""

    dim: int
    slice_num: int = 64
    H: int = 101
    W: int = 31
    kernel_size: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, C = x.shape
        M = self.slice_num
        xg = x.reshape(B, self.H, self.W, C)
        slices = nn.Conv(
            M * C,
            kernel_size=(self.kernel_size,) * 2,
            padding="SAME",
            kernel_init=torch_conv_kernel_init,
            bias_init=make_torch_conv_bias_init(C * self.kernel_size**2),
            name="slice_projection",
        )(xg)
        # reference reshapes through (B, M, C, W, H) then sums the points axis
        slices = slices.reshape(B, N, M, C)
        slice_token = slices.sum(axis=1)[:, None]  # [B, 1, M, C]

        dense = lambda name: nn.Dense(
            C, use_bias=False, kernel_init=torch_linear_kernel_init, name=name
        )
        q = dense("to_q")(slice_token)
        k = dense("to_k")(slice_token)
        v = dense("to_v")(slice_token)
        dots = jnp.einsum("bhmd,bhnd->bhmn", q, k) * C**-0.5
        attn = jax.nn.softmax(dots, axis=-1)
        out_token = jnp.einsum("bhmn,bhnd->bhmd", attn, v)[:, 0]  # [B, M, C]

        # learned deslice: Linear(slice_num -> N) over the slice axis
        out = nn.Dense(
            N, kernel_init=torch_linear_kernel_init, name="deslice"
        )(out_token.transpose(0, 2, 1))  # [B, C, N]
        return out.transpose(0, 2, 1)  # [B, N, C]
