"""Solver-in-the-loop unrolled Transolver.

TPU-native equivalent of ``model/SOL_Transolver_Structured_Mesh_2D.py:6-52``:
the inner model is applied ``look_ahead`` times, each step shifting the
channel-stacked frame history ``fx = cat(fx[..., step:], u)``; gradients flow
through the whole unroll (BPTT).  Here the unroll is an ``nn.scan`` with
broadcast parameters, so XLA compiles the inner model once regardless of the
curriculum's look-ahead value.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .transolver import Transolver


class _UnrollStep(nn.Module):
    model_kwargs: dict
    step: int

    @nn.compact
    def __call__(self, carry, _):
        x, fx = carry
        u = Transolver(**self.model_kwargs, name="transolver_model")(x, fx)
        fx = jnp.concatenate([fx[..., self.step :], u], axis=-1)
        # no per-step output: only the final prediction is used, and it is
        # recoverable from the carry -- stacking all look_ahead predictions
        # would materialize an [n, B, N, out] array per train step
        return (x, fx), None


class SOLTransolver(nn.Module):
    """Unrolls an inner Transolver ``look_ahead`` times over its own output.

    ``step`` is the number of scalar fields per frame (2 for a 2D velocity
    field); ``look_ahead`` the number of inner forward calls.  Returns the
    final step's prediction, like the reference (``SOL_...py:47-52``).
    """

    look_ahead: int = 5
    step: int = 1
    # inner-model configuration (mirrors Transolver's surface)
    space_dim: int = 1
    n_layers: int = 5
    n_hidden: int = 256
    dropout: float = 0.0
    n_head: int = 8
    Time_Input: bool = False
    act: str = "gelu"
    mlp_ratio: int = 1
    fun_dim: int = 1
    out_dim: int = 1
    slice_num: int = 32
    ref: int = 8
    unified_pos: bool = False
    H: int = 85
    W: int = 85
    use_checkpoint: bool = False
    impl: str = "xla"
    precision: Optional[str] = None

    def model_kwargs(self):
        return dict(
            space_dim=self.space_dim,
            n_layers=self.n_layers,
            n_hidden=self.n_hidden,
            dropout=self.dropout,
            n_head=self.n_head,
            Time_Input=self.Time_Input,
            act=self.act,
            mlp_ratio=self.mlp_ratio,
            fun_dim=self.fun_dim,
            out_dim=self.out_dim,
            slice_num=self.slice_num,
            ref=self.ref,
            unified_pos=self.unified_pos,
            geometry="grid2d",
            H=self.H,
            W=self.W,
            use_checkpoint=self.use_checkpoint,
            impl=self.impl,
            precision=self.precision,
        )

    @nn.compact
    def __call__(self, x, fx, look_ahead: Optional[int] = None):
        n = self.look_ahead if look_ahead is None else look_ahead
        unroll = nn.scan(
            _UnrollStep,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            length=n,
        )(model_kwargs=self.model_kwargs(), step=self.step, name="unroll")
        (_, fx_final), _ = unroll((x, fx), None)
        # the last prediction is the trailing out_dim channels of the carry
        # (each step drops `step` channels and appends the out_dim-channel
        # prediction)
        return fx_final[..., -self.out_dim:]
