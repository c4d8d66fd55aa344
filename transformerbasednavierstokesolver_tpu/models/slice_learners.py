"""Slice-weight predictors for latent-space decoding.

The fork explores three ways to predict the deslice weights SequenSolver's
decoder needs (SURVEY.md section 2.5):

* :class:`SliceLearner` (reference ``SliceLearner.py:36-130``): a standalone
  mirror of Transolver's slice phase -- preprocess MLP -> 3x3 Conv ->
  Linear -> temperature-softmax;
* :class:`LearnSlice` (reference ``LearnSlice.py:41-227``): a grab-bag of
  heads -- per-point MLP over cat(code, pos), prediction from the previous
  frame's slice weights + token, and conv-based prediction from the
  vorticity history (with optional z-scored code concat, and a per-slice
  'seperate' variant).

Python loops over points/slices become vmapped/batched computations.
Reference quirks preserved and documented:
  * ``LearnSlice.forward_all`` applies its softmax over the POINT axis
    (``nn.Softmax(dim=0)`` on [N, M, 1] -- ``LearnSlice.py:116-123``),
    unlike the per-point ``forward`` which normalizes over slices;
  * ``forward_from_vorticity_seperate`` softmaxes a singleton axis
    (``LearnSlice.py:221-222``), so its weights are identically 1.0.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.embedding import unified_pos_grid_2d
from ..ops.initializers import (
    make_torch_conv_bias_init,
    placeholder_init,
    torch_conv_kernel_init,
    trunc_normal_002,
    zeros,
)
from ..ops.mlp import MLP
from .sequensolver import z_score


class SliceLearner(nn.Module):
    space_dim: int = 1
    n_hidden: int = 256
    act: str = "gelu"
    fun_dim: int = 1
    ref: int = 8
    unified_pos: bool = False
    H: int = 85
    W: int = 85
    slice_num: int = 32

    def setup(self):
        self.preprocess = MLP(
            n_hidden=self.n_hidden * 2, n_output=self.n_hidden,
            n_layers=0, res=False, act=self.act, name="preprocess",
        )
        fan_in = self.n_hidden * 9
        self.in_project_x = nn.Conv(
            self.n_hidden, kernel_size=(3, 3), padding="SAME",
            kernel_init=torch_conv_kernel_init,
            bias_init=make_torch_conv_bias_init(fan_in),
            name="in_project_x",
        )
        self.in_project_slice = nn.Dense(
            self.slice_num, kernel_init=trunc_normal_002, bias_init=zeros,
            name="in_project_slice",
        )
        self.temperature = self.param(
            "temperature", lambda k, s: jnp.full(s, 0.5, jnp.float32), (1, 1, 1, 1)
        )
        self.placeholder = self.param(
            "placeholder", placeholder_init(self.n_hidden), (self.n_hidden,)
        )

    def __call__(self, x, fx=None):
        if self.unified_pos:
            pos = jnp.asarray(unified_pos_grid_2d(self.H, self.W, self.ref))
            x = jnp.broadcast_to(pos, (x.shape[0],) + pos.shape[1:])
        if fx is not None:
            z = self.preprocess(jnp.concatenate([x, fx], axis=-1))
        else:
            z = self.preprocess(x) + self.placeholder[None, None, :]
        B, N, C = z.shape
        zg = z.reshape(B, self.H, self.W, C)
        x_mid = self.in_project_x(zg).reshape(B, 1, N, C)
        temp = jnp.clip(self.temperature, 0.1, 5.0)
        return jax.nn.softmax(self.in_project_slice(x_mid) / temp, axis=-1)


class LearnSlice(nn.Module):
    unified_pos: bool = False
    use_vorticity: bool = False
    use_code_for_vorticity: bool = False
    C: int = 32
    M: int = 16
    H: int = 64
    W: int = 64
    n_hidden: int = 256
    act: str = "gelu"

    @property
    def pos_dim(self):
        base = 64 if self.unified_pos else 2
        return base + 10 if self.use_vorticity else base

    def setup(self):
        self.weight_projection = MLP(
            n_hidden=64, n_output=1, n_layers=0, res=False, act=self.act,
            name="weight_projection",
        )
        dim = self.M * self.C
        self.weight_projection_from_slice = MLP(
            n_hidden=(self.M + dim) * 4, n_output=self.M, n_layers=1,
            res=True, act=self.act, name="weight_projection_from_slice",
        )
        nh = self.n_hidden
        self.preprocess = MLP(
            n_hidden=nh * 2, n_output=nh, n_layers=0, res=False,
            act=self.act, name="preprocess",
        )
        self.in_project_x = nn.Conv(
            nh, kernel_size=(3, 3), padding="SAME",
            kernel_init=torch_conv_kernel_init,
            bias_init=make_torch_conv_bias_init(nh * 9),
            name="in_project_x",
        )
        concat = nh + dim if self.use_code_for_vorticity else nh
        self.in_project_slice = MLP(
            n_hidden=concat // 2, n_output=self.M, n_layers=0, res=False,
            act=self.act, name="in_project_slice",
        )
        self.temperature = self.param(
            "temperature", lambda k, s: jnp.full(s, 0.5, jnp.float32), (1, 1, 1, 1)
        )
        # per-slice ('seperate') head
        self.preprocess_seperate = MLP(
            n_hidden=212, n_output=64, n_layers=0, res=False, act=self.act,
            name="preprocess_seperate",
        )
        self.in_project_x_seperate = nn.Conv(
            64, kernel_size=(3, 3), padding="SAME",
            kernel_init=torch_conv_kernel_init,
            bias_init=make_torch_conv_bias_init(64 * 9),
            name="in_project_x_seperate",
        )
        self.in_project_slice_seperate = nn.Dense(
            1, kernel_init=trunc_normal_002, bias_init=zeros,
            name="in_project_slice_seperate",
        )
        self.temperature_seperate = self.param(
            "temperature_seperate",
            lambda k, s: jnp.full(s, 0.5, jnp.float32), (1, 1, 1, 1),
        )

    def __call__(self, code, pos_feat):
        """Per-point slice weights: code [B, M, C], pos_feat [B, N, P]
        -> [B, 1, N, M] (softmax over slices, like the reference's per-point
        ``forward``)."""
        B, M, C = code.shape
        N = pos_feat.shape[1]
        codeb = jnp.broadcast_to(code[:, None], (B, N, M, C))
        posb = jnp.broadcast_to(pos_feat[:, :, None, :], (B, N, M, pos_feat.shape[-1]))
        logits = self.weight_projection(
            jnp.concatenate([codeb, posb], axis=-1)
        )[..., 0]  # [B, N, M]
        return jax.nn.softmax(logits, axis=-1)[:, None]

    def forward_all(self, concatenated, point_axis_softmax: bool = True):
        """Batched head on precomputed cat(code, pos): [N, M, P] -> [1, N, M].

        ``point_axis_softmax=True`` reproduces the reference's
        ``Softmax(dim=0)`` over the POINT axis (``LearnSlice.py:116-123``);
        pass False for the per-point normalization the decoder expects.
        """
        logits = self.weight_projection(concatenated)  # [N, M, 1]
        axis = 0 if point_axis_softmax else 1
        w = jax.nn.softmax(logits, axis=axis)
        return w[..., 0][None]

    def forward_previous_slice(self, prev_slice, token):
        """prev_slice [B, 1, N, M], token [B, 1, M, C] -> raw logits [B, 1, N, M]."""
        B = prev_slice.shape[0]
        flat = token.reshape(B, 1, 1, -1)
        flat = jnp.broadcast_to(flat, (B, 1, prev_slice.shape[2], flat.shape[-1]))
        return self.weight_projection_from_slice(
            jnp.concatenate([prev_slice, flat], axis=-1)
        )

    def forward_from_vorticity(self, x, fx, code=None):
        """Conv head over cat(pos, history) [+ z-scored code] -> [B, 1, N, M]."""
        z = self.preprocess(jnp.concatenate([x, fx], axis=-1))
        B, N, C = z.shape
        zg = z.reshape(B, self.H, self.W, C)
        x_mid = self.in_project_x(zg).reshape(B, 1, N, C)
        if code is not None:
            codef = code.reshape(B, 1, 1, -1)
            codef = jnp.broadcast_to(z_score(codef), (B, 1, N, codef.shape[-1]))
            x_mid = jnp.concatenate([z_score(x_mid), codef], axis=-1)
        temp = jnp.clip(self.temperature, 0.1, 5.0)
        return jax.nn.softmax(self.in_project_slice(x_mid) / temp, axis=-1)

    def forward_from_vorticity_seperate(self, x, fx, code):
        """Per-slice conv heads, vmapped over M.  NOTE: faithful to the
        reference, the final softmax acts on a singleton axis
        (``LearnSlice.py:221-222``) so the result is identically 1.0."""
        B, N, _ = fx.shape

        def per_slice(code_i):  # code_i: [B, C]
            ci = jnp.broadcast_to(code_i[:, None, :], (B, N, code_i.shape[-1]))
            z = self.preprocess_seperate(
                jnp.concatenate([x, fx, ci], axis=-1)
            )
            zg = z.reshape(B, self.H, self.W, -1)
            x_mid = self.in_project_x_seperate(zg).reshape(B, 1, N, -1)
            temp = jnp.clip(self.temperature_seperate, 0.1, 5.0)
            return jax.nn.softmax(
                self.in_project_slice_seperate(x_mid) / temp, axis=-1
            )  # [B, 1, N, 1] -- singleton softmax == 1.0

        ws = [per_slice(code[:, 0, i]) for i in range(self.M)]
        return jnp.concatenate(ws, axis=-1)
