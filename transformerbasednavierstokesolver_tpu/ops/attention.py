"""Physics-Attention: slice -> attend-over-slice-tokens -> deslice.

TPU-native redesign of the reference's four attention variants
(``model/Physics_Attention.py:6-288``).  One Flax module covers all
geometries; the compute core is a standalone function (``slice_attention``)
shared by the XLA path and the fused Pallas kernel, and returns the slice
weights / tokens explicitly (the reference's autoencoder variant caches them
as module state, ``Physics_Attention.py:135,210-211`` -- here they are pure
function results).

Reference semantics preserved:
  * slice phase (``Physics_Attention.py:36-43, 94-102``): two input
    projections (Linear for point clouds, 3x3 Conv for structured grids),
    head split, ``softmax(in_project_slice(x_mid) / temperature)`` over the
    slice axis, token aggregation ``einsum('bhnd,bhng->bhgd')`` normalized by
    ``slice_weights.sum(N) + 1e-5``;
  * temperature is raw for irregular meshes (``:40``) and clamped to
    [0.1, 5] for structured grids (``:98-99``);
  * G x G multi-head attention over slice tokens with bias-free q/k/v
    (``:45-52``), scale ``dim_head ** -0.5``;
  * deslice broadcast ``einsum('bhgd,bhng->bhnd')`` + head merge + output
    projection (``:54-57``).

All contractions are plain batched matmuls that XLA tiles onto the MXU; N is
the only large axis, so the op is linear in mesh points and shards naturally
over N (the aggregation / normalization reductions become psums).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .initializers import (
    make_torch_conv_bias_init,
    orthogonal,
    torch_conv_kernel_init,
    trunc_normal_002,
    zeros,
)

GEOMETRIES = ("irregular", "grid2d", "grid3d")


def _shifted_conv2d(xg, kernel, bias):
    """3x3 SAME conv as 9 shifted matmuls: sum_dy,dx shift(x) @ K[dy, dx].

    Mathematically identical to ``lax.conv_general_dilated``; the matmul
    weight gradients are plain [C, C'] contractions, avoiding the huge
    per-batch conv-dW accumulation buffers XLA emits in the backward pass.
    """
    B, H, W, C = xg.shape
    kh, kw, _, Cout = kernel.shape
    assert (kh, kw) == (3, 3), "shifted conv path supports 3x3 kernels"
    xp = jnp.pad(xg, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.broadcast_to(bias, (B, H, W, Cout)).astype(jnp.float32)
    for dy in range(3):
        for dx in range(3):
            window = xp[:, dy : dy + H, dx : dx + W, :]
            out = out + jnp.einsum(
                "bhwc,co->bhwo", window, kernel[dy, dx],
                preferred_element_type=jnp.float32,
            )
    return out.astype(xg.dtype)


def compute_slice_weights(x_mid, slice_kernel, slice_bias, temperature, clamp_temperature, precision=None):
    """softmax(x_mid @ slice_kernel / temperature) over the slice axis.

    x_mid: [B, H, N, D]; slice_kernel: [D, G]; temperature: [1, H, 1, 1].
    Returns [B, H, N, G] in x_mid's dtype (softmax itself runs in float32).
    """
    logits = jnp.einsum(
        "bhnd,dg->bhng", x_mid, slice_kernel.astype(x_mid.dtype),
        precision=precision, preferred_element_type=jnp.float32,
    ) + slice_bias
    temp = temperature
    if clamp_temperature:
        temp = jnp.clip(temp, 0.1, 5.0)
    return jax.nn.softmax(logits / temp, axis=-1).astype(x_mid.dtype)


def aggregate_slice_tokens(fx_mid, slice_weights, precision=None):
    """Weighted token aggregation: [B,H,N,D] x [B,H,N,G] -> [B,H,G,D]."""
    slice_norm = slice_weights.astype(jnp.float32).sum(axis=2)  # [B, H, G]
    slice_token = jnp.einsum(
        "bhnd,bhng->bhgd", fx_mid, slice_weights, precision=precision,
        preferred_element_type=jnp.float32,
    )
    return slice_token / (slice_norm + 1e-5)[..., None]


def slice_token_attention(slice_token, wq, wk, wv, scale, dropout_fn=None, precision=None):
    """Standard scaled-dot-product MHA among the G slice tokens (float32 --
    G x G is tiny, precision is free here)."""
    slice_token = slice_token.astype(jnp.float32)
    q = jnp.einsum("bhgd,de->bhge", slice_token, wq, precision=precision)
    k = jnp.einsum("bhgd,de->bhge", slice_token, wk, precision=precision)
    v = jnp.einsum("bhgd,de->bhge", slice_token, wv, precision=precision)
    dots = jnp.einsum("bhgd,bhkd->bhgk", q, k, precision=precision) * scale
    attn = jax.nn.softmax(dots, axis=-1)
    if dropout_fn is not None:
        attn = dropout_fn(attn)
    return jnp.einsum("bhgk,bhkd->bhgd", attn, v, precision=precision)


def deslice(out_slice_token, slice_weights, precision=None):
    """Broadcast tokens back to points and merge heads: -> [B, N, H*D]."""
    out_x = jnp.einsum(
        "bhgd,bhng->bhnd",
        out_slice_token.astype(slice_weights.dtype), slice_weights,
        precision=precision, preferred_element_type=jnp.float32,
    ).astype(slice_weights.dtype)
    B, H, N, D = out_x.shape
    return out_x.transpose(0, 2, 1, 3).reshape(B, N, H * D)


def slice_attention(
    x_mid,
    fx_mid,
    slice_kernel,
    slice_bias,
    temperature,
    wq,
    wk,
    wv,
    *,
    clamp_temperature: bool = True,
    dropout_fn=None,
    precision=None,
    impl: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full slice -> attend -> deslice core on head-split inputs.

    Args:
      x_mid, fx_mid: [B, H, N, D] head-split projections.
      slice_kernel/slice_bias: slice projection ([D, G], [G]).
      temperature: [1, H, 1, 1].
      wq/wk/wv: [D, D] bias-free q/k/v weights.

    Returns:
      (out_x [B, N, H*D], slice_weights [B, H, N, G], out_slice_token [B, H, G, D])
    """
    if impl == "pallas":
        from . import pallas_attention_v2

        xb = x_mid.transpose(0, 2, 1, 3)  # this API is [B,H,N,D]; v2 wants [B,N,H,D]
        if dropout_fn is None and pallas_attention_v2.supported(xb, slice_kernel):
            return pallas_attention_v2.fused(
                xb, fx_mid.transpose(0, 2, 1, 3), slice_kernel, slice_bias,
                temperature, wq, wk, wv, clamp_temperature=clamp_temperature,
            )
        # fall through to the XLA reference path

    scale = x_mid.shape[-1] ** -0.5
    slice_weights = compute_slice_weights(
        x_mid, slice_kernel, slice_bias, temperature, clamp_temperature, precision
    )
    slice_token = aggregate_slice_tokens(fx_mid, slice_weights, precision)
    out_slice_token = slice_token_attention(
        slice_token, wq, wk, wv, scale, dropout_fn, precision
    )
    out_x = deslice(out_slice_token, slice_weights, precision)
    return out_x, slice_weights, out_slice_token



# --- transpose-free [B, N, H, D] core (hot path) --------------------------
#
# The head-split transposes of the [B, H, N, D] layout are pure HBM copies
# (33 MB each for the flagship config); keeping the point axis adjacent to
# batch lets every einsum below run without materializing a transpose.

def compute_slice_weights_bnhd(x_mid, slice_kernel, slice_bias, temperature,
                               clamp_temperature, precision=None):
    """x_mid: [B, N, H, D] -> weights [B, N, H, G] (softmax in float32)."""
    logits = jnp.einsum(
        "bnhd,dg->bnhg", x_mid, slice_kernel.astype(x_mid.dtype),
        precision=precision, preferred_element_type=jnp.float32,
    ) + slice_bias
    temp = temperature.reshape(1, 1, -1, 1)
    if clamp_temperature:
        temp = jnp.clip(temp, 0.1, 5.0)
    return jax.nn.softmax(logits / temp, axis=-1).astype(x_mid.dtype)


def slice_attention_bnhd(
    x_mid, fx_mid, slice_kernel, slice_bias, temperature, wq, wk, wv,
    *, clamp_temperature=True, dropout_fn=None, precision=None,
):
    """slice -> attend -> deslice without any head transpose.

    x_mid/fx_mid: [B, N, H, D].  Returns (out [B, N, H*D],
    slice_weights [B, N, H, G], out_slice_token [B, H, G, D]).
    """
    B, N, H, D = x_mid.shape
    scale = D ** -0.5
    w = compute_slice_weights_bnhd(
        x_mid, slice_kernel, slice_bias, temperature, clamp_temperature,
        precision,
    )
    norm = w.astype(jnp.float32).sum(axis=1)  # [B, H, G]
    tok = jnp.einsum(
        "bnhd,bnhg->bhgd", fx_mid, w, precision=precision,
        preferred_element_type=jnp.float32,
    ) / (norm + 1e-5)[..., None]
    otok = slice_token_attention(tok, wq, wk, wv, scale, dropout_fn, precision)
    out = jnp.einsum(
        "bhgd,bnhg->bnhd", otok.astype(w.dtype), w, precision=precision,
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return out.reshape(B, N, H * D), w, otok


class PhysicsAttention(nn.Module):
    """Unified physics-attention module for all mesh geometries.

    geometry='irregular' matches ``Physics_Attention_Irregular_Mesh``
    (Linear projections, unclamped temperature); 'grid2d'/'grid3d' match the
    ``Structured_Mesh_2D/3D`` variants (3x3(x3) Conv projections, clamped
    temperature).  ``autoencoder=True`` adds the ``project_slice`` Linear of
    the ``..._Auto_Encoder`` variant (``Physics_Attention.py:146``).
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    slice_num: int = 64
    geometry: str = "grid2d"
    grid_shape: Tuple[int, ...] = ()
    kernel_size: int = 3
    slice_init: str = "trunc_normal"  # full models overwrite orthogonal w/ trunc-normal
    autoencoder: bool = False
    impl: str = "xla"
    precision: Optional[str] = None
    dtype: Optional[str] = None  # compute dtype; params stay float32
    conv_impl: str = "lax"  # 'lax' | 'shifted' (9 shifted matmuls; identical
    # math, but the weight gradient is 9 clean [C, C'] matmul grads instead
    # of XLA's per-batch f32[B, 3, 3, C, C'] accumulation buffers)

    def setup(self):
        if self.geometry not in GEOMETRIES:
            raise ValueError(f"geometry {self.geometry!r} not in {GEOMETRIES}")
        inner_dim = self.dim_head * self.heads
        self.temperature = self.param(
            "temperature",
            lambda key, shape: jnp.full(shape, 0.5, jnp.float32),
            (1, self.heads, 1, 1),
        )
        if self.geometry == "irregular":
            self.in_project_x = nn.Dense(
                inner_dim, kernel_init=trunc_normal_002, bias_init=zeros,
                name="in_project_x", dtype=self.dtype,
            )
            self.in_project_fx = nn.Dense(
                inner_dim, kernel_init=trunc_normal_002, bias_init=zeros,
                name="in_project_fx", dtype=self.dtype,
            )
        else:
            ndim = 2 if self.geometry == "grid2d" else 3
            if len(self.grid_shape) != ndim:
                raise ValueError(
                    f"{self.geometry} needs grid_shape of length {ndim}, "
                    f"got {self.grid_shape}"
                )
            kern = (self.kernel_size,) * ndim
            fan_in = self.dim * self.kernel_size**ndim
            conv = lambda name: nn.Conv(
                inner_dim,
                kernel_size=kern,
                padding="SAME",
                kernel_init=torch_conv_kernel_init,
                bias_init=make_torch_conv_bias_init(fan_in),
                name=name,
                dtype=self.dtype,
            )
            self.in_project_x = conv("in_project_x")
            self.in_project_fx = conv("in_project_fx")

        slice_kernel_init = (
            orthogonal if self.slice_init == "orthogonal" else trunc_normal_002
        )
        self.slice_kernel = self.param(
            "in_project_slice_kernel", slice_kernel_init, (self.dim_head, self.slice_num)
        )
        self.slice_bias = self.param(
            "in_project_slice_bias", zeros, (self.slice_num,)
        )
        qkv_init = trunc_normal_002
        self.wq = self.param("to_q_kernel", qkv_init, (self.dim_head, self.dim_head))
        self.wk = self.param("to_k_kernel", qkv_init, (self.dim_head, self.dim_head))
        self.wv = self.param("to_v_kernel", qkv_init, (self.dim_head, self.dim_head))
        self.to_out = nn.Dense(
            self.dim, kernel_init=trunc_normal_002, bias_init=zeros,
            name="to_out", dtype=self.dtype,
        )
        if self.autoencoder:
            self.project_slice = nn.Dense(
                self.slice_num, kernel_init=trunc_normal_002, bias_init=zeros,
                name="project_slice",
            )
        self.attn_dropout = nn.Dropout(self.dropout)
        self.out_dropout = nn.Dropout(self.dropout)

    def _project_and_split(self, x):
        """Apply the two input projections and split heads -> [B, N, H, D] x2
        (head axis kept inboard -- no transpose materializes).

        Both projections consume the SAME pre-LN input, so the structured-grid
        convs run as ONE conv with concatenated kernels (identical math,
        halves the conv-kernel count on the hot path).
        """
        B, N, C = x.shape
        if self.geometry == "irregular":
            fx_mid = self.in_project_fx(x)
            x_mid = self.in_project_x(x)
        elif self.is_initializing():
            # params are created lazily; initialize through the plain calls
            xg = x.reshape((B,) + tuple(self.grid_shape) + (C,))
            fx_mid = self.in_project_fx(xg).reshape(B, N, -1)
            x_mid = self.in_project_x(xg).reshape(B, N, -1)
        else:
            xg = x.reshape((B,) + tuple(self.grid_shape) + (C,))
            vx = self.in_project_x.variables["params"]
            vf = self.in_project_fx.variables["params"]
            kernel = jnp.concatenate([vx["kernel"], vf["kernel"]], axis=-1)
            bias = jnp.concatenate([vx["bias"], vf["bias"]], axis=-1)
            dtype = self.dtype or xg.dtype
            ndim = kernel.ndim - 2
            if self.conv_impl == "shifted" and ndim == 2:
                both = _shifted_conv2d(
                    xg.astype(dtype), kernel.astype(dtype), bias.astype(dtype)
                )
            else:
                both = jax.lax.conv_general_dilated(
                    xg.astype(dtype), kernel.astype(dtype),
                    window_strides=(1,) * ndim,
                    padding="SAME",
                    dimension_numbers=(
                        ("NHWC", "HWIO", "NHWC") if ndim == 2
                        else ("NDHWC", "DHWIO", "NDHWC")
                    ),
                ) + bias.astype(dtype)
            both = both.reshape(B, N, -1)
            inner = self.heads * self.dim_head
            x_mid, fx_mid = both[..., :inner], both[..., inner:]

        def split(t):
            return t.reshape(B, N, self.heads, self.dim_head)

        return split(x_mid), split(fx_mid)

    def _core(self, x, deterministic):
        x_mid, fx_mid = self._project_and_split(x)
        if self.dropout > 0.0 and not deterministic:
            dropout_fn = lambda a: self.attn_dropout(a, deterministic=False)
        else:
            dropout_fn = None
        clamp = self.geometry != "irregular"
        # The fused kernel never materializes slice weights (returns None);
        # encoder/autoencoder variants need them for decode/reconstruct_fx,
        # so they always take the XLA path.
        if self.impl == "pallas" and not self.autoencoder:
            from . import pallas_attention_v2

            if dropout_fn is None and pallas_attention_v2.supported(
                x_mid, self.slice_kernel
            ):
                out, w, otok = pallas_attention_v2.fused(
                    x_mid, fx_mid,
                    self.slice_kernel, self.slice_bias, self.temperature,
                    self.wq, self.wk, self.wv, clamp_temperature=clamp,
                )
                return out, w, otok
        out, w, otok = slice_attention_bnhd(
            x_mid,
            fx_mid,
            self.slice_kernel,
            self.slice_bias,
            self.temperature,
            self.wq,
            self.wk,
            self.wv,
            clamp_temperature=clamp,
            dropout_fn=dropout_fn,
            precision=self.precision,
        )
        # API layout: slice_weights as [B, H, N, G] (encoder contract)
        return out, w.transpose(0, 2, 1, 3), otok

    def __call__(self, x, deterministic: bool = True):
        out_x, _, _ = self._core(x, deterministic)
        return self.out_dropout(self.to_out(out_x), deterministic=deterministic)

    def encode(self, x, deterministic: bool = True):
        """Return post-attention slice tokens and the slice weights.

        Functional equivalent of ``Physics_Attention...Auto_Encoder.encode``
        (``Physics_Attention.py:185-213``) -- the weights are returned instead
        of cached on the module.
        """
        _, slice_weights, out_slice_token = self._core(x, deterministic)
        return out_slice_token, slice_weights

    def decode(self, code, slice_weights, deterministic: bool = True):
        """Deslice a token code with explicit slice weights (``:222-227``)."""
        out_x = deslice(code, slice_weights, self.precision)
        return self.out_dropout(self.to_out(out_x), deterministic=deterministic)

    def reconstruct_fx(self, code, slice_weights, deterministic: bool = True):
        """``decode`` after mapping the weights through ``project_slice`` (``:215-220``).

        Returns (out, projected_slice_weights); the reference mutates its cache
        with the projected weights, so callers that need that behavior thread
        the returned weights onward explicitly.
        """
        projected = self.project_slice(slice_weights)
        out_x = deslice(code, projected, self.precision)
        out = self.out_dropout(self.to_out(out_x), deterministic=deterministic)
        return out, projected
