"""Fused Pallas TPU kernels for the physics-attention core (v1, LEGACY).

Superseded by ``pallas_attention_v2`` (packed-lane layout, hand-written
backward); kept as the simpler reference implementation of the fusion
strategy.  Nothing on the hot path dispatches here anymore.

The XLA path materializes ``slice_weights [B, H, N, G]`` in HBM three times
(softmax write + aggregation read + deslice read) -- the dominant memory
traffic of the model (the G x G attention itself is tiny).  The fused kernels
keep the weights in VMEM and *recompute* them for the deslice phase (the
slice-logit matmul is cheap), so the [B, H, N, G] tensor never touches HBM:

* ``_aggregate_kernel``: per (b*h), blocked over N -- slice-logit matmul ->
  temperature softmax -> masked accumulation of ``w^T @ fx`` and
  ``sum_n w`` into revisited output blocks (zeroed on the first N-step);
* ``_deslice_kernel``: recomputes ``w`` per N-block and broadcasts the
  post-attention tokens back: ``w @ out_token``.

The tiny G x G attention between the two runs in plain XLA.  Rows past the
true N (padding to the block size) are masked to zero weight.

Gradients: ``slice_attention_fused`` carries a ``jax.custom_vjp`` whose
backward is the VJP of the XLA reference composition -- numerically
identical gradients, with the forward recomputation the training loop's
remat would do anyway.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_N = 512


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def supported(x_mid, slice_kernel) -> bool:
    """Fused path constraints: fp32/bf16 inputs, modest G and D."""
    try:
        B, H, N, D = x_mid.shape
        G = slice_kernel.shape[-1]
    except Exception:
        return False
    if x_mid.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return D <= 256 and G <= 256


def _slice_w(x_blk, kern, bias, inv_temp, row0, n_valid):
    """Masked temperature softmax of the slice logits for one N-block."""
    logits = (
        jax.lax.dot_general(
            x_blk.astype(jnp.float32), kern.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias
    )
    w = jax.nn.softmax(logits * inv_temp, axis=-1)
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
    return jnp.where(rows < n_valid, w, 0.0)


def _aggregate_kernel(n_ref, t_ref, x_ref, fx_ref, k_ref, b_ref,
                      tok_ref, norm_ref, *, block_n):
    bh = pl.program_id(0)
    nb = pl.program_id(1)
    inv_temp = 1.0 / t_ref[bh]
    w = _slice_w(
        x_ref[0], k_ref[:], b_ref[0], inv_temp, nb * block_n, n_ref[0]
    )  # [block_n, G]

    @pl.when(nb == 0)
    def _():
        tok_ref[:] = jnp.zeros_like(tok_ref)
        norm_ref[:] = jnp.zeros_like(norm_ref)

    tok_ref[0] += jax.lax.dot_general(
        w, fx_ref[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [G, D]
    norm_ref[0] += jnp.sum(w, axis=0, keepdims=True)


def _deslice_kernel(n_ref, t_ref, x_ref, k_ref, b_ref, otok_ref, out_ref,
                    *, block_n):
    bh = pl.program_id(0)
    nb = pl.program_id(1)
    inv_temp = 1.0 / t_ref[bh]
    w = _slice_w(
        x_ref[0], k_ref[:], b_ref[0], inv_temp, nb * block_n, n_ref[0]
    )
    out_ref[0] = jnp.dot(
        w, otok_ref[0], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _clamped_temps(temperature, B, H, clamp):
    t = temperature.reshape(H).astype(jnp.float32)
    if clamp:
        t = jnp.clip(t, 0.1, 5.0)
    return jnp.broadcast_to(t[None], (B, H)).reshape(B * H)


def aggregate_fused(x_mid, fx_mid, slice_kernel, slice_bias, temperature,
                    clamp_temperature=True, block_n=DEFAULT_BLOCK_N):
    """Returns (slice_token_sum [B,H,G,D], slice_norm [B,H,G]) -- pre-divide."""
    B, H, N, D = x_mid.shape
    G = slice_kernel.shape[-1]
    block_n = min(block_n, _round_up(N, 128))
    n_pad = _round_up(N, block_n)
    if n_pad != N:
        pad = ((0, 0), (0, 0), (0, n_pad - N), (0, 0))
        x_mid = jnp.pad(x_mid, pad)
        fx_mid = jnp.pad(fx_mid, pad)
    xm = x_mid.reshape(B * H, n_pad, D)
    fm = fx_mid.reshape(B * H, n_pad, D)
    temps = _clamped_temps(temperature, B, H, clamp_temperature)
    n_arr = jnp.full((1,), N, jnp.int32)

    grid = (B * H, n_pad // block_n)
    kernel = functools.partial(_aggregate_kernel, block_n=block_n)
    tok, norm = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_n, D), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, block_n, D), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((D, G), lambda i, j, *_: (0, 0)),
                pl.BlockSpec((1, G), lambda i, j, *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, G, D), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, 1, G), lambda i, j, *_: (i, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * H, G, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, 1, G), jnp.float32),
        ],
    )(n_arr, temps, xm, fm, slice_kernel, slice_bias.reshape(1, G))
    return tok.reshape(B, H, G, D), norm.reshape(B, H, G)


def deslice_fused(x_mid, out_token, slice_kernel, slice_bias, temperature,
                  clamp_temperature=True, block_n=DEFAULT_BLOCK_N):
    """Recompute slice weights per block and deslice: -> [B, N, H*D]."""
    B, H, N, D = x_mid.shape
    G = slice_kernel.shape[-1]
    block_n = min(block_n, _round_up(N, 128))
    n_pad = _round_up(N, block_n)
    if n_pad != N:
        x_mid = jnp.pad(x_mid, ((0, 0), (0, 0), (0, n_pad - N), (0, 0)))
    xm = x_mid.reshape(B * H, n_pad, D)
    ot = out_token.reshape(B * H, G, D).astype(jnp.float32)
    temps = _clamped_temps(temperature, B, H, clamp_temperature)
    n_arr = jnp.full((1,), N, jnp.int32)

    grid = (B * H, n_pad // block_n)
    kernel = functools.partial(_deslice_kernel, block_n=block_n)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_n, D), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((D, G), lambda i, j, *_: (0, 0)),
                pl.BlockSpec((1, G), lambda i, j, *_: (0, 0)),
                pl.BlockSpec((1, G, D), lambda i, j, *_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_n, D), lambda i, j, *_: (i, j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, n_pad, D), x_mid.dtype),
    )(n_arr, temps, xm, slice_kernel, slice_bias.reshape(1, G), ot)
    out = out.reshape(B, H, n_pad, D)[:, :, :N]
    return out.transpose(0, 2, 1, 3).reshape(B, N, H * D)


def _xla_reference(x_mid, fx_mid, slice_kernel, slice_bias, temperature,
                   wq, wk, wv, clamp_temperature):
    from .attention import (
        aggregate_slice_tokens,
        compute_slice_weights,
        deslice,
        slice_token_attention,
    )

    scale = x_mid.shape[-1] ** -0.5
    w = compute_slice_weights(
        x_mid, slice_kernel, slice_bias, temperature, clamp_temperature
    )
    tok = aggregate_slice_tokens(fx_mid, w)
    otok = slice_token_attention(tok, wq, wk, wv, scale)
    return deslice(otok, w), otok


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _fused(x_mid, fx_mid, slice_kernel, slice_bias, temperature,
           wq, wk, wv, clamp_temperature):
    scale = x_mid.shape[-1] ** -0.5
    tok, norm = aggregate_fused(
        x_mid, fx_mid, slice_kernel, slice_bias, temperature,
        clamp_temperature,
    )
    tok = tok / (norm + 1e-5)[..., None]
    from .attention import slice_token_attention

    otok = slice_token_attention(tok, wq, wk, wv, scale)
    out = deslice_fused(
        x_mid, otok, slice_kernel, slice_bias, temperature, clamp_temperature
    )
    return out, otok


def _fused_fwd(x_mid, fx_mid, slice_kernel, slice_bias, temperature,
               wq, wk, wv, clamp_temperature):
    out = _fused(
        x_mid, fx_mid, slice_kernel, slice_bias, temperature, wq, wk, wv,
        clamp_temperature,
    )
    return out, (x_mid, fx_mid, slice_kernel, slice_bias, temperature, wq, wk, wv)


def _fused_bwd(clamp_temperature, res, cts):
    x_mid, fx_mid, slice_kernel, slice_bias, temperature, wq, wk, wv = res

    _, vjp = jax.vjp(
        functools.partial(_xla_reference, clamp_temperature=clamp_temperature),
        x_mid, fx_mid, slice_kernel, slice_bias, temperature, wq, wk, wv,
    )
    return vjp(cts)


_fused.defvjp(_fused_fwd, _fused_bwd)


def slice_attention_fused(x_mid, fx_mid, slice_kernel, slice_bias,
                          temperature, wq, wk, wv, *, clamp_temperature=True):
    """Drop-in fused version of ``attention.slice_attention``.

    Returns (out_x, slice_weights, out_slice_token).  slice_weights is
    returned as ``None`` -- the fused path exists precisely to avoid
    materializing it; callers that need the weights (the encoder variant)
    use the XLA path.
    """
    out, otok = _fused(
        x_mid, fx_mid, slice_kernel, slice_bias, temperature, wq, wk, wv,
        clamp_temperature,
    )
    return out, None, otok
