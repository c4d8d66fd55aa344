"""Packed-lane fused physics-attention kernels (v2).

The v1 kernels (``pallas_attention.py``) iterate a (batch*head) grid whose
blocks have only D = hidden/heads <= 64 lanes -- a 2-4x waste of the TPU's
128-lane registers, and they require [B, H, N, D] head transposes.  v2 packs
ALL heads into the lane dimension and never transposes:

* activations stay in the model's native ``[B, N, H*D]`` layout;
* the slice projection becomes one matmul against a block-diagonal-expanded
  kernel ``[H*D, H*G]`` (zero blocks off the head diagonal -- ~8x FLOP
  overhead on a tiny matmul, full MXU utilization);
* the per-head softmax uses a row-global max (valid per head: softmax is
  shift-invariant) and head-segment sums via one-hot matmuls -- every op is
  a full-width [block_n, H*G] VPU/MXU op;
* aggregation accumulates ``w^T fx -> [H*G, H*D]`` whose per-head diagonal
  blocks are the slice tokens; deslice multiplies against the
  block-diagonal-expanded post-attention tokens and directly emits the
  merged-head ``[N, H*D]`` output.

Slice weights never touch HBM (recomputed for the deslice), and no
transposes materialize anywhere.  Backward = VJP of the XLA composition
(see ``pallas_attention.py`` rationale).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_N = 1024


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _expand_blockdiag(kernel, H):
    """[D, G] shared-per-head kernel -> [H*D, H*G] block diagonal."""
    D, G = kernel.shape
    eye = jnp.eye(H, dtype=kernel.dtype)
    return jnp.einsum("hk,dg->hdkg", eye, kernel).reshape(H * D, H * G)


def _blockdiag_tokens(tokens):
    """[B, H, G, D] tokens -> [B, H*G, H*D] block diagonal per batch."""
    B, H, G, D = tokens.shape
    eye = jnp.eye(H, dtype=tokens.dtype)
    return jnp.einsum("hk,bhgd->bhgkd", eye, tokens).reshape(B, H * G, H * D)


def _segment_onehots(H, G, dtype=jnp.float32):
    seg = np.kron(np.eye(H), np.ones((G, 1)))  # [H*G, H]
    return jnp.asarray(seg, dtype)


def _packed_w(x_blk, kexp_ref, bias_ref, invt_ref, seg_ref, row0, n_valid):
    """Per-head temperature softmax over packed [block_n, H*G] logits."""
    logits = jnp.dot(
        x_blk.astype(jnp.float32), kexp_ref[:],
        preferred_element_type=jnp.float32,
    ) + bias_ref[0]
    z = logits * invt_ref[0]
    z = z - jnp.max(z, axis=-1, keepdims=True)  # row-global shift (per-head safe)
    e = jnp.exp(z)
    seg = seg_ref[:]  # [HG, H]
    sums = jnp.dot(e, seg, preferred_element_type=jnp.float32)  # [nb, H]
    denom = jnp.dot(sums, seg.T, preferred_element_type=jnp.float32)
    w = e / denom
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
    return jnp.where(rows < n_valid, w, 0.0)


def _agg_kernel(n_ref, x_ref, fx_ref, kexp_ref, b_ref, invt_ref, seg_ref,
                tok_ref, norm_ref, *, block_n):
    nb = pl.program_id(1)
    w = _packed_w(
        x_ref[0], kexp_ref, b_ref, invt_ref, seg_ref, nb * block_n, n_ref[0]
    )

    @pl.when(nb == 0)
    def _():
        tok_ref[:] = jnp.zeros_like(tok_ref)
        norm_ref[:] = jnp.zeros_like(norm_ref)

    tok_ref[0] += jax.lax.dot_general(
        w, fx_ref[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [HG, HD]
    norm_ref[0] += jnp.sum(w, axis=0, keepdims=True)


def _deslice_kernel(n_ref, x_ref, kexp_ref, b_ref, invt_ref, seg_ref,
                    aexp_ref, out_ref, *, block_n):
    nb = pl.program_id(1)
    w = _packed_w(
        x_ref[0], kexp_ref, b_ref, invt_ref, seg_ref, nb * block_n, n_ref[0]
    )
    out_ref[0] = jnp.dot(
        w, aexp_ref[0], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _prep(slice_kernel, slice_bias, temperature, H, G, clamp):
    D = slice_kernel.shape[0]
    kexp = _expand_blockdiag(slice_kernel.astype(jnp.float32), H)
    bexp = jnp.tile(slice_bias.astype(jnp.float32), H).reshape(1, H * G)
    t = temperature.reshape(H).astype(jnp.float32)
    if clamp:
        t = jnp.clip(t, 0.1, 5.0)
    invt = jnp.repeat(1.0 / t, G).reshape(1, H * G)
    seg = _segment_onehots(H, G)
    return kexp, bexp, invt, seg


def slice_attention_fused_v2(
    x_mid, fx_mid, slice_kernel, slice_bias, temperature, wq, wk, wv,
    *, clamp_temperature=True, block_n=DEFAULT_BLOCK_N, interpret=False,
):
    """Packed fused core on [B, N, H, D]-shaped inputs (contiguous H*D).

    Returns (out [B, N, H*D], None, out_token [B, H, G, D]).
    """
    B, N, H, D = x_mid.shape
    G = slice_kernel.shape[-1]
    C = H * D
    HG = H * G
    if not interpret:
        # CPU (tests, debugging) only supports the pallas interpreter
        interpret = jax.default_backend() == "cpu"
    block_n = min(block_n, _round_up(N, 128))
    n_pad = _round_up(N, block_n)
    x = x_mid.reshape(B, N, C)
    f = fx_mid.reshape(B, N, C)
    if n_pad != N:
        x = jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0)))
        f = jnp.pad(f, ((0, 0), (0, n_pad - N), (0, 0)))
    kexp, bexp, invt, seg = _prep(
        slice_kernel, slice_bias, temperature, H, G, clamp_temperature
    )
    n_arr = jnp.full((1,), N, jnp.int32)
    grid = (B, n_pad // block_n)

    tok_full, norm = pl.pallas_call(
        functools.partial(_agg_kernel, block_n=block_n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_n, C), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, block_n, C), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((C, HG), lambda i, j, *_: (0, 0)),
                pl.BlockSpec((1, HG), lambda i, j, *_: (0, 0)),
                pl.BlockSpec((1, HG), lambda i, j, *_: (0, 0)),
                pl.BlockSpec((HG, H), lambda i, j, *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, HG, C), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, 1, HG), lambda i, j, *_: (i, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, HG, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, HG), jnp.float32),
        ],
        interpret=interpret,
    )(n_arr, x, f, kexp, bexp, invt, seg)

    # per-head diagonal blocks: [B, HG, HD] -> [B, H, G, D]
    tok = tok_full.reshape(B, H, G, H, D)
    tok = jnp.einsum("bhghd->bhgd", tok)  # take the h==h' diagonal
    norm = norm.reshape(B, H, G)
    tok = tok / (norm + 1e-5)[..., None]

    from .attention import slice_token_attention

    otok = slice_token_attention(tok, wq, wk, wv, D**-0.5)

    aexp = _blockdiag_tokens(otok.astype(jnp.float32))  # [B, HG, HD]
    out = pl.pallas_call(
        functools.partial(_deslice_kernel, block_n=block_n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_n, C), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((C, HG), lambda i, j, *_: (0, 0)),
                pl.BlockSpec((1, HG), lambda i, j, *_: (0, 0)),
                pl.BlockSpec((1, HG), lambda i, j, *_: (0, 0)),
                pl.BlockSpec((HG, H), lambda i, j, *_: (0, 0)),
                pl.BlockSpec((1, HG, C), lambda i, j, *_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_n, C), lambda i, j, *_: (i, j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, C), x_mid.dtype),
        interpret=interpret,
    )(n_arr, x, kexp, bexp, invt, seg, aexp)
    return out[:, :N], None, otok


# --- differentiable wrapper ------------------------------------------------


def _xla_reference_bnhd(x_mid, fx_mid, slice_kernel, slice_bias, temperature,
                        wq, wk, wv, clamp_temperature):
    from .attention import slice_attention_bnhd

    out, _, otok = slice_attention_bnhd(
        x_mid, fx_mid, slice_kernel, slice_bias, temperature, wq, wk, wv,
        clamp_temperature=clamp_temperature,
    )
    return out, otok


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _fused_v2(x_mid, fx_mid, slice_kernel, slice_bias, temperature,
              wq, wk, wv, clamp_temperature):
    out, _, otok = slice_attention_fused_v2(
        x_mid, fx_mid, slice_kernel, slice_bias, temperature, wq, wk, wv,
        clamp_temperature=clamp_temperature,
    )
    return out, otok


def _fused_v2_fwd(x_mid, fx_mid, slice_kernel, slice_bias, temperature,
                  wq, wk, wv, clamp_temperature):
    out = _fused_v2(
        x_mid, fx_mid, slice_kernel, slice_bias, temperature, wq, wk, wv,
        clamp_temperature,
    )
    return out, (x_mid, fx_mid, slice_kernel, slice_bias, temperature, wq, wk, wv)


def _fused_v2_bwd(clamp_temperature, res, cts):
    _, vjp = jax.vjp(
        functools.partial(
            _xla_reference_bnhd, clamp_temperature=clamp_temperature
        ),
        *res,
    )
    return vjp(cts)


_fused_v2.defvjp(_fused_v2_fwd, _fused_v2_bwd)


def supported(x_mid, slice_kernel) -> bool:
    B, N, H, D = x_mid.shape
    G = slice_kernel.shape[-1]
    if x_mid.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    # packed lanes need modest head-expanded widths
    return H * D <= 1024 and H * G <= 1024


def fused(x_mid, fx_mid, slice_kernel, slice_bias, temperature, wq, wk, wv,
          *, clamp_temperature=True):
    """Differentiable packed fused core; returns (out, None, out_token)."""
    out, otok = _fused_v2(
        x_mid, fx_mid, slice_kernel, slice_bias, temperature, wq, wk, wv,
        clamp_temperature,
    )
    return out, None, otok
