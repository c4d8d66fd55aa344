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
transposes materialize anywhere -- in EITHER direction: the backward pass
is hand-derived into two more packed kernels (dAexp accumulation, then a
main kernel recomputing W per block and emitting dX/dF while accumulating
dK/db/dtemperature), with only the tiny G x G attention differentiated by
XLA.  Gradient parity vs the XLA composition is tested.
"""

import functools
import os

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


_SEG_DOT_UNSAFE = os.environ.get("TBNSS_SEG_DOT_UNSAFE", "0") == "1"


def _seg_dot(a, b):
    """One-hot segment broadcast/reduce matmul — near-exact in f32.

    At the TPU's default matmul precision the f32 value operand is rounded
    through ONE bf16 pass, so a broadcast per-head max comes back short by
    up to ~|max| * 2^-8 and ``z - max`` can be *positive*; once drifting
    weights push |logits/temperature| past ~2^8 * 88, ``exp`` overflows and
    the softmax goes inf/inf -> NaN.  That is the round-5 padded-mega
    plasticity training NaN (finite params, NaN mega forward, finite XLA
    forward at replay update 1973 — logs/probe_nan_bisect_r5.log).

    Fix: split the f32 value operand into a bf16-exact hi part plus an f32
    residual and run TWO default-precision matmuls.  Both operands of each
    pass are exactly representable in bf16 (the one-hot side is 0/1), so
    the only loss is the bf16 rounding OF THE RESIDUAL: total error
    <= |a| * 2^-18 — a broadcast max can no longer under/over-shoot by
    more than ~0.09 even at |z| ~ 2.3e4, and together with the z <= 0
    clamp (``_softmax_z_guard``) overflow is impossible at any magnitude.
    Cost is 2 passes of a tiny matmul; the first fix attempt
    (``precision=HIGHEST`` ~ 6 passes) measurably cost 13-20% of the whole
    train step (logs/bench_shapes_r5f.json, first retake).

    ``TBNSS_SEG_DOT_UNSAFE=1`` (diagnostic only) restores the pre-fix
    single-pass behavior so the failure trajectory can be replayed
    deterministically (tools/probe_mega_nan_bisect.py --dump-at).
    """
    if _SEG_DOT_UNSAFE:
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    lo = a - hi
    return (jnp.dot(hi, b, preferred_element_type=jnp.float32)
            + jnp.dot(lo, b, preferred_element_type=jnp.float32))


def _softmax_z_guard(z):
    """Clamp z <= 0 after the (exact) max subtraction — a no-op unless
    something upstream produced a positive residual; disabled under the
    diagnostic TBNSS_SEG_DOT_UNSAFE replay mode."""
    if _SEG_DOT_UNSAFE:
        return z
    return jnp.minimum(z, 0.0)


def _perhead_max(z, seg):
    """Per-head max of packed [nb, H*G] rows, broadcast back to [nb, H*G].

    A row-global max is only *shift*-safe; if one head's max logit sits ~88+
    below another head's, exp underflows that whole head segment to zero and
    the per-head denominator becomes 0 -> NaN.

    Implementation note: each head's G logits are a *contiguous* lane
    segment, so the per-head max is a static lane-slice max; the broadcast
    back to [nb, H*G] rides the same segment-one-hot matmul as the packed
    denominator.  (An earlier masked ``where(-inf)`` loop made Mosaic's
    layout inference blow up: >8 min compile at the flagship shape.)
    """
    H = seg.shape[1]
    G = z.shape[-1] // H
    zh = jnp.concatenate(
        [jnp.max(z[:, h * G:(h + 1) * G], axis=-1, keepdims=True)
         for h in range(H)],
        axis=-1,
    )  # [nb, H]
    return _seg_dot(zh, seg.T)


def _packed_w(x_blk, kexp_ref, bias_ref, invt_ref, seg_ref, row0, n_valid):
    """Per-head temperature softmax over packed [block_n, H*G] logits."""
    logits = jnp.dot(
        x_blk.astype(jnp.float32), kexp_ref[:],
        preferred_element_type=jnp.float32,
    ) + bias_ref[0]
    z = logits * invt_ref[0]
    seg = seg_ref[:]  # [HG, H]
    # exact max (see _seg_dot) + clamp: z - exact_max <= 0 exactly in IEEE,
    # so the minimum is a no-op safety net (fwd is never autodiffed — the
    # backward is the hand-derived kernel — so the tie-gradient of minimum
    # at 0 cannot perturb anything).
    z = _softmax_z_guard(z - _perhead_max(z, seg))
    e = jnp.exp(z)
    sums = _seg_dot(e, seg)  # [nb, H]
    denom = _seg_dot(sums, seg.T)
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


# --- hand-written backward kernels -----------------------------------------
#
# Derivation (packed layout; per batch; C = H*D lanes, HG = H*G):
#   L = X Kexp + bexp;  Z = L * invt;  W = per-head softmax(Z) (rows >= N
#   masked to 0);  S = sum_n W;  Traw = W^T F (diag blocks);  T = Traw/(S+e);
#   A = attention(T);  out = W Aexp.
# Given cotangents dOut [N, C] and dA (on the attention tokens):
#   deslice:      dW1 = dOut Aexp^T;          dAexp += W^T dOut  (pass 1)
#   attention:    XLA vjp (tiny G x G math) -> dT, dwq/k/v
#   norm divide:  dTraw = dT/(S+e);  dS = -sum_d T*dT/(S+e)
#   aggregation:  dF = W dTrawexp;  dW2 = F dTrawexp^T;  dW3 = dS (broadcast)
#   softmax:      dZ = W * (dW - seghead-sum(W*dW))
#   logits:       dL = dZ*invt; dX = dL Kexp^T; dKexp += X^T dL; db += sum dL
#   temperature:  dinvt = sum_n dZ*L -> dtau_h = -invt_h^2 * sum_g dinvt
# Pass 1 accumulates dAexp; pass 2 recomputes W/L per block and emits
# dX, dF while accumulating dKexp, db, dinvt.  The [N, HG] weights are
# never materialized in HBM in either direction.


def _bwd_acc_kernel(n_ref, x_ref, dout_ref, kexp_ref, b_ref, invt_ref,
                    seg_ref, daexp_ref, *, block_n):
    nb = pl.program_id(1)
    w = _packed_w(
        x_ref[0], kexp_ref, b_ref, invt_ref, seg_ref, nb * block_n, n_ref[0]
    )

    @pl.when(nb == 0)
    def _():
        daexp_ref[:] = jnp.zeros_like(daexp_ref)

    daexp_ref[0] += jax.lax.dot_general(
        w, dout_ref[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_main_kernel(n_ref, x_ref, f_ref, dout_ref, kexp_ref, b_ref,
                     invt_ref, seg_ref, aexp_ref, dtrawexp_ref, ds_ref,
                     dx_ref, df_ref, dkexp_ref, db_ref, dinvt_ref,
                     *, block_n):
    nb = pl.program_id(1)
    x_blk = x_ref[0].astype(jnp.float32)
    f_blk = f_ref[0].astype(jnp.float32)
    dout = dout_ref[0].astype(jnp.float32)
    # recompute logits, z, w with masking
    logits = jnp.dot(x_blk, kexp_ref[:], preferred_element_type=jnp.float32) + b_ref[0]
    z = logits * invt_ref[0]
    seg = seg_ref[:]
    z = _softmax_z_guard(z - _perhead_max(z, seg))  # exact, see _seg_dot
    e = jnp.exp(z)
    sums = _seg_dot(e, seg)
    denom = _seg_dot(sums, seg.T)
    w = e / denom
    rows = nb * block_n + jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
    w = jnp.where(rows < n_ref[0], w, 0.0)

    # dW from deslice, aggregation and norm paths
    dw = (
        jax.lax.dot_general(dout, aexp_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(f_blk, dtrawexp_ref[0], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        + ds_ref[0]
    )
    # per-head softmax backward: dZ = W * (dW - seghead<W, dW>)
    wdw = w * dw
    inner = _seg_dot(_seg_dot(wdw, seg), seg.T)
    dz = w * (dw - inner)
    dl = dz * invt_ref[0]

    dx_ref[0] = jax.lax.dot_general(
        dl, kexp_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)
    df_ref[0] = jax.lax.dot_general(
        w, dtrawexp_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(df_ref.dtype)

    @pl.when(nb == 0)
    def _():
        dkexp_ref[:] = jnp.zeros_like(dkexp_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dinvt_ref[:] = jnp.zeros_like(dinvt_ref)

    dkexp_ref[0] += jax.lax.dot_general(
        x_blk, dl, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_ref[0] += jnp.sum(dl, axis=0, keepdims=True)
    dinvt_ref[0] += jnp.sum(dz * logits, axis=0, keepdims=True)


def _fused_v2_backward(res, cts, clamp_temperature, block_n=DEFAULT_BLOCK_N,
                       interpret=False):
    (x_mid, fx_mid, slice_kernel, slice_bias, temperature,
     wq, wk, wv, tok, norm) = res
    g_out, g_otok = cts
    B, N, H, D = x_mid.shape
    G = slice_kernel.shape[-1]
    C, HG = H * D, H * G
    if not interpret:
        interpret = jax.default_backend() == "cpu"
    block_n_eff = min(block_n, _round_up(N, 128))
    n_pad = _round_up(N, block_n_eff)
    x = x_mid.reshape(B, N, C)
    f = fx_mid.reshape(B, N, C)
    dout = g_out.reshape(B, N, C)
    if n_pad != N:
        pad = ((0, 0), (0, n_pad - N), (0, 0))
        x = jnp.pad(x, pad); f = jnp.pad(f, pad); dout = jnp.pad(dout, pad)
    kexp, bexp, invt, seg = _prep(
        slice_kernel, slice_bias, temperature, H, G, clamp_temperature
    )
    n_arr = jnp.full((1,), N, jnp.int32)
    grid = (B, n_pad // block_n_eff)

    full_spec = [
        pl.BlockSpec((1, block_n_eff, C), lambda i, j, *_: (i, j, 0)),
        pl.BlockSpec((1, block_n_eff, C), lambda i, j, *_: (i, j, 0)),
        pl.BlockSpec((C, HG), lambda i, j, *_: (0, 0)),
        pl.BlockSpec((1, HG), lambda i, j, *_: (0, 0)),
        pl.BlockSpec((1, HG), lambda i, j, *_: (0, 0)),
        pl.BlockSpec((HG, H), lambda i, j, *_: (0, 0)),
    ]

    # pass 1: dAexp accumulation
    daexp = pl.pallas_call(
        functools.partial(_bwd_acc_kernel, block_n=block_n_eff),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=full_spec,
            out_specs=pl.BlockSpec((1, HG, C), lambda i, j, *_: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, HG, C), jnp.float32),
        interpret=interpret,
    )(n_arr, x, dout, kexp, bexp, invt, seg)
    dA_deslice = jnp.einsum(
        "bhghd->bhgd", daexp.reshape(B, H, G, H, D)
    )

    # attention backward (tiny): differentiate tokens+qkv
    from .attention import slice_token_attention

    def attn_fn(tok_, wq_, wk_, wv_):
        return slice_token_attention(tok_, wq_, wk_, wv_, D**-0.5)

    _, attn_vjp = jax.vjp(attn_fn, tok, wq, wk, wv)
    dtok, dwq, dwk, dwv = attn_vjp(dA_deslice + g_otok)

    # norm-divide backward
    denom = (norm + 1e-5)[..., None]
    dtraw = dtok / denom  # [B, H, G, D]
    ds = -jnp.sum(dtok * tok, axis=-1) / (norm + 1e-5)  # [B, H, G]

    dtrawexp = _blockdiag_tokens(dtraw)  # [B, HG, C]
    aexp = _blockdiag_tokens(
        attn_fn(tok, wq, wk, wv).astype(jnp.float32)
    )
    dsexp = ds.reshape(B, 1, HG)

    dx_p, df_p, dkexp, db_exp, dinvt = pl.pallas_call(
        functools.partial(_bwd_main_kernel, block_n=block_n_eff),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_n_eff, C), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, block_n_eff, C), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, block_n_eff, C), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((C, HG), lambda i, j, *_: (0, 0)),
                pl.BlockSpec((1, HG), lambda i, j, *_: (0, 0)),
                pl.BlockSpec((1, HG), lambda i, j, *_: (0, 0)),
                pl.BlockSpec((HG, H), lambda i, j, *_: (0, 0)),
                pl.BlockSpec((1, HG, C), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, HG, C), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, 1, HG), lambda i, j, *_: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_n_eff, C), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, block_n_eff, C), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, C, HG), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, 1, HG), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, 1, HG), lambda i, j, *_: (i, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, n_pad, C), x_mid.dtype),
            jax.ShapeDtypeStruct((B, n_pad, C), fx_mid.dtype),
            jax.ShapeDtypeStruct((B, C, HG), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, HG), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, HG), jnp.float32),
        ],
        interpret=interpret,
    )(n_arr, x, f, dout, kexp, bexp, invt, seg, aexp, dtrawexp, dsexp)

    dx = dx_p[:, :N].reshape(B, N, H, D)
    df = df_p[:, :N].reshape(B, N, H, D)
    # dKexp [C, HG]: K is replicated into the head-diagonal blocks
    dkexp_sum = dkexp.sum(0).reshape(H, D, H, G)
    dk = jnp.einsum("hdhg->dg", dkexp_sum)
    db = db_exp.sum(axis=(0, 1)).reshape(H, G).sum(0)
    # temperature: invt = 1/clip(tau); dtau = -invt^2 * sum_g dinvt
    dinvt_h = dinvt.sum(axis=(0, 1)).reshape(H, G).sum(-1)  # [H]
    tau = temperature.reshape(H).astype(jnp.float32)
    tau_c = jnp.clip(tau, 0.1, 5.0) if clamp_temperature else tau
    dtau = -dinvt_h / (tau_c**2)
    if clamp_temperature:
        inside = (tau >= 0.1) & (tau <= 5.0)
        dtau = jnp.where(inside, dtau, 0.0)
    dtemp = dtau.reshape(temperature.shape).astype(temperature.dtype)

    return (dx.astype(x_mid.dtype), df.astype(fx_mid.dtype),
            dk.astype(slice_kernel.dtype), db.astype(slice_bias.dtype),
            dtemp, dwq, dwk, dwv)


def slice_attention_fused_v2_with_res(
    x_mid, fx_mid, slice_kernel, slice_bias, temperature, wq, wk, wv,
    *, clamp_temperature=True,
):
    """Forward returning (out, otok, tok, norm) for the custom VJP."""
    B, N, H, D = x_mid.shape
    G = slice_kernel.shape[-1]
    interpret = jax.default_backend() == "cpu"
    block_n = min(DEFAULT_BLOCK_N, _round_up(N, 128))
    n_pad = _round_up(N, block_n)
    x = x_mid.reshape(B, N, H * D)
    f = fx_mid.reshape(B, N, H * D)
    if n_pad != N:
        x = jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0)))
        f = jnp.pad(f, ((0, 0), (0, n_pad - N), (0, 0)))
    kexp, bexp, invt, seg = _prep(
        slice_kernel, slice_bias, temperature, H, G, clamp_temperature
    )
    n_arr = jnp.full((1,), N, jnp.int32)
    grid = (B, n_pad // block_n)
    C, HG = H * D, H * G

    tok_full, norm = pl.pallas_call(
        functools.partial(_agg_kernel, block_n=block_n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
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
    tok = jnp.einsum("bhghd->bhgd", tok_full.reshape(B, H, G, H, D))
    norm = norm.reshape(B, H, G)
    tok = tok / (norm + 1e-5)[..., None]

    from .attention import slice_token_attention

    otok = slice_token_attention(tok, wq, wk, wv, D**-0.5)
    aexp = _blockdiag_tokens(otok.astype(jnp.float32))
    out = pl.pallas_call(
        functools.partial(_deslice_kernel, block_n=block_n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
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
    return out[:, :N], otok, tok, norm


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _fused_v2(x_mid, fx_mid, slice_kernel, slice_bias, temperature,
              wq, wk, wv, clamp_temperature):
    out, otok, _, _ = slice_attention_fused_v2_with_res(
        x_mid, fx_mid, slice_kernel, slice_bias, temperature, wq, wk, wv,
        clamp_temperature=clamp_temperature,
    )
    return out, otok


def _fused_v2_fwd(x_mid, fx_mid, slice_kernel, slice_bias, temperature,
                  wq, wk, wv, clamp_temperature):
    out, otok, tok, norm = slice_attention_fused_v2_with_res(
        x_mid, fx_mid, slice_kernel, slice_bias, temperature, wq, wk, wv,
        clamp_temperature=clamp_temperature,
    )
    res = (x_mid, fx_mid, slice_kernel, slice_bias, temperature,
           wq, wk, wv, tok, norm)
    return (out, otok), res


def _fused_v2_bwd(clamp_temperature, res, cts):
    return _fused_v2_backward(res, cts, clamp_temperature)


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
