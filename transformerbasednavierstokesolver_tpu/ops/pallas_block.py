"""Fused Transolver-block megakernel (Pallas, TPU).

One physics-attention block (reference ``model/Transolver_Structured_Mesh_2D.py:41-75``:
``fx = Attn(ln_1(fx)) + fx; fx = mlp(ln_2(fx)) + fx`` with the 2D attention of
``model/Physics_Attention.py:60-119``) runs as TWO Pallas kernels around a tiny
XLA G x G attention, instead of ~20 XLA fusions:

* **front kernel** (grid over batch x row-blocks, 1-row conv halo):
  LayerNorm(ln_1) -> merged 3x3 projection conv (9 shifted matmuls, the two
  reference convs concatenated) -> packed per-head slice softmax (v2 layout:
  all heads in lanes, block-diagonal slice kernel) -> slice-token aggregation.
  Emits the slice weights W [B,N,HG] and projections XF [B,N,2C] to HBM once
  (~50 MB/layer at the flagship config, ~2 HBM round trips cheaper than the
  XLA fusion chain) plus packed tokens/norms.
* **XLA glue**: token normalization + G x G MHA (tiny; ``slice_token_attention``).
* **back kernel** (grid over batch x flat point blocks): deslice (W @ Aexp)
  -> output projection -> +residual -> LayerNorm(ln_2) -> MLP(gelu) ->
  +residual.  Emits the next residual stream directly.

The backward pass is hand-derived into three more kernels (bwd-back,
bwd-slice, bwd-conv; see ``_bwd_*`` below) wrapped in one ``jax.custom_vjp``
over the whole block, so no [B,N,*] intermediate other than W/XF/dXF ever
round-trips HBM in either direction.  Gradient parity vs the XLA block is
tested in ``tests/test_pallas_block.py``.

Layout notes (shared with ``pallas_attention_v2``): C = heads*dim_head lanes,
HG = heads*slice_num packed lanes; per-head softmax via segment one-hots;
block-diagonal expanded slice kernel / tokens.  The row-block size R is a
multiple of 8 (Mosaic's second-minor block rule); when R does not divide
the grid height H (85, 101, 129, 221: Darcy-hires, plasticity, pipe,
airfoil) the grid is zero-padded to the next multiple and the tail rows
are masked -- ``_row_validity`` already carries row validity into every
kernel for the conv halo, and zeroing the padded rows' slice weights in
``_front_kernel`` makes every other padding term vanish (w == 0 kills the
tok/norm sums forward and all dW/dXF paths backward; the padded rows'
outputs are sliced away outside the custom_vjp, so their cotangents are
exactly zero).  The conv halo is assembled from two adjacent row blocks,
so no manual DMA is needed.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention_v2 import (
    _blockdiag_tokens,
    _expand_blockdiag,
    _perhead_max,
    _seg_dot,
    _segment_onehots,
    _softmax_z_guard,
)

LN_EPS = 1e-5

# v5e has 128 MB of VMEM; Mosaic's default 16 MB scoped limit rejects the
# fused kernels at production block sizes, so every pallas_call below asks
# for a higher cap and the block pickers budget well under it.
_VMEM_LIMIT = 100 * 1024 * 1024
_SQRT2 = math.sqrt(2.0)
_INV_SQRT_2PI = 0.3989422804014327


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7 = f32 eps).

    Mosaic has no erf lowering; this keeps the megakernel's gelu the *exact*
    (erf) form of ``ACTIVATION['gelu']`` / torch nn.GELU to f32 precision,
    rather than silently switching to the tanh approximation.
    """
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu(p):
    """Exact (erf) gelu -- matches ``ACTIVATION['gelu']`` / torch nn.GELU."""
    return 0.5 * p * (1.0 + _erf(p / _SQRT2))


def _gelu_grad(p):
    phi = jnp.exp(-0.5 * p * p) * _INV_SQRT_2PI
    cdf = 0.5 * (1.0 + _erf(p / _SQRT2))
    return cdf + p * phi


def _ln_fwd(x32, scale, bias):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
    rs = jax.lax.rsqrt(var + LN_EPS)
    xhat = (x32 - mu) * rs
    return xhat * scale + bias, xhat, rs


def _ln_bwd(dv32, xhat, rs, scale):
    """Input gradient of LayerNorm given normalized xhat and rsqrt(var+eps)."""
    dxhat = dv32 * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return rs * (dxhat - m1 - xhat * m2)


def _mask_from_rows(rm1, rm2, R, W):
    """float32 [R+2, W+2, 1] conv-pad mask from row-validity block inputs.

    Row validity comes in as data (``_row_validity``) so the same kernels
    serve the single-device case (rows 0 and H+1 invalid) and the
    space-sharded case under shard_map (only the GLOBAL top/bottom rows are
    invalid -- shard-boundary halo rows carry real neighbor data).  Columns
    are always local: padded col q valid iff 1 <= q <= W.
    """
    rmask = jnp.concatenate([rm1, rm2[:2]], axis=0)[:, :1].reshape(R + 2, 1, 1)
    pcol = jax.lax.broadcasted_iota(jnp.int32, (1, W + 2, 1), 1)
    cmask = ((pcol >= 1) & (pcol <= W)).astype(jnp.float32)
    return rmask * cmask


def _row_validity(Hl, R, nb, row0, htot):
    """[ (nb+1)*R, 128 ] f32: padded local row p valid iff the global padded
    row ``row0 + p`` lies in [1, htot] (and p <= Hl+1; divisibility padding
    beyond that is never read but kept invalid for safety)."""
    p = jnp.arange((nb + 1) * R, dtype=jnp.int32)
    gp = row0 + p
    valid = (gp >= 1) & (gp <= htot) & (p <= Hl + 1)
    return jnp.broadcast_to(
        valid.astype(jnp.float32)[:, None], ((nb + 1) * R, 128)
    )


def _softmax_packed(logits32, invt, seg):
    """Per-head temperature softmax over packed [rows, HG] logits.

    The segment max broadcast and denominator ride ``_seg_dot`` (exact f32
    one-hot matmuls) and z is clamped <= 0: at the default MXU precision the
    broadcast max is short by ~|max|*2^-8, which overflows exp once drifting
    weights push |logits/temp| past ~2e4 — the round-5 padded-mega training
    NaN (logs/probe_nan_bisect_r5.log, replay update 1973).
    """
    z = logits32 * invt
    z = _softmax_z_guard(z - _perhead_max(z, seg))
    e = jnp.exp(z)
    sums = _seg_dot(e, seg)
    denom = _seg_dot(sums, seg.T)
    return e / denom


# --------------------------------------------------------------------------
# forward kernels
# --------------------------------------------------------------------------


def _front_kernel(x1_ref, x2_ref, rm1_ref, rm2_ref, g1_ref, b1_ref,
                  kc_ref, cb_ref,
                  kexp_ref, bexp_ref, invt_ref, seg_ref,
                  w_ref, xf_ref, tok_ref, norm_ref,
                  *, R, W, C, cdt):
    """LN1 + merged 3x3 conv + packed slice softmax + token aggregation."""
    j = pl.program_id(1)
    # assemble the (R+2)-row halo block from two adjacent R-row blocks
    xa = jnp.concatenate([x1_ref[0], x2_ref[0, :2]], axis=0).astype(jnp.float32)
    y, _, _ = _ln_fwd(xa, g1_ref[0], b1_ref[0])
    mask = _mask_from_rows(rm1_ref[:], rm2_ref[:], R, W)
    y = (y * mask).astype(cdt)

    acc = jnp.broadcast_to(cb_ref[0], (R * W, 2 * C)).astype(jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = y[dy:dy + R, dx:dx + W, :].reshape(R * W, C)
            acc = acc + jnp.dot(win, kc_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    xf_ref[0] = acc.astype(xf_ref.dtype)
    x_mid = acc[:, :C].astype(cdt)
    f_mid = acc[:, C:]

    logits = jnp.dot(x_mid, kexp_ref[:].astype(cdt),
                     preferred_element_type=jnp.float32) + bexp_ref[0]
    w = _softmax_packed(logits, invt_ref[0], seg_ref[:])
    # Zero the slice weights of invalid center rows (the masked row tail
    # when R does not divide H): they then contribute nothing to the slice
    # tokens/norms here, and w == 0 kills every padding-row term in the
    # backward kernels (see _fused_block_bwd) without further masking.
    w = w * mask[1:1 + R, 1:1 + W].reshape(R * W, 1)
    w_ref[0] = w.astype(w_ref.dtype)

    @pl.when(j == 0)
    def _():
        tok_ref[:] = jnp.zeros_like(tok_ref)
        norm_ref[:] = jnp.zeros_like(norm_ref)

    tok_ref[0] += jax.lax.dot_general(
        w, f_mid, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    norm_ref[0] += jnp.sum(w, axis=0, keepdims=True)


def _back_kernel(w_ref, r_ref, aexp_ref, wo_ref, bo_ref, g2_ref, b2_ref,
                 w1_ref, bm1_ref, w2_ref, bm2_ref, out_ref, *, cdt):
    """Deslice + out-projection + residual + LN2 + MLP(gelu) + residual."""
    w = w_ref[0].astype(cdt)
    o = jnp.dot(w, aexp_ref[0].astype(cdt), preferred_element_type=jnp.float32)
    u = jnp.dot(o.astype(cdt), wo_ref[:].astype(cdt),
                preferred_element_type=jnp.float32) + bo_ref[0]
    r2 = u + r_ref[0].astype(jnp.float32)
    v, _, _ = _ln_fwd(r2, g2_ref[0], b2_ref[0])
    p = jnp.dot(v.astype(cdt), w1_ref[:].astype(cdt),
                preferred_element_type=jnp.float32) + bm1_ref[0]
    g = _gelu(p)
    m = jnp.dot(g.astype(cdt), w2_ref[:].astype(cdt),
                preferred_element_type=jnp.float32) + bm2_ref[0]
    out_ref[0] = (r2 + m).astype(out_ref.dtype)


# --------------------------------------------------------------------------
# backward kernels
# --------------------------------------------------------------------------


def _bwd_back_kernel(w_ref, r_ref, aexp_ref, dout_ref,
                     wo_ref, bo_ref, g2_ref, b2_ref,
                     w1_ref, bm1_ref, w2_ref, bm2_ref,
                     drdir_ref, dwd_ref, daexp_ref,
                     dwo_ref, dbo_ref, dg2_ref, db2_ref,
                     dw1_ref, dbm1_ref, dw2_ref, dbm2_ref, *, cdt):
    """Backward of the back kernel; recomputes its forward internally."""
    j = pl.program_id(1)
    w = w_ref[0].astype(cdt)
    aexp = aexp_ref[0]
    o = jnp.dot(w, aexp.astype(cdt), preferred_element_type=jnp.float32)
    u = jnp.dot(o.astype(cdt), wo_ref[:].astype(cdt),
                preferred_element_type=jnp.float32) + bo_ref[0]
    r2 = u + r_ref[0].astype(jnp.float32)
    v, xhat2, rs2 = _ln_fwd(r2, g2_ref[0], b2_ref[0])
    p = jnp.dot(v.astype(cdt), w1_ref[:].astype(cdt),
                preferred_element_type=jnp.float32) + bm1_ref[0]
    g = _gelu(p)

    dout = dout_ref[0].astype(jnp.float32)
    # m-path
    dg = jnp.dot(dout.astype(cdt), w2_ref[:].astype(cdt).T,
                 preferred_element_type=jnp.float32)
    dp = dg * _gelu_grad(p)
    dv = jnp.dot(dp.astype(cdt), w1_ref[:].astype(cdt).T,
                 preferred_element_type=jnp.float32)
    # LN2 backward
    dr2 = dout + _ln_bwd(dv, xhat2, rs2, g2_ref[0])
    du = dr2
    do = jnp.dot(du.astype(cdt), wo_ref[:].astype(cdt).T,
                 preferred_element_type=jnp.float32)

    drdir_ref[0] = dr2.astype(drdir_ref.dtype)
    dwd_ref[0] = jax.lax.dot_general(
        do.astype(cdt), aexp.astype(cdt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dwd_ref.dtype)

    @pl.when(j == 0)
    def _():
        daexp_ref[:] = jnp.zeros_like(daexp_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)
        dg2_ref[:] = jnp.zeros_like(dg2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dbm1_ref[:] = jnp.zeros_like(dbm1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        dbm2_ref[:] = jnp.zeros_like(dbm2_ref)

    ct = lambda a, b: jax.lax.dot_general(  # a^T @ b with f32 accum
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    daexp_ref[0] += ct(w, do)
    dwo_ref[0] += ct(o, du)
    dbo_ref[0] += jnp.sum(du, axis=0, keepdims=True)
    dg2_ref[0] += jnp.sum(dv * xhat2, axis=0, keepdims=True)
    db2_ref[0] += jnp.sum(dv, axis=0, keepdims=True)
    dw1_ref[0] += ct(v, dp)
    dbm1_ref[0] += jnp.sum(dp, axis=0, keepdims=True)
    dw2_ref[0] += ct(g, dout)
    dbm2_ref[0] += jnp.sum(dout, axis=0, keepdims=True)


def _bwd_slice_kernel(xf_ref, w_ref, dwd_ref, dtrawexp_ref, dsexp_ref,
                      kexp_ref, invt_ref, seg_ref,
                      dxf_ref, dkexp_ref, dbexp_ref, dinvt_ref,
                      *, C, cdt):
    """Backward through softmax/aggregation; emits dXF, accumulates slice grads.

    Reuses the slice weights ``w`` saved by the forward instead of
    recomputing them from xf (saves the [Rn,C]x[C,HG] logits matmul + the
    packed softmax per block-step).  The temperature gradient needs the
    pre-softmax logits; those are recovered as log(w)/invt -- the dropped
    per-row-per-segment softmax constant (max + log-denominator) cannot
    contribute because dz has exactly zero segment-sums and only the
    per-head lane-sum of dinvt is consumed host-side (_fused_block_bwd).
    """
    j = pl.program_id(1)
    xf = xf_ref[0]
    x_mid = xf[:, :C]
    f_mid = xf[:, C:].astype(jnp.float32)
    invt = invt_ref[0]
    seg = seg_ref[:]
    w = w_ref[0].astype(jnp.float32)

    dtrawexp = dtrawexp_ref[0]
    dw = (
        dwd_ref[0].astype(jnp.float32)
        + jax.lax.dot_general(f_mid, dtrawexp, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        + dsexp_ref[0]
    )
    wdw = w * dw
    inner = _seg_dot(_seg_dot(wdw, seg), seg.T)
    dz = w * (dw - inner)
    dl = dz * invt

    dx_mid = jax.lax.dot_general(
        dl.astype(cdt), kexp_ref[:].astype(cdt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    df_mid = jnp.dot(w.astype(cdt), dtrawexp.astype(cdt),
                     preferred_element_type=jnp.float32)
    dxf_ref[0] = jnp.concatenate([dx_mid, df_mid], axis=-1).astype(dxf_ref.dtype)

    @pl.when(j == 0)
    def _():
        dkexp_ref[:] = jnp.zeros_like(dkexp_ref)
        dbexp_ref[:] = jnp.zeros_like(dbexp_ref)
        dinvt_ref[:] = jnp.zeros_like(dinvt_ref)

    dkexp_ref[0] += jax.lax.dot_general(
        x_mid.astype(jnp.float32), dl, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbexp_ref[0] += jnp.sum(dl, axis=0, keepdims=True)
    # logits == log(w)/invt up to the per-segment softmax constant (see
    # docstring); guard log(0) -- dz is exactly 0 wherever w underflows.
    # Center logw per row-segment before the reduction: the constant is in
    # dz's null space so the value is unchanged, but removing the large
    # common offset (log-denominator, magnitude ~10-70) keeps the
    # near-cancelling row sum at the recompute path's f32 accuracy.
    logw = jnp.log(jnp.maximum(w, 1e-30))
    G = seg.shape[0] // seg.shape[1]
    seg_mean = _seg_dot(_seg_dot(logw, seg) / G, seg.T)
    dinvt_ref[0] += jnp.sum(dz * (logw - seg_mean), axis=0,
                            keepdims=True) / invt


def _bwd_conv_kernel(x1_ref, x2_ref, d1_ref, d2_ref, rm1_ref, rm2_ref,
                     drdir_ref, g1_ref, b1_ref, kc_ref,
                     dtot_ref, dkc_ref, dg1_ref, db1_ref,
                     *, R, W, C, cdt):
    """Conv-transpose + dKc + LN1 backward (+ fold in the direct residual grad)."""
    j = pl.program_id(1)
    xa = jnp.concatenate([x1_ref[0], x2_ref[0, :2]], axis=0).astype(jnp.float32)
    _, xhat, rs = _ln_fwd(xa, g1_ref[0], b1_ref[0])
    mask = _mask_from_rows(rm1_ref[:], rm2_ref[:], R, W)
    y = ((xhat * g1_ref[0] + b1_ref[0]) * mask).astype(cdt)

    da = jnp.concatenate([d1_ref[0], d2_ref[0, :2]], axis=0).astype(cdt)
    # dxf halo local coords: row ell <-> original dxf row (jR - 1 + ell)
    dy_acc = jnp.zeros((R * W, C), jnp.float32)

    @pl.when(j == 0)
    def _():
        dkc_ref[:] = jnp.zeros_like(dkc_ref)
        dg1_ref[:] = jnp.zeros_like(dg1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)

    dxf_center = da[1:1 + R, 1:1 + W, :].reshape(R * W, 2 * C)
    for dy in range(3):
        for dx in range(3):
            # dY[r, c] += dXF[r + 1 - dy, c + 1 - dx] @ Kc[dy, dx]^T
            win = da[2 - dy:2 - dy + R, 2 - dx:2 - dx + W, :].reshape(R * W, 2 * C)
            dy_acc = dy_acc + jax.lax.dot_general(
                win, kc_ref[dy, dx].astype(cdt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dKc[dy, dx] += Y[local rows dy:dy+R, cols dx:dx+W]^T @ dXF_center
            ywin = y[dy:dy + R, dx:dx + W, :].reshape(R * W, C)
            dkc_ref[0, dy, dx] += jax.lax.dot_general(
                ywin, dxf_center, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    # LN1 backward on the center rows (halo rows belong to neighboring
    # blocks).  dy_acc is the gradient wrt the MASKED y: the conv-transpose
    # pulls from valid dxf neighbors, so a masked-tail center row can
    # receive a nonzero dy_acc -- the mask's own backward (zeroing) must be
    # applied before it feeds LN1's input/scale/bias gradients.
    dyg = dy_acc.reshape(R, W, C) * mask[1:1 + R, 1:1 + W]
    xhat_c = xhat[1:1 + R, 1:1 + W, :]
    rs_c = rs[1:1 + R, 1:1 + W, :]
    dx = _ln_bwd(dyg, xhat_c, rs_c, g1_ref[0])
    dtot_ref[0] = (dx + drdir_ref[0].astype(jnp.float32)).astype(dtot_ref.dtype)
    dg1_ref[0] += jnp.sum(dyg * xhat_c, axis=(0, 1), keepdims=True)[0]
    db1_ref[0] += jnp.sum(dyg, axis=(0, 1), keepdims=True)[0]


# --------------------------------------------------------------------------
# host-side orchestration
# --------------------------------------------------------------------------


def _row_budget_ok(r, W, C, HG, budget_bytes):
    """Whether row-block r fits Mosaic's scoped VMEM with headroom.

    The kernels request a raised scoped-VMEM cap (``_VMEM_LIMIT``); the
    budget here keeps blocks well under it so Mosaic retains headroom for
    double-buffering.  Binding constraint is the bwd-conv kernel (halo
    blocks of x and dXF from two refs each, the LN recompute, the per-batch
    dKc accumulator, and all nine live conv windows; measured 17-25 MB at
    the flagship shape).
    """
    halo = (r + 2) * (W + 2)
    fwd = 4 * (2 * halo * C + 6 * r * W * C + 3 * r * W * HG)
    bwd = 4 * (12 * halo * C + 5 * r * W * C + 18 * C * C)
    return max(fwd, bwd) <= budget_bytes


def _pick_row_block(Hrows, W, C, HG, budget_bytes=40 * 1024 * 1024):
    """Row-block R (multiple of 8, Mosaic's second-minor rule) for H rows.

    Exact divisors of H are preferred (no padding; largest one fitting the
    VMEM budget, the round-2/3 behavior).  Otherwise ANY multiple of 8
    works: ``_pad_rows`` already zero-pads H up to nb*R rows, and the
    masked row tail (``_row_validity`` + the w-mask in ``_front_kernel``)
    keeps the padded rows out of the slice statistics, so heights like 85
    (darcy-hires), 101 (plasticity), 129 (pipe) or 221 (airfoil) run the
    megakernel instead of falling back to XLA.  Among padded candidates:
    least padded rows first (least wasted compute), then the larger R
    (fewer grid steps).  Returns None only when nothing fits the budget.
    """
    best = None
    for r in range(8, min(Hrows, 64) + 1, 8):
        if Hrows % r == 0 and _row_budget_ok(r, W, C, HG, budget_bytes):
            best = r
    if best is not None:
        return best
    cand = []
    for r in range(8, min(((Hrows + 7) // 8) * 8, 64) + 1, 8):
        if _row_budget_ok(r, W, C, HG, budget_bytes):
            hp = -(-Hrows // r) * r
            cand.append((hp, -r, r))
    return min(cand)[2] if cand else None


def _pick_flat_block(N, C, HG, M, budget_bytes=40 * 1024 * 1024):
    """Largest divisor of N whose flat kernels fit the scoped-VMEM limit.

    N here is the row-PADDED point count nb*R*W (R a multiple of 8), so a
    multiple-of-8 divisor always exists.  Binding constraint is the
    bwd-back kernel: ~2 [*, HG] weight-row copies, ~10 [*, C]
    activation/grad rows, ~4 [*, M] MLP intermediates (f32), calibrated
    against Mosaic OOM reports (flagship: Rn=2048 -> 33 MB, Rn=1024 ->
    17.3 MB, so ~16 KB/row + constant).  The budget is kept at 40 MB
    although the raised VMEM cap admits more: measured end-to-end,
    R=16/Rn=2048 beats R=32/Rn=4096 by ~8% (smaller blocks double-buffer
    better inside the grid pipeline).
    """
    row_bytes = 4 * (2 * HG + 10 * C + 4 * M)
    cap = max(budget_bytes // row_bytes, 8)
    best = None
    for b in range(8, min(2048, N, cap) + 1):
        if N % b == 0 and not (b % 8 and b != N):
            # multiple-of-8 second-minor rule (b == N makes the block equal
            # the array dim, which Mosaic always allows)
            best = b
    return best


def _padded_ok():
    """Whether the masked-tail (row-padded) plans may run on this backend.

    History: the r4 TPU probe (logs/probe_mega_params_r4.log) reported the
    slice-parameter gradient of the padded path "wrong" on compiled Mosaic
    (rel 0.77 at 101x31) while CPU interpret passed, and r4/early-r5 gated
    the padded plans off compiled backends.  The r5 precision cross-probe
    (tools/probe_mega_precision.py, logs/probe_mega_precision_r5.log)
    attributed the whole discrepancy to TPU *default matmul precision*
    (single-pass bf16 MXU for f32 operands), which perturbs the
    cancellation-heavy slice_kernel/temperature grads in BOTH
    implementations: at 101x31, mega(default) is 7.6e-1 from
    mega(highest) and xla(default) is 4.2e-1 from xla(highest), while
    mega(highest) vs xla(highest) agree to <=5.4e-5 on the real chip
    (logs/probe_diag_hp_r5.log).  There was never a Mosaic lowering bug;
    the padded path is exactly as accurate as the unpadded mega/XLA paths
    at those probe points.

    Session-4 addendum: grad parity at init is NOT the whole story.  The
    first real TRAINING run on a padded grid (plasticity 101x31, resumed
    from a healthy xla-trained epoch-21 checkpoint) went straight to NaN
    on its first mega epoch (logs/plas900_r5.log "Epoch 21 ...nan"),
    while the same checkpoint continued cleanly under xla the same day.
    The param-grad probe at this exact shape passes at init, so the
    failure needed real mid-schedule weights to manifest.

    Round-5 RESOLUTION: root-caused to the packed softmax's per-head max
    broadcast riding a default-precision MXU matmul — bf16 rounding
    under-subtracts the max once |logits/temperature| drifts past ~2e4,
    exp overflows, and w = inf/inf = NaN.  Fixed by exact
    HIGHEST-precision segment matmuls + a z<=0 guard
    (pallas_attention_v2._seg_dot / _softmax_z_guard).  Evidence: the
    pinned epoch-21 replay NaN'd at update 1973 pre-fix; the dumped
    failing case dissects to [pre-fix mega NaN | fixed mega 0.20523 |
    xla 0.20524] (logs/r5f_nan_dissect_{prefix,fixed}.log); the full
    2260-update replay runs clean under the fixed kernels on the XLA
    loss trajectory (logs/r5f_nan_replay_{fixed,xla}.log).  The failure
    was never specific to padded plans — they were simply the first
    place training drove logits that large — so padded plans are now ON
    by default (``TBNSS_MEGA_PADDED=0`` opts out; the diagnostic
    pre-fix-numerics replay knob is ``TBNSS_SEG_DOT_UNSAFE=1``).
    """
    import os

    return _interpret() or os.environ.get("TBNSS_MEGA_PADDED", "1") == "1"


def _plan_blocks(Hrows, W, C, HG, M):
    """(R, Hp, Rn) row block / padded height / flat block, or None.

    Hp == Hrows when R divides H (no padding); otherwise the fused path
    zero-pads the grid to Hp rows and masks the tail (see
    ``fused_transolver_block``) -- gated by ``_padded_ok`` on compiled
    backends.
    """
    R = _pick_row_block(Hrows, W, C, HG)
    if R is None:
        return None
    Hp = -(-Hrows // R) * R
    if Hp != Hrows and not _padded_ok():
        return None
    Rn = _pick_flat_block(Hp * W, C, HG, M)
    if Rn is None:
        return None
    return R, Hp, Rn


def _interpret():
    return jax.default_backend() == "cpu"


def _pad_rows(xg, R, nb, halo=None):
    """[B, H, W, C] -> [B, (nb+1)*R, W+2, C] with a 1-ring zero pad.

    ``halo``: optional (top, bottom) [B, 1, W, C] neighbor rows (space-sharded
    shard_map path); they overwrite the zero pad rows at positions 0 and H+1.
    """
    B, Hrows, W, C = xg.shape
    xp = jnp.pad(
        xg, ((0, 0), (1, (nb + 1) * R - Hrows - 1), (1, 1), (0, 0))
    )
    if halo is not None:
        top, bottom = halo
        xp = xp.at[:, 0, 1:W + 1, :].set(top[:, 0].astype(xp.dtype))
        xp = xp.at[:, Hrows + 1, 1:W + 1, :].set(bottom[:, 0].astype(xp.dtype))
    return xp


def _space_halo(xg, axis_name, size):
    """(top, bottom) neighbor rows over the 'space' axis via ppermute.

    Shards at the global boundary receive zeros (ppermute's fill), which is
    exactly the conv's zero padding there.
    """
    top = jax.lax.ppermute(
        xg[:, -1:], axis_name, [(i, i + 1) for i in range(size - 1)]
    )
    bottom = jax.lax.ppermute(
        xg[:, :1], axis_name, [(i + 1, i) for i in range(size - 1)]
    )
    return top, bottom


def _prep_packed(params, H, G, clamp):
    kexp = _expand_blockdiag(params["slice_kernel"].astype(jnp.float32), H)
    bexp = jnp.tile(params["slice_bias"].astype(jnp.float32), H).reshape(1, H * G)
    t = params["temperature"].reshape(H).astype(jnp.float32)
    if clamp:
        t = jnp.clip(t, 0.1, 5.0)
    invt = jnp.repeat(1.0 / t, G).reshape(1, H * G)
    seg = _segment_onehots(H, G)
    return kexp, bexp, invt, seg


def _front(xg, params, cfg, row0=0, halo=None):
    """Run the front kernel; returns (w, xf, tok_raw [B,HG,C], norm [B,1,HG]).

    tok_raw/norm are UN-normalized partial sums over this call's N rows --
    the caller psums them over the 'space' axis (sharded path) before the
    tok / (norm+1e-5) normalization.
    """
    B, Hrows, W, C = xg.shape
    heads, G, clamp, cdt = cfg.heads, cfg.G, cfg.clamp, cfg.cdt
    HG = heads * G
    R = cfg.R
    nb = Hrows // R
    N = Hrows * W
    xp = _pad_rows(xg, R, nb, halo)
    rm = _row_validity(Hrows, R, nb, row0, cfg.htot)
    kexp, bexp, invt, seg = _prep_packed(params, heads, G, clamp)
    g1 = params["ln1_scale"].astype(jnp.float32).reshape(1, C)
    b1 = params["ln1_bias"].astype(jnp.float32).reshape(1, C)
    kc = params["conv_kernel"].astype(cdt)
    cb = params["conv_bias"].astype(jnp.float32).reshape(1, 2 * C)

    grid = (B, nb)
    bs = pl.BlockSpec
    w, xf, tok_p, norm = pl.pallas_call(
        functools.partial(_front_kernel, R=R, W=W, C=C, cdt=cdt),
        grid=grid,
        in_specs=[
            bs((1, R, W + 2, C), lambda i, j: (i, j, 0, 0)),
            bs((1, R, W + 2, C), lambda i, j: (i, j + 1, 0, 0)),
            bs((R, 128), lambda i, j: (j, 0)),
            bs((R, 128), lambda i, j: (j + 1, 0)),
            bs((1, C), lambda i, j: (0, 0)),
            bs((1, C), lambda i, j: (0, 0)),
            bs((3, 3, C, 2 * C), lambda i, j: (0, 0, 0, 0)),
            bs((1, 2 * C), lambda i, j: (0, 0)),
            bs((C, HG), lambda i, j: (0, 0)),
            bs((1, HG), lambda i, j: (0, 0)),
            bs((1, HG), lambda i, j: (0, 0)),
            bs((HG, heads), lambda i, j: (0, 0)),
        ],
        out_specs=[
            bs((1, R * W, HG), lambda i, j: (i, j, 0)),
            bs((1, R * W, 2 * C), lambda i, j: (i, j, 0)),
            bs((1, HG, C), lambda i, j: (i, 0, 0)),
            bs((1, 1, HG), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, HG), cdt),
            jax.ShapeDtypeStruct((B, N, 2 * C), cdt),
            jax.ShapeDtypeStruct((B, HG, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, HG), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(xp, xp, rm, rm, g1, b1, kc, cb, kexp, bexp, invt, seg)
    return w, xf, tok_p, norm


def _unpack_tokens(tok_p, norm, heads, G, C):
    """Head-unpack the packed token sums and normalize by the slice norms."""
    B = tok_p.shape[0]
    D = C // heads
    tok = jnp.einsum("bhghd->bhgd", tok_p.reshape(B, heads, G, heads, D))
    norm = norm.reshape(B, heads, G)
    tok = tok / (norm + 1e-5)[..., None]
    return tok, norm


def _back(w, fx, aexp, params, cfg):
    B, N, C = fx.shape
    HG = aexp.shape[1]
    Rn = cfg.Rn
    cdt = cfg.cdt
    grid = (B, N // Rn)
    bs = pl.BlockSpec
    pp = lambda key: params[key].astype(jnp.float32).reshape(1, -1)
    out = pl.pallas_call(
        functools.partial(_back_kernel, cdt=cdt),
        grid=grid,
        in_specs=[
            bs((1, Rn, HG), lambda i, j: (i, j, 0)),
            bs((1, Rn, C), lambda i, j: (i, j, 0)),
            bs((1, HG, C), lambda i, j: (i, 0, 0)),
            bs((C, C), lambda i, j: (0, 0)),
            bs((1, C), lambda i, j: (0, 0)),
            bs((1, C), lambda i, j: (0, 0)),
            bs((1, C), lambda i, j: (0, 0)),
            bs((C, cfg.M), lambda i, j: (0, 0)),
            bs((1, cfg.M), lambda i, j: (0, 0)),
            bs((cfg.M, C), lambda i, j: (0, 0)),
            bs((1, C), lambda i, j: (0, 0)),
        ],
        out_specs=bs((1, Rn, C), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), fx.dtype),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(
        w, fx, aexp.astype(jnp.float32), params["out_kernel"].astype(cdt),
        pp("out_bias"), pp("ln2_scale"), pp("ln2_bias"),
        params["w1"].astype(cdt), pp("b1"), params["w2"].astype(cdt), pp("b2"),
    )
    return out


class _Cfg:
    """Static kernel configuration (hashable for custom_vjp nondiff args).

    ``grid_shape`` is the LOCAL (per-shard) grid; ``htot`` the GLOBAL row
    count (== local rows single-device); ``data_axis``/``space_axis`` are
    mesh axis names when running inside shard_map (None otherwise) and
    ``space_size`` the 'space' axis extent.
    """

    def __init__(self, grid_shape, heads, G, M, clamp, cdt, R, Rn,
                 htot=None, data_axis=None, space_axis=None, space_size=1):
        self.grid_shape = grid_shape
        self.heads = heads
        self.G = G
        self.M = M
        self.clamp = clamp
        self.cdt = cdt
        self.R = R
        self.Rn = Rn
        self.htot = grid_shape[0] if htot is None else htot
        self.data_axis = data_axis
        self.space_axis = space_axis
        self.space_size = space_size
        self._key = (grid_shape, heads, G, M, clamp, str(cdt), R, Rn,
                     self.htot, data_axis, space_axis, space_size)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _Cfg) and self._key == other._key


def supported(fx_shape, dtype, grid_shape, heads, slice_num, mlp_hidden,
              kernel_size=3, dropout_active=False):
    """Whether the fused block kernel covers this configuration.

    Consults the active ('data', 'space') mesh: under multi-chip sharding
    the check applies to the PER-SHARD shapes the shard_map path will see.
    """
    if dropout_active or kernel_size != 3 or len(grid_shape) != 2:
        return False
    B, N, C = fx_shape
    Hrows, W = grid_shape
    if Hrows * W != N or C % heads:
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    HG = heads * slice_num
    if C > 1024 or HG > 1024 or mlp_hidden > 2048:
        return False
    mesh = _active_mesh()
    if mesh is not None:
        return _sharded_cfg(fx_shape, dtype, grid_shape, heads, slice_num,
                            mlp_hidden, True, mesh) is not None
    return _plan_blocks(Hrows, W, C, HG, mlp_hidden) is not None


def _active_mesh():
    from ..parallel import active_mesh

    return active_mesh()


def _make_cfg(fx, grid_shape, heads, slice_num, mlp_hidden, clamp):
    """Single-device cfg.  ``cfg.grid_shape`` holds the row-PADDED height
    Hp (== H when R | H); ``cfg.htot`` keeps the TRUE height so
    ``_row_validity`` marks the padded tail rows invalid."""
    Hrows, W = grid_shape
    C = fx.shape[-1]
    HG = heads * slice_num
    plan = _plan_blocks(Hrows, W, C, HG, mlp_hidden)
    if plan is None:
        raise ValueError(
            f"fused_transolver_block: no kernel plan for grid {grid_shape} "
            f"C={C} heads={heads} G={slice_num} M={mlp_hidden} on this "
            "backend (shape exceeds the VMEM budget, or the masked-tail "
            "path is gated off -- see _padded_ok); check supported() first"
        )
    R, Hp, Rn = plan
    return _Cfg(
        (Hp, W), heads, slice_num, mlp_hidden, clamp,
        jnp.bfloat16 if fx.dtype == jnp.bfloat16 else jnp.float32,
        R, Rn, htot=Hrows,
    )


def _attn(tok, params, D):
    from .attention import slice_token_attention

    return slice_token_attention(
        tok, params["wq"], params["wk"], params["wv"], D ** -0.5
    )


def _block_fwd_impl(fx, params, cfg):
    B, N, C = fx.shape
    Hrows, W = cfg.grid_shape
    xg = fx.reshape(B, Hrows, W, C)
    if cfg.space_axis is not None:
        row0 = jax.lax.axis_index(cfg.space_axis).astype(jnp.int32) * Hrows
        halo = _space_halo(xg, cfg.space_axis, cfg.space_size)
        w, xf, tok_p, norm = _front(xg, params, cfg, row0=row0, halo=halo)
        # token sums / slice norms are partials over this shard's rows
        tok_p, norm = jax.lax.psum((tok_p, norm), cfg.space_axis)
    else:
        w, xf, tok_p, norm = _front(xg, params, cfg)
    tok, norm = _unpack_tokens(tok_p, norm, cfg.heads, cfg.G, C)
    otok = _attn(tok, params, C // cfg.heads)
    aexp = _blockdiag_tokens(otok.astype(jnp.float32))
    out = _back(w, fx, aexp, params, cfg)
    return out, (w, xf, tok, norm, otok)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_block(fx, params, cfg):
    out, _ = _block_fwd_impl(fx, params, cfg)
    return out


def _fused_block_fwd(fx, params, cfg):
    out, (w, xf, tok, norm, otok) = _block_fwd_impl(fx, params, cfg)
    return out, (fx, params, w, xf, tok, norm, otok)


def _bwd_back(w, fx, aexp, dout, params, cfg):
    B, N, C = fx.shape
    HG = aexp.shape[1]
    Rn, cdt, M = cfg.Rn, cfg.cdt, cfg.M
    grid = (B, N // Rn)
    bs = pl.BlockSpec
    pp = lambda key: params[key].astype(jnp.float32).reshape(1, -1)
    outs = pl.pallas_call(
        functools.partial(_bwd_back_kernel, cdt=cdt),
        grid=grid,
        in_specs=[
            bs((1, Rn, HG), lambda i, j: (i, j, 0)),
            bs((1, Rn, C), lambda i, j: (i, j, 0)),
            bs((1, HG, C), lambda i, j: (i, 0, 0)),
            bs((1, Rn, C), lambda i, j: (i, j, 0)),
            bs((C, C), lambda i, j: (0, 0)),
            bs((1, C), lambda i, j: (0, 0)),
            bs((1, C), lambda i, j: (0, 0)),
            bs((1, C), lambda i, j: (0, 0)),
            bs((C, M), lambda i, j: (0, 0)),
            bs((1, M), lambda i, j: (0, 0)),
            bs((M, C), lambda i, j: (0, 0)),
            bs((1, C), lambda i, j: (0, 0)),
        ],
        out_specs=[
            bs((1, Rn, C), lambda i, j: (i, j, 0)),
            bs((1, Rn, HG), lambda i, j: (i, j, 0)),
            bs((1, HG, C), lambda i, j: (i, 0, 0)),
            bs((1, C, C), lambda i, j: (i, 0, 0)),
            bs((1, 1, C), lambda i, j: (i, 0, 0)),
            bs((1, 1, C), lambda i, j: (i, 0, 0)),
            bs((1, 1, C), lambda i, j: (i, 0, 0)),
            bs((1, C, M), lambda i, j: (i, 0, 0)),
            bs((1, 1, M), lambda i, j: (i, 0, 0)),
            bs((1, M, C), lambda i, j: (i, 0, 0)),
            bs((1, 1, C), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), jnp.float32),
            jax.ShapeDtypeStruct((B, N, HG), cdt),
            jax.ShapeDtypeStruct((B, HG, C), jnp.float32),
            jax.ShapeDtypeStruct((B, C, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, C, M), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, M), jnp.float32),
            jax.ShapeDtypeStruct((B, M, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(
        w, fx, aexp.astype(jnp.float32), dout,
        params["out_kernel"].astype(cdt), pp("out_bias"),
        pp("ln2_scale"), pp("ln2_bias"),
        params["w1"].astype(cdt), pp("b1"), params["w2"].astype(cdt), pp("b2"),
    )
    return outs


def _bwd_slice(xf, w, dwd, dtrawexp, dsexp, params, cfg):
    B, N, C2 = xf.shape
    C = C2 // 2
    HG = dtrawexp.shape[1]
    Rn, cdt = cfg.Rn, cfg.cdt
    kexp, _, invt, seg = _prep_packed(params, cfg.heads, cfg.G, cfg.clamp)
    grid = (B, N // Rn)
    bs = pl.BlockSpec
    return pl.pallas_call(
        functools.partial(_bwd_slice_kernel, C=C, cdt=cdt),
        grid=grid,
        in_specs=[
            bs((1, Rn, 2 * C), lambda i, j: (i, j, 0)),
            bs((1, Rn, HG), lambda i, j: (i, j, 0)),
            bs((1, Rn, HG), lambda i, j: (i, j, 0)),
            bs((1, HG, C), lambda i, j: (i, 0, 0)),
            bs((1, 1, HG), lambda i, j: (i, 0, 0)),
            bs((C, HG), lambda i, j: (0, 0)),
            bs((1, HG), lambda i, j: (0, 0)),
            bs((HG, cfg.heads), lambda i, j: (0, 0)),
        ],
        out_specs=[
            bs((1, Rn, 2 * C), lambda i, j: (i, j, 0)),
            bs((1, C, HG), lambda i, j: (i, 0, 0)),
            bs((1, 1, HG), lambda i, j: (i, 0, 0)),
            bs((1, 1, HG), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, 2 * C), cdt),
            jax.ShapeDtypeStruct((B, C, HG), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, HG), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, HG), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(xf, w, dwd, dtrawexp, dsexp, kexp, invt, seg)


def _bwd_conv(fx, dxf, drdir, params, cfg, row0=0, halo_x=None, halo_d=None):
    B, N, C = fx.shape
    Hrows, W = cfg.grid_shape
    R = cfg.R
    nb = Hrows // R
    cdt = cfg.cdt
    xg = fx.reshape(B, Hrows, W, C)
    xp = _pad_rows(xg, R, nb, halo_x)
    dg = dxf.reshape(B, Hrows, W, 2 * C)
    dp = _pad_rows(dg, R, nb, halo_d)
    rm = _row_validity(Hrows, R, nb, row0, cfg.htot)
    drg = drdir.reshape(B, Hrows, W, C)
    g1 = params["ln1_scale"].astype(jnp.float32).reshape(1, C)
    b1 = params["ln1_bias"].astype(jnp.float32).reshape(1, C)
    kc = params["conv_kernel"].astype(cdt)
    grid = (B, nb)
    bs = pl.BlockSpec
    return pl.pallas_call(
        functools.partial(_bwd_conv_kernel, R=R, W=W, C=C, cdt=cdt),
        grid=grid,
        in_specs=[
            bs((1, R, W + 2, C), lambda i, j: (i, j, 0, 0)),
            bs((1, R, W + 2, C), lambda i, j: (i, j + 1, 0, 0)),
            bs((1, R, W + 2, 2 * C), lambda i, j: (i, j, 0, 0)),
            bs((1, R, W + 2, 2 * C), lambda i, j: (i, j + 1, 0, 0)),
            bs((R, 128), lambda i, j: (j, 0)),
            bs((R, 128), lambda i, j: (j + 1, 0)),
            bs((1, R, W, C), lambda i, j: (i, j, 0, 0)),
            bs((1, C), lambda i, j: (0, 0)),
            bs((1, C), lambda i, j: (0, 0)),
            bs((3, 3, C, 2 * C), lambda i, j: (0, 0, 0, 0)),
        ],
        out_specs=[
            bs((1, R, W, C), lambda i, j: (i, j, 0, 0)),
            bs((1, 3, 3, C, 2 * C), lambda i, j: (i, 0, 0, 0, 0)),
            bs((1, 1, C), lambda i, j: (i, 0, 0)),
            bs((1, 1, C), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hrows, W, C), fx.dtype),
            jax.ShapeDtypeStruct((B, 3, 3, C, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(xp, xp, dp, dp, rm, rm, drg, g1, b1, kc)


def _fused_block_bwd(cfg, res, dout):
    fx, params, w, xf, tok, norm, otok = res
    B, N, C = fx.shape
    heads, G = cfg.heads, cfg.G
    D = C // heads
    HG = heads * G
    aexp = _blockdiag_tokens(otok.astype(jnp.float32))

    (drdir, dwd, daexp, dwo_b, dbo_b, dg2_b, db2_b,
     dw1_b, dbm1_b, dw2_b, dbm2_b) = _bwd_back(w, fx, aexp, dout, params, cfg)

    if cfg.space_axis is not None:
        # daexp is a partial sum over this shard's N rows; the attention
        # backward below needs the full reduction
        daexp = jax.lax.psum(daexp, cfg.space_axis)

    dotok = jnp.einsum("bhghd->bhgd", daexp.reshape(B, heads, G, heads, D))
    _, attn_vjp = jax.vjp(
        lambda t, q, k, v: _attn(t, {"wq": q, "wk": k, "wv": v}, D),
        tok, params["wq"], params["wk"], params["wv"],
    )
    dtok, dwq, dwk, dwv = attn_vjp(dotok)

    denom = (norm + 1e-5)[..., None]
    dtraw = dtok / denom
    ds = -jnp.sum(dtok * tok, axis=-1) / (norm + 1e-5)
    dtrawexp = _blockdiag_tokens(dtraw)
    dsexp = ds.reshape(B, 1, HG)

    dxf, dkexp_b, dbexp_b, dinvt_b = _bwd_slice(
        xf, w, dwd, dtrawexp, dsexp, params, cfg
    )
    if cfg.space_axis is not None:
        Hrows, W = cfg.grid_shape
        row0 = jax.lax.axis_index(cfg.space_axis).astype(jnp.int32) * Hrows
        halo_x = _space_halo(
            fx.reshape(B, Hrows, W, C), cfg.space_axis, cfg.space_size)
        halo_d = _space_halo(
            dxf.reshape(B, Hrows, W, 2 * C), cfg.space_axis, cfg.space_size)
        dtot, dkc_b, dg1_b, db1_b = _bwd_conv(
            fx, dxf, drdir, params, cfg,
            row0=row0, halo_x=halo_x, halo_d=halo_d)
    else:
        dtot, dkc_b, dg1_b, db1_b = _bwd_conv(fx, dxf, drdir, params, cfg)

    dks = jnp.einsum("hdhg->dg", dkexp_b.sum(0).reshape(heads, D, heads, G))
    dbs = dbexp_b.sum(axis=(0, 1)).reshape(heads, G).sum(0)
    dinvt_h = dinvt_b.sum(axis=(0, 1)).reshape(heads, G).sum(-1)
    tau = params["temperature"].reshape(heads).astype(jnp.float32)
    tau_c = jnp.clip(tau, 0.1, 5.0) if cfg.clamp else tau
    dtau = -dinvt_h / (tau_c ** 2)
    if cfg.clamp:
        dtau = jnp.where((tau >= 0.1) & (tau <= 5.0), dtau, 0.0)

    p = params
    dparams = {
        "ln1_scale": dg1_b.sum(axis=(0, 1)).astype(p["ln1_scale"].dtype),
        "ln1_bias": db1_b.sum(axis=(0, 1)).astype(p["ln1_bias"].dtype),
        "conv_kernel": dkc_b.sum(0).astype(p["conv_kernel"].dtype),
        "conv_bias": dxf.astype(jnp.float32).sum(axis=(0, 1)).astype(
            p["conv_bias"].dtype),
        "slice_kernel": dks.astype(p["slice_kernel"].dtype),
        "slice_bias": dbs.astype(p["slice_bias"].dtype),
        "temperature": dtau.reshape(p["temperature"].shape).astype(
            p["temperature"].dtype),
        "wq": dwq, "wk": dwk, "wv": dwv,
        "out_kernel": dwo_b.sum(0).astype(p["out_kernel"].dtype),
        "out_bias": dbo_b.sum(axis=(0, 1)).astype(p["out_bias"].dtype),
        "ln2_scale": dg2_b.sum(axis=(0, 1)).astype(p["ln2_scale"].dtype),
        "ln2_bias": db2_b.sum(axis=(0, 1)).astype(p["ln2_bias"].dtype),
        "w1": dw1_b.sum(0).astype(p["w1"].dtype),
        "b1": dbm1_b.sum(axis=(0, 1)).astype(p["b1"].dtype),
        "w2": dw2_b.sum(0).astype(p["w2"].dtype),
        "b2": dbm2_b.sum(axis=(0, 1)).astype(p["b2"].dtype),
    }
    if cfg.data_axis is not None or cfg.space_axis is not None:
        # replicate the parameter gradients across the mesh.  wq/wk/wv are
        # already space-invariant (computed from the space-psummed daexp),
        # so they only reduce over 'data'; everything else is a partial over
        # both the local batch and the local N rows.
        axes_all = tuple(a for a in (cfg.data_axis, cfg.space_axis) if a)
        attn_keys = ("wq", "wk", "wv")
        rest = jax.lax.psum(
            {k: v for k, v in dparams.items() if k not in attn_keys}, axes_all
        )
        attn = {k: dparams[k] for k in attn_keys}
        if cfg.data_axis is not None:
            attn = jax.lax.psum(attn, cfg.data_axis)
        dparams = {**rest, **attn}
    dtot = dtot.reshape(B, N, C).astype(fx.dtype)
    return dtot, dparams


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


# --------------------------------------------------------------------------
# Multi-chip path: GSPMD has no partitioning rules for custom calls, so a
# pallas_call under a sharded jit degrades to a fully-replicated all-gather.
# Instead the fused block wraps itself in shard_map over the trainers'
# ('data', 'space') mesh (parallel.mesh.active_mesh): batch over 'data',
# grid rows over 'space', with explicit collectives -- ppermute conv-halo
# rows, psum of the slice-token partials (fwd) / dAexp + parameter gradients
# (bwd).  SURVEY 2.9-2.10; closes round-2 VERDICT gap 3 (bench.py's
# multi-chip XLA fallback).
# --------------------------------------------------------------------------


def _mesh_factors(mesh):
    if mesh is None:
        return 1, 1
    return mesh.shape.get("data", 1), mesh.shape.get("space", 1)


def _smap(f, mesh, in_specs, out_specs):
    try:
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:
        from jax.experimental.shard_map import shard_map

        return shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )


def _sharded_cfg(fx_shape, dtype, grid_shape, heads, slice_num, mlp_hidden,
                 clamp, mesh):
    """Per-shard _Cfg for the mesh, or None if shapes don't shard cleanly.

    ``cfg.grid_shape`` is the per-shard PADDED height Hlp (a multiple of
    the row block R; the caller pads the global grid to s*Hlp rows);
    ``cfg.htot`` stays the global TRUE height, so only the tail shard's
    padding rows go invalid in ``_row_validity``.
    """
    d, s = _mesh_factors(mesh)
    B, N, C = fx_shape
    Hrows, W = grid_shape
    if B % d:
        return None
    HG = heads * slice_num
    # Plan on the even per-shard share; pad the share up to a multiple of
    # the chosen R (also covers Hrows % s != 0: the global grid is padded
    # to s * Hlp rows and the tail masked).
    plan = _plan_blocks(-(-Hrows // s), W, C, HG, mlp_hidden)
    if plan is None:
        return None
    R, Hlp, Rn = plan
    return _Cfg(
        (Hlp, W), heads, slice_num, mlp_hidden, clamp,
        jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32, R, Rn,
        htot=Hrows,
        data_axis="data" if d > 1 else None,
        space_axis="space" if s > 1 else None,
        space_size=s,
    )


def _pspecs():
    from jax.sharding import PartitionSpec as P

    return P("data", "space", None), P("data"), P()


def _sharded_fwd_parts(fx, params, cfg, mesh):
    pspec, bspec, rspec = _pspecs()

    def body(fx_l, params_r):
        return _block_fwd_impl(fx_l, params_r, cfg)

    out_specs = (pspec, (pspec, pspec, bspec, bspec, bspec))
    return _smap(
        body, mesh, in_specs=(pspec, rspec), out_specs=out_specs
    )(fx, params)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_block_sharded(fx, params, cfg, mesh):
    out, _ = _sharded_fwd_parts(fx, params, cfg, mesh)
    return out


def _fused_block_sharded_fwd(fx, params, cfg, mesh):
    out, (w, xf, tok, norm, otok) = _sharded_fwd_parts(fx, params, cfg, mesh)
    return out, (fx, params, w, xf, tok, norm, otok)


def _fused_block_sharded_bwd(cfg, mesh, res, dout):
    fx, params, w, xf, tok, norm, otok = res
    pspec, bspec, rspec = _pspecs()

    def body(fx_l, params_r, w_l, xf_l, tok_l, norm_l, otok_l, dout_l):
        return _fused_block_bwd(
            cfg, (fx_l, params_r, w_l, xf_l, tok_l, norm_l, otok_l), dout_l
        )

    dtot, dparams = _smap(
        body, mesh,
        in_specs=(pspec, rspec, pspec, pspec, bspec, bspec, bspec, pspec),
        out_specs=(pspec, rspec),
    )(fx, params, w, xf, tok, norm, otok, dout)
    return dtot, dparams


_fused_block_sharded.defvjp(_fused_block_sharded_fwd, _fused_block_sharded_bwd)


def fused_transolver_block(fx, params, *, grid_shape, heads, slice_num,
                           mlp_hidden, clamp_temperature=True):
    """Run one full Transolver block through the fused Pallas megakernel.

    fx: [B, N, C] residual stream (N = H*W row-major).  ``params`` keys:
    ln1_scale/bias, conv_kernel [3,3,C,2C] (in_project_x ++ in_project_fx),
    conv_bias [2C], slice_kernel [D,G], slice_bias [G], temperature [1,H,1,1],
    wq/wk/wv [D,D], out_kernel [C,C], out_bias [C], ln2_scale/bias,
    w1 [C,M], b1 [M], w2 [M,C], b2 [C].
    """
    Hrows, W = grid_shape
    mesh = _active_mesh()
    if mesh is not None:
        cfg = _sharded_cfg(
            fx.shape, fx.dtype, grid_shape, heads, slice_num, mlp_hidden,
            clamp_temperature, mesh,
        )
        if cfg is not None:
            fx_p, n_true = _pad_grid_rows(fx, Hrows, W,
                                          cfg.grid_shape[0] * cfg.space_size)
            out = _fused_block_sharded(fx_p, params, cfg, mesh)
            return out if out.shape[1] == n_true else out[:, :n_true]
    cfg = _make_cfg(fx, grid_shape, heads, slice_num, mlp_hidden,
                    clamp_temperature)
    fx_p, n_true = _pad_grid_rows(fx, Hrows, W, cfg.grid_shape[0])
    out = _fused_block(fx_p, params, cfg)
    return out if out.shape[1] == n_true else out[:, :n_true]


def _pad_grid_rows(fx, Hrows, W, Hp):
    """Zero-pad [B, H*W, C] to [B, Hp*W, C] along the row-major grid rows.

    The masked tail (``_row_validity``/w-mask in the kernels) makes the
    padding rows inert: zero slice weights forward, zero cotangents
    backward (the caller's slice transposes to a zero-pad), so values and
    gradients match the unpadded XLA block on the true H rows exactly.
    """
    B, N, C = fx.shape
    if Hp == Hrows:
        return fx, N
    pad = (Hp - Hrows) * W
    return jnp.pad(fx, ((0, 0), (0, pad), (0, 0))), N
