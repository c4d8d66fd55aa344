#!/usr/bin/env python
"""TPU stage-2 diagnostic: A/B each megakernel backward kernel
compiled-Mosaic vs interpret ON THE SAME CHIP, at the failing 101x31
plasticity shape, with synthetic cotangents.  Pinpoints which kernel (and
which output of it) Mosaic miscompiles.

Interpret-mode pallas lowers to plain lax ops (correct math; the CPU test
suite pins it against the XLA block), so compiled-vs-interpret deltas on
identical inputs isolate the Mosaic lowering bug without needing the XLA
block recompiled.

Usage: python tools/probe_mega_stage2.py [H W C heads G]
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TBNSS_MEGA_PADDED", "1")

import numpy as np
import jax
import jax.numpy as jnp

from transformerbasednavierstokesolver_tpu.ops import pallas_block as pb


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    d = np.linalg.norm((a - b).ravel())
    n = np.linalg.norm(b.ravel())
    return d / (n + 1e-30)


def _mk_params(key, C, heads, G, M):
    ks = jax.random.split(key, 16)
    n = lambda i, shape, s=0.2: jax.random.normal(ks[i], shape, jnp.float32) * s
    D = C // heads
    return {
        "ln1_scale": jnp.ones((C,)) + n(0, (C,), 0.05),
        "ln1_bias": n(1, (C,), 0.05),
        "conv_kernel": n(2, (3, 3, C, 2 * C), 0.1),
        "conv_bias": n(3, (2 * C,), 0.05),
        "slice_kernel": n(4, (D, G)),
        "slice_bias": n(5, (G,), 0.05),
        "temperature": jnp.full((1, heads, 1, 1), 0.5),
        "wq": n(6, (D, D)),
        "wk": n(7, (D, D)),
        "wv": n(8, (D, D)),
        "out_kernel": n(9, (C, C)),
        "out_bias": n(10, (C,), 0.05),
        "ln2_scale": jnp.ones((C,)) + n(11, (C,), 0.05),
        "ln2_bias": n(12, (C,), 0.05),
        "w1": n(13, (C, M)),
        "b1": n(14, (M,), 0.05),
        "w2": n(15, (M, C)),
        "b2": jnp.zeros((C,)),
    }


def main(H, W, C, heads, G, B=2, seed=0):
    M = 2 * C
    HG = heads * G
    params = _mk_params(jax.random.PRNGKey(seed), C, heads, G, M)
    rng = np.random.default_rng(seed)
    fx = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)

    cfg = pb._make_cfg(fx, (H, W), heads, G, M, True)
    Hp = cfg.grid_shape[0]
    pad = Hp * W - H * W
    fxp = jnp.pad(fx, ((0, 0), (0, pad), (0, 0)))
    Np = Hp * W
    print(f"plan R={cfg.R} Hp={Hp} Rn={cfg.Rn} pad={pad} "
          f"backend={jax.default_backend()}", flush=True)

    orig_interp = pb._interpret

    def run(interp, fn, *args):
        pb._interpret = (lambda: True) if interp else orig_interp
        try:
            return jax.jit(fn)(*args)
        finally:
            pb._interpret = orig_interp

    def cmp(tag, got, want):
        if isinstance(got, (tuple, list)):
            for k, (g, w_) in enumerate(zip(got, want)):
                print(f"  {tag}[{k}] rel={_rel(g, w_):.3e}", flush=True)
        else:
            print(f"  {tag} rel={_rel(got, want):.3e}", flush=True)

    # ---- front ----
    front = lambda x, p: pb._front(
        x.reshape(B, Hp, W, C), p, cfg)
    f_c = run(False, front, fxp, params)
    f_i = run(True, front, fxp, params)
    print("front (w, xf, tok_p, norm):", flush=True)
    cmp("front", f_c, f_i)
    w_i, xf_i = f_i[0], f_i[1]
    wt = float(jnp.max(jnp.abs(f_c[0][:, H * W:]))) if pad else 0.0
    print(f"  compiled w tail max={wt:.3e}", flush=True)

    # ---- synthetic mid-pass values (from interpret fwd, shared by both) ----
    tok, norm = pb._unpack_tokens(f_i[2], f_i[3], heads, G, C)
    otok = pb._attn(tok, params, C // heads)
    from transformerbasednavierstokesolver_tpu.ops.pallas_attention_v2 import (
        _blockdiag_tokens,
    )
    aexp = _blockdiag_tokens(otok.astype(jnp.float32))
    dout = jnp.asarray(rng.normal(size=(B, Np, C)), jnp.float32)
    dout = dout.at[:, H * W:].set(0.0)  # cotangent of sliced-away rows = 0

    # ---- bwd_back ----
    bb = lambda w_, fx_, ae_, do_, p: pb._bwd_back(w_, fx_, ae_, do_, p, cfg)
    bb_c = run(False, bb, w_i, fxp, aexp, dout, params)
    bb_i = run(True, bb, w_i, fxp, aexp, dout, params)
    names = ["drdir", "dwd", "daexp", "dwo", "dbo", "dg2", "db2",
             "dw1", "dbm1", "dw2", "dbm2"]
    print("bwd_back:", flush=True)
    for nm, g, w_ in zip(names, bb_c, bb_i):
        print(f"  {nm:6s} rel={_rel(g, w_):.3e}", flush=True)

    # ---- bwd_slice ----
    dwd = bb_i[1]
    dtraw = jnp.asarray(rng.normal(size=(B, heads, G, C // heads)), jnp.float32)
    dtrawexp = _blockdiag_tokens(dtraw)
    dsexp = jnp.asarray(rng.normal(size=(B, 1, HG)), jnp.float32)
    bs_fn = lambda xf_, w_, a, b, c, p: pb._bwd_slice(xf_, w_, a, b, c, p, cfg)
    bs_c = run(False, bs_fn, xf_i, w_i, dwd, dtrawexp, dsexp, params)
    bs_i = run(True, bs_fn, xf_i, w_i, dwd, dtrawexp, dsexp, params)
    print("bwd_slice:", flush=True)
    for nm, g, w_ in zip(["dxf", "dkexp", "dbexp", "dinvt"], bs_c, bs_i):
        print(f"  {nm:6s} rel={_rel(g, w_):.3e}", flush=True)
    # dkexp head-diagonal blocks only (what slice_kernel actually consumes)
    D = C // heads
    dks_c = np.einsum("hdhg->dg", np.asarray(bs_c[1].sum(0)).reshape(
        heads, D, heads, G))
    dks_i = np.einsum("hdhg->dg", np.asarray(bs_i[1].sum(0)).reshape(
        heads, D, heads, G))
    print(f"  dks (diag blocks) rel={_rel(dks_c, dks_i):.3e}", flush=True)

    # ---- bwd_conv ----
    dxf = bs_i[0]
    drdir = bb_i[0]
    bc = lambda fx_, dxf_, dr_, p: pb._bwd_conv(fx_, dxf_, dr_, p, cfg)
    bc_c = run(False, bc, fxp, dxf, drdir, params)
    bc_i = run(True, bc, fxp, dxf, drdir, params)
    print("bwd_conv:", flush=True)
    for nm, g, w_ in zip(["dtot", "dkc", "dg1", "db1"], bc_c, bc_i):
        print(f"  {nm:6s} rel={_rel(g, w_):.3e}", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:6]] or [101, 31, 128, 8, 64]
    main(*args)
