#!/usr/bin/env python
"""TPU diagnostic for the masked-tail megakernel gradient bug (r4 probe
FAIL at 101x31: slice_kernel grad rel 0.77 on compiled Mosaic, input grads
clean, CPU interpret clean).

Checks, in order, at one padded-tail shape:
  1. forward parity (fused vs XLA block) on the VALID rows;
  2. the saved slice weights w: max |w| over the padded tail rows (must be
     exactly 0 -- the forward's w-mask is what kills every padded-row term
     in the backward kernels);
  3. per-parameter gradient rel errors (every key, not just the worst).

Usage: python tools/probe_mega_diag.py [H W C heads G]
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from transformerbasednavierstokesolver_tpu.models.transolver import TransolverBlock
from transformerbasednavierstokesolver_tpu.ops import pallas_block
from tests.test_pallas_block import _extract_params, _rel


def main(H, W, C, heads, G, B=2, seed=0):
    block = TransolverBlock(
        num_heads=heads, hidden_dim=C, mlp_ratio=2, slice_num=G,
        geometry="grid2d", grid_shape=(H, W),
    )
    rng = np.random.default_rng(seed)
    fx = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(seed), fx)
    mp = _extract_params(variables["params"])
    ct = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)

    HG = heads * G
    cfg = pallas_block._make_cfg(fx, (H, W), heads, G, C * 2, True)
    Hp = cfg.grid_shape[0]
    print(f"plan: R={cfg.R} Hp={Hp} Rn={cfg.Rn} backend={jax.default_backend()}",
          flush=True)

    # ---- 1+2: forward internals --------------------------------------
    pad = Hp * W - H * W

    def fwd_parts(fx_, mp_):
        fxp = jnp.pad(fx_, ((0, 0), (0, pad), (0, 0)))
        out, (w, xf, tok, norm, otok) = pallas_block._block_fwd_impl(
            fxp, mp_, cfg)
        return out, w

    out_f, w = jax.jit(fwd_parts)(fx, mp)
    out_ref = jax.jit(lambda fx_: block.apply({"params": variables["params"]},
                                              fx_))(fx)
    fwd_rel = float(_rel(out_f[:, :H * W], out_ref))
    wtail = float(jnp.max(jnp.abs(w[:, H * W:]))) if pad else 0.0
    wvalid = float(jnp.max(jnp.abs(w[:, :H * W])))
    print(f"fwd rel={fwd_rel:.3e}  w tail max={wtail:.3e} "
          f"(valid max={wvalid:.3e}, pad rows={pad})", flush=True)

    # ---- 3: per-key grads --------------------------------------------
    def loss_ref(fx_, tree):
        return jnp.sum(block.apply({"params": tree}, fx_) * ct)

    def loss_mega(fx_, mp_):
        out = pallas_block.fused_transolver_block(
            fx_, mp_, grid_shape=(H, W), heads=heads, slice_num=G,
            mlp_hidden=C * 2,
        )
        return jnp.sum(out * ct)

    gfx_ref, gtree = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(
        fx, variables["params"])
    gfx, gmp = jax.jit(jax.grad(loss_mega, argnums=(0, 1)))(fx, mp)
    gmp_ref = _extract_params(gtree)
    print(f"input rel={float(_rel(gfx, gfx_ref)):.3e}", flush=True)
    for key in sorted(gmp):
        r = float(_rel(gmp[key], gmp_ref[key]))
        flag = "  <-- BAD" if r > 1e-4 else ""
        print(f"  {key:12s} rel={r:.3e}{flag}", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:6]] or [101, 31, 128, 8, 64]
    main(*args)
