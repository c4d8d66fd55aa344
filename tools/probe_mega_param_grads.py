#!/usr/bin/env python
"""TPU probe: FULL gradient parity (input + every parameter, incl. the
slice projection/temperature) of the fused megakernel vs the XLA block at
padded-tail benchmark shapes.

Round-4 context: the masked row tail (ops/pallas_block.py) was
TPU-verified for forward + input grad at 85^2/101x31/129^2; the
slice-PARAM grads at 101x31 remained unverified on real Mosaic, so the
r4 trainers stayed on the XLA block (scripts/r4_queue.sh).  A clean pass
here unlocks --impl mega for the plas/darcy/pipe trainers in round 5.

Usage: python tools/probe_mega_param_grads.py [H W C heads G]
Prints one line per shape: PASS/FAIL + worst key + rel err.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# kernel-evidence tooling exercises the padded masked-tail plans even
# though they are opt-in for training (see pallas_block._padded_ok)
os.environ.setdefault("TBNSS_MEGA_PADDED", "1")

import numpy as np
import jax
import jax.numpy as jnp

from transformerbasednavierstokesolver_tpu.models.transolver import TransolverBlock
from transformerbasednavierstokesolver_tpu.ops import pallas_block
from tests.test_pallas_block import _extract_params, _rel


def probe(H, W, C, heads, G, B=2, seed=0):
    block = TransolverBlock(
        num_heads=heads, hidden_dim=C, mlp_ratio=2, slice_num=G,
        geometry="grid2d", grid_shape=(H, W),
    )
    rng = np.random.default_rng(seed)
    fx = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(seed), fx)
    mp = _extract_params(variables["params"])
    ct = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)

    def loss_ref(fx_, tree):
        return jnp.sum(block.apply({"params": tree}, fx_) * ct)

    def loss_mega(fx_, mp_):
        out = pallas_block.fused_transolver_block(
            fx_, mp_, grid_shape=(H, W), heads=heads, slice_num=G,
            mlp_hidden=C * 2,
        )
        return jnp.sum(out * ct)

    # Both grad sets must be computed at matmul precision 'highest': TPU
    # default precision (single-pass bf16 MXU for f32 operands) perturbs
    # the cancellation-heavy slice_kernel/temperature grads by O(1e-1) in
    # BOTH implementations -- comparing a default-precision run of either
    # side against anything measures bf16 roundoff, not kernel
    # correctness.  That artifact was the r4 "Mosaic bug" false positive
    # (logs/probe_mega_precision_r5.log attributes it; at 'highest' the
    # two implementations agree to <=5.4e-5 on the real chip).
    with jax.default_matmul_precision("highest"):
        gfx_ref, gtree = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(
            fx, variables["params"])
        gfx, gmp = jax.jit(jax.grad(loss_mega, argnums=(0, 1)))(fx, mp)
    gmp_ref = _extract_params(gtree)

    worst_key, worst = "input", float(_rel(gfx, gfx_ref))
    for key in gmp:
        r = float(_rel(gmp[key], gmp_ref[key]))
        if r > worst:
            worst_key, worst = key, r
    ok = worst < 1e-4
    print(
        f"{'PASS' if ok else 'FAIL'} {H}x{W} C={C} h={heads} G={G} "
        f"worst={worst_key} rel={worst:.3e} "
        f"(input rel={float(_rel(gfx, gfx_ref)):.3e}) "
        f"backend={jax.default_backend()}",
        flush=True,
    )
    return ok


if __name__ == "__main__":
    if len(sys.argv) == 6:
        shapes = [tuple(int(a) for a in sys.argv[1:6])]
    else:
        # all four padded-tail benchmark grids at canonical width
        # (scripts/Transolver_{Plas,Darcy,Pipe,Airfoil}.sh)
        shapes = [(101, 31, 128, 8, 64), (85, 85, 128, 8, 64),
                  (129, 129, 128, 8, 64), (221, 51, 128, 8, 64)]
    ok = all([probe(*s) for s in shapes])
    sys.exit(0 if ok else 1)
