#!/usr/bin/env python
"""Attribute the r4 'masked-tail slice-grad bug' between the megakernel
and matmul precision of the XLA reference block.

The r4 probe (logs/probe_mega_params_r4.log) compared megakernel grads
against the XLA TransolverBlock under the backend's DEFAULT matmul
precision.  On TPU, default precision lowers f32 matmuls to bf16 MXU
passes, while the Pallas kernels accumulate in f32
(preferred_element_type) -- so a large rel-err can mean "the reference
moved", not "the kernel is wrong".  This tool computes all four grad
sets at one shape and prints the cross-table:

    mega(default)  vs mega(highest)   -- kernel's own precision drift
    xla(default)   vs xla(highest)    -- reference's precision drift
    mega(highest)  vs xla(highest)    -- true mathematical parity
    mega(default)  vs xla(highest)    -- what training-with-mega deploys

If row 2 reproduces the r4 error while rows 1/3/4 are tiny, the Mosaic
lowering is correct and the r4 FAIL was the XLA block's bf16 grads.

Usage: python tools/probe_mega_precision.py [H W C heads G]
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TBNSS_MEGA_PADDED", "1")

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

    def loss_ref(fx_, tree):
        return jnp.sum(block.apply({"params": tree}, fx_) * ct)

    def loss_mega(fx_, mp_):
        out = pallas_block.fused_transolver_block(
            fx_, mp_, grid_shape=(H, W), heads=heads, slice_num=G,
            mlp_hidden=C * 2,
        )
        return jnp.sum(out * ct)

    def grads(fn, arg, prec):
        with jax.default_matmul_precision(prec):
            return jax.jit(jax.grad(fn, argnums=1))(fx, arg)

    print(f"backend={jax.default_backend()} shape={H}x{W} C={C} "
          f"heads={heads} G={G}", flush=True)
    mega_d = grads(loss_mega, mp, "default")
    print("compiled mega(default)", flush=True)
    mega_h = grads(loss_mega, mp, "highest")
    print("compiled mega(highest)", flush=True)
    xla_d = _extract_params(grads(loss_ref, variables["params"], "default"))
    print("compiled xla(default)", flush=True)
    xla_h = _extract_params(grads(loss_ref, variables["params"], "highest"))
    print("compiled xla(highest)", flush=True)

    def table(tag, a, b):
        worst_key, worst = None, -1.0
        for k in a:
            r = float(_rel(a[k], b[k]))
            if r > worst:
                worst_key, worst = k, r
        sk = float(_rel(a["slice_kernel"], b["slice_kernel"]))
        print(f"{tag:28s} worst={worst_key:12s} {worst:.3e}   "
              f"slice_kernel {sk:.3e}", flush=True)

    table("mega(def)  vs mega(high)", mega_d, mega_h)
    table("xla(def)   vs xla(high)", xla_d, xla_h)
    table("mega(high) vs xla(high)", mega_h, xla_h)
    table("mega(def)  vs xla(high)", mega_d, xla_h)
    table("xla(def)   vs mega(high)", xla_d, mega_h)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:6]] or [101, 31, 128, 8, 64]
    main(*args)
