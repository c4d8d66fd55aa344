#!/usr/bin/env python
"""Per-benchmark train-step throughput sweep (the non-flagship shapes).

``bench.py`` tracks the NS flagship BPTT step; this sweep times one steady
supervised train step (fwd+bwd+update) at every other benchmark's canonical
shape and config (scripts/Transolver_*.sh), for both the XLA and fused
Pallas (mega) paths where the shape qualifies, so "fast" is demonstrated
beyond the single flagship workload (round-2 VERDICT weak #7).

Shapes: Darcy 85x85 (downsample 5), Airfoil 221x51, Pipe 129x129,
Plasticity 101x31, Elasticity 972-pt irregular cloud (batch 1, reference
script), plus a 32^3 structured-3D probe.

Run on the TPU: ``python tools/bench_shapes.py``.  One JSON line per row.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_step(model, sample_args, bsz, n_steps=None, extra=None):
    n_steps = n_steps or int(os.environ.get("BENCH_SWEEP_STEPS", "10"))
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transformerbasednavierstokesolver_tpu.train.loop import (
        create_train_state,
        make_update_fn,
    )
    from transformerbasednavierstokesolver_tpu.train.optim import make_optimizer
    from transformerbasednavierstokesolver_tpu.utils.losses import rel_lp

    rng = np.random.default_rng(0)
    args = tuple(
        jnp.asarray(rng.normal(size=(bsz,) + a.shape[1:]), jnp.float32)
        for a in sample_args
    )
    y = jnp.asarray(rng.normal(size=args[0].shape[:2] + (1,)), jnp.float32)

    def loss_fn(params, apply_fn, *batch):
        *xs, yy = batch
        im = apply_fn({"params": params}, *xs)
        b = yy.shape[0]
        return rel_lp(im.reshape(b, -1), yy.reshape(b, -1), reduction="sum"), {}

    tx = make_optimizer(1e-3, 10000, 1e-5, None)
    state = create_train_state(
        jax.random.PRNGKey(0), model, tuple(a[:1] for a in args), tx
    )
    update = make_update_fn(loss_fn, donate=True)
    state, (loss, _) = update(state, *args, y)
    float(loss)  # sync (block_until_ready under-reports through the relay)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, (loss, _) = update(state, *args, y)
    float(loss)
    dt = (time.perf_counter() - t0) / n_steps
    return bsz / dt, dt


def main():
    from transformerbasednavierstokesolver_tpu.utils.platform import (
        select_platform,
    )

    select_platform()
    import jax.numpy as jnp

    from transformerbasednavierstokesolver_tpu.models import get_model

    dtype = (jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
             else None)
    impls = os.environ.get("BENCH_IMPLS", "xla,mega").split(",")

    common = dict(n_layers=8, n_head=8, dropout=0.0, mlp_ratio=1, ref=8,
                  dtype=dtype)
    cases = [
        # (name, model_name, kwargs, (H, W[, D]), bsz, fun_dim)
        ("darcy_85x85", "Transolver_Structured_Mesh_2D",
         dict(n_hidden=128, slice_num=64, unified_pos=True), (85, 85), 4, 1),
        ("airfoil_221x51", "Transolver_Structured_Mesh_2D",
         dict(n_hidden=128, slice_num=64, unified_pos=False), (221, 51), 4, 0),
        ("pipe_129x129", "Transolver_Structured_Mesh_2D",
         dict(n_hidden=128, slice_num=64, unified_pos=False, mlp_ratio=2),
         (129, 129), 8, 0),
        ("plas_101x31", "Transolver_Structured_Mesh_2D",
         dict(n_hidden=128, slice_num=64, unified_pos=False), (101, 31), 8, 1),
        ("elas_972pt_irregular", "Transolver_Irregular_Mesh",
         dict(n_hidden=128, slice_num=64, unified_pos=False), (972,), 1, 0),
        ("ns3d_32cube", "Transolver_Structured_Mesh_3D",
         dict(n_hidden=128, slice_num=32, unified_pos=False), (32, 32, 32),
         2, 1),
    ]

    only = os.environ.get("BENCH_CASES")
    if only:
        cases = [c for c in cases if any(s in c[0] for s in only.split(","))]

    for name, model_name, kw, shape, bsz, fun_dim in cases:
        n = 1
        for s in shape:
            n *= s
        for impl in impls:
            if impl != "xla" and model_name != "Transolver_Structured_Mesh_2D":
                continue  # fused block kernels cover the structured-2D path
            kwargs = dict(common)
            kwargs.update(kw)
            kwargs.update(space_dim=len(shape) if len(shape) > 1 else 2,
                          fun_dim=fun_dim, out_dim=1, impl=impl)
            if model_name == "Transolver_Structured_Mesh_2D":
                kwargs.update(H=shape[0], W=shape[1])
            elif model_name == "Transolver_Structured_Mesh_3D":
                kwargs.update(H=shape[0], W=shape[1], D=shape[2], space_dim=3)
            try:
                model = get_model(model_name)(**kwargs)
                sample = [jnp.zeros((1, n, kwargs["space_dim"]))]
                if fun_dim:
                    sample.append(jnp.zeros((1, n, fun_dim)))
                sps, dt = time_step(model, sample, bsz)
                print(json.dumps({
                    "case": name, "impl": impl, "batch": bsz,
                    "points": n, "ms_per_step": round(dt * 1e3, 2),
                    "samples_per_sec": round(sps, 2),
                }))
            except Exception as e:  # report, keep sweeping
                print(json.dumps({
                    "case": name, "impl": impl,
                    "error": f"{type(e).__name__}: {str(e)[:160]}",
                }))


if __name__ == "__main__":
    main()
