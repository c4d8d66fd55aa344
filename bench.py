#!/usr/bin/env python
"""Headline benchmark: NS Transolver-8L teacher-forced training throughput.

Measures samples/sec/chip of the full jitted train step (10-step BPTT scan,
hidden 256, 8 heads, slice 32, unified_pos, 64x64 grid -- the
scripts/Transolver_NS.sh flagship config) on the available accelerator.
Default config is the fastest verified-correct one: bf16 compute (f32
params/softmax/head), unrolled layer scan, per-step remat, merged
projection convs, XLA attention core.  Knobs: BENCH_DTYPE=f32,
BENCH_IMPL=pallas, BENCH_REMAT=0, BENCH_UNROLL, BENCH_BATCH, BENCH_STEPS.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no speed numbers (BASELINE.md); vs_baseline compares
against the recorded first-round value in BENCH_BASELINE.json when present.
"""

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transformerbasednavierstokesolver_tpu.models import Transolver
    from transformerbasednavierstokesolver_tpu.train.autoregressive import (
        make_teacher_forced_loss,
    )
    from transformerbasednavierstokesolver_tpu.train.loop import (
        create_train_state,
        make_update_fn,
    )
    from transformerbasednavierstokesolver_tpu.train.optim import make_optimizer

    h, t_in, t_out = 64, 10, 10
    bsz = int(os.environ.get("BENCH_BATCH", "8"))
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))

    model = Transolver(
        space_dim=2, n_layers=8, n_hidden=256, n_head=8, fun_dim=t_in,
        out_dim=1, slice_num=32, ref=8, unified_pos=True, geometry="grid2d",
        H=h, W=h,
        impl=os.environ.get("BENCH_IMPL", "xla"),
        use_checkpoint=os.environ.get("BENCH_REMAT_BLOCKS", "0") == "1",
        conv_impl=os.environ.get("BENCH_CONV", "lax"),
        dtype=(jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
               else None),
    )
    rng = np.random.default_rng(0)
    x = jnp.zeros((bsz, h * h, 2), jnp.float32)
    fx = jnp.asarray(rng.normal(size=(bsz, h * h, t_in)), jnp.float32)
    yy = jnp.asarray(rng.normal(size=(bsz, h * h, t_out)), jnp.float32)

    tx = make_optimizer(1e-3, 10000, 1e-5, None)
    state = create_train_state(
        jax.random.PRNGKey(0), model, (x[:1], fx[:1]), tx
    )
    update = make_update_fn(
        make_teacher_forced_loss(
            step=1,
            remat=os.environ.get("BENCH_REMAT", "1") == "1",
            unroll=int(os.environ.get("BENCH_UNROLL", "1")),
            track_full=os.environ.get("BENCH_TRACK_FULL", "1") == "1",
        ),
        donate=True,
    )

    # warmup/compile (float() forces a device->host sync; block_until_ready
    # alone under-reports through the remote-relay TPU transport)
    state, (loss, _) = update(state, x, fx, yy)
    float(loss)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, (loss, _) = update(state, x, fx, yy)
    float(loss)
    dt = time.perf_counter() - t0

    n_chips = max(len(jax.devices()), 1)
    samples_per_sec = bsz * n_steps / dt / n_chips

    baseline = None
    if os.path.exists("BENCH_BASELINE.json"):
        with open("BENCH_BASELINE.json") as f:
            baseline = json.load(f).get("ns_train_samples_per_sec_per_chip")
    vs = samples_per_sec / baseline if baseline else 1.0

    print(
        json.dumps(
            {
                "metric": "ns_train_samples_per_sec_per_chip",
                "value": round(samples_per_sec, 3),
                "unit": "samples/s/chip",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
