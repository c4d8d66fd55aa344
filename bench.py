#!/usr/bin/env python
"""Headline benchmark: NS Transolver-8L teacher-forced training throughput.

Measures samples/sec/chip of the full jitted train step (10-step BPTT scan,
hidden 256, 8 heads, slice 32, unified_pos, 64x64 grid -- the
scripts/Transolver_NS.sh flagship config) on the available accelerator.
Default config is the fastest verified-correct one: bf16 compute (f32
params/softmax/head), unrolled layer scan, per-step remat, merged
projection convs, XLA attention core.  Knobs: BENCH_DTYPE=f32,
BENCH_IMPL=pallas, BENCH_REMAT=0, BENCH_UNROLL, BENCH_BATCH, BENCH_STEPS,
BENCH_PEAK_TFLOPS (per-chip bf16 peak for MFU; default 197 = TPU v5e).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"tflops_per_sec", "mfu", ...}.

On multi-chip hosts the batch is sharded over a ('data',) mesh before
timing, so samples/s/chip reflects genuinely distributed throughput rather
than a replicated computation divided by the device count.

The reference publishes no speed numbers (BASELINE.md); vs_baseline compares
against the recorded first-round value in BENCH_BASELINE.json when present.
"""

import json
import os


def _per_step_flops(cost_model, params, x, fx, n_rollout_steps):
    """Useful (fwd + bwd) model FLOPs of one train step.

    XLA's cost_analysis counts a ``lax.scan`` body ONCE regardless of trip
    count, so analysing the whole update under-reports the BPTT rollout by
    ~n_steps x.  Instead: count one jitted forward with the cost model and
    scale by rollout steps x 3 (backward ~ 2x forward for matmul-dominated
    nets; remat recompute is excluded -- standard "model FLOPs" accounting,
    so MFU honestly reflects the remat overhead).

    ``cost_model`` must be the *XLA-impl* model: cost_analysis cannot see
    inside Pallas custom calls, so costing an impl=mega/pallas forward
    under-reports by ~50x.  Costing the XLA twin keeps MFU comparable
    across BENCH_IMPL values (same useful-model-FLOP numerator).
    """
    import jax

    try:
        fwd = jax.jit(
            lambda p, x_, fx_: cost_model.apply({"params": p}, x_, fx_)
        )
        cost = fwd.lower(params, x, fx).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns per-device list
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops <= 0:
            return None
        return flops * n_rollout_steps * 3.0
    except Exception:
        return None


def main():
    from transformerbasednavierstokesolver_tpu.utils.platform import (
        select_platform,
    )

    select_platform()  # honors TBNSS_PLATFORM=cpu for off-TPU smokes

    import jax

    from transformerbasednavierstokesolver_tpu.utils.platform import (
        cpu_fallback_if_relay_dead,
    )

    # a dead relay HANGS device init; the shared probe pins CPU instead
    # (the downgrade is visible via the record's "platform" field)
    cpu_fallback_if_relay_dead()
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
    from transformerbasednavierstokesolver_tpu.utils.profiling import StepTimer

    h, t_in, t_out = 64, 10, 10
    # On CPU (explicit TBNSS_PLATFORM=cpu or the dead-relay fallback above)
    # the mega default would run the Pallas kernels in INTERPRET mode
    # (ops/pallas_block.py:_interpret) -- hours at flagship shape, which
    # reads as a hang.  Default to the XLA impl and a 2-step measurement
    # there instead; the record's "platform" field marks the downgrade.
    on_cpu = jax.default_backend() == "cpu"
    # The CPU fallback exists so a dead relay yields a valid JSON line
    # instead of a hang; its value is NOT comparable to the TPU number
    # either way ("platform" marks the downgrade).  This host has ONE
    # 2.1 GHz core (~1 GFLOP/s measured): the flagship step is ~2.8
    # TFLOP/sample, so shrink the whole config there, not just the batch.
    # TPU default batch: 32, promoted from the round-3 sweep
    # (logs/bench_r3_batchsweep.log: batch 8/16/32 -> 28.97/29.57/29.78
    # samples/s/chip; MFU 0.409/0.418/0.421).  Throughput saturates with
    # batch as the per-step scan bookkeeping and G x G glue amortize;
    # BENCH_BATCH=8 reproduces the round-1..3 lineage config.
    bsz = int(os.environ.get("BENCH_BATCH") or ("2" if on_cpu else "32"))
    n_steps = int(os.environ.get("BENCH_STEPS") or ("1" if on_cpu else "20"))
    if on_cpu:
        os.environ.setdefault("BENCH_LAYERS", "2")
        os.environ.setdefault("BENCH_HIDDEN", "64")

    # default = the fused Pallas block megakernel (fastest verified config).
    # Multi-chip: the mega path shard_maps itself over the registered
    # ('data', 'space') mesh (ops/pallas_block.py sharded path), so it
    # composes with dp_put sharding -- no XLA fallback needed.
    impl = os.environ.get("BENCH_IMPL") or ("xla" if on_cpu else "mega")
    model_kwargs = dict(
        space_dim=2,
        n_layers=int(os.environ.get("BENCH_LAYERS", "8")),
        n_hidden=int(os.environ.get("BENCH_HIDDEN", "256")),
        n_head=8, fun_dim=t_in,
        out_dim=1, slice_num=32, ref=8, unified_pos=True, geometry="grid2d",
        H=h, W=h,
        use_checkpoint=os.environ.get("BENCH_REMAT_BLOCKS", "0") == "1",
        conv_impl=os.environ.get("BENCH_CONV", "lax"),
        dtype=(jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
               else None),
    )
    model = Transolver(impl=impl, **model_kwargs)
    n_chips = max(len(jax.devices()), 1)
    if bsz % n_chips != 0:  # keep the batch shardable over the data axis
        bsz = max(bsz // n_chips, 1) * n_chips
    rng = np.random.default_rng(0)
    x = jnp.zeros((bsz, h * h, 2), jnp.float32)
    fx = jnp.asarray(rng.normal(size=(bsz, h * h, t_in)), jnp.float32)
    yy = jnp.asarray(rng.normal(size=(bsz, h * h, t_out)), jnp.float32)
    if n_chips > 1:
        from transformerbasednavierstokesolver_tpu.cli.common import dp_put

        put = dp_put()
        x, fx, yy = put(x), put(fx), put(yy)

    tx = make_optimizer(1e-3, 10000, 1e-5, None)
    state = create_train_state(
        jax.random.PRNGKey(0), model, (x[:1], fx[:1]), tx
    )
    update = make_update_fn(
        make_teacher_forced_loss(
            step=1,
            # unknown values mean False (pre-'half' semantics of != "1"),
            # not a KeyError that kills the bench before its JSON line
            remat={"0": False, "1": True, "half": "half"}.get(
                os.environ.get("BENCH_REMAT", "1"), False
            ),
            unroll=int(os.environ.get("BENCH_UNROLL", "1")),
            track_full=os.environ.get("BENCH_TRACK_FULL", "1") == "1",
        ),
        donate=True,
    )

    cost_model = (model if impl == "xla"
                  else Transolver(impl="xla", **model_kwargs))
    flops_per_step = _per_step_flops(cost_model, state.params, x, fx, t_out)

    # warmup/compile (StepTimer's sync forces a device->host value transfer;
    # block_until_ready alone under-reports through the remote-relay TPU
    # transport)
    state, (loss, _) = update(state, x, fx, yy)
    float(loss)

    timer = StepTimer(samples_per_step=bsz)
    timer.start()
    for _ in range(n_steps):
        state, (loss, _) = update(state, x, fx, yy)
    timer.stop(sync_value=loss)
    dt = timer.durations[-1] / n_steps

    samples_per_sec = bsz / dt / n_chips

    baseline = None
    if os.path.exists("BENCH_BASELINE.json"):
        with open("BENCH_BASELINE.json") as f:
            baseline = json.load(f).get("ns_train_samples_per_sec_per_chip")
    vs = samples_per_sec / baseline if baseline else 1.0

    record = {
        "metric": "ns_train_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 3),
        "unit": "samples/s/chip",
        "vs_baseline": round(vs, 4),
        # which backend actually ran: the axon relay process can die
        # (observed r3) and a silent CPU fallback would read as a ~50x
        # perf regression without this field
        "platform": jax.default_backend(),
    }
    if flops_per_step:
        peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
        tflops = flops_per_step / dt / n_chips / 1e12
        record["tflops_per_sec"] = round(tflops, 3)
        record["mfu"] = round(tflops * 1e12 / peak, 4)
        record["flops_per_step"] = flops_per_step
    print(json.dumps(record))


if __name__ == "__main__":
    main()
