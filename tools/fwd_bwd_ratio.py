"""Measure the train-step / forward time ratio at the bench shape.

`bench.py` prices MFU as ``forward-FLOPs x rollout-steps x 3`` (backward
~ 2x forward, standard model-FLOPs accounting; remat recompute excluded).
The x3 is an assumption for this conv+einsum mix (VERDICT r2, Weak 6);
this probe anchors it with measured wall-clock on the real chip:

    ratio_no_remat  = t(train step, remat off) / t(forward rollout)
      -> directly comparable to the assumed 3.0 (same FLOPs counted)
    ratio_remat     = t(train step, remat on)  / t(forward rollout)
      -> what the shipped config actually pays (includes the recompute
         bench.py deliberately excludes from the numerator, so
         MFU_true_hw = mfu_reported * ratio_remat / ratio_no_remat)

Run on the TPU: ``python tools/fwd_bwd_ratio.py`` (honors BENCH_* envs).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from transformerbasednavierstokesolver_tpu.utils.platform import (
        select_platform,
    )

    select_platform()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from transformerbasednavierstokesolver_tpu.models import Transolver
    from transformerbasednavierstokesolver_tpu.train.autoregressive import (
        closed_loop_rollout,
        make_teacher_forced_loss,
    )
    from transformerbasednavierstokesolver_tpu.train.loop import (
        create_train_state,
        make_update_fn,
    )
    from transformerbasednavierstokesolver_tpu.train.optim import make_optimizer

    h, t_in, t_out = 64, 10, 10
    bsz = int(os.environ.get("BENCH_BATCH", "8"))
    n_steps = int(os.environ.get("BENCH_STEPS", "10"))
    impl = os.environ.get("BENCH_IMPL", "mega")
    model = Transolver(
        impl=impl, space_dim=2,
        n_layers=int(os.environ.get("BENCH_LAYERS", "8")),
        n_hidden=int(os.environ.get("BENCH_HIDDEN", "256")),
        n_head=8,
        fun_dim=t_in, out_dim=1, slice_num=32, ref=8, unified_pos=True,
        geometry="grid2d", H=h, W=h,
        dtype=(jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
               else None),
    )
    rng = np.random.default_rng(0)
    x = jnp.zeros((bsz, h * h, 2), jnp.float32)
    fx = jnp.asarray(rng.normal(size=(bsz, h * h, t_in)), jnp.float32)
    yy = jnp.asarray(rng.normal(size=(bsz, h * h, t_out)), jnp.float32)
    tx = make_optimizer(1e-3, 10000, 1e-5, None)
    state = create_train_state(jax.random.PRNGKey(0), model, (x[:1], fx[:1]), tx)
    params = state.params

    @jax.jit
    def fwd(p, x_, fx_):
        f = lambda a, b: model.apply({"params": p}, a, b)
        return closed_loop_rollout(f, x_, fx_, t_out, 1)

    def timed(fn, *args, sync):
        out = fn(*args)
        float(sync(out))  # compile + sync (relay under-reports block_until_ready)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            out = fn(*args)
        float(sync(out))
        return (time.perf_counter() - t0) / n_steps

    t_fwd = timed(fwd, params, x, fx, sync=lambda o: o.sum())

    ts = {}
    st = {True: state, False: state}
    for remat in (False, True):
        update = make_update_fn(
            make_teacher_forced_loss(step=1, remat=remat), donate=False
        )
        ts[remat] = timed(
            lambda s=st[remat]: update(s, x, fx, yy),
            sync=lambda o: o[1][0],
        )

    out = {
        "t_fwd_rollout_ms": round(t_fwd * 1e3, 3),
        "t_train_no_remat_ms": round(ts[False] * 1e3, 3),
        "t_train_remat_ms": round(ts[True] * 1e3, 3),
        "ratio_no_remat": round(ts[False] / t_fwd, 3),
        "ratio_remat": round(ts[True] / t_fwd, 3),
        "assumed_ratio": 3.0,
        "impl": impl,
        "batch": bsz,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
