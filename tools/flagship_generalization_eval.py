#!/usr/bin/env python
"""Closed-loop rollout eval of the NS flagship on a LARGE fresh test set.

The canonical headline (docs/RESULTS.md) scores 200 held-out sims
(1000-1199 of the 1200-sim cache).  The round-3 cache extension banked
sims 1200-1999 (same chunked deterministic generator, so sims 0-1199 are
bit-identical to the training cache): 800 trajectories the model has
never seen in any role.  This tool reports the same test_step/test_full
rel-L2 the trainer prints (cli/autoreg.py semantics: per-frame and
full-block rel-L2, averaged over sims), giving a 4x-larger-sample
generalization estimate for the headline.

Runs on the TPU by default (eval only, chunked dispatches); pass
TBNSS_PLATFORM=cpu to run (slowly) off-chip.

Usage: python tools/flagship_generalization_eval.py \
    [--name ns_flagship_r3b] [--first 1200] [--count 800] [--chunk 50]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TBNSS_NS_REGIME", "fno")

import numpy as np

T_IN, T_OUT = 10, 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="ns_flagship_r3b")
    ap.add_argument("--synth_n", type=int, default=2000)
    ap.add_argument("--first", type=int, default=1200,
                    help="first test sim index (must be >= any trained index)")
    ap.add_argument("--count", type=int, default=800)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--n_hidden", type=int, default=256)
    ap.add_argument("--slice_num", type=int, default=32)
    args = ap.parse_args()

    from transformerbasednavierstokesolver_tpu.utils.platform import (
        select_platform,
    )

    select_platform()

    import jax
    import jax.numpy as jnp

    from transformerbasednavierstokesolver_tpu.data.datasets import (
        load_ns_vorticity, meshgrid_pos,
    )
    from transformerbasednavierstokesolver_tpu.models import get_model
    from transformerbasednavierstokesolver_tpu.train.checkpoint import (
        restore_params,
    )
    from transformerbasednavierstokesolver_tpu.utils.losses import rel_lp

    # ntrain = args.first makes the loader hand back exactly sims
    # [first, first+count) as the test block
    _, _, test_a, test_u, h = load_ns_vorticity(
        "/data/fno", args.first, args.count, T_IN, T_OUT, 1,
        synth_sims=args.synth_n,
    )
    assert test_a.shape[0] == args.count, test_a.shape

    model = get_model("Transolver_Structured_Mesh_2D")(
        space_dim=2, n_layers=8, n_hidden=args.n_hidden, dropout=0.0,
        n_head=8, Time_Input=False, mlp_ratio=1, fun_dim=T_IN, out_dim=1,
        slice_num=args.slice_num, ref=8, unified_pos=True, H=h, W=h,
        impl="xla",
    )
    pos = meshgrid_pos(h)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(pos), jnp.asarray(test_a[:1])
    )
    params = restore_params(
        os.path.join("./checkpoints", args.name + ".ckpt"),
        variables["params"],
    )

    @jax.jit
    def rollout_metrics(p, x, fx, yy):
        b = fx.shape[0]
        preds = []
        for _ in range(T_OUT):
            im = model.apply({"params": p}, x, fx)
            preds.append(im)
            fx = jnp.concatenate([fx[..., 1:], im], axis=-1)
        pred = jnp.concatenate(preds, axis=-1)
        step = sum(
            rel_lp(pred[..., t : t + 1].reshape(b, -1),
                   yy[..., t : t + 1].reshape(b, -1), reduction="sum")
            for t in range(T_OUT)
        )
        full = rel_lp(pred.reshape(b, -1), yy.reshape(b, -1), reduction="sum")
        return step, full

    xs = jnp.asarray(pos)
    step_sum = full_sum = 0.0
    n = args.count
    for c in range(0, n, args.chunk):
        a = jnp.asarray(test_a[c : c + args.chunk])
        u = jnp.asarray(test_u[c : c + args.chunk])
        x = jnp.broadcast_to(xs, (a.shape[0],) + xs.shape[1:])
        s, f = rollout_metrics(params, x, a, u)
        step_sum += float(s)
        full_sum += float(f)
        print(f"{c + a.shape[0]}/{n}", flush=True)
    out = {
        "checkpoint": args.name,
        "test_sims": [args.first, args.first + n],
        "test_step_loss": step_sum / n / T_OUT,
        "test_full_loss": full_sum / n,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
