#!/usr/bin/env python
"""Replicate the reference notebook's rollout-eval protocol on our checkpoints.

``/root/reference/SequenSolver.ipynb`` evaluates its latent stack and its
plain Transolver with a single held-out-sim autoregressive rollout that
prints the per-frame SUM of squared errors (cell 9 for SequenSolverMerged:
134 -> 6206 over 10 frames with ``sequential_ep200_sim50``; cell 13 for the
plain ``ns_curl_ep200_sim50_unified`` model: 51 -> 9942).  The band
"0.68-0.71" quoted in round-2 review is a different artifact: cell 5's
*comments* record "sequensolver loss" for two slice-learner checkpoints of
the ORIGINAL (non-merged) variant.  This tool reports the cell-9/13
quantities for our trained checkpoints so the latent-stack comparison can
be made on the reference's own scale: per-frame SSE and per-frame rel-L2,
per test sim, plus medians.

Runs on CPU by default (forward-only) so it never becomes a relay client.

Usage:
  python tools/notebook_rollout_eval.py \
      --merged sequen_merged_r3b --flagship ns_flagship_r3b --synth_n 1200
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TBNSS_PLATFORM", "cpu")
os.environ.setdefault("TBNSS_NS_REGIME", "fno")

import numpy as np

import jax
import jax.numpy as jnp

T_IN, T_OUT, H = 10, 10, 64


def per_frame_metrics(pred, yy):
    """pred/yy: [B, N, T_OUT] -> (sse, rel) lists of per-frame arrays [B]."""
    sse = [
        np.sum((pred[..., t] - yy[..., t]) ** 2, axis=-1) for t in range(T_OUT)
    ]
    rel = [
        np.linalg.norm(pred[..., t] - yy[..., t], axis=-1)
        / np.linalg.norm(yy[..., t], axis=-1)
        for t in range(T_OUT)
    ]
    return np.stack(sse, -1), np.stack(rel, -1)  # [B, T_OUT]


def eval_merged(name, encoder_path, test_a, test_u, M=16, C=32):
    from transformerbasednavierstokesolver_tpu.cli.sequen_solver import (
        load_encoder_params, seq_ckpt,
    )
    from transformerbasednavierstokesolver_tpu.models.sequensolver import (
        SequenSolverMerged,
    )
    from transformerbasednavierstokesolver_tpu.ops.embedding import (
        unified_pos_grid_2d,
    )
    from transformerbasednavierstokesolver_tpu.train.checkpoint import (
        restore_params,
    )

    model = SequenSolverMerged(T=T_IN, H=H, W=H, M=M, C=C, layers=8,
                               sequential_head=16, encoder_layers=8)
    pos = unified_pos_grid_2d(H, H, 8)
    b = test_a.shape[0]
    x = jnp.broadcast_to(pos, (b,) + pos.shape[1:])
    variables = model.init(jax.random.PRNGKey(0), x[:1], test_a[:1],
                           test_u[:1, ..., :1], use_gt=False)
    params = dict(variables["params"])
    params["encoder"] = load_encoder_params(encoder_path, params["encoder"])
    params = restore_params(seq_ckpt(name), params)
    pred = jax.jit(
        lambda p, x_, fx: model.apply(
            {"params": p}, x_, fx, T_OUT,
            method=SequenSolverMerged.closed_loop_outputs,
        )
    )(params, x, test_a)
    return per_frame_metrics(np.asarray(pred), np.asarray(test_u))


def eval_flagship(name, test_a, test_u, n_hidden=256, slice_num=32):
    from transformerbasednavierstokesolver_tpu.data.datasets import meshgrid_pos
    from transformerbasednavierstokesolver_tpu.models import get_model
    from transformerbasednavierstokesolver_tpu.train.checkpoint import (
        restore_params,
    )

    model = get_model("Transolver_Structured_Mesh_2D")(
        space_dim=2, n_layers=8, n_hidden=n_hidden, dropout=0.0, n_head=8,
        Time_Input=False, mlp_ratio=1, fun_dim=T_IN, out_dim=1,
        slice_num=slice_num, ref=8, unified_pos=True, H=H, W=H, impl="xla",
    )
    pos = meshgrid_pos(H)
    b = test_a.shape[0]
    x = jnp.broadcast_to(pos, (b,) + pos.shape[1:])
    variables = model.init(jax.random.PRNGKey(0), x[:1], test_a[:1])
    params = restore_params(os.path.join("./checkpoints", name + ".ckpt"),
                            variables["params"])

    @jax.jit
    def rollout(p, x_, fx):
        preds = []
        for _ in range(T_OUT):  # notebook cell 13's feed-forward loop
            im = model.apply({"params": p}, x_, fx)
            preds.append(im)
            fx = jnp.concatenate([fx[..., 1:], im], axis=-1)
        return jnp.concatenate(preds, axis=-1)

    pred = rollout(params, x, test_a)
    return per_frame_metrics(np.asarray(pred), np.asarray(test_u))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--merged", default="sequen_merged_r3b")
    ap.add_argument("--encoder", default="sequential_checkpoints/encoder_fno_ep80.ckpt")
    ap.add_argument("--flagship", default="ns_flagship_r3b")
    ap.add_argument("--flagship_hidden", type=int, default=256)
    ap.add_argument("--flagship_slices", type=int, default=32)
    ap.add_argument("--latent_m", type=int, default=16)
    ap.add_argument("--latent_c", type=int, default=32)
    ap.add_argument("--synth_n", type=int, default=1200)
    ap.add_argument("--ntest", type=int, default=10)
    ap.add_argument("--ntrain", type=int, default=50,
                    help="loader train-split size: evaluated sims are "
                         "[ntrain, ntrain+ntest). Set PAST every compared "
                         "model's training split (e.g. 1190 when the "
                         "merged model trained on 1190 sims and the "
                         "flagship on 1000) — the r3 runs used the "
                         "default 50, which put sims 50-59 INSIDE the "
                         "1000/1190-sim training splits (disclosed in "
                         "docs/RESULTS.md round 5)")
    args = ap.parse_args()

    from transformerbasednavierstokesolver_tpu.data.datasets import (
        load_ns_vorticity,
    )
    from transformerbasednavierstokesolver_tpu.utils.platform import (
        select_platform,
    )

    select_platform()
    _, _, test_a, test_u, h = load_ns_vorticity(
        "/data/fno", args.ntrain, args.ntest, T_IN, T_OUT, 1,
        synth_sims=args.synth_n,
    )
    assert h == H
    out = {}
    for label, fn in (
        ("merged", lambda: eval_merged(args.merged, args.encoder,
                                       jnp.asarray(test_a), jnp.asarray(test_u),
                                       args.latent_m, args.latent_c)),
        ("flagship", lambda: eval_flagship(args.flagship, jnp.asarray(test_a),
                                           jnp.asarray(test_u),
                                           args.flagship_hidden,
                                           args.flagship_slices)),
    ):
        try:
            sse, rel = fn()
        except Exception as e:  # a missing checkpoint shouldn't kill the other
            out[label] = {"error": f"{type(e).__name__}: {e}"[:200]}
            continue
        out[label] = {
            "sse_per_frame_median": [round(float(v), 2)
                                     for v in np.median(sse, axis=0)],
            "rel_per_frame_median": [round(float(v), 4)
                                     for v in np.median(rel, axis=0)],
            "rel_mean_over_frames_and_sims": round(float(rel.mean()), 4),
        }
    out["reference_cell9_merged_sse"] = [134, 404, 823, 1354, 1902, 2334,
                                         2833, 3674, 5193, 6206]
    out["reference_cell13_plain_sse"] = [51, 179, 463, 989, 1693, 2700,
                                         4183, 5520, 7087, 9943]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
