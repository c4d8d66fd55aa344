#!/usr/bin/env python
"""Reproduce the session-4 padded-mega plasticity NaN with REAL weights.

The init-time param-grad probe (tools/probe_mega_param_grads.py) passes at
101x31, yet the plasticity-900 resume under --impl mega NaN'd on its first
epoch (logs/plas900_r5.log) while xla continued cleanly from the same
checkpoint.  This tool loads the banked mid-schedule checkpoint
(checkpoints/plas900_r4.ckpt), builds real training batches exactly the
way exp_plas does (pos + normalized fx + per-step time scalar,
channel-weighted rel-Lp loss), and compares mega vs xla loss AND parameter
gradients — on CPU this runs the megakernel in interpret mode (no chip
needed); on the TPU it exercises the compiled Mosaic path.

Usage: [TBNSS_PLATFORM=cpu] python tools/probe_mega_real_weights.py [ckpt]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# exercise the padded masked-tail plans (opt-in for training)
os.environ.setdefault("TBNSS_MEGA_PADDED", "1")

from transformerbasednavierstokesolver_tpu.utils.platform import select_platform

select_platform()

import jax
import jax.numpy as jnp
import numpy as np

from transformerbasednavierstokesolver_tpu.cli.common import checkpoint_path
from transformerbasednavierstokesolver_tpu.data.datasets import (
    load_plasticity,
    meshgrid_pos,
)
from transformerbasednavierstokesolver_tpu.models import get_model
from transformerbasednavierstokesolver_tpu.train.checkpoint import (
    restore_params_and_step,
)
from transformerbasednavierstokesolver_tpu.utils.losses import rel_lp


def tree_nan_max(t):
    leaves = jax.tree_util.tree_leaves(t)
    n_nan = sum(int(jnp.sum(~jnp.isfinite(x))) for x in leaves)
    amax = max(float(jnp.max(jnp.abs(x))) for x in leaves)
    return n_nan, amax


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else checkpoint_path("plas900_r4")
    # data_path is the DIRECTORY (exp_plas joins the .mat name onto it);
    # load the full 900-sample training split so the normalization stats
    # match the checkpoint's training run exactly, then probe on the first
    # 8 samples (round-4 advisor findings)
    x_train, y_train, x_test, y_test, s1, s2, T, out_dim = load_plasticity(
        "/data/fno", 900, 2, synth_n=900
    )
    xm = x_train.mean()
    xs = x_train.std(ddof=1) + 1e-8
    x_train = (x_train - xm) / xs
    x_train = x_train[:8]
    y_train = y_train[:8]
    pos = meshgrid_pos(s1, s2)
    t_grid = np.linspace(0, 1, T, dtype=np.float32)

    b = 8
    x = jnp.asarray(pos.repeat(b, 0), jnp.float32)
    fx = jnp.asarray(x_train[:b], jnp.float32)
    print(f"shapes x={x.shape} fx={fx.shape} y={y_train.shape} "
          f"grid={s1}x{s2} T={T}")

    def build(impl):
        return get_model("Transolver_Structured_Mesh_2D")(
            space_dim=2, n_hidden=128, n_layers=8, Time_Input=True,
            n_head=8, fun_dim=1, out_dim=out_dim, mlp_ratio=1,
            slice_num=64, ref=8, unified_pos=False, H=s1, W=s2, impl=impl,
        )

    tpl = build("xla").init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, s1 * s2, 2)), jnp.zeros((1, s1 * s2, 1)),
        jnp.zeros((1, 1)),
    )["params"]
    params, step = restore_params_and_step(ckpt, tpl)
    print(f"checkpoint {ckpt} step={step}")

    grads_by_impl = {}
    loss_by_impl = {}
    for impl in ("xla", "mega"):
        model = build(impl)

        def loss_fn(p, tt, yt):
            im = model.apply({"params": p}, x, fx, tt)
            c = im.shape[-1]
            return sum(
                rel_lp(im[..., j].reshape(b, -1), yt[..., j].reshape(b, -1),
                       reduction="sum")
                for j in range(c)
            ) / c

        vg = jax.jit(jax.value_and_grad(loss_fn))
        worst_nan = 0
        for t in (0, T // 2, T - 1):
            tt = jnp.full((b, 1), t_grid[t])
            yt = jnp.asarray(y_train[:b, :, :, t], jnp.float32)
            loss, grads = vg(params, tt, yt)
            n_nan, amax = tree_nan_max(grads)
            worst_nan = max(worst_nan, n_nan)
            print(f"{impl} t={t}: loss={float(loss):.6f} "
                  f"grad_nans={n_nan} grad_absmax={amax:.3e}")
            if t == 0:
                grads_by_impl[impl], loss_by_impl[impl] = grads, float(loss)
        if worst_nan:
            flat = jax.tree_util.tree_flatten_with_path(grads)[0]
            bad = ["/".join(str(p) for p in k) for k, v in flat
                   if int(jnp.sum(~jnp.isfinite(v)))]
            print("  NaN keys:", bad[:10])

    worst_k, worst = None, 0.0
    for (k, vx), (_, vm) in zip(
        jax.tree_util.tree_flatten_with_path(grads_by_impl["xla"])[0],
        jax.tree_util.tree_flatten_with_path(grads_by_impl["mega"])[0],
    ):
        rel = float(jnp.linalg.norm((vm - vx).astype(jnp.float32))) / (
            float(jnp.linalg.norm(vx.astype(jnp.float32))) + 1e-30
        )
        if rel > worst:
            worst, worst_k = rel, "/".join(str(p) for p in k)
    dl = abs(loss_by_impl["mega"] - loss_by_impl["xla"])
    print(f"t=0 loss delta={dl:.3e}  worst grad key={worst_k} rel={worst:.3e}")
    ok = dl < 1e-3 and worst < 5e-2 and np.isfinite(dl)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
