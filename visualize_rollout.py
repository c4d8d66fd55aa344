#!/usr/bin/env python
"""Rollout visualization (replaces the reference's inference notebooks).

Loads a trained NS checkpoint, rolls the model out closed-loop against
ground truth and writes per-frame pred/gt/error panels plus an animated GIF
-- the script equivalent of ``Navier_Stokes_prediction.ipynb`` /
``velocity_prediction.ipynb``.

Example:
    python visualize_rollout.py --save_name ns_2d_UniPDE --frames 10
"""

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--save_name", type=str, default="ns_2d_UniPDE")
    p.add_argument("--data_path", type=str, default="/data/fno")
    p.add_argument("--synth_n", type=int, default=None)
    p.add_argument("--ntrain", type=int, default=50,
                   help="training-split size the checkpoint was trained "
                        "with; the visualized cases are drawn from the "
                        "sims AFTER it (true held-out, exp_ns.py split "
                        "semantics)")
    p.add_argument("--ntest", type=int, default=50)
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--case", type=int, default=0)
    p.add_argument("--out_dir", type=str, default=None)
    # model flags (must match the checkpoint)
    p.add_argument("--n-hidden", type=int, default=256)
    p.add_argument("--n-layers", type=int, default=8)
    p.add_argument("--n-heads", type=int, default=8)
    p.add_argument("--slice_num", type=int, default=32)
    p.add_argument("--unified_pos", type=int, default=1)
    p.add_argument("--ref", type=int, default=8)
    args = p.parse_args(argv)

    from transformerbasednavierstokesolver_tpu.utils.platform import select_platform

    select_platform()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    import jax
    import jax.numpy as jnp

    from transformerbasednavierstokesolver_tpu.data.datasets import (
        load_ns_vorticity,
        meshgrid_pos,
    )
    from transformerbasednavierstokesolver_tpu.models import Transolver
    from transformerbasednavierstokesolver_tpu.train.autoregressive import (
        closed_loop_rollout,
    )
    from transformerbasednavierstokesolver_tpu.cli.common import maybe_load_params

    t_in = 10
    _, _, test_a, test_u, h = load_ns_vorticity(
        args.data_path, args.ntrain, args.ntest, t_in, args.frames, 1,
        synth_sims=args.synth_n,
    )
    pos = meshgrid_pos(h)
    model = Transolver(
        space_dim=2, n_layers=args.n_layers, n_hidden=args.n_hidden,
        n_head=args.n_heads, fun_dim=t_in, out_dim=1,
        slice_num=args.slice_num, ref=args.ref,
        unified_pos=bool(args.unified_pos), geometry="grid2d", H=h, W=h,
    )
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h * h, 2)), jnp.zeros((1, h * h, t_in))
    )["params"]
    params = maybe_load_params(args.save_name, template, geometry="grid2d")

    i = args.case
    forward = lambda x, fx: model.apply({"params": params}, x, fx)
    pred = closed_loop_rollout(
        forward, jnp.asarray(pos), jnp.asarray(test_a[i : i + 1]),
        args.frames, 1,
    )
    pred = np.asarray(pred)[0]  # [N, T]
    gt = test_u[i, :, : args.frames]

    outdir = args.out_dir or os.path.join("./results", args.save_name, "rollout")
    os.makedirs(outdir, exist_ok=True)
    frames_png = []
    vmax = float(np.abs(gt).max())
    for t in range(args.frames):
        fig, axes = plt.subplots(1, 3, figsize=(12, 4))
        for ax, img, title in zip(
            axes,
            [pred[:, t].reshape(h, h), gt[:, t].reshape(h, h),
             (pred[:, t] - gt[:, t]).reshape(h, h)],
            ["prediction", "ground truth", "error"],
        ):
            im = ax.imshow(img, cmap="coolwarm", vmin=-vmax, vmax=vmax)
            ax.set_title(f"{title} t={t}")
            ax.axis("off")
        fig.colorbar(im, ax=axes, shrink=0.8)
        path = os.path.join(outdir, f"frame_{t:03d}.png")
        fig.savefig(path, dpi=80)
        plt.close(fig)
        frames_png.append(path)

    # animated GIF like the reference's committed animation artifacts
    try:
        from PIL import Image

        imgs = [Image.open(f) for f in frames_png]
        gif = os.path.join(outdir, "animation.gif")
        imgs[0].save(gif, save_all=True, append_images=imgs[1:], duration=300, loop=0)
        print(f"wrote {gif}")
    except ImportError:
        print("PIL unavailable; kept per-frame PNGs only")

    rel = np.linalg.norm(pred - gt) / np.linalg.norm(gt)
    print(f"rollout rel-L2 over {args.frames} frames: {rel:.4f}")
    print(f"frames in {outdir}")


if __name__ == "__main__":
    main()
