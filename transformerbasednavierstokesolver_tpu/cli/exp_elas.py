"""Elasticity point-cloud benchmark (reference: ``exp_elas.py``).

Irregular-mesh Transolver on 972-point unit-cell clouds, fun_dim=0
(coordinates only, ``model(x, None)``), y-normalizer decode before the loss.
Scheduler: the reference calls ``CosineAnnealingLR(T_max=epochs)`` with an
undefined ``epochs`` variable (``exp_elas.py:102`` -- a NameError as written);
here it is a cosine schedule over ``--epochs``, stepped per epoch like the
reference's ``scheduler.step()`` placement (``exp_elas.py:178``).
"""

from ..data.datasets import load_elasticity
from ..models import get_model
from .common import base_parser, model_dtype
from .steady import run_steady


def build_argparser():
    return base_parser(
        "Training Transolver (Elasticity)",
        model="Transolver_Irregular_Mesh",
        save_name="elas_Transolver",
    )


def main(argv=None):
    from ..utils.platform import select_platform

    select_platform()
    args = build_argparser().parse_args(argv)
    train_xy, train_s, test_xy, test_s = load_elasticity(
        args.data_path, args.ntrain, 200, synth_n=args.synth_n
    )
    print("Dataloading is over.")

    ym, ys = float(train_s.mean()), float(train_s.std(ddof=1)) + 1e-8

    model = get_model(args.model)(
        space_dim=2,
        n_layers=args.n_layers,
        n_hidden=args.n_hidden,
        dropout=args.dropout,
        n_head=args.n_heads,
        Time_Input=False,
        mlp_ratio=args.mlp_ratio,
        fun_dim=0,
        out_dim=1,
        slice_num=args.slice_num,
        ref=args.ref,
        unified_pos=bool(args.unified_pos),
        impl=args.impl,
        precision=args.precision,
        dtype=model_dtype(args),
    )

    def eval_figures(params, predict):
        import numpy as np
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import os

        outdir = os.path.join("./results", args.save_name)
        os.makedirs(outdir, exist_ok=True)
        for i in range(min(9, test_xy.shape[0])):
            out = np.asarray(predict(params, test_xy[i : i + 1]))[0]
            for name, c, clim in (
                ("gt", test_s[i], (0, 1000)),
                ("pred", out, (0, 1000)),
                ("error", test_s[i] - out, (-8, 8)),
            ):
                plt.figure()
                plt.axis("off")
                plt.scatter(test_xy[i, :, 0], test_xy[i, :, 1], c=c, cmap="coolwarm")
                plt.colorbar()
                plt.clim(*clim)
                plt.savefig(
                    os.path.join(outdir, f"{name}_{i + 1}.pdf"),
                    bbox_inches="tight", pad_inches=0,
                )
                plt.close()

    return run_steady(
        args, model, train_xy, train_s, test_xy, test_s,
        geometry="irregular", y_stats=(ym, ys),
        schedule="cosine", schedule_per_epoch=True,
        eval_figures=eval_figures,
    )


if __name__ == "__main__":
    main()
