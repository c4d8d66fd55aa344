"""Airfoil transonic-flow benchmark (reference: ``exp_airfoil.py``).

Deformed 221x51 C-mesh around NACA airfoils; raw fields, no normalizers
(``exp_airfoil.py:81-86``); coordinates are the only input (fun_dim=0).
"""

from ..data.datasets import load_airfoil
from ..models import get_model
from .common import base_parser, model_dtype
from .steady import run_steady


def build_argparser():
    p = base_parser(
        "Training Transolver (Airfoil)",
        model="Transolver_Structured_Mesh_2D",
        save_name="airfoil_Transolver",
    )
    p.add_argument("--downsamplex", type=int, default=1)
    p.add_argument("--downsampley", type=int, default=1)
    p.add_argument("--surface_weight", type=float, default=1.0,
                   help="extra TRAIN-loss weight on the near-surface radial "
                        "rings (error concentrates there ~16x; eval metric "
                        "unchanged). 1.0 = canonical unweighted loss")
    return p


def main(argv=None):
    from ..utils.platform import select_platform

    select_platform()
    args = build_argparser().parse_args(argv)
    x_train, y_train, x_test, y_test, s1, s2 = load_airfoil(
        args.data_path, 1000, 200, args.downsamplex, args.downsampley,
        synth_n=args.synth_n,
    )
    print("Dataloading is over.")

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
        H=s1,
        W=s2,
        impl=args.impl,
        precision=args.precision,
        dtype=model_dtype(args),
    )
    def eval_figures(params, predict):
        # pred/gt/error on the deformed mesh, like exp_airfoil.py:113-180
        import numpy as np

        from .common import save_mesh_figures

        for i in range(min(6, x_test.shape[0])):
            out = np.asarray(predict(params, x_test[i : i + 1]))[0]
            X = x_test[i, :, 0].reshape(s1, s2)
            Y = x_test[i, :, 1].reshape(s1, s2)
            save_mesh_figures(
                args.save_name, i + 1, X, Y,
                {
                    "pred": out.reshape(s1, s2),
                    "gt": y_test[i].reshape(s1, s2),
                    "error": (y_test[i] - out).reshape(s1, s2),
                },
            )

    loss_weight = None
    if args.surface_weight != 1.0:
        import numpy as np

        # point index = theta * s2 + radial_ring (row-major over (s1, s2));
        # weight decays from surface_weight at the wall to 1 by ~ring 15
        ring = np.tile(np.arange(s2, dtype=np.float32), s1)
        loss_weight = 1.0 + (args.surface_weight - 1.0) * np.exp(-ring / 5.0)

    return run_steady(
        args, model, x_train, y_train, x_test, y_test, geometry="grid2d",
        eval_figures=eval_figures, loss_weight=loss_weight,
    )


if __name__ == "__main__":
    main()
