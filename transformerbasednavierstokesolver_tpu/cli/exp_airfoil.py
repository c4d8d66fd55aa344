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
    return run_steady(
        args, model, x_train, y_train, x_test, y_test, geometry="grid2d"
    )


if __name__ == "__main__":
    main()
