"""Velocity-field autoregressive trainer (reference: ``ns_velocity.py``).

Fork addition: teacher-forced next-frame prediction on interleaved
[velx, vely] channel stacks from the phiflow-generated ``.npy`` datasets
(here: the jnp.fft pseudo-spectral generator).  step=2 (two scalar fields
per frame), out_dim=2, fun_dim=10 input channels (5 frames of history).
The reference hard-codes the author's Windows data path (``ns_velocity.py:40``);
here ``--data_path`` is honored (file or directory containing ns_*.npy).
"""

import os

from ..data.datasets import load_ns_velocity_npy, meshgrid_pos
from ..models import get_model
from .autoreg import run_autoregressive
from .common import base_parser, model_dtype

T_IN = 10  # channels (= 5 frames of velx/vely)
T_OUT = 10
STEP = 2


def build_argparser():
    return base_parser(
        "Training Transolver (NS velocity)",
        model="Transolver_2D",
        save_name="ns_velocity",
        epochs=30,
        downsample=1,
    )


def prepare(data, ntrain, ntest, r, h):
    def prep(block):
        return block.reshape(block.shape[0], -1, block.shape[-1]).copy()

    train_a = prep(data[:ntrain, ::r, ::r, :T_IN][:, :h, :h, :])
    train_u = prep(data[:ntrain, ::r, ::r, T_IN : T_OUT + T_IN][:, :h, :h, :])
    test_a = prep(data[-ntest:, ::r, ::r, :T_IN][:, :h, :h, :])
    test_u = prep(data[-ntest:, ::r, ::r, T_IN : T_OUT + T_IN][:, :h, :h, :])
    return train_a, train_u, test_a, test_u


def main(argv=None):
    from ..utils.platform import select_platform

    select_platform()
    args = build_argparser().parse_args(argv)

    ntrain, ntest = 40, 10
    path = args.data_path
    if os.path.isdir(path):
        path = os.path.join(path, "ns_50_20.npy")
    sims = args.synth_n or 50
    data = load_ns_velocity_npy(path, sims=sims, frames=10)
    ntrain = min(ntrain, max(data.shape[0] - 2, 1))
    ntest = min(ntest, data.shape[0] - ntrain)

    r = args.downsample
    h = int(((64 - 1) / r) + 1)
    train_a, train_u, test_a, test_u = prepare(data, ntrain, ntest, r, h)
    pos = meshgrid_pos(h)
    print("Dataloading is over.")

    model = get_model(args.model)(
        space_dim=2,
        n_layers=args.n_layers,
        n_hidden=args.n_hidden,
        dropout=args.dropout,
        n_head=args.n_heads,
        Time_Input=False,
        mlp_ratio=args.mlp_ratio,
        fun_dim=T_IN,
        out_dim=2,
        slice_num=args.slice_num,
        ref=args.ref,
        unified_pos=bool(args.unified_pos),
        H=h,
        W=h,
        impl=args.impl,
        precision=args.precision,
        dtype=model_dtype(args),
    )
    _, _, _, final = run_autoregressive(
        args, model, pos, train_a, train_u, test_a, test_u, T_OUT, STEP
    )
    return final


if __name__ == "__main__":
    main()
