"""Transolver autoencoder trainer (reference: ``auto_encoder.py``).

Trains the encoder-variant Transolver as an identity autoencoder on single
vorticity frames (every frame an independent sample, ``auto_encoder.py:81-88``;
``loss = rel(im, fx)``, ``:171-173``).  Checkpoints go to
``sequential_checkpoints/`` and are what SequenSolver's frozen encoder loads.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..data.datasets import load_ns_vorticity, meshgrid_pos
from ..models import get_model
from ..train.checkpoint import save_params
from ..train.loop import create_train_state, make_update_fn
from ..train.optim import make_optimizer
from ..utils.losses import rel_lp
from .common import (
    MetricsLogger,
    base_parser,
    count_parameters,
    dp_put,
    epoch_batches,
    model_dtype,
)


def build_argparser():
    return base_parser(
        "Training Transolver autoencoder",
        model="Transolver_Structured_Mesh2D_Encoder",
        save_name="encoder",
        epochs=50,
        n_hidden=32,
        n_heads=1,
        slice_num=16,
        unified_pos=1,
        downsample=1,
    )


def seq_checkpoint_path(save_name):
    os.makedirs("./sequential_checkpoints", exist_ok=True)
    return os.path.join("./sequential_checkpoints", save_name + ".ckpt")


def frames_dataset(args, ntrain=50, ntest=10):
    """Each frame an independent sample: [(n*20), h*h, 1]."""
    train_a, train_u, test_a, test_u, h = load_ns_vorticity(
        args.data_path, ntrain, ntest, 10, 10, args.downsample,
        synth_sims=args.synth_n,
    )
    def frames(a, u):
        full = np.concatenate([a, u], axis=-1)  # [n, N, 20]
        n, N, T = full.shape
        return full.transpose(0, 2, 1).reshape(n * T, N, 1)

    return frames(train_a, train_u), frames(test_a, test_u), h


def main(argv=None):
    from ..utils.platform import select_platform

    select_platform()
    args = build_argparser().parse_args(argv)
    put = dp_put(getattr(args, "mesh", "auto"))
    train, test, h = frames_dataset(args)
    ntrain_f, ntest_f = train.shape[0], test.shape[0]
    pos = meshgrid_pos(h)
    print(f"train data {train.shape}")
    print("Dataloading is over.")

    model = get_model(args.model)(
        space_dim=2,
        n_layers=args.n_layers,
        n_hidden=args.n_hidden,
        dropout=args.dropout,
        n_head=args.n_heads,
        Time_Input=False,
        mlp_ratio=args.mlp_ratio,
        fun_dim=1,
        out_dim=1,
        slice_num=args.slice_num,
        ref=args.ref,
        unified_pos=bool(args.unified_pos),
        H=h,
        W=h,
        impl=args.impl,
        precision=args.precision,
        dtype=model_dtype(args),
    )
    bsz = args.batch_size
    steps_per_epoch = (ntrain_f + bsz - 1) // bsz
    tx = make_optimizer(
        args.lr, args.epochs * steps_per_epoch, args.weight_decay,
        args.max_grad_norm,
    )
    sample = (jnp.zeros((1, h * h, 2)), jnp.zeros((1, h * h, 1)))

    def loss_fn(params, apply_fn, x, fx):
        im = apply_fn({"params": params}, x, fx)
        b = x.shape[0]
        return rel_lp(im.reshape(b, -1), fx.reshape(b, -1), reduction="sum"), {}

    @jax.jit
    def recon_loss(params, x, fx):
        im = model.apply({"params": params}, x, fx)
        b = x.shape[0]
        return rel_lp(im.reshape(b, -1), fx.reshape(b, -1), reduction="sum")

    def evaluate(params):
        total = 0.0
        for idx in epoch_batches(np.random.default_rng(0), ntest_f, bsz, shuffle=False):
            x = put(pos.repeat(len(idx), 0))
            total += float(recon_loss(params, x, put(test[idx])))
        return total / ntest_f

    if args.eval:
        from ..train.checkpoint import restore_params

        template = model.init(jax.random.PRNGKey(0), *sample)["params"]
        params = restore_params(seq_checkpoint_path(args.save_name), template)
        print(f"recon rel-L2: {evaluate(params)}")
        return evaluate(params)

    state = create_train_state(jax.random.PRNGKey(args.seed), model, sample, tx)
    count_parameters(state.params)
    update = make_update_fn(loss_fn)

    metrics = MetricsLogger(args.metrics_file, samples_per_epoch=ntrain_f)
    data_rng = np.random.default_rng(args.seed)
    for ep in range(args.epochs):
        train_l = 0.0
        for idx in epoch_batches(data_rng, ntrain_f, bsz):
            x = put(pos.repeat(len(idx), 0))
            state, (loss, _) = update(state, x, put(train[idx]))
            train_l += float(loss)
        test_l = evaluate(state.params)
        metrics.log(ep, train_loss=train_l / ntrain_f, test_loss=test_l)
        print(
            f"Epoch {ep} , train_step_loss:{train_l / ntrain_f} , "
            f"test_step_loss:{test_l}"
        )
        if ep % 100 == 0:
            print("save model")
            save_params(seq_checkpoint_path(args.save_name), state.params, state.step)

    print("save model")
    save_params(seq_checkpoint_path(args.save_name), state.params, state.step)
    return evaluate(state.params)


if __name__ == "__main__":
    main()
