"""3D structured-mesh scaling trainer.

The reference ships ``Transolver_Structured_Mesh_3D`` (with the repo's only
gradient-checkpoint flag, ``Transolver_Structured_Mesh_3D.py:100,185-188``)
but no 3D entry point or dataset.  This CLI provides the BASELINE "3D
structured-mesh scaling run": steady-state operator learning on synthetic 3D
Gaussian-random-field data, exercising the grid3d attention variant and
``use_checkpoint`` (-> ``nn.remat``) at scale.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..models import get_model
from ..train.checkpoint import save_params
from ..train.loop import create_train_state, make_update_fn
from ..train.optim import make_optimizer
from ..utils.losses import rel_lp
from .common import (
    dp_put,
    model_dtype,
    base_parser,
    checkpoint_path,
    count_parameters,
    epoch_batches,
    maybe_resume,
    save_state,
    MetricsLogger,
)


def build_argparser():
    p = base_parser(
        "Training Transolver (3D scaling)",
        model="Transolver_Structured_Mesh_3D",
        save_name="ns3d_Transolver",
        slice_num=32,
        epochs=10,
    )
    p.add_argument("--size", type=int, default=32, help="grid edge (size^3 points)")
    p.add_argument("--use_checkpoint", type=int, default=1,
                   help="gradient checkpointing (nn.remat) per block")
    return p


def synthetic_3d(n_samples, s, seed=0):
    """3D GRF source field -> periodic Poisson solution (-lap u = f).

    A real nonlocal PDE operator (exact spectral solve, host numpy FFT --
    the TPU backend has no complex arithmetic, but generation is host-side
    anyway), replacing the round-3 pointwise tanh target: learning it
    requires genuinely 3D global mixing, which is what the grid3d
    attention variant + ``use_checkpoint`` remat are meant to scale.
    """
    rng = np.random.default_rng(seed)
    k = 2 * np.pi * np.fft.fftfreq(s)
    k2 = (k[:, None, None] ** 2 + k[None, :, None] ** 2
          + k[None, None, :] ** 2)
    filt = 1.0 / (1.0 + 10.0 * k2)  # smooth GRF spectrum
    inv_lap = np.where(k2 > 0, 1.0 / np.maximum(k2, 1e-12), 0.0)
    xs, ys = [], []
    for _ in range(n_samples):
        noise = rng.normal(size=(s, s, s))
        f_hat = np.fft.fftn(noise) * filt
        f_hat[0, 0, 0] = 0.0  # zero-mean source (solvability)
        f = np.fft.ifftn(f_hat).real
        sc = f.std() + 1e-8
        f /= sc
        u = np.fft.ifftn(f_hat * inv_lap).real / sc
        # normalize the TARGET scale once, by the operator's typical gain
        # (k~1 modes dominate), so rel-L2 is comparable across samples
        xs.append(f.astype(np.float32))
        ys.append(u.astype(np.float32))
    return np.stack(xs).reshape(n_samples, -1, 1), np.stack(ys).reshape(n_samples, -1)


def main(argv=None):
    from ..utils.platform import select_platform

    select_platform()
    args = build_argparser().parse_args(argv)
    put = dp_put(getattr(args, "mesh", "auto"))
    s = args.size
    n = s**3
    ntrain = args.synth_n or 16
    ntest = max(ntrain // 4, 2)
    x_train, y_train = synthetic_3d(ntrain, s, seed=0)
    x_test, y_test = synthetic_3d(ntest, s, seed=1)

    gx = np.linspace(0, 1, s, dtype=np.float32)
    mx, my, mz = np.meshgrid(gx, gx, gx, indexing="ij")
    pos = np.stack([mx.ravel(), my.ravel(), mz.ravel()], -1)[None]
    print("Dataloading is over.")

    model = get_model(args.model)(
        space_dim=3,
        n_layers=args.n_layers,
        n_hidden=args.n_hidden,
        dropout=args.dropout,
        n_head=args.n_heads,
        mlp_ratio=args.mlp_ratio,
        fun_dim=1,
        out_dim=1,
        slice_num=args.slice_num,
        ref=args.ref,
        unified_pos=bool(args.unified_pos),
        H=s, W=s, D=s,
        use_checkpoint=bool(args.use_checkpoint),
        impl=args.impl,
        precision=args.precision,
        dtype=model_dtype(args),
    )
    bsz = args.batch_size
    steps_per_epoch = (ntrain + bsz - 1) // bsz
    tx = make_optimizer(
        args.lr, args.epochs * steps_per_epoch, args.weight_decay,
        args.max_grad_norm,
    )

    def loss_fn(params, apply_fn, x, fx, y):
        out = apply_fn({"params": params}, x, fx)[..., 0]
        return rel_lp(out, y, reduction="sum"), {}

    @jax.jit
    def predict(params, x, fx):
        return model.apply({"params": params}, x, fx)[..., 0]

    def evaluate(params):
        rel = 0.0
        for idx in epoch_batches(np.random.default_rng(0), ntest, bsz, shuffle=False):
            out = predict(
                params, put(pos.repeat(len(idx), 0)),
                put(x_test[idx]),
            )
            rel += float(rel_lp(out, put(y_test[idx]), reduction="sum"))
        return rel / ntest

    state = create_train_state(
        jax.random.PRNGKey(args.seed), model,
        (jnp.zeros((1, n, 3)), jnp.zeros((1, n, 1))), tx,
    )
    state, start_step = maybe_resume(state, args)
    start_epoch = start_step // steps_per_epoch
    count_parameters(state.params)
    update = make_update_fn(loss_fn)

    eval_every = max(1, getattr(args, "eval_every", 1))
    metrics = MetricsLogger(args.metrics_file, samples_per_epoch=ntrain)
    data_rng = np.random.default_rng(args.seed)
    rel = float("nan")
    for ep in range(start_epoch, args.epochs):
        train_loss = 0.0
        for idx in epoch_batches(data_rng, ntrain, bsz):
            state, (loss, _) = update(
                state, put(pos.repeat(len(idx), 0)),
                put(x_train[idx]), put(y_train[idx]),
            )
            train_loss += float(loss)
        print(
            "Epoch {} Train loss : {:.5f}".format(ep, train_loss / ntrain)
        )
        evaluated = ep % eval_every == 0 or ep == args.epochs - 1
        if evaluated:
            rel = evaluate(state.params)
            print(f"rel_err:{rel}")
        metrics.log(
            ep, train_loss=train_loss / ntrain,
            **(dict(test_rel=rel) if evaluated else {}),
        )
        if ep % 10 == 0:
            save_params(checkpoint_path(args.save_name), state.params, state.step)
            save_state(state, args)

    print("save model")
    save_params(checkpoint_path(args.save_name), state.params, state.step)
    save_state(state, args)
    return evaluate(state.params)


if __name__ == "__main__":
    main()
