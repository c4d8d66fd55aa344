"""Darcy flow benchmark trainer (reference: ``exp_darcy.py``).

Steady-state operator learning on the 421^2 -> downsampled structured grid:
rel-L2 on the denormalized solution + 0.1 x central-difference derivative
regularizer (``exp_darcy.py:213-226``), AdamW + OneCycle, per-epoch eval.
The reference hard-codes ``epochs=500`` for the scheduler regardless of
``--epochs`` (``exp_darcy.py:44``) -- here the flag is respected.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..data.datasets import load_darcy, meshgrid_pos
from ..models import get_model
from ..train.checkpoint import save_params
from ..train.loop import create_train_state, make_update_fn
from ..train.optim import make_optimizer
from ..utils.losses import central_diff, rel_lp
from .common import (
    MetricsLogger,
    maybe_resume,
    save_state,
    dp_put,
    model_dtype,
    base_parser,
    checkpoint_path,
    count_parameters,
    epoch_batches,
    maybe_load_params,
    save_figures,
)


def build_argparser():
    return base_parser(
        "Training Transolver (Darcy)",
        model="Transolver_2D",
        save_name="darcy_Transolver",
        downsample=5,
    )


def make_loss_fn(y_mean, y_std, s, deriv_weight=0.1):
    dx = 1.0 / s

    def loss_fn(params, apply_fn, x, fx, y):
        out = apply_fn({"params": params}, x, fx[..., None])[..., 0]
        out = out * y_std + y_mean  # decode
        l2 = rel_lp(out, y, reduction="sum")

        # boundary ring of the prediction zeroed before differencing
        og = out.reshape(out.shape[0], s, s)
        og = og.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
        og = og.at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
        pgx, pgy = central_diff(og.reshape(out.shape[0], -1, 1), dx, s)
        ggx, ggy = central_diff(y[..., None], dx, s)
        deriv = rel_lp(pgx, ggx, reduction="sum") + rel_lp(pgy, ggy, reduction="sum")
        loss = deriv_weight * deriv + l2
        return loss, {"l2": l2, "deriv": deriv}

    return loss_fn


def main(argv=None):
    from ..utils.platform import select_platform

    select_platform()
    args = build_argparser().parse_args(argv)
    put = dp_put(getattr(args, "mesh", "auto"))
    r = args.downsample
    ntest = 200

    x_train, y_train, x_test, y_test, s = load_darcy(
        args.data_path, args.ntrain, ntest, r, synth_n=args.synth_n
    )
    ntrain, ntest = x_train.shape[0], x_test.shape[0]

    # UnitTransformer stats (torch-parity: mean/std over dims (0,1), ddof=1)
    xm, xs = x_train.mean(), x_train.std(ddof=1) + 1e-8
    ym, ys = y_train.mean(), y_train.std(ddof=1) + 1e-8
    x_train_n = (x_train - xm) / xs
    x_test_n = (x_test - xm) / xs
    y_train_n = (y_train - ym) / ys

    pos = meshgrid_pos(s)
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
        H=s,
        W=s,
        impl=args.impl,
        precision=args.precision,
        dtype=model_dtype(args),
    )

    bsz = args.batch_size
    sample = (
        jnp.zeros((1, s * s, 2)),
        jnp.zeros((1, s * s, 1)),
    )
    steps_per_epoch = (ntrain + bsz - 1) // bsz
    tx = make_optimizer(
        args.lr, args.epochs * steps_per_epoch, args.weight_decay, args.max_grad_norm
    )

    @jax.jit
    def predict(params, x, fx):
        out = model.apply({"params": params}, x, fx[..., None])[..., 0]
        return out * ys + ym

    def evaluate(params):
        rel_err = 0.0
        for idx in epoch_batches(np.random.default_rng(0), ntest, bsz, shuffle=False):
            x = put(pos.repeat(len(idx), 0))
            fx = put(x_test_n[idx])
            out = predict(params, x, fx)
            rel_err += float(rel_lp(out, put(y_test[idx]), reduction="sum"))
        return rel_err / ntest

    if args.eval:
        template = model.init(jax.random.PRNGKey(0), *sample)["params"]
        params = maybe_load_params(args.save_name, template, geometry="grid2d")
        print("model evaluation")
        count_parameters(params)
        rel_err = evaluate(params)
        # figure dumps for the first few cases, like exp_darcy.py:166-200
        for i in range(min(9, ntest)):
            x = put(pos)
            fx = put(x_test_n[i : i + 1])
            out = np.asarray(predict(params, x, fx))[0].reshape(s, s)
            gt = y_test[i].reshape(s, s)
            save_figures(
                args.save_name,
                i + 1,
                {
                    "pred": out,
                    "gt": gt,
                    "error": gt - out,
                    "input": x_test_n[i].reshape(s, s),
                },
                clims={"error": (-0.0005, 0.0005)},
            )
        print(f"rel_err:{rel_err}")
        return rel_err

    rng = jax.random.PRNGKey(args.seed)
    state = create_train_state(rng, model, sample, tx)
    state, start_step = maybe_resume(state, args)
    steps_per_epoch = (ntrain + bsz - 1) // bsz
    start_epoch = start_step // steps_per_epoch
    count_parameters(state.params)
    loss_fn = make_loss_fn(ym, ys, s)
    update = make_update_fn(loss_fn)

    # one-dispatch epochs (see train.loop.make_epoch_fn): the canonical
    # 1000-sample batch-4 config makes 250 dispatches/epoch otherwise,
    # which the remote accelerator transport turns into minutes per epoch
    import os as _os

    scan_epochs = (
        ntrain % bsz == 0 and ntest % bsz == 0
        and jax.device_count() == 1
        and _os.environ.get("TBNSS_EPOCH_SCAN", "1") == "1"
    )
    if scan_epochs:
        from ..train.loop import make_epoch_fn, make_eval_fn

        pos_d = jnp.asarray(pos)
        fx_all = jnp.asarray(x_train_n)
        y_all = jnp.asarray(y_train)
        fxt_all = jnp.asarray(x_test_n)
        yt_all = jnp.asarray(y_test)

        # datasets thread through as explicit jit args, not closure
        # constants (relay ~300 MB compile-payload limit; CLAUDE.md)
        def gather(idx, fx_c, y_c):
            xb = jnp.broadcast_to(
                pos_d, (idx.shape[0],) + pos_d.shape[1:]
            )
            return xb, fx_c[idx], y_c[idx]

        epoch_fn = make_epoch_fn(loss_fn, gather)
        eval_total = make_eval_fn(
            lambda p, x, fx, y: rel_lp(
                predict(p, x, fx), y, reduction="sum"
            ),
            gather,
        )
        eval_idx = jnp.arange(ntest).reshape(-1, bsz)

        def evaluate(params):  # noqa: F811 -- scan-epoch variant
            return float(eval_total(params, eval_idx, fxt_all, yt_all)) / ntest

    metrics = MetricsLogger(args.metrics_file, samples_per_epoch=ntrain)
    data_rng = np.random.default_rng(args.seed)
    eval_every = max(1, getattr(args, "eval_every", 1))
    for ep in range(start_epoch, args.epochs):
        if scan_epochs:
            idx_mat = jnp.asarray(
                data_rng.permutation(ntrain).reshape(-1, bsz)
            )
            state, (_, auxs) = epoch_fn(state, idx_mat, fx_all, y_all)
            train_loss = float(auxs["l2"].sum())
            reg = float(auxs["deriv"].sum())
        else:
            train_loss = reg = 0.0
            for idx in epoch_batches(data_rng, ntrain, bsz):
                x = put(pos.repeat(len(idx), 0))
                fx = put(x_train_n[idx])
                y = put(y_train[idx])  # reference decodes target before loss
                state, (loss, aux) = update(state, x, fx, y)
                train_loss += float(aux["l2"])
                reg += float(aux["deriv"])
        print(
            "Epoch {} Reg : {:.5f} Train loss : {:.5f}".format(
                ep, reg / ntrain, train_loss / ntrain
            )
        )
        if ep % eval_every == 0 or ep == args.epochs - 1:
            rel_err = evaluate(state.params)
            print(f"rel_err:{rel_err}")
            metrics.log(ep, train_loss=train_loss / ntrain, reg=reg / ntrain,
                        rel_err=rel_err)
        else:  # skipped eval (--eval_every): record train metrics only
            metrics.log(ep, train_loss=train_loss / ntrain, reg=reg / ntrain)
        # Save at every eval point (>= every 10 epochs), not the reference's
        # ep % 100: a relay hang + kill at epoch 73 of a 100-epoch run left
        # only the epoch-0 state on disk (round-5 depth study), losing the
        # whole run.  Writes are ~1 s host-side — negligible vs an epoch.
        if ep % max(min(eval_every, 10), 1) == 0:
            print("save model")
            save_params(checkpoint_path(args.save_name), state.params, state.step)
            save_state(state, args)

    print("save model")
    save_params(checkpoint_path(args.save_name), state.params, state.step)
    save_state(state, args)
    return evaluate(state.params)


if __name__ == "__main__":
    main()
