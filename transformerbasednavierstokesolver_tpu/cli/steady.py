"""Shared steady-state benchmark runner.

Elasticity, Airfoil and Pipe are the same training shape
(``exp_elas.py:158-185``, ``exp_airfoil.py:181-210``, ``exp_pipe.py:199-230``):
``out = model(x, None)``, rel-L2 loss (optionally on normalizer-decoded
fields), AdamW + scheduler, per-epoch eval -- only the data loading,
normalizers, geometry and schedule differ.  One jitted runner serves all
three.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..train.checkpoint import save_params
from ..train.loop import create_train_state, make_update_fn
from ..train.optim import make_optimizer
from ..utils.losses import rel_lp
from .common import (
    MetricsLogger,
    checkpoint_path,
    count_parameters,
    dp_put,
    epoch_batches,
    maybe_load_params,
    maybe_resume,
    save_state,
)


def run_steady(
    args,
    model,
    x_train,
    y_train,
    x_test,
    y_test,
    *,
    geometry="grid2d",
    y_stats=None,  # (mean, std): predictions are decoded; targets stay raw
    schedule="onecycle",
    schedule_per_epoch=False,
    eval_figures=None,  # callable(params, predict) for --eval figure dumps
    loss_weight=None,  # [N] per-point TRAIN loss weights; eval metric unchanged
):
    ntrain, ntest = x_train.shape[0], x_test.shape[0]
    bsz = args.batch_size
    steps_per_epoch = (ntrain + bsz - 1) // bsz
    total = args.epochs * (1 if schedule_per_epoch else steps_per_epoch)
    tx = make_optimizer(
        args.lr, total, args.weight_decay, args.max_grad_norm,
        schedule=schedule,
        sched_divisor=steps_per_epoch if schedule_per_epoch else 1,
    )

    ym, ys = (0.0, 1.0) if y_stats is None else y_stats

    lw = None if loss_weight is None else jnp.asarray(loss_weight, jnp.float32)

    def loss_fn(params, apply_fn, x, y):
        out = apply_fn({"params": params}, x, None)[..., 0]
        out = out * ys + ym
        if lw is None:
            return rel_lp(out, y, reduction="sum"), {}
        # weighted relative L2 (||w.(out-y)|| / ||w.y||): steers capacity
        # toward the hard region (e.g. the airfoil near-surface band, where
        # the error concentrates ~16x) without changing the eval metric
        b = out.shape[0]
        num = jnp.linalg.norm(((out - y) * lw).reshape(b, -1), axis=1)
        den = jnp.linalg.norm((y * lw).reshape(b, -1), axis=1)
        return jnp.sum(num / den), {}

    @jax.jit
    def predict(params, x):
        out = model.apply({"params": params}, x, None)[..., 0]
        return out * ys + ym

    def evaluate(params):
        rel = 0.0
        for idx in epoch_batches(np.random.default_rng(0), ntest, bsz, shuffle=False):
            out = predict(params, jnp.asarray(x_test[idx]))
            rel += float(rel_lp(out, jnp.asarray(y_test[idx]), reduction="sum"))
        return rel / ntest

    sample = (jnp.zeros((1,) + x_train.shape[1:]),)

    if args.eval:
        template = model.init(jax.random.PRNGKey(0), sample[0], None)["params"]
        params = maybe_load_params(args.save_name, template, geometry=geometry)
        count_parameters(params)
        rel_err = evaluate(params)
        if eval_figures is not None:
            eval_figures(params, predict)
        print(f"rel_err:{rel_err}")
        return rel_err

    state = create_train_state(
        jax.random.PRNGKey(args.seed), model, sample + (None,), tx
    )
    state, start_step = maybe_resume(state, args)
    start_epoch = start_step // max(steps_per_epoch, 1)
    count_parameters(state.params)
    update = make_update_fn(loss_fn)

    put = dp_put(getattr(args, "mesh", "auto"))
    # one-dispatch epochs when the splits tile evenly and fit on device
    # (avoids per-minibatch dispatch latency; see train.loop.make_epoch_fn)
    scan_epochs = (
        ntrain % bsz == 0 and ntest % bsz == 0
        and jax.device_count() == 1
        and os.environ.get("TBNSS_EPOCH_SCAN", "1") == "1"
    )
    if scan_epochs:
        from ..train.loop import make_epoch_fn, make_eval_fn

        x_all = jnp.asarray(x_train)
        y_all = jnp.asarray(y_train)
        xt_all = jnp.asarray(x_test)
        yt_all = jnp.asarray(y_test)
        # datasets thread through as explicit jit args: closed-over device
        # arrays become compile-payload constants, and the pipe split
        # (~200 MB) sits close to the relay's ~300 MB remote-compile limit
        # (train/loop.py make_epoch_fn docstring; CLAUDE.md)
        epoch_fn = make_epoch_fn(
            loss_fn, lambda idx, x, y: (x[idx], y[idx])
        )
        eval_total = make_eval_fn(
            lambda p, x, y: rel_lp(
                predict(p, x), y, reduction="sum"
            ),
            lambda idx, x, y: (x[idx], y[idx]),
        )
        eval_idx = jnp.arange(ntest).reshape(-1, bsz)

        def evaluate(params):  # noqa: F811 -- scan-epoch variant
            return float(eval_total(params, eval_idx, xt_all, yt_all)) / ntest

    metrics = MetricsLogger(args.metrics_file, samples_per_epoch=ntrain)
    data_rng = np.random.default_rng(args.seed)
    eval_every = max(1, getattr(args, "eval_every", 1))
    for ep in range(start_epoch, args.epochs):
        if scan_epochs:
            idx_mat = jnp.asarray(
                data_rng.permutation(ntrain).reshape(-1, bsz)
            )
            state, (losses, _) = epoch_fn(state, idx_mat, x_all, y_all)
            train_loss = float(losses.sum())
        else:
            train_loss = 0.0
            for idx in epoch_batches(data_rng, ntrain, bsz):
                x = put(x_train[idx])
                y = put(y_train[idx])
                state, (loss, _) = update(state, x, y)
                train_loss += float(loss)
        print("Epoch {} Train loss : {:.5f}".format(ep, train_loss / ntrain))
        if ep % eval_every == 0 or ep == args.epochs - 1:
            rel_err = evaluate(state.params)
            metrics.log(ep, train_loss=train_loss / ntrain, rel_err=rel_err)
            print(f"rel_err:{rel_err}")
        else:  # skipped eval (--eval_every): record train metrics only
            metrics.log(ep, train_loss=train_loss / ntrain)
        if ep % 100 == 0:
            print("save model")
            save_params(checkpoint_path(args.save_name), state.params, state.step)
            save_state(state, args)

    print("save model")
    save_params(checkpoint_path(args.save_name), state.params, state.step)
    save_state(state, args)
    return evaluate(state.params)
