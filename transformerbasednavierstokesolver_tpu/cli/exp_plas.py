"""Plasticity benchmark trainer (reference: ``exp_plas.py``).

Time-conditioned deformation prediction on the 101x31 extruded-BC grid:
per-timestep scalar T in [0, 1] via sinusoidal timestep embedding
(``Time_Input=True``), out_dim=4; the reference shuffles the time axis per
sample in its collate (``exp_plas.py:51-85``) and performs one optimizer
step per timestep (``exp_plas.py:247-253``) with the scheduler stepped per
batch -- reproduced here with the schedule laid out over the per-timestep
update count.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..data.datasets import load_plasticity, meshgrid_pos
from ..models import get_model
from ..train.checkpoint import save_params
from ..train.loop import create_train_state, make_update_fn
from ..train.optim import make_optimizer
from ..utils.losses import rel_lp
from .common import (
    MetricsLogger,
    dp_put,
    model_dtype,
    base_parser,
    checkpoint_path,
    count_parameters,
    epoch_batches,
    maybe_load_params,
    maybe_resume,
    save_state,
)


def build_argparser():
    p = base_parser(
        "Training Transolver (Plasticity)",
        model="Transolver_Structured_Mesh_2D",
        save_name="plas_Transolver",
        ntrain=900,
        batch_size=8,
    )
    p.add_argument(
        "--channel_weighted", type=int, default=0,
        help="train on the mean of per-channel rel-L2 instead of the "
        "flattened rel-L2: the 4 output channels' scales differ ~7x in the "
        "synthetic forging data, so the flattened loss underweights the "
        "small-scale channels (eval metric unchanged, reference-exact)",
    )
    return p


def main(argv=None):
    from ..utils.platform import select_platform

    select_platform()
    args = build_argparser().parse_args(argv)
    import sys as _sys

    if args.impl == "mega" and "--impl" not in (argv or _sys.argv):
        # measured perf carve-out, NOT a correctness gate: the fused block
        # loses ~14% at this benchmark's tiny 101x31 grid (kernel-launch
        # amortization; logs/bench_shapes_r5.json plas row), so resolved
        # 'auto' keeps the XLA path here.  An explicit --impl mega on the
        # command line is honored unchanged.
        args.impl = "xla"
    put = dp_put(getattr(args, "mesh", "auto"))
    ntest = 80

    x_train, y_train, x_test, y_test, s1, s2, T, out_dim = load_plasticity(
        args.data_path, args.ntrain, ntest, synth_n=args.synth_n
    )
    ntrain, ntest = x_train.shape[0], x_test.shape[0]

    # x UnitTransformer (exp_plas.py:119-122)
    xm = x_train.mean()
    xs = x_train.std(ddof=1) + 1e-8
    x_train = (x_train - xm) / xs
    x_test = (x_test - xm) / xs

    pos = meshgrid_pos(s1, s2)
    t_grid = np.linspace(0, 1, T, dtype=np.float32)
    print("Dataloading is over.")

    model = get_model(args.model)(
        space_dim=2,
        n_hidden=args.n_hidden,
        n_layers=args.n_layers,
        Time_Input=True,
        n_head=args.n_heads,
        fun_dim=1,
        out_dim=out_dim,
        mlp_ratio=args.mlp_ratio,
        slice_num=args.slice_num,
        ref=args.ref,
        unified_pos=bool(args.unified_pos),
        H=s1,
        W=s2,
        impl=args.impl,
        precision=args.precision,
        dtype=model_dtype(args),
    )
    bsz = args.batch_size
    steps_per_epoch = (ntrain + bsz - 1) // bsz
    tx = make_optimizer(
        args.lr, args.epochs * steps_per_epoch * T, args.weight_decay,
        args.max_grad_norm,
    )
    sample = (
        jnp.zeros((1, s1 * s2, 2)),
        jnp.zeros((1, s1 * s2, 1)),
        jnp.zeros((1, 1)),
    )

    def loss_fn(params, apply_fn, x, fx, y, tt):
        im = apply_fn({"params": params}, x, fx, tt)
        b = x.shape[0]
        if args.channel_weighted:
            c = im.shape[-1]
            l = sum(
                rel_lp(im[..., j].reshape(b, -1), y[..., j].reshape(b, -1),
                       reduction="sum")
                for j in range(c)
            ) / c
            return l, {}
        return rel_lp(im.reshape(b, -1), y.reshape(b, -1), reduction="sum"), {}

    @jax.jit
    def predict(params, x, fx, tt):
        return model.apply({"params": params}, x, fx, tt)

    def evaluate(params):
        step_sum = full_sum = 0.0
        for idx in epoch_batches(np.random.default_rng(0), ntest, bsz, shuffle=False):
            b = len(idx)
            x = put(pos.repeat(b, 0))
            fx = put(x_test[idx])
            yy = y_test[idx]  # [b, N, 4, T]
            preds = []
            for t in range(T):
                tt = jnp.full((b, 1), t_grid[t])
                im = predict(params, x, fx, tt)
                preds.append(np.asarray(im))
                step_sum += float(
                    rel_lp(im.reshape(b, -1),
                           put(yy[..., t].reshape(b, -1)),
                           reduction="sum")
                )
            pred = np.stack(preds, axis=-1)
            full_sum += float(
                rel_lp(put(pred.reshape(b, -1)),
                       put(yy.reshape(b, -1)), reduction="sum")
            )
        return step_sum / ntest / T, full_sum / ntest

    if args.eval:
        template = model.init(jax.random.PRNGKey(0), *sample)["params"]
        params = maybe_load_params(args.save_name, template, geometry="grid2d")
        count_parameters(params)
        ts, tf = evaluate(params)
        print("test_step_loss:{:.5f} , test_full_loss:{:.5f}".format(ts, tf))
        return tf

    state = create_train_state(jax.random.PRNGKey(args.seed), model, sample, tx)
    state, start_step = maybe_resume(state, args)
    start_epoch = start_step // (steps_per_epoch * T)
    count_parameters(state.params)
    update = make_update_fn(loss_fn)

    # one-dispatch epochs over the (batch, permuted-time) update sequence:
    # the reference's per-timestep backward (exp_plas.py:247-253) is
    # steps*T tiny dispatches/epoch otherwise (see train.loop.make_epoch_fn)
    import os as _os

    scan_epochs = (
        ntrain % bsz == 0 and jax.device_count() == 1
        and _os.environ.get("TBNSS_EPOCH_SCAN", "1") == "1"
    )
    if scan_epochs:
        from ..train.loop import make_epoch_fn

        pos_d = jnp.asarray(pos)
        fx_all = jnp.asarray(x_train)
        y_all = jnp.asarray(y_train)
        t_grid_d = jnp.asarray(t_grid)

        # dataset threads through as explicit jit args, not closures: the
        # reference-scale y (900 x 3131 x 4 x 20 f32 ~ 900 MB) would blow
        # the relay's ~300 MB compile-payload limit as a traced constant
        def gather(carry, pos_c, fx_c, y_c, tg_c):
            idxb, pt = carry  # [bsz], [bsz]
            xb = jnp.broadcast_to(pos_c, (idxb.shape[0],) + pos_c.shape[1:])
            fxb = fx_c[idxb]
            y_t = jnp.take_along_axis(
                y_c[idxb], pt[:, None, None, None], axis=-1
            )[..., 0]
            tt = tg_c[pt][:, None]
            return xb, fxb, y_t, tt

        epoch_fn = make_epoch_fn(loss_fn, gather)

    metrics = MetricsLogger(args.metrics_file, samples_per_epoch=ntrain)
    data_rng = np.random.default_rng(args.seed)
    eval_every = max(1, getattr(args, "eval_every", 1))
    for ep in range(start_epoch, args.epochs):
        if scan_epochs:
            steps = ntrain // bsz
            idx_mat = data_rng.permutation(ntrain).reshape(steps, bsz)
            perms = np.stack(
                [np.stack([data_rng.permutation(T) for _ in range(bsz)])
                 for _ in range(steps)]
            )  # [steps, bsz, T]
            idx_rep = np.repeat(idx_mat[:, None, :], T, axis=1).reshape(-1, bsz)
            pt_flat = perms.transpose(0, 2, 1).reshape(-1, bsz)
            state, (losses, _) = epoch_fn(
                state, (jnp.asarray(idx_rep), jnp.asarray(pt_flat)),
                pos_d, fx_all, y_all, t_grid_d,
            )
            train_step_l = float(losses.sum())
        else:
            train_step_l = 0.0
            for idx in epoch_batches(data_rng, ntrain, bsz):
                b = len(idx)
                x = put(pos.repeat(b, 0))
                fx = put(x_train[idx])
                yy = y_train[idx]
                # per-sample random time permutation (random_collate_fn parity)
                perms = np.stack([data_rng.permutation(T) for _ in range(b)])
                for t in range(T):
                    pt = perms[:, t]
                    y_t = np.take_along_axis(
                        yy, pt[:, None, None, None], axis=-1
                    )[..., 0]
                    tt = put(t_grid[pt][:, None])
                    state, (loss, _) = update(
                        state, x, fx, put(y_t), tt
                    )
                    train_step_l += float(loss)
        if ep % eval_every == 0 or ep == args.epochs - 1:
            ts, tf = evaluate(state.params)
            metrics.log(
                ep,
                train_step_loss=train_step_l / ntrain / T,
                test_step_loss=ts,
                test_full_loss=tf,
            )
            print(
                "Epoch {} , train_step_loss:{:.5f} , test_step_loss:{:.5f} , "
                "test_full_loss:{:.5f}".format(
                    ep, train_step_l / ntrain / T, ts, tf
                )
            )
        else:  # skipped eval (--eval_every): record train metrics only
            metrics.log(ep, train_step_loss=train_step_l / ntrain / T)
            print(
                "Epoch {} , train_step_loss:{:.5f}".format(
                    ep, train_step_l / ntrain / T
                )
            )
        # reference saves every 100 (exp_plas.py:262); every 10 here so the
        # relaunch-on-hang watcher + --resume loses at most 10 epochs
        # every 5 (vs the autoreg trainers' 10): plasticity epochs are the
        # slowest in the suite (~3-6 min under a shared relay), so a
        # timeout-restart otherwise redoes up to 10 x 5 min of work
        if ep % 5 == 0:
            print("save model")
            save_params(checkpoint_path(args.save_name), state.params, state.step)
            save_state(state, args)

    print("save model")
    save_params(checkpoint_path(args.save_name), state.params, state.step)
    save_state(state, args)
    return evaluate(state.params)[1]


if __name__ == "__main__":
    main()
