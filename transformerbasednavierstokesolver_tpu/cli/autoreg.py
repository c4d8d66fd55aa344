"""Shared autoregressive benchmark runner.

The teacher-forced-train / closed-loop-eval shape of ``exp_ns.py:185-246``
and ``ns_velocity.py`` (identical up to ``step``/``out_dim`` and the data
source), as jitted ``lax.scan`` loops.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..train.autoregressive import closed_loop_rollout, make_teacher_forced_loss
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


def run_autoregressive(
    args, model, pos, train_a, train_u, test_a, test_u, T, step,
    remat=False,
):
    # --remat (default on) overrides the caller's default: without it the
    # flagship config (batch 8, hidden 256, T=10 BPTT) holds ~22 GB of
    # activations and OOMs a 16 GB chip (docs/PERF.md)
    remat = {"0": False, "1": True, "half": "half"}.get(
        str(getattr(args, "remat", remat)), remat
    )
    ntrain, ntest = train_a.shape[0], test_a.shape[0]
    t_in = train_a.shape[-1]
    n = train_a.shape[1]
    bsz = args.batch_size
    # --aug_roll: anti-diagonal torus translation augmentation.  The FNO NS
    # forcing 0.1(sin+cos)(2pi(x+y)) is invariant under x->x+s, y->y-s, and
    # the other NS terms and the GRF IC distribution are translation-
    # equivariant, so (roll(a), roll(u)) with a shared per-sample shift is
    # an exact new training pair.  Positions stay fixed: we augment the
    # operator's graph, not the coordinate chart.  (Deliberate flag-gated
    # addition over /root/reference/exp_ns.py, which trains unaugmented.)
    aug_roll = bool(getattr(args, "aug_roll", 0))
    side = int(round(n ** 0.5))
    if aug_roll and side * side != n:
        raise ValueError(f"--aug_roll needs a square grid, got n={n}")

    def roll_batch(f, s):
        # f: (b, n, c), s: (b,) int grid shifts; rolls each sample's
        # (side, side) field by (s, -s) on the torus
        def one(fi, si):
            g = fi.reshape(side, side, -1)
            return jnp.roll(g, (si, -si), (0, 1)).reshape(fi.shape)

        return jax.vmap(one)(f, s)
    steps_per_epoch = (ntrain + bsz - 1) // bsz
    tx = make_optimizer(
        args.lr, args.epochs * steps_per_epoch, args.weight_decay,
        args.max_grad_norm,
    )
    put = dp_put(getattr(args, "mesh", "auto"))
    sample = (jnp.zeros((1, n, pos.shape[-1])), jnp.zeros((1, n, t_in)))

    @jax.jit
    def eval_batch(params, x, fx, yy):
        forward = lambda x_, f_: model.apply({"params": params}, x_, f_)
        pred = closed_loop_rollout(forward, x, fx, T // step, step)
        b = x.shape[0]
        step_loss = sum(
            rel_lp(pred[..., t : t + step].reshape(b, -1),
                   yy[..., t : t + step].reshape(b, -1), reduction="sum")
            for t in range(0, T, step)
        )
        full = rel_lp(pred.reshape(b, -1), yy.reshape(b, -1), reduction="sum")
        return step_loss, full, pred

    def evaluate(params):
        # closed-loop rollout is forward-only, so eval can batch much wider
        # than the training batch: fewer relay round-trips on 200-sim splits
        ebsz = next(b for b in (64, 50, 40, 32, 25, 20, 16, 10, 8, 5, 4, 2, 1)
                    if b <= ntest and ntest % b == 0) if ntest else bsz
        step_sum = full_sum = 0.0
        for idx in epoch_batches(np.random.default_rng(0), ntest, ebsz, shuffle=False):
            x = jnp.asarray(pos.repeat(len(idx), 0))
            s, f, _ = eval_batch(
                params, x, jnp.asarray(test_a[idx]), jnp.asarray(test_u[idx])
            )
            step_sum += float(s)
            full_sum += float(f)
        return step_sum / ntest / (T / step), full_sum / ntest

    if args.eval:
        template = model.init(jax.random.PRNGKey(0), *sample)["params"]
        params = maybe_load_params(args.save_name, template, geometry="grid2d")
        print("evaluation mode")
        count_parameters(params)
        test_step, test_full = evaluate(params)
        # per-case pred/gt/error figures of the final rollout frame, like the
        # reference's --eval renders (exp_ns.py eval / exp_airfoil.py:113-180)
        side = int(round(n ** 0.5))
        if side * side == n:
            from .common import save_figures

            for i in range(min(6, ntest)):
                x = jnp.asarray(pos)
                _, _, pred = eval_batch(
                    params, x, jnp.asarray(test_a[i : i + 1]),
                    jnp.asarray(test_u[i : i + 1]),
                )
                pr = np.asarray(pred)[0, :, -1].reshape(side, side)
                gt = np.asarray(test_u)[i, :, -1].reshape(side, side)
                save_figures(
                    args.save_name, i + 1,
                    {"pred": pr, "gt": gt, "error": gt - pr},
                )
        print(test_full)
        return params, evaluate, eval_batch, test_full

    state = create_train_state(jax.random.PRNGKey(args.seed), model, sample, tx)
    state, start_step = maybe_resume(state, args)
    start_epoch = start_step // steps_per_epoch
    count_parameters(state.params)
    loss_fn = make_teacher_forced_loss(step, remat=remat)
    update = make_update_fn(loss_fn)

    # one-dispatch epochs when the split tiles evenly (remote-dispatch
    # latency dominates the small canonical batches otherwise; see
    # train.loop.make_epoch_fn)
    import os as _os

    scan_epochs = (
        ntrain % bsz == 0 and jax.device_count() == 1
        and _os.environ.get("TBNSS_EPOCH_SCAN", "1") == "1"
    )
    if scan_epochs:
        from ..train.loop import make_epoch_fn

        pos_d = jnp.asarray(pos)
        a_all = jnp.asarray(train_a)
        u_all = jnp.asarray(train_u)

        # dataset threads through as explicit jit args (NOT a closure):
        # closed-over arrays become compile-payload constants and the
        # relay rejects the 1000-sim split with HTTP 413 (train/loop.py)
        if aug_roll:
            # per-epoch shifts ride in as an extra device arg (same shape
            # every epoch -> one compile); gather applies them on device
            def gather(idx, pos_c, a_c, u_c, s_c):
                xb = jnp.broadcast_to(pos_c, (idx.shape[0],) + pos_c.shape[1:])
                sb = s_c[idx]
                return xb, roll_batch(a_c[idx], sb), roll_batch(u_c[idx], sb)

        else:

            def gather(idx, pos_c, a_c, u_c):
                xb = jnp.broadcast_to(pos_c, (idx.shape[0],) + pos_c.shape[1:])
                return xb, a_c[idx], u_c[idx]

        epoch_fn = make_epoch_fn(loss_fn, gather)

    # the relay transport hangs intermittently on single dispatches past
    # ~1 min (CLAUDE.md); split benchmark-scale epochs into equal-shaped
    # sub-dispatches of <= TBNSS_SCAN_CHUNK samples (equal shapes keep one
    # compiled epoch_fn)
    chunk_samples = int(_os.environ.get("TBNSS_SCAN_CHUNK", "256"))
    if scan_epochs:
        n_steps = ntrain // bsz
        max_steps = max(1, chunk_samples // bsz)
        steps_per_chunk = next(
            (d for d in range(max_steps, 0, -1) if n_steps % d == 0), n_steps
        )

    eval_every = max(1, getattr(args, "eval_every", 1))
    metrics = MetricsLogger(args.metrics_file, samples_per_epoch=ntrain)
    data_rng = np.random.default_rng(args.seed)
    test_step = test_full = float("nan")
    for ep in range(start_epoch, args.epochs):
        if scan_epochs:
            idx_mat = data_rng.permutation(ntrain).reshape(-1, bsz)
            extra = (
                (jnp.asarray(data_rng.integers(0, side, ntrain)),)
                if aug_roll
                else ()
            )
            train_step_l = train_full_l = 0.0
            for c in range(0, n_steps, steps_per_chunk):
                state, (_, auxs) = epoch_fn(
                    state, jnp.asarray(idx_mat[c : c + steps_per_chunk]),
                    pos_d, a_all, u_all, *extra,
                )
                train_step_l += float(auxs["step_loss"].sum())
                train_full_l += float(auxs["full_loss"].sum())
        else:
            train_step_l = train_full_l = 0.0
            for idx in epoch_batches(data_rng, ntrain, bsz):
                x = put(pos.repeat(len(idx), 0))
                a_b, u_b = train_a[idx], train_u[idx]
                if aug_roll:
                    sb = data_rng.integers(0, side, len(idx))
                    a_b = np.stack([
                        np.roll(a_b[i].reshape(side, side, -1),
                                (sb[i], -sb[i]), (0, 1)).reshape(a_b[i].shape)
                        for i in range(len(idx))
                    ])
                    u_b = np.stack([
                        np.roll(u_b[i].reshape(side, side, -1),
                                (sb[i], -sb[i]), (0, 1)).reshape(u_b[i].shape)
                        for i in range(len(idx))
                    ])
                state, (loss, aux) = update(
                    state, x, put(a_b), put(u_b)
                )
                train_step_l += float(aux["step_loss"])
                train_full_l += float(aux["full_loss"])
        evaluated = ep % eval_every == 0 or ep == args.epochs - 1
        if evaluated:
            test_step, test_full = evaluate(state.params)
        # on skipped-eval epochs the JSONL record omits the test fields:
        # logging the stale (or, right after a resume, NaN) carry-over as if
        # current would corrupt downstream readers of the metrics file
        metrics.log(
            ep,
            train_step_loss=train_step_l / ntrain / (T / step),
            train_full_loss=train_full_l / ntrain,
            **(
                dict(test_step_loss=test_step, test_full_loss=test_full)
                if evaluated
                else {}
            ),
        )
        if evaluated:
            print(
                "Epoch {} , train_step_loss:{:.5f} , train_full_loss:{:.5f} , "
                "test_step_loss:{:.5f} , test_full_loss:{:.5f}".format(
                    ep,
                    train_step_l / ntrain / (T / step),
                    train_full_l / ntrain,
                    test_step,
                    test_full,
                )
            )
        else:  # no eval this epoch: don't print a stale test loss as current
            print(
                "Epoch {} , train_step_loss:{:.5f} , "
                "train_full_loss:{:.5f}".format(
                    ep,
                    train_step_l / ntrain / (T / step),
                    train_full_l / ntrain,
                )
            )
        # reference saves every 100 epochs (exp_ns.py:248); save every 10 so
        # the relaunch-on-hang watcher + --resume loses at most 10 epochs
        if ep % 10 == 0:
            print("save model")
            save_params(checkpoint_path(args.save_name), state.params, state.step)
            save_state(state, args)

    print("save model")
    save_params(checkpoint_path(args.save_name), state.params, state.step)
    save_state(state, args)
    return state.params, evaluate, eval_batch, evaluate(state.params)[1]
