"""SequenSolver trainers (reference: ``SequenSolverMerged.py:347-523`` and
``SequenSolver.py:469-645``).

Latent-space next-frame prediction: a frozen pretrained Transolver encoder
maps frames to slice-token codes; a causal temporal transformer predicts the
next code; learned slice weights deslice it back to a field.  Teacher-forced
training (gt frame appended to the history), closed-loop rollout eval.

The frozen encoder's parameters sit under the ``encoder`` subtree and are
masked out of the optimizer (``freeze_subtrees``); its outputs carry
``stop_gradient``.  Flags match the reference's 4-flag parser
(``SequenSolverMerged.py:528-535``) plus the shared extras.
"""

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..data.datasets import load_ns_vorticity
from ..models.sequensolver import SequenSolver, SequenSolverMerged
from ..ops.embedding import unified_pos_grid_2d
from ..train.checkpoint import restore_params, save_params
from ..train.loop import make_update_fn
from ..train.optim import freeze_subtrees, make_optimizer
from ..utils.losses import rel_lp
from .common import (
    MetricsLogger,
    count_parameters,
    dp_put,
    epoch_batches,
    maybe_resume,
    save_state,
    train_state_path,
)

T_IN = 10
T_OUT = 10
H = W = 64


def build_argparser():
    p = argparse.ArgumentParser("Training SequenSolver")
    p.add_argument("--eval", type=int, default=0)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--save_name", type=str, default="buff")
    p.add_argument("--sim_num", type=int, default=10)
    p.add_argument("--variant", type=str, default="merged",
                   choices=["merged", "original"])
    p.add_argument("--encoder_path", type=str,
                   default="./sequential_checkpoints/encoder.ckpt")
    p.add_argument("--data_path", type=str, default="/data/fno")
    p.add_argument("--synth_n", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_gt_epochs", type=int, default=5,
                   help="original variant: epochs using gt slice weights")
    # size knobs for smoke tests; defaults = the reference's hard-coded config
    p.add_argument("--layers", type=int, default=None,
                   help="temporal layers (default: 8 merged / 5 original)")
    p.add_argument("--encoder_layers", type=int, default=8)
    p.add_argument("--latent_m", type=int, default=16,
                   help="latent slice-token count M (reference fixes 16, "
                        "SequenSolverMerged.ipynb; the r4 budget study "
                        "widens to 32 -- VERDICT item 5)")
    p.add_argument("--latent_c", type=int, default=32,
                   help="latent code width C per token (reference fixes 32; "
                        "the matching auto_encoder run must use "
                        "--n-hidden C --slice_num M)")
    # observability/restart extras shared with the field trainers
    # (cli/common.py conventions): the 400-sim merged run is >1 h under the
    # relay, so losing it to a transport hiccup is not acceptable
    p.add_argument("--resume", type=int, default=0)
    p.add_argument("--metrics_file", type=str, default=None)
    p.add_argument("--eval_every", type=int, default=1)
    # Joint encoder fine-tuning (merged variant; extension, no reference
    # counterpart — the reference keeps the encoder frozen forever,
    # SequenSolverMerged.py:84-86): the LAST K epochs unfreeze the encoder
    # and train everything end-to-end on the rollout objective with a
    # fresh short OneCycle at --finetune_lr (default lr/10).  The main
    # phase's schedule is shortened to complete before the switch.
    p.add_argument("--max_grad_norm", type=float, default=None,
                   help="global-norm gradient clip (main AND ft phases); "
                        "the w64 merged run diverged 2 epochs into ft "
                        "without it (session 4)")
    p.add_argument("--finetune_epochs", type=int, default=0)
    p.add_argument("--finetune_lr", type=float, default=None)
    # Rollout-objective training (merged variant; extension — the reference
    # only ever trains teacher-forced, SequenSolverMerged.py:446-476, and
    # its closed-loop rollouts compound accordingly): train directly on the
    # T_OUT-step closed-loop prediction, i.e. the eval metric itself.
    p.add_argument("--rollout_loss", type=int, default=0,
                   help="merged: replace the teacher-forced loss with the "
                        "closed-loop multi-step loss (per-frame rel-L2 sum "
                        "over a T_OUT-step autoregressive rollout)")
    p.add_argument("--rollout_bptt", type=int, default=1,
                   help="with --rollout_loss: backprop THROUGH the frozen "
                        "encoder's re-encoding of predicted frames (encoder "
                        "params stay optimizer-frozen; 0 = stop-gradient "
                        "feedback, scheduled-sampling style)")
    p.add_argument("--init_from", type=str, default=None,
                   help="warm-start params (incl. encoder) from a prior "
                        "merged checkpoint, with a FRESH schedule — for "
                        "rollout fine-tuning from a teacher-forced run")
    return p


def seq_ckpt(name):
    os.makedirs("./sequential_checkpoints", exist_ok=True)
    return os.path.join("./sequential_checkpoints", name + ".ckpt")


def load_encoder_params(path, template):
    """Load pretrained encoder params from a native ckpt or reference .pt."""
    if path.endswith(".pt") and os.path.exists(path):
        from ..train.checkpoint import import_torch_state_dict

        return import_torch_state_dict(path, geometry="grid2d", variant="encoder")
    if os.path.exists(path):
        return restore_params(path, template)
    import warnings

    warnings.warn(
        f"encoder checkpoint {path!r} not found -- using randomly initialized "
        f"(frozen) encoder; train one with auto_encoder.py first."
    )
    return template


def main(argv=None):
    from ..utils.platform import select_platform

    select_platform()
    args = build_argparser().parse_args(argv)
    put = dp_put(getattr(args, "mesh", "auto"))

    ntrain = args.sim_num
    ntest = 10
    train_a, train_u, test_a, test_u, h = load_ns_vorticity(
        args.data_path, ntrain, ntest, T_IN, T_OUT, 1, synth_sims=args.synth_n
    )
    ntrain, ntest = train_a.shape[0], test_a.shape[0]
    assert h == H

    pos = unified_pos_grid_2d(H, W, 8)  # [1, N, 64]
    pos2d = None
    if args.variant == "original":
        gx = np.linspace(0, 1, h, dtype=np.float32)
        mx, my = np.meshgrid(gx, gx)
        pos2d = np.stack([mx.ravel(), my.ravel()], -1)[None]

    if args.variant == "merged":
        model = SequenSolverMerged(T=T_IN, H=H, W=W,
                                   M=args.latent_m, C=args.latent_c,
                                   layers=args.layers or 8,
                                   sequential_head=16,
                                   encoder_layers=args.encoder_layers)
        x_feat = pos
    else:
        model = SequenSolver(T=T_IN, H=H, W=W,
                             M=args.latent_m, C=args.latent_c,
                             layers=args.layers or 8,
                             encoder_layers=args.encoder_layers)
        x_feat = pos2d

    bsz = args.batch_size
    steps_per_epoch = (ntrain + bsz - 1) // bsz
    ft_epochs = args.finetune_epochs if args.variant == "merged" else 0
    switch_epoch = args.epochs - ft_epochs
    # Original variant, phase 2 (after the use-gt epochs): the temporal
    # attention block freezes while the slice head keeps training
    # (reference ``SequenSolver.py:576-579`` freeze_attention).
    phase_keys = {"block"} if args.variant == "original" else ()
    tx = freeze_subtrees(
        make_optimizer(args.lr, switch_epoch * steps_per_epoch, 1e-5,
                       args.max_grad_norm),
        {"encoder"},
        phase_frozen_keys=phase_keys,
        phase_start_step=args.use_gt_epochs * steps_per_epoch,
    )
    sample = (
        jnp.zeros((1, H * W, x_feat.shape[-1])),
        jnp.zeros((1, H * W, T_IN)),
        jnp.zeros((1, H * W, 1)),
    )

    def init_model(rng):
        # use_gt=False exercises every parameterized path (the gt branch only
        # adds an extra encoder call on shared params)
        variables = model.init(rng, *sample, use_gt=False)
        params = variables["params"]
        enc = load_encoder_params(args.encoder_path, params["encoder"])
        params = dict(params)
        params["encoder"] = enc
        return params

    def make_loss(use_gt):
        if args.variant == "merged" and args.rollout_loss:
            # closed-loop objective: the rollout the eval measures IS the
            # training loss; per-frame rel-L2 keeps late-frame compounding
            # from drowning the early-frame signal
            def loss_fn(params, apply_fn, x, fx, yy):
                b = x.shape[0]
                pred = apply_fn(
                    {"params": params}, x, fx, T_OUT,
                    method=SequenSolverMerged.closed_loop_outputs,
                )
                loss = sum(
                    rel_lp(pred[..., t : t + 1].reshape(b, -1),
                           yy[..., t : t + 1].reshape(b, -1), reduction="sum")
                    for t in range(T_OUT)
                )
                full = rel_lp(
                    pred.reshape(b, -1), yy.reshape(b, -1), reduction="sum"
                )
                return loss, {"full": full}

            return loss_fn

        if args.variant == "merged":
            # fast path: every teacher-forced frame encoded exactly once
            def loss_fn(params, apply_fn, x, fx, yy):
                b = x.shape[0]
                pred = apply_fn(
                    {"params": params}, x, fx, yy,
                    method=SequenSolverMerged.teacher_forced_outputs,
                )
                loss = sum(
                    rel_lp(pred[..., t : t + 1].reshape(b, -1),
                           yy[..., t : t + 1].reshape(b, -1), reduction="sum")
                    for t in range(T_OUT)
                )
                full = rel_lp(
                    pred.reshape(b, -1), yy.reshape(b, -1), reduction="sum"
                )
                return loss, {"full": full}

            return loss_fn

        def loss_fn(params, apply_fn, x, fx, yy):
            b = x.shape[0]
            loss = 0.0
            preds = []
            for t in range(T_OUT):
                y = jax.lax.dynamic_slice_in_dim(yy, t, 1, axis=-1)
                im = apply_fn({"params": params}, x, fx, y, use_gt=use_gt)
                loss = loss + rel_lp(
                    im.reshape(b, -1), y.reshape(b, -1), reduction="sum"
                )
                preds.append(im)
                fx = jnp.concatenate([fx[..., 1:], y], axis=-1)
            pred = jnp.concatenate(preds, axis=-1)
            full = rel_lp(pred.reshape(b, -1), yy.reshape(b, -1), reduction="sum")
            return loss, {"full": full}

        return loss_fn

    @jax.jit
    def eval_batch(params, x, fx, yy):
        b = x.shape[0]
        if args.variant == "merged":
            # incremental token window: T x fewer frozen-encoder passes
            pred = model.apply(
                {"params": params}, x, fx, T_OUT,
                method=SequenSolverMerged.closed_loop_outputs,
            )
        else:
            preds = []
            for t in range(T_OUT):
                im = model.apply({"params": params}, x, fx, None, use_gt=False)
                preds.append(im)
                fx = jnp.concatenate([fx[..., 1:], im], axis=-1)
            pred = jnp.concatenate(preds, axis=-1)
        loss = sum(
            rel_lp(pred[..., t : t + 1].reshape(b, -1),
                   yy[..., t : t + 1].reshape(b, -1), reduction="sum")
            for t in range(T_OUT)
        )
        full = rel_lp(pred.reshape(b, -1), yy.reshape(b, -1), reduction="sum")
        first = rel_lp(
            pred[..., :1].reshape(b, -1), yy[..., :1].reshape(b, -1),
            reduction="sum",
        )
        return loss, full, first

    def evaluate(params):
        s = f = fi = 0.0
        for idx in epoch_batches(np.random.default_rng(0), ntest, bsz, shuffle=False):
            x = put(x_feat.repeat(len(idx), 0))
            a, b_, c = eval_batch(
                params, x, put(test_a[idx]), put(test_u[idx])
            )
            s += float(a); f += float(b_); fi += float(c)
        return s / ntest / T_IN, f / ntest, fi / ntest

    if args.eval:
        rng = jax.random.PRNGKey(0)
        template = init_model(rng)
        params = restore_params(seq_ckpt(args.save_name), template)
        print("evaluation mode")
        _, full, _ = evaluate(params)
        print(full)
        return full

    params = init_model(jax.random.PRNGKey(args.seed))
    if args.init_from:
        params = restore_params(args.init_from, params)
        print(f"warm-started params from {args.init_from} (fresh schedule)")
    from ..train.loop import TrainState

    # --rollout_bptt trains through the re-encoding of predicted frames:
    # the finetune_encoder=True clone drops the stop_gradients (the encoder
    # SUBTREE stays frozen via the optimizer mask above), so the rollout
    # loss at step t reaches the parameters through all t-1 feedback hops
    # instead of only the last one.  Forward math is identical.
    train_apply = (
        model.clone(finetune_encoder=True).apply
        if (args.variant == "merged" and args.rollout_loss
            and args.rollout_bptt)
        else model.apply
    )
    state = TrainState.create(apply_fn=train_apply, params=params, tx=tx)
    state, start_step = maybe_resume(
        state, args, ckpt_path=seq_ckpt(args.save_name)
    )
    start_epoch = start_step // steps_per_epoch
    count_parameters(state.params)

    in_finetune = False
    switch_step = switch_epoch * steps_per_epoch

    def to_finetune(state, ft_step=0):
        """Switch to the joint encoder fine-tune phase (see argparser).

        New TrainState: apply_fn from the finetune_encoder=True module
        (drops the stop_gradients), an unmasked fresh OneCycle over the
        remaining ft steps, optimizer state reset (the phase boundary is a
        schedule restart, like the reference's own phase switches).

        ``ft_step``: ft-local step to advance the fresh schedule/step
        counters to on a params-only resume into the ft phase.
        """
        model_ft = model.clone(finetune_encoder=True)
        lr_ft = args.finetune_lr if args.finetune_lr is not None else args.lr / 10
        # honor --max_grad_norm in the ft phase too: the session-4 w64 run
        # diverged (0.15 -> 0.96 train) exactly 2 epochs into ft, where the
        # fresh OneCycle ramps the joint-encoder LR while clipping was
        # silently dropped (this arg was hardcoded None)
        tx_ft = make_optimizer(
            lr_ft, ft_epochs * steps_per_epoch, 1e-5, args.max_grad_norm
        )
        st = TrainState.create(
            apply_fn=model_ft.apply, params=state.params, tx=tx_ft
        )
        if ft_step:
            def _bump(x):
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.integer) \
                        and getattr(x, "ndim", None) == 0:
                    return jnp.asarray(ft_step, x.dtype)
                return x
            st = st.replace(
                step=ft_step,
                opt_state=jax.tree_util.tree_map(_bump, st.opt_state),
            )
        return st

    # Phase-aware resume (session-4 quirk fix): the ft phase restarts
    # state.step at 0, so without a phase marker a params-only resume
    # re-entered the MAIN phase at a bogus epoch.  The ft phase now (a)
    # saves its full TrainState under ``<save_name>_ft.state`` and (b)
    # stamps the params checkpoint with the GLOBAL step
    # (switch_step + ft-local step); resume prefers the ft state file and
    # otherwise maps a restored global step past the boundary back into
    # the ft phase.
    ft_state_path = train_state_path(args.save_name + "_ft")
    if ft_epochs and os.path.exists(ft_state_path):
        from ..train.checkpoint import restore_train_state

        ft_template = to_finetune(state)
        try:
            st = restore_train_state(ft_state_path, ft_template)
            ft_step = int(st.step)
            state, in_finetune = st, True
            start_epoch = switch_epoch + ft_step // steps_per_epoch
            print(f"resumed ft phase from {ft_state_path} at ft step {ft_step}"
                  f" (epoch {start_epoch})")
        except Exception as e:
            print(f"ft state {ft_state_path} unreadable "
                  f"({type(e).__name__}: {e}); falling back")
    if ft_epochs and not in_finetune and start_epoch >= switch_epoch:
        # params-only resume into the ft phase: re-enter ft with the
        # schedule advanced to the ft-local step recovered from the
        # globally-stamped checkpoint step
        ft_step = max(0, start_step - switch_step)
        state = to_finetune(state, ft_step)
        in_finetune = True
        start_epoch = switch_epoch + ft_step // steps_per_epoch

    gt_modes = {True, False} if args.variant == "original" else {False}
    update_cache = {
        g: make_update_fn(make_loss(g), donate=False) for g in gt_modes
    }
    # one-dispatch epochs (train.loop.make_epoch_fn): the latent stack makes
    # ntrain/bsz dispatches per epoch otherwise
    import os as _os

    scan_epochs = (
        ntrain % bsz == 0 and jax.device_count() == 1
        and _os.environ.get("TBNSS_EPOCH_SCAN", "1") == "1"
    )
    if scan_epochs:
        from ..train.loop import make_epoch_fn

        xf_d = jnp.asarray(x_feat)
        a_all = jnp.asarray(train_a)
        u_all = jnp.asarray(train_u)

        # trajectory arrays thread through as explicit jit args: closed-over
        # device arrays become compile-payload constants (relay HTTP 413 at
        # ~300 MB; CLAUDE.md); xf_d is a small shared constant
        def gather(idx, a, u):
            xb = jnp.broadcast_to(xf_d, (idx.shape[0],) + xf_d.shape[1:])
            return xb, a[idx], u[idx]

        epoch_cache = {
            g: make_epoch_fn(make_loss(g), gather, donate=False)
            for g in gt_modes
        }
    # the relay transport hangs on single dispatches past ~1 min (CLAUDE.md);
    # split scan epochs into equal-shaped sub-dispatches like cli/autoreg.py
    if scan_epochs:
        n_steps = ntrain // bsz
        chunk_samples = int(_os.environ.get("TBNSS_SCAN_CHUNK", "256"))
        max_steps = max(1, chunk_samples // bsz)
        steps_per_chunk = next(
            (d for d in range(max_steps, 0, -1) if n_steps % d == 0), n_steps
        )

    def save_checkpoint(state, in_ft):
        """Params + full-state save, phase-aware (see the resume block):
        the ft phase stamps the params ckpt with the GLOBAL step and saves
        its own ``_ft.state`` (opt-state shapes differ across phases)."""
        if in_ft:
            save_params(seq_ckpt(args.save_name), state.params,
                        switch_step + int(state.step))
            from ..train.checkpoint import save_train_state

            save_train_state(ft_state_path, state)
        else:
            save_params(seq_ckpt(args.save_name), state.params, state.step)
            save_state(state, args)

    eval_every = max(1, args.eval_every)
    metrics = MetricsLogger(args.metrics_file, samples_per_epoch=ntrain)
    data_rng = np.random.default_rng(args.seed)
    ts = tf = tfirst = float("nan")
    for ep in range(start_epoch, args.epochs):
        if ft_epochs and ep == switch_epoch and not in_finetune:
            print(f"epoch {ep}: unfreezing encoder (joint fine-tune phase)")
            state = to_finetune(state)
            in_finetune = True
        use_gt = args.variant == "original" and ep < args.use_gt_epochs
        if scan_epochs:
            idx_mat = data_rng.permutation(ntrain).reshape(-1, bsz)
            tr_s = tr_f = 0.0
            for c in range(0, n_steps, steps_per_chunk):
                state, (losses, auxs) = epoch_cache[use_gt](
                    state, jnp.asarray(idx_mat[c : c + steps_per_chunk]),
                    a_all, u_all,
                )
                tr_s += float(losses.sum())
                tr_f += float(auxs["full"].sum())
        else:
            update = update_cache[use_gt]
            tr_s = tr_f = 0.0
            for idx in epoch_batches(data_rng, ntrain, bsz):
                x = put(x_feat.repeat(len(idx), 0))
                state, (loss, aux) = update(
                    state, x, put(train_a[idx]), put(train_u[idx])
                )
                tr_s += float(loss)
                tr_f += float(aux["full"])
        evaluated = ep % eval_every == 0 or ep == args.epochs - 1
        if evaluated:
            ts, tf, tfirst = evaluate(state.params)
            print(
                "Epoch {} , train_step_loss:{:.5f} , train_full_loss:{:.5f} , "
                "test_step_loss:{:.5f} , test_full_loss:{:.5f}".format(
                    ep, tr_s / ntrain / T_IN, tr_f / ntrain, ts, tf
                )
            )
            print(f"first frame loss {tfirst}")
        else:  # no eval this epoch: don't print a stale test loss as current
            print(
                "Epoch {} , train_step_loss:{:.5f} , "
                "train_full_loss:{:.5f}".format(
                    ep, tr_s / ntrain / T_IN, tr_f / ntrain
                )
            )
        metrics.log(
            ep,
            train_step_loss=tr_s / ntrain / T_IN,
            train_full_loss=tr_f / ntrain,
            **(
                dict(test_step_loss=ts, test_full_loss=tf, first_frame=tfirst)
                if evaluated
                else {}
            ),
        )
        if ep % 10 == 0:
            print("save model")
            save_checkpoint(state, in_finetune)

    print("save model")
    save_checkpoint(state, in_finetune)
    return evaluate(state.params)[1]


if __name__ == "__main__":
    main()
