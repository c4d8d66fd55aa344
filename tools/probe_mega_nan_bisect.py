"""Deterministic bisect of the padded-megakernel training NaN (VERDICT r4 #1).

The plasticity-900 resume under ``--impl mega`` (101x31, padded masked-tail
plan) NaN'd on its first epoch from the banked ep-21 state
(``checkpoints/plas900_meganan.{ckpt,state}``, step 47460,
``logs/plas900_r5.log``) while the identical command under ``--impl xla``
continued cleanly.  Single-step fwd+bwd probes with the same weights pass on
compiled TPU (``logs/probe_mega_real_tpu.log``), so the failure needs the
actual training sequence.

exp_plas with ntrain=900, bsz=8 takes the NON-scan path (900 % 8 != 0): a
jitted per-update loop over ``epoch_batches`` (112x8 + one 4-batch tail)
with T=20 per-timestep inner updates and donated state — the NaN run's
actual program.  This tool replays epoch 21 EXACTLY as the trainer would
after a resume (fresh ``np.random.default_rng(seed)``; the trainer's
data_rng restarts on every resume, so the first epoch's batch/time
permutations are reproducible), checking every update's loss host-side and
keeping a 2-deep rolling device copy of the pre-update params so that the
moment the loss goes non-finite it can grad-diff the culprit update under
BOTH impls from identical inputs.

Reference semantics being matched: ``/root/reference/exp_plas.py:247-253``
(per-timestep updates, shuffled time collate).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("TBNSS_MEGA_PADDED", "1")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="mega")
    ap.add_argument("--state", default="checkpoints/plas900_meganan.state")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--no-donate", action="store_true",
                    help="disable update-step buffer donation (hypothesis "
                    "test; the trainer donates)")
    ap.add_argument("--dump-at", type=int, default=None,
                    help="after update K-1 completes, save the params and "
                    "update-K batch to tools/_nan_case.npz + .msgpack and "
                    "exit (for offline dissection)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        os.environ["TBNSS_PLATFORM"] = args.platform

    from transformerbasednavierstokesolver_tpu.utils.platform import (
        select_platform,
    )

    select_platform()
    import jax
    import jax.numpy as jnp

    from transformerbasednavierstokesolver_tpu.cli.exp_plas import (
        build_argparser,
    )
    from transformerbasednavierstokesolver_tpu.cli.common import (
        epoch_batches,
        model_dtype,
    )
    from transformerbasednavierstokesolver_tpu.data.datasets import (
        load_plasticity,
        meshgrid_pos,
    )
    from transformerbasednavierstokesolver_tpu.models import get_model
    from transformerbasednavierstokesolver_tpu.train.checkpoint import (
        restore_train_state,
    )
    from transformerbasednavierstokesolver_tpu.train.loop import (
        create_train_state,
        make_update_fn,
    )
    from transformerbasednavierstokesolver_tpu.train.optim import (
        make_optimizer,
    )
    from transformerbasednavierstokesolver_tpu.utils.losses import rel_lp

    # the EXACT failing command line (scripts/r5d_client1.sh)
    targs = build_argparser().parse_args(
        [
            "--model", "Transolver_Structured_Mesh_2D", "--n-hidden", "128",
            "--n-heads", "8", "--n-layers", "8", "--batch-size", "8",
            "--slice_num", "64", "--max_grad_norm", "0.1", "--epochs", "100",
            "--synth_n", "900", "--channel_weighted", "1",
            "--impl", args.impl,
        ]
    )
    ntest = 80
    x_train, y_train, x_test, y_test, s1, s2, T, out_dim = load_plasticity(
        targs.data_path, targs.ntrain, ntest, synth_n=targs.synth_n
    )
    ntrain = x_train.shape[0]
    xm = x_train.mean()
    xs = x_train.std(ddof=1) + 1e-8
    x_train = (x_train - xm) / xs
    pos = meshgrid_pos(s1, s2)
    t_grid = np.linspace(0, 1, T, dtype=np.float32)

    def build_model(impl):
        return get_model(targs.model)(
            space_dim=2, n_hidden=targs.n_hidden, n_layers=targs.n_layers,
            Time_Input=True, n_head=targs.n_heads, fun_dim=1,
            out_dim=out_dim, mlp_ratio=targs.mlp_ratio,
            slice_num=targs.slice_num, ref=targs.ref,
            unified_pos=bool(targs.unified_pos), H=s1, W=s2, impl=impl,
            precision=targs.precision, dtype=model_dtype(targs),
        )

    model = build_model(args.impl)
    bsz = targs.batch_size
    steps_per_epoch = (ntrain + bsz - 1) // bsz
    tx = make_optimizer(
        targs.lr, targs.epochs * steps_per_epoch * T, targs.weight_decay,
        targs.max_grad_norm,
    )
    sample = (
        jnp.zeros((1, s1 * s2, 2)),
        jnp.zeros((1, s1 * s2, 1)),
        jnp.zeros((1, 1)),
    )
    state = create_train_state(jax.random.PRNGKey(targs.seed), model, sample, tx)
    state = restore_train_state(args.state, state)
    print(f"restored {args.state} at step {int(state.step)}", flush=True)

    def loss_fn(params, apply_fn, x, fx, y, tt):
        im = apply_fn({"params": params}, x, fx, tt)
        b = x.shape[0]
        c = im.shape[-1]
        l = sum(
            rel_lp(im[..., j].reshape(b, -1), y[..., j].reshape(b, -1),
                   reduction="sum")
            for j in range(c)
        ) / c
        return l, {}

    update = make_update_fn(loss_fn, donate=not args.no_donate)

    def tree_nonfinite(t):
        bad = []
        for path, leaf in jax.tree_util.tree_leaves_with_path(t):
            n = int(jnp.sum(~jnp.isfinite(leaf)))
            if n:
                bad.append((jax.tree_util.keystr(path), n, leaf.size))
        return bad

    def make_batch(idx, pt):
        b = len(idx)
        x = jnp.asarray(pos.repeat(b, 0))
        fx = jnp.asarray(x_train[idx])
        y_t = np.take_along_axis(
            y_train[idx], pt[:, None, None, None], axis=-1
        )[..., 0]
        tt = jnp.asarray(t_grid[pt][:, None])
        return x, fx, jnp.asarray(y_t), tt

    def grad_diff(params, batch, tag):
        results = {}
        for impl in ("mega", "xla"):
            m = build_model(impl)

            def lf(p, *b, _m=m):
                return loss_fn(p, _m.apply, *b)

            (loss, _), grads = jax.jit(
                jax.value_and_grad(lf, has_aux=True)
            )(params, *batch)
            loss = float(loss)
            badg = tree_nonfinite(grads)
            gn = float(
                jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                             for g in jax.tree_util.tree_leaves(grads)))
            )
            print(f"[{tag}][{impl}] loss={loss:.6f} grad_norm={gn:.4e} "
                  f"nonfinite_grads={badg[:8]}", flush=True)
            results[impl] = grads
        rows = []
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(results["mega"]),
            jax.tree_util.tree_leaves_with_path(results["xla"]),
        ):
            a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
            denom = float(jnp.linalg.norm(b32.ravel())) + 1e-20
            rel = float(jnp.linalg.norm((a32 - b32).ravel())) / denom
            rows.append((rel, jax.tree_util.keystr(path)))
        print(f"[{tag}] top grad mismatches mega-vs-xla (rel):", flush=True)
        for rel, path in sorted(rows, reverse=True)[:10]:
            print(f"  {rel:.3e}  {path}")

    # epoch-21 sequence exactly as the resumed trainer draws it (data_rng
    # restarts at the seed on every resume)
    data_rng = np.random.default_rng(targs.seed)
    schedule = []  # (idx, pt) per update
    for idx in epoch_batches(data_rng, ntrain, bsz):
        b = len(idx)
        perms = np.stack([data_rng.permutation(T) for _ in range(b)])
        for t in range(T):
            schedule.append((idx, perms[:, t]))
    n_steps = len(schedule)
    if args.max_steps:
        n_steps = min(n_steps, args.max_steps)
    print(f"replaying {n_steps} updates under --impl {args.impl}", flush=True)

    hist = []  # rolling [(k, params_copy, batch)] of the last 2 updates
    for k in range(n_steps):
        idx, pt = schedule[k]
        batch = make_batch(idx, pt)
        if args.dump_at is not None and k == args.dump_at:
            from flax import serialization

            with open("tools/_nan_case.msgpack", "wb") as f:
                f.write(serialization.msgpack_serialize(
                    jax.device_get({"params": state.params})
                ))
            x, fx, y, tt = (np.asarray(a) for a in batch)
            np.savez("tools/_nan_case.npz", x=x, fx=fx, y=y, tt=tt)
            print(f"dumped params after update {k - 1} + batch {k} "
                  "to tools/_nan_case.{msgpack,npz}")
            return
        params_copy = jax.tree_util.tree_map(
            lambda a: a + 0, state.params  # device copy (donation-safe)
        )
        hist = (hist + [(k, params_copy, batch)])[-2:]
        state, (loss, _) = update(state, *batch)
        loss = float(loss)
        if k % 100 == 0:
            print(f"update {k}: loss={loss:.5f}", flush=True)
        if not np.isfinite(loss):
            print(f"FIRST NON-FINITE LOSS at update {k} "
                  f"(loss computed from the params left by update {k - 1})",
                  flush=True)
            badp = tree_nonfinite(hist[-1][1])
            print(f"params nonfinite BEFORE update {k}: {badp[:8]}")
            for kk, p, bt in hist:
                grad_diff(p, bt, tag=f"update{kk}")
            return
    print(f"no non-finite loss in {n_steps} replayed updates")
    badp = tree_nonfinite(state.params)
    print(f"params nonfinite after run: {badp[:8]}")


if __name__ == "__main__":
    main()
