"""Shared CLI plumbing for the benchmark entry points.

One flag module replaces the ~18 argparse flags each reference trainer
re-declares (``exp_darcy.py:14-36``); names and defaults are kept identical
so the reference ``scripts/*.sh`` launchers run unchanged.
"""

import argparse
import faulthandler
import math
import os
import signal
import time

import numpy as np

import jax

# `kill -USR1 <pid>` dumps every thread's Python stack to stderr without
# disturbing the process — the only way to see WHERE a trainer is stuck
# when a relay dispatch or a long trace goes silent (py-spy/gdb are not in
# this image).  Registered at import so every CLI gets it.
try:
    faulthandler.register(signal.SIGUSR1, all_threads=True)
except (AttributeError, ValueError, OSError):  # non-main thread / platform
    pass


class _RuntimeFlagsParser(argparse.ArgumentParser):
    """ArgumentParser that applies cross-cutting runtime flags on parse.

    Wires the observability facilities (utils/profiling.py) into every CLI
    from one place: ``--profile DIR`` opens a ``jax.profiler`` trace for the
    whole run (stopped atexit), and ``--nan_debug`` / ``TBNSS_NAN_DEBUG=1``
    turns on ``jax_debug_nans``.  The reference has neither (SURVEY.md
    section 5: print() is its only observability).
    """

    def parse_args(self, *a, **k):
        args = super().parse_args(*a, **k)
        from ..utils.profiling import enable_nan_debugging, start_trace

        if getattr(args, "nan_debug", 0) or os.environ.get(
            "TBNSS_NAN_DEBUG", ""
        ) not in ("", "0"):
            enable_nan_debugging(True)
            print("NaN debugging enabled (jax_debug_nans)")
        if getattr(args, "profile", None):
            start_trace(args.profile)
            print(f"profiler trace -> {args.profile}")
        if getattr(args, "impl", None) == "auto":
            # the fused Pallas block is the fastest verified TPU config
            # (bench.py; loss-curve agreement vs XLA in tests and
            # logs/ns_agree_*.jsonl) and gates itself per block shape
            # (models/transolver.py _use_mega -> pallas_block.supported),
            # so 'auto' only has to pick the backend family
            args.impl = "mega" if jax.default_backend() == "tpu" else "xla"
        return args


def base_parser(description="Training Transolver", **overrides):
    p = _RuntimeFlagsParser(description=description)
    d = dict(
        lr=1e-3,
        epochs=500,
        weight_decay=1e-5,
        model="Transolver_2D",
        n_hidden=64,
        n_layers=3,
        n_heads=4,
        batch_size=8,
        gpu="0",
        max_grad_norm=None,
        downsample=5,
        mlp_ratio=1,
        dropout=0.0,
        ntrain=1000,
        unified_pos=0,
        ref=8,
        slice_num=32,
        eval=0,
        save_name="Transolver",
        data_path="/data/fno",
    )
    d.update(overrides)
    p.add_argument("--lr", type=float, default=d["lr"])
    p.add_argument("--epochs", type=int, default=d["epochs"])
    p.add_argument("--weight_decay", type=float, default=d["weight_decay"])
    p.add_argument("--model", type=str, default=d["model"])
    p.add_argument("--n-hidden", type=int, default=d["n_hidden"], help="hidden dim")
    p.add_argument("--n-layers", type=int, default=d["n_layers"], help="layers")
    p.add_argument("--n-heads", type=int, default=d["n_heads"])
    p.add_argument("--batch-size", type=int, default=d["batch_size"])
    p.add_argument("--gpu", type=str, default=d["gpu"], help="accepted for CLI parity; devices come from JAX")
    p.add_argument("--max_grad_norm", type=float, default=d["max_grad_norm"])
    p.add_argument("--downsample", type=int, default=d["downsample"])
    p.add_argument("--mlp_ratio", type=int, default=d["mlp_ratio"])
    p.add_argument("--dropout", type=float, default=d["dropout"])
    p.add_argument("--ntrain", type=int, default=d["ntrain"])
    p.add_argument("--unified_pos", type=int, default=d["unified_pos"])
    p.add_argument("--ref", type=int, default=d["ref"])
    p.add_argument("--slice_num", type=int, default=d["slice_num"])
    p.add_argument("--eval", type=int, default=d["eval"])
    p.add_argument("--save_name", type=str, default=d["save_name"])
    p.add_argument("--data_path", type=str, default=d["data_path"])
    # TPU-rebuild extras (default off / neutral)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synth_n", type=int, default=None,
                   help="synthetic-data sample count when benchmark files are absent")
    p.add_argument("--impl", type=str, default="auto",
                   choices=["auto", "xla", "pallas", "mega"],
                   help="physics-attention implementation; auto = the fused "
                        "Pallas block on TPU (per-shape gated), XLA elsewhere")
    p.add_argument("--precision", type=str, default=None,
                   help="jax matmul precision override (e.g. 'highest')")
    p.add_argument("--resume", type=int, default=0,
                   help="resume from the saved train state (params + optimizer + step)")
    p.add_argument("--dtype", type=str, default="f32", choices=["f32", "bf16"],
                   help="compute dtype (params stay f32); bf16 for throughput")
    p.add_argument("--mesh", type=str, default="auto",
                   help="device mesh: 'auto' (DP over all devices), 'off', "
                        "or 'DxS' for an explicit data x space mesh")
    p.add_argument("--metrics_file", type=str, default=None,
                   help="append per-epoch metrics as JSON lines to this file")
    p.add_argument("--remat", type=str, default="1", choices=["0", "1", "half"],
                   help="BPTT activation policy: 1 = remat every rollout "
                        "step (10x memory reduction), half = remat every "
                        "other step (faster backward, ~half the no-remat "
                        "memory), 0 = save everything")
    p.add_argument("--profile", type=str, default=None,
                   help="write a jax.profiler trace for the run to this dir")
    p.add_argument("--nan_debug", type=int, default=0,
                   help="enable jax_debug_nans (also TBNSS_NAN_DEBUG=1)")
    p.add_argument("--aug_roll", type=int, default=0,
                   help="train-time anti-diagonal torus-roll augmentation "
                        "for square periodic grids (autoreg trainers). The "
                        "FNO NS forcing 0.1(sin+cos)(2pi(x+y)) is invariant "
                        "under translations x->x+s, y->y-s, so rolling input "
                        "AND target frames by a shared random (s,-s) is an "
                        "exact symmetry of the dynamics: 64x free data. The "
                        "reference trains without augmentation (exp_ns.py); "
                        "this is a deliberate, flag-gated addition.")
    p.add_argument("--eval_every", type=int, default=1,
                   help="run the test-set evaluation every N epochs (the "
                        "reference evaluates every epoch, exp_ns.py:216-246; "
                        "N>1 trades monitoring granularity for wall-clock on "
                        "benchmark-scale splits). Honored by the autoreg, "
                        "steady, darcy, plasticity, and auto-encoder "
                        "trainers; the latent/unrolling trainers evaluate "
                        "every epoch.")
    return p


def model_dtype(args):
    import jax.numpy as jnp

    return jnp.bfloat16 if getattr(args, "dtype", "f32") == "bf16" else None


def count_parameters(params):
    total = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    print(f"Total Trainable Params: {int(total)}")
    return int(total)


def epoch_batches(rng: np.random.Generator, n: int, batch_size: int, shuffle=True):
    """Index batches like a torch DataLoader (shuffle, keep last partial)."""
    idx = rng.permutation(n) if shuffle else np.arange(n)
    for i in range(0, n, batch_size):
        yield idx[i : i + batch_size]


def checkpoint_path(save_name: str) -> str:
    os.makedirs("./checkpoints", exist_ok=True)
    return os.path.join("./checkpoints", save_name + ".ckpt")


def maybe_load_params(save_name, template, model=None, geometry="grid2d"):
    """Load a native checkpoint, falling back to a reference ``.pt`` file."""
    from ..train.checkpoint import import_torch_state_dict, restore_params

    native = checkpoint_path(save_name)
    pt = os.path.join("./checkpoints", save_name + ".pt")
    if os.path.exists(native):
        return restore_params(native, template)
    if os.path.exists(pt):
        return import_torch_state_dict(pt, geometry=geometry)
    raise FileNotFoundError(f"no checkpoint {native} or {pt}")


def save_figures(save_name, idx, panels, clims=None):
    """Dump pred/gt/error/input panels as PDFs like the reference eval mode."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    outdir = os.path.join("./results", save_name)
    os.makedirs(outdir, exist_ok=True)
    clims = clims or {}
    for name, img in panels.items():
        plt.figure()
        plt.axis("off")
        plt.imshow(img, cmap="coolwarm")
        plt.colorbar()
        if name in clims:
            plt.clim(*clims[name])
        plt.savefig(os.path.join(outdir, f"case_{idx}_{name}.pdf"))
        plt.close()


def save_mesh_figures(save_name, idx, X, Y, panels, cmap="coolwarm"):
    """Pred/gt/error panels rendered on a deformed structured mesh, like the
    reference's airfoil/pipe eval renders (``exp_airfoil.py:113-180``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    outdir = os.path.join("./results", save_name)
    os.makedirs(outdir, exist_ok=True)
    for name, img in panels.items():
        plt.figure()
        plt.axis("off")
        plt.pcolormesh(X, Y, img, cmap=cmap, shading="gouraud")
        plt.colorbar()
        plt.gca().set_aspect("equal")
        plt.savefig(os.path.join(outdir, f"case_{idx}_{name}.pdf"))
        plt.close()


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def lap(self):
        t = time.perf_counter()
        dt, self.t0 = t - self.t0, t
        return dt


def train_state_path(save_name: str) -> str:
    os.makedirs("./checkpoints", exist_ok=True)
    return os.path.join("./checkpoints", save_name + ".state")


def maybe_resume(state, args, ckpt_path=None):
    """Restore the full TrainState if --resume and a state file exists.

    Degrades gracefully on a corrupt/truncated state file (a timeout can
    kill a trainer mid-save): falls back to the params checkpoint, keeping
    the saved step so the LR/momentum schedules continue from the right
    place (Adam moments restart at zero — a brief transient, vs the old
    behavior of crash-looping every restart attempt).

    ``ckpt_path``: where that params fallback lives when it is not the
    default ``./checkpoints/<name>.ckpt`` — the sequen trainers save
    params under ``sequential_checkpoints/`` (session-4 find: the w64 ft
    resume silently started a 38M-param model FROM SCRATCH because the
    fallback looked in the wrong directory)."""
    if not getattr(args, "resume", 0):
        return state, 0

    def params_fallback(state):
        """Params-checkpoint fallback shared by the missing-state and
        corrupt-state branches: the VM-wipe scenario deletes gitignored
        ``checkpoints/*.state`` while committed ``sequential_checkpoints/``
        params survive — without this, --resume silently restarted from
        scratch whenever the state file was missing ENTIRELY (round-4
        advisor finding)."""
        ckpt = ckpt_path or checkpoint_path(args.save_name)
        if not os.path.exists(ckpt):
            print(f"no params checkpoint at {ckpt} either; starting fresh")
            return state, 0
        import jax
        import jax.numpy as jnp

        from ..train.checkpoint import restore_params_and_step

        params, step = restore_params_and_step(ckpt, state.params)
        step = int(step or 0)

        def _bump_count(x):
            # schedule/Adam step counters in a FRESH opt_state are integer
            # scalars (all zero); advancing them to the saved step keeps the
            # OneCycle schedules on track after the fallback
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.integer) \
                    and getattr(x, "ndim", None) == 0:
                return jnp.asarray(step, x.dtype)
            return x

        state = state.replace(
            params=params,
            step=step,
            opt_state=jax.tree_util.tree_map(_bump_count, state.opt_state),
        )
        print(f"resumed params+schedule from {ckpt} at step {step} "
              "(fresh optimizer moments)")
        return state, step

    path = train_state_path(args.save_name)
    if not os.path.exists(path):
        print(f"--resume set but no state at {path}; "
              "trying the params checkpoint")
        return params_fallback(state)
    from ..train.checkpoint import restore_train_state

    try:
        state = restore_train_state(path, state)
        print(f"resumed from {path} at step {int(state.step)}")
        return state, int(state.step)
    except Exception as e:
        print(f"state file {path} unreadable ({type(e).__name__}: {e}); "
              "trying the params checkpoint")
    return params_fallback(state)


def save_state(state, args):
    from ..train.checkpoint import save_train_state

    save_train_state(train_state_path(args.save_name), state)


def dp_put(mesh_arg="auto"):
    """Distributed placement for [B, N, ...] batch arrays.

    ``mesh_arg``: ``'auto'`` (all devices on the data axis), ``'off'``
    (single-device placement), or ``'DxS'`` (e.g. ``'4x2'``) for an explicit
    ('data', 'space') mesh -- batch over ``data``, mesh-point axis N over
    ``space`` (physics-attention is naturally sequence-parallel; XLA SPMD
    inserts the slice-phase psums and conv halo exchanges).  This is the
    TPU-native replacement for the reference's absent DDP
    (SURVEY.md section 2.9).  Falls back to plain placement on one device
    or non-divisible axes.
    """
    import jax

    from ..parallel import set_active_mesh

    if jax.device_count() <= 1 or mesh_arg == "off":
        import jax.numpy as jnp

        set_active_mesh(None)
        return jnp.asarray

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import make_mesh

    if mesh_arg and mesh_arg not in ("auto", "data"):
        d, s = mesh_arg.lower().split("x")
        mesh = make_mesh(int(d), int(s))
    else:
        mesh = make_mesh()
    set_active_mesh(mesh)
    nd, ns = mesh.devices.shape

    def put(a):
        import jax.numpy as jnp

        a = jnp.asarray(a)
        if a.ndim == 0 or a.shape[0] % nd != 0:
            return a
        axes = ["data"]
        if a.ndim >= 2 and ns > 1 and a.shape[1] % ns == 0:
            axes.append("space")
        spec = P(*(tuple(axes) + (None,) * (a.ndim - len(axes))))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return put


class MetricsLogger:
    """Structured per-epoch metrics (JSONL) -- the observability layer the
    reference lacks (print() only, SURVEY.md section 5).  Records wall-clock
    and derived throughput alongside whatever the trainer reports."""

    def __init__(self, path=None, samples_per_epoch=None):
        self.path = path
        self.samples = samples_per_epoch
        self.t0 = time.perf_counter()
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, epoch, **metrics):
        t = time.perf_counter()
        rec = {"epoch": epoch, "wall_s": round(t - self.t0, 3)}
        if self.samples:
            rec["samples_per_sec"] = round(self.samples / max(t - self.t0, 1e-9), 3)
        def coerce(v):
            try:
                f = round(float(v), 6)  # handles device scalars too
            except (TypeError, ValueError):
                return v
            # json.dumps would emit bare NaN/Infinity literals, which are
            # not valid strict JSON and break jq-style JSONL consumers
            return f if math.isfinite(f) else None

        rec.update({k: coerce(v) for k, v in metrics.items()})
        self.t0 = t
        if self.path:
            import json

            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec
