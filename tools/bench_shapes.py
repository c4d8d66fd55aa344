"""Train-step throughput across every benchmark grid, not just the NS
flagship (VERDICT r2, Weak 7: "bench covers one shape").

For each benchmark's canonical model shape this times the jitted
teacher-forced (NS) or steady train step under impl=auto semantics (mega
where `pallas_block.supported` covers the shape, XLA otherwise — printed
per row) and the forced-XLA step for comparison.  One JSON line per shape.

Run on the TPU: ``python tools/bench_shapes.py`` (BENCH_STEPS, BENCH_DTYPE
honored).  Reference configs: scripts/Transolver_*.sh.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# kernel-evidence tooling exercises the padded masked-tail plans even
# though they are opt-in for training (see pallas_block._padded_ok)
os.environ.setdefault("TBNSS_MEGA_PADDED", "1")

# (name, grid H x W or None for irregular, n_hidden, heads, slice, mlp_ratio,
#  fun_dim, out_dim, batch, rollout_T or 0 for steady)
SHAPES = [
    ("ns_64x64_T10", (64, 64), 256, 8, 32, 1, 10, 1, 8, 10),
    ("darcy_85x85", (85, 85), 128, 8, 64, 1, 1, 1, 4, 0),
    ("airfoil_221x51", (221, 51), 128, 8, 64, 1, 0, 1, 4, 0),
    ("pipe_129x129", (129, 129), 128, 8, 64, 2, 0, 1, 8, 0),
    ("plas_101x31_T20", (101, 31), 128, 8, 64, 1, 1, 4, 8, 0),
    ("elas_irregular_972", None, 128, 8, 64, 1, 0, 1, 8, 0),
]


def main():
    from transformerbasednavierstokesolver_tpu.utils.platform import (
        select_platform,
    )

    select_platform()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from transformerbasednavierstokesolver_tpu.models import Transolver
    from transformerbasednavierstokesolver_tpu.ops import pallas_block
    from transformerbasednavierstokesolver_tpu.train.autoregressive import (
        make_teacher_forced_loss,
    )
    from transformerbasednavierstokesolver_tpu.train.loop import (
        create_train_state,
        make_update_fn,
    )
    from transformerbasednavierstokesolver_tpu.train.optim import make_optimizer
    from transformerbasednavierstokesolver_tpu.utils.losses import rel_lp

    n_steps = int(os.environ.get("BENCH_STEPS", "10"))
    use_bf16 = os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    rng = np.random.default_rng(0)

    shapes = [s for s in SHAPES
              if not sys.argv[1:] or any(a in s[0] for a in sys.argv[1:])]
    for name, grid, hid, heads, slc, mlp_ratio, fun_dim, out_dim, bsz, T in shapes:
        bsz = int(os.environ.get("BENCH_BATCH_OVERRIDE", bsz))
        if grid is not None:
            n = grid[0] * grid[1]
            geometry = "grid2d"
            gk = dict(H=grid[0], W=grid[1])
        else:
            n = 972
            geometry = "irregular"
            gk = {}
        mega_ok = grid is not None and pallas_block.supported(
            (bsz, n, hid), dtype, grid or (), heads, slc, hid * mlp_ratio
        )
        impl = "mega" if mega_ok else "xla"
        row = {"shape": name, "impl_auto": impl, "batch": bsz}
        for use_impl in dict.fromkeys((impl, "xla")):
            model = Transolver(
                impl=use_impl, space_dim=2,
                n_layers=int(os.environ.get("BENCH_LAYERS", "8")),
                n_hidden=hid,
                n_head=heads, fun_dim=fun_dim, out_dim=out_dim,
                slice_num=slc, mlp_ratio=mlp_ratio, ref=8,
                unified_pos=(geometry == "grid2d"), geometry=geometry,
                dtype=(jnp.bfloat16 if use_bf16 else None), **gk,
            )
            x = jnp.asarray(rng.normal(size=(bsz, n, 2)), jnp.float32)
            fx = (jnp.asarray(rng.normal(size=(bsz, n, fun_dim)), jnp.float32)
                  if fun_dim else None)
            tx = make_optimizer(1e-3, 1000, 1e-5, None)
            sample = (x[:1], fx[:1] if fx is not None else None)
            try:
                state = create_train_state(
                    jax.random.PRNGKey(0), model, sample, tx
                )
                if T:  # autoregressive benchmark (NS)
                    yy = jnp.asarray(
                        rng.normal(size=(bsz, n, T)), jnp.float32
                    )
                    update = make_update_fn(
                        make_teacher_forced_loss(step=1, remat=True),
                        donate=False,
                    )
                    args = (x, fx, yy)
                else:  # steady-state benchmarks
                    y = jnp.asarray(
                        rng.normal(size=(bsz, n, out_dim)), jnp.float32
                    )

                    def loss_fn(params, apply_fn, x_, fx_, y_):
                        out = apply_fn({"params": params}, x_, fx_)
                        return rel_lp(
                            out.reshape(bsz, -1), y_.reshape(bsz, -1),
                            reduction="sum",
                        ), {}

                    update = make_update_fn(loss_fn, donate=False)
                    args = (x, fx, y)
                state, (loss, _) = update(state, *args)
                float(loss)  # compile+sync
                t0 = time.perf_counter()
                for _ in range(n_steps):
                    state, (loss, _) = update(state, *args)
                float(loss)
                dt = (time.perf_counter() - t0) / n_steps
                row[f"{use_impl}_ms"] = round(dt * 1e3, 2)
                row[f"{use_impl}_samples_per_s"] = round(bsz / dt, 2)
            except Exception as e:  # pragma: no cover - probe robustness
                row[f"{use_impl}_error"] = f"{type(e).__name__}: {e}"[:200]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
