#!/usr/bin/env python
"""Ground-truth data generation CLI (replaces ``data_generation.ipynb``).

Generates Navier-Stokes datasets on device with the jnp.fft pseudo-spectral
solver and writes them in the reference's layouts:

* ``velocity``: decaying McWilliams turbulence, [sims, 64, 64, 2*frames]
  with interleaved [velx, vely] channels -> ``data/ns_{sims}_{frames}.npy``
  (the fork's layout, ``data_generation.ipynb`` cells 6-7);
* ``vorticity``: FNO-benchmark-style forced vorticity,
  [sims, 64, 64, frames] -> ``.npy``.

Examples:
    python generate_data.py velocity --sims 50 --frames 20
    python generate_data.py vorticity --sims 100 --frames 20 --nu 1e-5
"""

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=["velocity", "vorticity"])
    p.add_argument("--sims", type=int, default=50)
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--n", type=int, default=64, help="grid resolution")
    p.add_argument("--re", type=float, default=100.0, help="velocity: Reynolds number")
    p.add_argument("--nu", type=float, default=1e-5, help="vorticity: viscosity")
    p.add_argument("--dt", type=float, default=None, help="solver substep")
    p.add_argument("--frame_dt", type=float, default=None, help="time between frames")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    from transformerbasednavierstokesolver_tpu.utils.platform import select_platform

    select_platform()
    import jax

    from transformerbasednavierstokesolver_tpu.data.spectral_ns import (
        generate_velocity_dataset,
        generate_vorticity_dataset,
    )

    key = jax.random.PRNGKey(args.seed)
    if args.kind == "velocity":
        data = generate_velocity_dataset(
            key, args.sims, args.frames, n=args.n, re=args.re,
            dt=args.dt or 1e-2, frame_dt=args.frame_dt or 0.5,
        )
        out = args.out or f"data/ns_{args.sims}_{args.frames}.npy"
    else:
        data = generate_vorticity_dataset(
            key, args.sims, args.frames, n=args.n, nu=args.nu,
            dt=args.dt or 1e-3, frame_dt=args.frame_dt or 1.0,
            warmup_frames=2,
        )
        out = args.out or f"data/ns_vorticity_{args.sims}_{args.frames}.npy"

    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    import numpy as np

    np.save(out, data)
    print(f"wrote {out} shape={data.shape} dtype={data.dtype}")


if __name__ == "__main__":
    main()
