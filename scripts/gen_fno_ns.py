"""Generate the FNO-regime NS vorticity dataset on the TPU and cache it
where ``datasets.load_ns_vorticity`` (TBNSS_NS_REGIME=fno) will find it.

Usage: python scripts/gen_fno_ns.py [sims] [frames]
The benchmark regime: GRF IC at 256^2, dt=1e-4, forced nu=1e-5, one frame
per time unit, Fourier-truncated to 64^2 (Li et al. 2020; the data the
reference downloads per README.md:29).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from transformerbasednavierstokesolver_tpu.data.datasets import _SYNTH_DIR
from transformerbasednavierstokesolver_tpu.data.spectral_ns import (
    generate_vorticity_dataset,
)


def main():
    sims = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    print("devices:", jax.devices(), flush=True)
    os.makedirs(_SYNTH_DIR, exist_ok=True)
    path = os.path.join(_SYNTH_DIR, f"ns_v1e-5_fno_s{sims}_t{frames}_r64.npz")
    if os.path.exists(path):
        print("already cached:", path)
        return
    t0 = time.time()
    def progress(i, fr):
        print(f"batch@{i} frame {fr} t={time.time()-t0:.0f}s", flush=True)

    u = generate_vorticity_dataset(
        jax.random.PRNGKey(42), sims, frames, n=64,
        nu=1e-5, dt=1e-4, frame_dt=1.0, warmup_frames=0,
        sim_n=256, batch=10, progress=progress,
    )
    print(f"generated {u.shape} in {time.time()-t0:.0f}s "
          f"std0={u[..., 0].std():.3f} stdT={u[..., -1].std():.3f}",
          flush=True)
    np.savez_compressed(path, u=u)
    print("saved", path)


if __name__ == "__main__":
    main()
