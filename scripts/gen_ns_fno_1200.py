#!/usr/bin/env python
"""Generate the benchmark-scale FNO-regime NS vorticity dataset (1200 sims).

Produces the synthetic-cache file ``data/synthetic/ns_v1e-5_fno_s1200_t20_r64.npz``
consumed by ``load_ns_vorticity`` (datasets.py) for the published 1000/200
NS split (reference: ``/root/reference/exp_ns.py:38,64-80`` consuming
``NavierStokes_V1e-5_N1200_T20.mat``; rel-L2 bar 0.090, ``README.md:29``).

Regime (Li et al. 2020 generation recipe): GRF initial vorticity, solve at
256^2, nu=1e-5, fixed forcing 0.1(sin+cos)(2pi(x+y)), record 20 frames at
1-time-unit intervals, Fourier-truncate frames to 64^2.  dt=2e-4 (the
recipe's 1e-4 halved): step-halving convergence measured at rel-L2 1.8e-4
per time unit between dt=1e-4 and 2e-4 -- far below the 0.09 target band
and the model's resolution; see tests/test_spectral.py.

Restartable: chunks of 64 sims are saved to data/synthetic/chunks/ and
skipped when present, so a killed/hung run resumes where it left off.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TBNSS_FFT", "matmul")

import numpy as np

import jax

import transformerbasednavierstokesolver_tpu.data.spectral_ns as S

SIMS = 1200
CHUNK = 64
SIM_N = 256
N_OUT = 64
FRAMES = 20
DT = 2e-4
RECORD_EVERY = int(round(1.0 / DT))
NU = 1e-5
MAX_SUB = 1000  # bounded dispatches for the relay

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHUNK_DIR = os.path.join(REPO, "data", "synthetic", "chunks")
OUT = os.path.join(REPO, "data", "synthetic", "ns_v1e-5_fno_s1200_t20_r64.npz")


def main():
    os.makedirs(CHUNK_DIR, exist_ok=True)
    keys = jax.random.split(jax.random.PRNGKey(42), SIMS)
    f_p = S._fft2p_real(S.fno_forcing(SIM_N))
    down = jax.jit(lambda w_p: S.spectral_downsample(S._ifft2p_re(w_p), N_OUT))

    t_start = time.time()
    for i in range(0, SIMS, CHUNK):
        b = min(CHUNK, SIMS - i)
        path = os.path.join(CHUNK_DIR, f"ns_fno_1200_{i:04d}.npy")
        if os.path.exists(path):
            print(f"chunk {i:04d}: exists, skip", flush=True)
            continue
        t0 = time.time()
        w_p = jax.vmap(lambda k: S.gaussian_random_field_pair(k, SIM_N))(
            keys[i : i + b]
        )
        frames_list = []
        for fr in range(FRAMES):
            left = RECORD_EVERY
            while left > 0:
                sub = min(left, MAX_SUB)
                w_p = S.advance_vorticity_pair(w_p, f_p, sub, DT, NU)
                left -= sub
            frames_list.append(np.asarray(down(w_p), np.float32))
            print(
                f"chunk {i:04d}: frame {fr + 1}/{FRAMES} "
                f"({time.time() - t0:.0f}s chunk, {time.time() - t_start:.0f}s total)",
                flush=True,
            )
        arr = np.stack(frames_list, axis=1)  # [b, frames, n, n]
        arr = np.ascontiguousarray(arr.transpose(0, 2, 3, 1).astype(np.float32))
        np.save(path + ".tmp.npy", arr)
        os.replace(path + ".tmp.npy", path)
        print(f"chunk {i:04d}: saved {arr.shape} in {time.time() - t0:.0f}s", flush=True)

    parts = []
    for i in range(0, SIMS, CHUNK):
        parts.append(np.load(os.path.join(CHUNK_DIR, f"ns_fno_1200_{i:04d}.npy")))
    u = np.concatenate(parts, axis=0)
    assert u.shape == (SIMS, N_OUT, N_OUT, FRAMES), u.shape
    np.savez(OUT + ".tmp.npz", u=u)
    os.replace(OUT + ".tmp.npz", OUT)
    print(f"wrote {OUT} shape={u.shape}", flush=True)


if __name__ == "__main__":
    main()
