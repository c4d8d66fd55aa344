#!/usr/bin/env python
"""Extend the FNO-regime NS vorticity cache to more sims (round-4 prep).

Same regime and PRNG stream as ``gen_ns_fno_1200.py`` (GRF ICs from
``jax.random.split(PRNGKey(42), sims)`` — split is prefix-stable, so sims
0..1199 of a larger run are bit-identical to the shipped 1200-sim cache and
their banked chunks in ``data/synthetic/chunks/`` are reused as-is).
Produces ``data/synthetic/ns_v1e-5_fno_s{sims}_t20_r64.npz`` for
``load_ns_vorticity`` (reference split semantics:
/root/reference/exp_ns.py:38,64-80).

Differences from the 1200 generator:
  * ``--sims`` parameterizes the total (default 2000);
  * short banked chunks (the old partial tail, e.g. 48 rows at i=1152 when
    1200 was the total) are regenerated at full width — prefix-stable keys
    keep the overlapping rows identical;
  * ``--deadline_ts`` stops cleanly between chunks (no assembly) so the
    run can ride surplus chip time and resume later.

Usage: python scripts/gen_ns_fno_ext.py --sims 2000 [--deadline_ts T]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TBNSS_FFT", "matmul")

import numpy as np

from transformerbasednavierstokesolver_tpu.utils.platform import select_platform

select_platform()  # honor TBNSS_PLATFORM=cpu (the env var alone is ignored)

import jax

import transformerbasednavierstokesolver_tpu.data.spectral_ns as S

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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sims", type=int, default=2000)
    p.add_argument("--deadline_ts", type=float, default=None,
                   help="unix time; stop between chunks when the next one "
                        "would not finish by then")
    args = p.parse_args()
    sims = args.sims
    out = os.path.join(
        REPO, "data", "synthetic", f"ns_v1e-5_fno_s{sims}_t20_r64.npz"
    )
    if os.path.exists(out):
        print(f"cache already built: {out}")
        return

    os.makedirs(CHUNK_DIR, exist_ok=True)
    keys = jax.random.split(jax.random.PRNGKey(42), sims)
    f_p = S._fft2p_real(S.fno_forcing(SIM_N))
    down = jax.jit(lambda w_p: S.spectral_downsample(S._ifft2p_re(w_p), N_OUT))

    t_start = time.time()
    chunk_secs = 1500.0  # prior estimate; replaced by measured time
    for i in range(0, sims, CHUNK):
        b = min(CHUNK, sims - i)
        path = os.path.join(CHUNK_DIR, f"ns_fno_1200_{i:04d}.npy")
        if os.path.exists(path):
            rows = np.load(path, mmap_mode="r").shape[0]
            if rows >= b:
                print(f"chunk {i:04d}: exists ({rows} rows), skip", flush=True)
                continue
            print(f"chunk {i:04d}: short ({rows} < {b}), regenerating", flush=True)
        if args.deadline_ts and time.time() + chunk_secs > args.deadline_ts:
            print(f"deadline: stopping before chunk {i:04d}", flush=True)
            return
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
        chunk_secs = time.time() - t0
        print(f"chunk {i:04d}: saved {arr.shape} in {chunk_secs:.0f}s", flush=True)

    parts = []
    for i in range(0, sims, CHUNK):
        b = min(CHUNK, sims - i)
        parts.append(
            np.load(os.path.join(CHUNK_DIR, f"ns_fno_1200_{i:04d}.npy"))[:b]
        )
    u = np.concatenate(parts, axis=0)
    assert u.shape == (sims, N_OUT, N_OUT, FRAMES), u.shape
    np.savez(out + ".tmp.npz", u=u)
    os.replace(out + ".tmp.npz", out)
    print(f"wrote {out} shape={u.shape}", flush=True)


if __name__ == "__main__":
    main()
