#!/usr/bin/env python
"""Regenerate the benchmark-scale FNO-regime NS dataset in BOTH downsample
modes from one 256^2 solve.

The environment reboot wiped ``data/synthetic/`` (gitignored), so the
1200-sim dataset must be regenerated either way.  The expensive part is the
256^2 spectral solve; the 64^2 reduction is per-frame post-processing, so
each recorded frame is saved twice:

* ``ns_v1e-5_fno_s1200_t20_r64.npz``   -- Fourier truncation (alias-free),
  the mode every round-3 canonical number used;
* ``ns_v1e-5_fnopw_s1200_t20_r64.npz`` -- pointwise ``sol[::4, ::4]``,
  exactly the official generation script's product
  (reference consumes ``NavierStokes_V1e-5_N1200_T20.mat``,
  ``/root/reference/exp_ns.py:38``; the official 64^2 files are pointwise
  subsamples, so this closes the round-3 regime-fidelity caveat in
  docs/RESULTS.md at zero extra solve cost).

Also materializes prefix-slice caches (s400/s100) for the latent chain.
Restartable: 64-sim chunks under data/synthetic/chunks/ are skipped when
present.
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
DT = 2e-4  # recipe's 1e-4 halved; step-halving convergence 1.8e-4/time-unit
RECORD_EVERY = int(round(1.0 / DT))
NU = 1e-5
MAX_SUB = 1000  # bounded dispatches for the relay

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SYNTH = os.path.join(REPO, "data", "synthetic")
CHUNK_DIR = os.path.join(SYNTH, "chunks")
STRIDE = SIM_N // N_OUT


def main():
    os.makedirs(CHUNK_DIR, exist_ok=True)
    keys = jax.random.split(jax.random.PRNGKey(42), SIMS)
    f_p = S._fft2p_real(S.fno_forcing(SIM_N))
    down_tr = jax.jit(lambda w_p: S.spectral_downsample(S._ifft2p_re(w_p), N_OUT))
    down_pw = jax.jit(lambda w_p: S._ifft2p_re(w_p)[..., ::STRIDE, ::STRIDE])

    t_start = time.time()
    for i in range(0, SIMS, CHUNK):
        b = min(CHUNK, SIMS - i)
        path_tr = os.path.join(CHUNK_DIR, f"ns_fno_1200_{i:04d}.npy")
        path_pw = os.path.join(CHUNK_DIR, f"ns_fnopw_1200_{i:04d}.npy")
        if os.path.exists(path_tr) and os.path.exists(path_pw):
            print(f"chunk {i:04d}: exists, skip", flush=True)
            continue
        t0 = time.time()
        w_p = jax.vmap(lambda k: S.gaussian_random_field_pair(k, SIM_N))(
            keys[i : i + b]
        )
        fr_tr, fr_pw = [], []
        for fr in range(FRAMES):
            left = RECORD_EVERY
            while left > 0:
                sub = min(left, MAX_SUB)
                w_p = S.advance_vorticity_pair(w_p, f_p, sub, DT, NU)
                left -= sub
            fr_tr.append(np.asarray(down_tr(w_p), np.float32))
            fr_pw.append(np.asarray(down_pw(w_p), np.float32))
            print(
                f"chunk {i:04d}: frame {fr + 1}/{FRAMES} "
                f"({time.time() - t0:.0f}s chunk, {time.time() - t_start:.0f}s total)",
                flush=True,
            )
        for path, frames_list in ((path_tr, fr_tr), (path_pw, fr_pw)):
            arr = np.stack(frames_list, axis=1)  # [b, frames, n, n]
            arr = np.ascontiguousarray(arr.transpose(0, 2, 3, 1).astype(np.float32))
            np.save(path + ".tmp.npy", arr)
            os.replace(path + ".tmp.npy", path)
        print(f"chunk {i:04d}: saved both modes in {time.time() - t0:.0f}s",
              flush=True)

    for tag in ("fno", "fnopw"):
        parts = [
            np.load(os.path.join(CHUNK_DIR, f"ns_{tag}_1200_{i:04d}.npy"))
            for i in range(0, SIMS, CHUNK)
        ]
        u = np.concatenate(parts, axis=0)
        assert u.shape == (SIMS, N_OUT, N_OUT, FRAMES), u.shape
        for n_slice in (SIMS, 400, 100):
            out = os.path.join(
                SYNTH, f"ns_v1e-5_{tag}_s{n_slice}_t{FRAMES}_r{N_OUT}.npz"
            )
            np.savez_compressed(out + ".tmp.npz", u=u[:n_slice])
            os.replace(out + ".tmp.npz", out)
            print(f"wrote {out} shape={u[:n_slice].shape}", flush=True)


if __name__ == "__main__":
    main()
