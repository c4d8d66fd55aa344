"""Host-side generator for the transonic airfoil cache.

Produces ``data/synthetic/airfoil_tsn_n1250.npz`` — the cache
``load_airfoil`` consumes under ``TBNSS_AIRFOIL_REGIME=transonic`` —
with the exact seed/ordering of the loader's in-process build path
(sequential draws from ``default_rng(0)``), so the cache is
indistinguishable from one built by the loader.

~10-25 s per sample on this host (subcritical samples converge early);
the full 1250 takes a few hours, so work is checkpointed in 50-sample
chunks under ``data/synthetic/chunks/`` and the run resumes after a
crash by fast-forwarding the rng over completed chunks (drawing the
same 5 geometry/flow parameters per sample without solving).

Usage: python tools/gen_airfoil_transonic.py [n_total]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from transformerbasednavierstokesolver_tpu.data.transonic import (  # noqa: E402
    transonic_sample,
)

CHUNK = 50
SYNTH = os.path.join(os.path.dirname(__file__), "..", "data", "synthetic")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1250
    out = os.path.join(SYNTH, f"airfoil_tsn_n{n}.npz")
    if os.path.exists(out):
        print(f"{out} already exists; delete it to regenerate")
        return
    chunk_dir = os.path.join(SYNTH, "chunks")
    os.makedirs(chunk_dir, exist_ok=True)

    rng = np.random.default_rng(0)
    t0 = time.time()
    shocked = unconverged = 0
    for start in range(0, n, CHUNK):
        size = min(CHUNK, n - start)
        cpath = os.path.join(chunk_dir, f"airfoil_tsn_{start:05d}.npz")
        if os.path.exists(cpath):
            # fast-forward the rng over this completed chunk: same draws
            # as transonic_sample's parameter sampling, no solves
            for _ in range(size):
                rng.uniform(0.04, 0.12)
                rng.uniform(0.0, 0.06)
                rng.uniform(4.0, 14.0)
                rng.uniform(-1.0, 5.0)
                rng.uniform(0.64, 0.74)
            continue
        xs, ys, qs = [], [], []
        for _ in range(size):
            X, Y, Q, meta = transonic_sample(rng)
            xs.append(X)
            ys.append(Y)
            qs.append(Q)
            if meta["supersonic_nodes"] > 10:
                shocked += 1
            if meta["corr"] > 1e-4:
                unconverged += 1
        tmp = cpath + ".tmp.npz"
        np.savez(tmp, X=np.stack(xs), Y=np.stack(ys), Q=np.stack(qs))
        os.replace(tmp, cpath)
        done = start + size
        el = time.time() - t0
        print(
            f"{done}/{n} ({el:.0f}s) supersonic {shocked} "
            f"unconverged {unconverged}",
            flush=True,
        )

    Xs, Ys, Qs = [], [], []
    for start in range(0, n, CHUNK):
        with np.load(os.path.join(chunk_dir,
                                  f"airfoil_tsn_{start:05d}.npz")) as z:
            Xs.append(z["X"])
            Ys.append(z["Y"])
            Qs.append(z["Q"])
    tmp = out + ".tmp.npz"
    np.savez(tmp, X=np.concatenate(Xs), Y=np.concatenate(Ys),
             Q=np.concatenate(Qs))
    os.replace(tmp, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
