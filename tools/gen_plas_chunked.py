#!/usr/bin/env python
"""Chunked, resumable builder for the plasticity FEM synthetic cache.

``datasets.load_plasticity`` (reference schema: /root/reference/exp_plas.py:105-116)
builds ``data/synthetic/plas_fem_n{n}.npz`` in ONE call to
``solvers.generate_plasticity_dataset`` -- ~5 s/sample on this host's single
CPU core, so the reference-scale cache (synth_n 900 -> n = 900 + 225 = 1125)
is ~95 min of compute that an end-of-round kill would throw away entirely.

This tool produces the byte-identical cache in resumable chunks:

  * samples are drawn from the same ``np.random.default_rng(seed)`` stream
    in the same order (one ``uniform(0.5, 2.0, 3)`` draw per sample, see
    ``solvers.plasticity_sample``), so chunk k resumes by fast-forwarding
    the stream past the k*chunk draws already banked;
  * each finished chunk is written to ``plas_fem_n{n}.part{k}.npz`` -- a
    killed run loses at most one chunk;
  * when all chunks exist they are concatenated into the exact
    ``plas_fem_n{n}.npz`` the loader reads, and the parts are removed.

Usage:  python tools/gen_plas_chunked.py --synth_n 900 [--chunk 25]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--synth_n", type=int, default=900,
                   help="training-sample count; total n adds the loader's "
                        "max(synth_n//4, 8) eval margin")
    p.add_argument("--chunk", type=int, default=25)
    p.add_argument("--seed", type=int, default=11,
                   help="must stay 11 to match datasets.load_plasticity")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # FEM gen is CPU-only

    from transformerbasednavierstokesolver_tpu.data import solvers
    from transformerbasednavierstokesolver_tpu.data.datasets import _SYNTH_DIR

    n = args.synth_n + max(args.synth_n // 4, 8)  # loader's sizing rule
    os.makedirs(_SYNTH_DIR, exist_ok=True)
    final = os.path.join(_SYNTH_DIR, f"plas_fem_n{n}.npz")
    if os.path.exists(final):
        print(f"cache already built: {final}")
        return

    rng = np.random.default_rng(args.seed)
    parts, start, k = [], 0, 0
    while start < n:
        m = min(args.chunk, n - start)
        part = os.path.join(_SYNTH_DIR, f"plas_fem_n{n}.part{k}.npz")
        if os.path.exists(part):
            for _ in range(m):  # fast-forward the rng stream past this chunk
                rng.uniform(0.5, 2.0, 3)
        else:
            cb, cy = [], []
            for _ in range(m):
                y, bc = solvers.plasticity_sample(rng)
                cb.append(bc)
                cy.append(y)
            tmp = part + ".tmp.npz"
            np.savez_compressed(tmp, x=np.stack(cb), y=np.stack(cy))
            os.replace(tmp, part)
            print(f"part {k}: samples {start}..{start + m - 1}", flush=True)
        parts.append(part)
        start += m
        k += 1

    if os.path.exists(final):  # a concurrent invocation won the assembly race
        print(f"cache already built: {final}")
        return
    x = np.concatenate([np.load(q)["x"] for q in parts])
    y = np.concatenate([np.load(q)["y"] for q in parts])
    tmp = final + ".tmp.npz"
    np.savez_compressed(tmp, x=x, y=y)
    try:
        os.replace(tmp, final)
    except FileNotFoundError:
        # two invocations raced on the shared tmp name; fine iff one landed
        if not os.path.exists(final):
            raise
    for q in parts:
        if os.path.exists(q):
            os.remove(q)
    print(f"built {final}  x{x.shape} y{y.shape}")


if __name__ == "__main__":
    main()
