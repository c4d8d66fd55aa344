"""Host-side generator for the official-recipe Darcy cache.

Produces ``data/synthetic/darcy_hires_s85_n1000_200.npz`` — the cache
``load_darcy`` (``data/datasets.py``) consumes under
``TBNSS_DARCY_REGIME=hires`` — by the FNO pipeline the reference's
``piececonst_r421_*`` files come from (``/root/reference/exp_darcy.py:77-91``):
GRF-threshold coefficients at 421^2, a node-centered solve with the
boundary pinned to exactly 0, pointwise ``[::5, ::5]`` subsampling.

The solve uses scipy's sparse LU (~3 s/sample on this host, ~5x faster
than the JAX CG path) on the SAME stencil as
``darcy_gen.solve_darcy_nodes``; agreement is asserted on the first
sample of each split (rel-L2 < 1e-4).  Coefficient fields reproduce the
JAX generator's key-split sequence bit-exactly, so the cache is
indistinguishable from one built in-process.

Usage:  TBNSS_PLATFORM=cpu python tools/gen_darcy_hires.py [n_train n_test]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import scipy.sparse as sp  # noqa: E402
import scipy.sparse.linalg as spl  # noqa: E402

from transformerbasednavierstokesolver_tpu.data.darcy_gen import (  # noqa: E402
    grf_coefficient,
    solve_darcy_nodes,
)

S_FINE, R = 421, 5


def solve_scipy(a, s):
    """Sparse-LU solve of the exact ``solve_darcy_nodes`` stencil."""
    h = 1.0 / (s - 1)
    hm = lambda x, y: 2 * x * y / (x + y)
    ax = hm(a[:, :-1], a[:, 1:])
    ay = hm(a[:-1, :], a[1:, :])
    e = np.zeros((s, s))
    e[:, :-1] = ax
    w = np.zeros((s, s))
    w[:, 1:] = ax
    so = np.zeros((s, s))
    so[:-1, :] = ay
    no = np.zeros((s, s))
    no[1:, :] = ay
    diag = e + w + so + no
    idx = np.arange(s * s).reshape(s, s)
    interior = np.zeros((s, s), bool)
    interior[1:-1, 1:-1] = True
    ii = idx[interior]
    rows, cols, vals = [ii], [ii], [diag[interior] / h**2]
    I, J = np.meshgrid(np.arange(1, s - 1), np.arange(1, s - 1), indexing="ij")

    def add(coefgrid, di, dj):
        nI, nJ = I + di, J + dj
        inner = (nI > 0) & (nI < s - 1) & (nJ > 0) & (nJ < s - 1)
        rows.append(idx[I[inner], J[inner]])
        cols.append(idx[nI[inner], nJ[inner]])
        vals.append(-coefgrid[I[inner], J[inner]] / h**2)

    add(e, 0, 1)
    add(w, 0, -1)
    add(so, 1, 0)
    add(no, -1, 0)
    n_int = (s - 2) ** 2
    remap = -np.ones(s * s, np.int64)
    remap[ii] = np.arange(n_int)
    A = sp.csc_matrix(
        (
            np.concatenate(vals),
            (remap[np.concatenate(rows)], remap[np.concatenate(cols)]),
        ),
        shape=(n_int, n_int),
    )
    u_int = spl.splu(A).solve(np.ones(n_int))
    u = np.zeros((s, s), np.float64)
    u[1:-1, 1:-1] = u_int.reshape(s - 2, s - 2)
    return u


def build_split(seed, n, check_first=True):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    cs, us = [], []
    t0 = time.time()
    for i in range(n):
        a = np.asarray(grf_coefficient(keys[i], S_FINE), np.float64)
        u = solve_scipy(a, S_FINE)
        if check_first and i == 0:
            u_jax = np.asarray(
                solve_darcy_nodes(jax.numpy.asarray(a, jax.numpy.float32), S_FINE)
            )
            rel = np.linalg.norm(u - u_jax) / np.linalg.norm(u_jax)
            assert rel < 1e-4, f"scipy/jax stencil mismatch: {rel}"
            print(f"seed {seed}: scipy vs jax-cg rel-L2 {rel:.2e}", flush=True)
        cs.append(a[::R, ::R].astype(np.float32))
        us.append(u[::R, ::R].astype(np.float32))
        if (i + 1) % 50 == 0:
            el = time.time() - t0
            print(
                f"seed {seed}: {i + 1}/{n} ({el:.0f}s, {el / (i + 1):.1f}s/sample)",
                flush=True,
            )
    return np.stack(cs), np.stack(us)


def main():
    n_tr = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_te = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    s = (S_FINE - 1) // R + 1
    out = os.path.join(
        os.path.dirname(__file__),
        "..",
        "data",
        "synthetic",
        f"darcy_hires_s{s}_n{n_tr}_{n_te}.npz",
    )
    if os.path.exists(out):
        print(f"{out} already exists; delete it to regenerate")
        return
    x_train, y_train = build_split(0, n_tr)
    x_test, y_test = build_split(1, n_te)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = out + ".tmp.npz"
    np.savez(tmp, x_train=x_train, y_train=y_train, x_test=x_test, y_test=y_test)
    os.replace(tmp, out)
    print(f"wrote {out}: train {x_train.shape}, test {x_test.shape}")


if __name__ == "__main__":
    main()
