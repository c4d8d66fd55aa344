#!/usr/bin/env python
"""Discretization-noise floors for the pipe / darcy / plasticity regimes
(VERDICT r4 #7 — the refinement method that closed the elasticity gap,
tools/elas_noise_floor.py; airfoil edition: tools/airfoil_noise_floor.py).

Method (per benchmark): draw a case's continuous parameters exactly as the
dataset generator does, solve on the dataset grid AND a nested 2x
refinement, and measure rel-L2 between the two solutions at the coarse
nodes — the content of the training target that changes under refinement.
A model plateauing near this number is at the data regime's floor.

* pipe  (129x129 -> 257x257): wavy-channel geometry is analytic in
  (amp, ph); linspace grids nest exactly (fine node 2i == coarse node i).
  Dataset solver: solvers._pipe_solver (Poisson, source=8, tol 1e-7).
  Reference regime: /root/reference/exp_pipe.py:43-58.
* darcy (421^2 -> 841^2, compared on the ::5 = 85^2 training view): the
  GRF coefficient is band-limited with 421^2 modes; evaluating its Fourier
  series at the fine solver nodes is exactly the 2x zero-padded inverse
  FFT (fine node j sits at generator coordinate j/842, coarse node j at
  j/421 = fine node 2j).  Dataset solver: darcy_gen.solve_darcy_nodes.
  Reference regime: /root/reference/exp_darcy.py:77-91 (::5 subsample).
* plas  (101x31 -> 201x61, T=20): the die profile bc(x) is analytic;
  linspace grids nest (201 = 2*101-1, 61 = 2*31-1).  Deformation-theory
  plasticity is solved per load step independently, so only the spatial
  discretization (and the dataset's fixed 4 secant iterations) refine;
  the fine solve uses 8 secant iterations + a larger CG budget.  Metric
  matches exp_plas's channel-averaged rel-L2 over [s1, s2, T, 4].
  Reference regime: /root/reference/exp_plas.py:60-74.

Resumable: pass a state file (the tool's own stdout log) as the second
positional arg; completed case lines are skipped.

Run: python tools/refine_noise_floors.py <pipe|darcy|plas> [n] [state]
(darcy/plas prefer the TPU; pipe is cheap anywhere.)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from transformerbasednavierstokesolver_tpu.utils import platform as _plat

_plat.select_platform()

import jax
import jax.numpy as jnp

from transformerbasednavierstokesolver_tpu.data import solvers


def pipe_case(rng):
    amp = rng.uniform(0.05, 0.25, 2).astype(np.float32)
    ph = rng.uniform(0, 2 * np.pi, 2).astype(np.float32)

    def grid(s1, s2):
        t1 = np.linspace(0, 1, s1, dtype=np.float32)
        t2 = np.linspace(0, 1, s2, dtype=np.float32)
        U, V = np.meshgrid(t1, t2, indexing="ij")
        center = 0.5 + amp[0] * np.sin(2 * np.pi * U + ph[0])
        width = 0.3 + amp[1] * 0.3 * np.cos(2 * np.pi * U + ph[1])
        return np.stack([U * 10.0, center + (V - 0.5) * width], -1)

    u_c = np.asarray(solvers._pipe_solver(129, 129)(jnp.asarray(grid(129, 129))))
    u_f = np.asarray(
        solvers._pipe_solver(257, 257, maxiter=12000)(jnp.asarray(grid(257, 257)))
    )
    fa = u_f[::2, ::2]
    return {
        "rel_l2_129_vs_257": float(
            np.linalg.norm(u_c - fa) / np.linalg.norm(fa)
        ),
    }


def _grf_hat(key, s, alpha=2.0, tau=3.0):
    """The 421^2-mode GRF spectrum exactly as grf_coefficient builds it.

    Spectrum/FFT work runs HOST-SIDE (numpy complex): the axon TPU backend
    has no complex arithmetic (CLAUDE.md), only the CG solves go on-chip.
    The normal draws still come from jax.random on CPU so the stream
    matches grf_coefficient bit-for-bit.
    """
    k = np.fft.fftfreq(s, d=1.0 / s) * 2 * np.pi
    kx, ky = np.meshgrid(k, k, indexing="ij")
    coef = (kx**2 + ky**2 + tau**2) ** (-alpha / 2.0) * s
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        kr, ki = jax.random.split(key)
        nr = np.asarray(jax.random.normal(kr, (s, s)))
        ni = np.asarray(jax.random.normal(ki, (s, s)))
    f_hat = coef * (nr + 1j * ni)
    f_hat[0, 0] = 0.0
    return f_hat


def _upsample2x(f_hat, s):
    """Band-limited evaluation of the s^2-mode field at the 2s FFT points
    (generator coordinate j/(2s)); returns a real [2s, 2s] grid whose even
    nodes equal ifft2(f_hat).real exactly.  s odd -> no Nyquist split.
    Host-side numpy (no complex support on the TPU backend)."""
    s2 = 2 * s
    half = (s + 1) // 2  # positive freqs 0..half-1, negative -(s-half)..-1
    pad = np.zeros((s2, s2), f_hat.dtype)
    pad[:half, :half] = f_hat[:half, :half]
    pad[:half, s2 - (s - half):] = f_hat[:half, half:]
    pad[s2 - (s - half):, :half] = f_hat[half:, :half]
    pad[s2 - (s - half):, s2 - (s - half):] = f_hat[half:, half:]
    return (np.fft.ifft2(pad) * 4.0).real


def darcy_case(key):
    from transformerbasednavierstokesolver_tpu.data.darcy_gen import (
        solve_darcy_nodes,
    )

    s = 421
    f_hat = _grf_hat(key, s)
    g_c = np.fft.ifft2(f_hat).real
    a_c = jnp.asarray(np.where(g_c >= 0, 12.0, 3.0), jnp.float32)
    # fine solver nodes j=0..840 sit at generator coordinate j/842: the
    # dataset assigns periodic sample j/s to solver node j/(s-1), and the
    # induced continuous coefficient evaluated at fine solver positions
    # j/840 maps back to exactly j/842 — the 2x zero-padded FFT points.
    g_f = _upsample2x(f_hat, s)[:841, :841]
    a_f = jnp.asarray(np.where(g_f >= 0, 12.0, 3.0), jnp.float32)
    u_c = np.asarray(solve_darcy_nodes(a_c, s))
    u_f = np.asarray(solve_darcy_nodes(a_f, 841, 1.0, 80000, 1e-7))
    fa = u_f[::2, ::2]
    out = {
        "rel_l2_421_vs_841": float(
            np.linalg.norm(u_c - fa) / np.linalg.norm(fa)
        ),
    }
    # the 85^2 training view (::5 of the 421 grid == ::10 of the 841 grid)
    c5, f5 = u_c[::5, ::5], u_f[::10, ::10]
    out["rel_l2_85view"] = float(np.linalg.norm(c5 - f5) / np.linalg.norm(f5))
    return out


def plas_case(rng):
    t1c = np.linspace(0, 1, 101, dtype=np.float32)
    t1f = np.linspace(0, 1, 201, dtype=np.float32)
    a = rng.uniform(0.5, 2.0, 3)

    def bc_of(t1):
        bc = (
            a[0] * np.sin(np.pi * t1)
            + a[1] * np.sin(2 * np.pi * t1) ** 2
            + a[2] * t1 * (1 - t1)
        )
        return ((bc - bc.min()) * 0.06
                / max(bc.max() - bc.min(), 1e-6)).astype(np.float32)

    # NOTE: bc normalization (min/max) is grid-dependent in the generator;
    # use the COARSE grid's normalization for both so the continuous die
    # profile is identical (the dataset's own profile).
    bc_c = bc_of(t1c)
    raw_f = (
        a[0] * np.sin(np.pi * t1f)
        + a[1] * np.sin(2 * np.pi * t1f) ** 2
        + a[2] * t1f * (1 - t1f)
    )
    raw_c = (
        a[0] * np.sin(np.pi * t1c)
        + a[1] * np.sin(2 * np.pi * t1c) ** 2
        + a[2] * t1c * (1 - t1c)
    )
    bc_f = ((raw_f - raw_c.min()) * 0.06
            / max(raw_c.max() - raw_c.min(), 1e-6)).astype(np.float32)

    y_c = np.asarray(
        solvers._plas_solver(101, 31, 20, 1.0, 0.02, 0.1, 4)(jnp.asarray(bc_c))
    )
    y_f = np.asarray(
        solvers._plas_solver(201, 61, 20, 1.0, 0.02, 0.1, 8, maxiter=12000)(
            jnp.asarray(bc_f)
        )
    )
    fa = y_f[::2, ::2]  # [101, 31, 20, 4]
    rels = [
        float(
            np.linalg.norm(y_c[..., j] - fa[..., j])
            / (np.linalg.norm(fa[..., j]) + 1e-12)
        )
        for j in range(4)
    ]
    return {
        "rel_l2_chanavg_101x31_vs_201x61": float(np.mean(rels)),
        "rel_per_channel": [round(r, 6) for r in rels],
    }


def main():
    bench = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    state_path = sys.argv[3] if len(sys.argv) > 3 else None
    done = {}
    if state_path and os.path.exists(state_path):
        for line in open(state_path):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("bench") == bench and "case" in rec:
                done[rec["case"]] = rec

    rels = []
    key_field = None
    for k in range(n):
        # deterministic per-case streams (probe seed distinct from dataset)
        if k in done:
            rec = done[k]
        else:
            if bench == "pipe":
                rec = pipe_case(np.random.default_rng(77000 + k))
            elif bench == "darcy":
                rec = darcy_case(jax.random.PRNGKey(77000 + k))
            elif bench == "plas":
                rec = plas_case(np.random.default_rng(77000 + k))
            else:
                raise SystemExit(f"unknown bench {bench}")
            rec = {"bench": bench, "case": k, **rec}
        if key_field is None:
            key_field = next(f for f in rec if f.startswith("rel_l2"))
        rels.append(rec[key_field])
        print(json.dumps(rec), flush=True)
    print(json.dumps({
        "bench": bench, "summary": True, "n": n, "metric": key_field,
        "mean": float(np.mean(rels)), "median": float(np.median(rels)),
        "min": float(np.min(rels)), "max": float(np.max(rels)),
    }), flush=True)


if __name__ == "__main__":
    main()
