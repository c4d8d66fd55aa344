#!/usr/bin/env python
"""Quantify the discretization-noise floor of the transonic airfoil regime
(VERDICT r4 "quantified data-regime ceiling" criterion, airfoil edition —
the elasticity analogue is tools/elas_noise_floor.py).

Method: the dataset's case parameters (eps_x, eps_y, te_deg, alpha, M_inf)
are drawn before any mesh exists, so the SAME case can be solved on the
dataset's 221x51 Karman-Trefftz O-mesh and on the nested 441x101
refinement (angular nodes are linspace -> fine node 2i == coarse node i;
radial nodes are a geometric progression r_far^(j/(n-1)) -> fine 2j ==
coarse j).  The rel-L2 between the two Mach fields AT THE COARSE NODES
measures the content of the 221x51 target that changes under refinement —
dominated by the O(h) smearing of the first-order artificial-density
shock capturing.  A model trained/tested on 221x51 transonic data
plateauing near this number is at the data regime's floor, not at an
optimization gap.

Reference regime being mirrored: the Geo-FNO airfoil download the
reference trains on (/root/reference/exp_airfoil.py:50-68) is transonic
Euler data; its published 0.0053 is on smooth, far finer-resolved fields.

Writes one JSON line per case + a summary to stdout.
Run host-side (pure numpy): ``python tools/airfoil_noise_floor.py [n]``.
"""

import json
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transformerbasednavierstokesolver_tpu.data.transonic import (
    transonic_sample,
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    # resumable: case draws are a deterministic seed stream, so completed
    # cases recorded in the state file (one JSON line each, the same lines
    # this tool prints) are skipped — their rng draws still consumed.
    state_path = sys.argv[2] if len(sys.argv) > 2 else None
    done = {}
    if state_path and os.path.exists(state_path):
        for line in open(state_path):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if "case" in rec:
                done[rec["case"]] = rec
    # the dataset's own parameter stream (generate_airfoil_dataset_transonic
    # seed layout); held-out tail cases via a distinct probe seed
    rng = np.random.default_rng(20260820)
    rels = []
    for k in range(n):
        params = (
            rng.uniform(0.04, 0.12),
            rng.uniform(0.0, 0.06),
            rng.uniform(4.0, 14.0),
            np.deg2rad(rng.uniform(-1.0, 5.0)),
            rng.uniform(0.64, 0.74),
        )
        if k in done:
            rels.append(done[k]["rel_l2_221x51_vs_441x101"])
            print(json.dumps(done[k]), flush=True)
            continue
        _, _, q_c, meta_c = transonic_sample(
            None, 221, 51, n_sweeps=6000, params=params
        )
        _, _, q_f, meta_f = transonic_sample(
            None, 441, 101, n_sweeps=16000, params=params
        )
        fine_at_coarse = q_f[::2, ::2]
        assert fine_at_coarse.shape == q_c.shape
        rel = float(
            np.linalg.norm(q_c - fine_at_coarse) / np.linalg.norm(fine_at_coarse)
        )
        rels.append(rel)
        print(json.dumps({
            "case": k, "rel_l2_221x51_vs_441x101": rel,
            "minf": round(float(params[4]), 4),
            "max_mach_coarse": meta_c["max_mach"],
            "max_mach_fine": meta_f["max_mach"],
            "supersonic_nodes_coarse": meta_c["supersonic_nodes"],
        }), flush=True)
    print(json.dumps({
        "summary": True, "n": n,
        "mean": float(np.mean(rels)), "median": float(np.median(rels)),
        "min": float(np.min(rels)), "max": float(np.max(rels)),
    }))


if __name__ == "__main__":
    main()
