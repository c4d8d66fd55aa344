"""Quantified NS-benchmark gap analysis (dataset-intrinsic difficulty).

The published NS bar (rollout rel-L2 0.090, `fig/standard_benchmark.png`
via `/root/reference/README.md:29`) was measured on the downloaded
`NavierStokes_V1e-5_N1200_T20.mat`; our runs use the in-repo spectral
generator in the same documented regime (`data/spectral_ns.py:413`,
Li et al. 2020: GRF IC, 0.1(sin+cos) forcing, nu=1e-5, 256^2 solver
truncated to 64^2, frame_dt=1).  This tool measures how hard the
*generated* data is, independent of any model:

  * per-frame persistence error  ||u[t+1]-u[t]|| / ||u[t+1]||  -- the
    skill-zero baseline the model has to beat at every rollout step;
  * the benchmark metric applied to persistence (predict the whole
    t=10..19 window as a frozen copy of frame 9) and to the
    "solver-frame-shift" baseline (predict u[t+k] = u[9+k-1]);
  * kinetic energy / enstrophy growth over the record window (the
    forced nu=1e-5 flow spins up: decorrelation accelerates in the
    prediction window, so late frames are intrinsically harder).

Run on CPU against the cached dataset:
    TBNSS_PLATFORM=cpu python tools/ns_gap_analysis.py [cache.npz]
"""

import json
import sys

import numpy as np


def rel_l2(pred, tgt, axis):
    num = np.sqrt((np.asarray(pred - tgt, np.float64) ** 2).sum(axis=axis))
    den = np.sqrt((np.asarray(tgt, np.float64) ** 2).sum(axis=axis))
    return num / den


def main(path="data/synthetic/ns_v1e-5_fno_s1200_t20_r64.npz", nsims=200):
    u = np.load(path)["u"][:nsims]  # [S, 64, 64, 20]
    s, h, w, T = u.shape
    print(f"{path}: using {s} sims, {h}x{w}, T={T}")

    # per-frame persistence (one-step decorrelation)
    per_step = rel_l2(u[..., :-1], u[..., 1:], axis=(1, 2)).mean(0)
    print("\nper-frame persistence rel-L2 (predict u[t+1]=u[t]):")
    for t, v in enumerate(per_step):
        marker = " <- prediction window" if t >= 9 else ""
        print(f"  t={t:2d} -> t={t+1:2d}: {v:.4f}{marker}")

    # benchmark-style full-window persistence baselines.  exp_ns predicts
    # frames 10..19 from frames 0..9; the metric is rel-L2 over the
    # flattened 10-frame window (utils/losses.rel_lp == reference
    # TestLoss, /root/reference/exp_ns.py:243-246).
    tgt = u[..., 10:20]
    frozen = np.repeat(u[..., 9:10], 10, axis=-1)
    shift = u[..., 9:19]
    full_frozen = rel_l2(frozen, tgt, axis=(1, 2, 3)).mean()
    full_shift = rel_l2(shift, tgt, axis=(1, 2, 3)).mean()

    # energy / enstrophy growth (forced spin-up)
    ke_proxy = (u**2).mean(axis=(0, 1, 2))  # enstrophy ~ <w^2>
    print("\nmean enstrophy <w^2> by frame (spin-up profile):")
    print("  " + " ".join(f"{v:.2f}" for v in ke_proxy))

    out = {
        "per_step_persistence": [round(float(v), 4) for v in per_step],
        "full_window_persistence_frozen": round(float(full_frozen), 4),
        "full_window_persistence_frame_shift": round(float(full_shift), 4),
        "enstrophy_by_frame": [round(float(v), 3) for v in ke_proxy],
        "enstrophy_growth_10_to_19": round(
            float(ke_proxy[19] / ke_proxy[10]), 3
        ),
    }
    print("\n" + json.dumps(out))
    return out


if __name__ == "__main__":
    main(*sys.argv[1:])
