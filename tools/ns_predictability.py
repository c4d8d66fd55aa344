"""Intrinsic predictability floor of the 64^2 NS benchmark frames.

The benchmark's 64^2 vorticity frames are Fourier truncations of an
unclosed 256^2 nu=1e-5 flow (`data/spectral_ns.py:413`, matching the
Li et al. 2020 generation the reference downloads).  Any model that
observes only the truncated state therefore has an irreducible rollout
error: the discarded k>32 modes feed back into the resolved modes
through the nonlinear term.  This probe measures that floor directly
with the true solver, no learning involved:

  * TRUE:     w256(t=10) -> integrate 10 frames -> truncate to 64^2
  * FLOOR:    truncate w256(t=10) to 64^2, zero-pad back to 256^2,
              integrate the same 10 frames with the TRUE solver,
              truncate  ->  the best any Markov 64^2-state emulator
              could possibly do (a 10-frame input history can recover
              part of the subgrid state, so this is a mild
              overestimate of the floor for the benchmark's T_in=10
              models);
  * LYAPUNOV: perturb w256(t=10) by eps relative GRF noise and
              integrate -> per-frame error amplification of the
              resolved flow (how fast one-step model error compounds
              over the 10-step closed-loop rollout).

Run on the TPU (a 256^2 spectral integration over 20 time units at
dt=2e-4 is ~100k substeps/sim):
    python tools/ns_predictability.py [nsims]
CPU smoke (tiny, mechanics only):
    TBNSS_PLATFORM=cpu python tools/ns_predictability.py 2 64 16 1e-2
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from transformerbasednavierstokesolver_tpu.utils.platform import (  # noqa: E402
    select_platform,
)

select_platform()

from transformerbasednavierstokesolver_tpu.data.spectral_ns import (  # noqa: E402
    _fft2p_real,
    _ifft2p_re,
    advance_vorticity_pair,
    fno_forcing,
    gaussian_random_field_pair,
    spectral_downsample,
)

NU = 1e-5
SUB = 1000  # max substeps per dispatch (relay hangs on multi-minute ones)


def lift(w64, sim_n):
    """Zero-pad real [..., m, m] fields to a sim_n^2 spectral pair
    (inverse of spectral_downsample up to the discarded modes)."""
    m = w64.shape[-1]
    f_p = _fft2p_real(w64) * (sim_n / m) ** 2
    h = m // 2
    out = jnp.zeros(w64.shape[:-2] + (2, sim_n, sim_n), f_p.dtype)
    out = out.at[..., :h, :h].set(f_p[..., :h, :h])
    out = out.at[..., :h, -h:].set(f_p[..., :h, -h:])
    out = out.at[..., -h:, :h].set(f_p[..., -h:, :h])
    out = out.at[..., -h:, -h:].set(f_p[..., -h:, -h:])
    return out


def rel_l2(a, b, axis):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.sqrt(((a - b) ** 2).sum(axis)) / np.sqrt((b**2).sum(axis))


def main(nsims=4, sim_n=256, n_out=64, dt=2e-4, eps=1e-3):
    nsims, sim_n, n_out = int(nsims), int(sim_n), int(n_out)
    dt, eps = float(dt), float(eps)
    keys = jax.random.split(jax.random.PRNGKey(123), nsims)
    w_p = jax.vmap(lambda k: gaussian_random_field_pair(k, sim_n))(keys)
    f_p = _fft2p_real(fno_forcing(sim_n))
    down = jax.jit(lambda wp: spectral_downsample(_ifft2p_re(wp), n_out))

    def run(w_p, frames):
        per_frame = int(round(1.0 / dt))
        recs = []
        for _ in range(frames):
            left = per_frame
            while left > 0:
                s = min(left, SUB)
                w_p = advance_vorticity_pair(w_p, f_p, s, dt, NU)
                left -= s
            recs.append(np.asarray(down(w_p), np.float32))
        return w_p, np.stack(recs, 1)  # [b, frames, n_out, n_out]

    print(f"spinning up {nsims} sims to t=10 at {sim_n}^2, dt={dt} ...")
    w10, _ = run(w_p, 10)

    print("TRUE rollout t=10..20 ...")
    _, true64 = run(w10, 10)

    print("FLOOR rollout (truncated restart) ...")
    _, floor64 = run(lift(down(w10), sim_n), 10)

    print(f"LYAPUNOV rollout (eps={eps} relative GRF perturbation) ...")
    pkeys = jax.random.split(jax.random.PRNGKey(7), nsims)
    noise = jax.vmap(lambda k: gaussian_random_field_pair(k, sim_n))(pkeys)
    w_rms = jnp.sqrt(jnp.mean(_ifft2p_re(w10) ** 2))
    n_rms = jnp.sqrt(jnp.mean(_ifft2p_re(noise) ** 2))
    _, pert64 = run(w10 + noise * (eps * w_rms / n_rms), 10)

    floor_step = rel_l2(floor64, true64, axis=(2, 3)).mean(0)
    floor_full = rel_l2(floor64, true64, axis=(1, 2, 3)).mean()
    pert_step = rel_l2(pert64, true64, axis=(2, 3)).mean(0)
    pert_full = rel_l2(pert64, true64, axis=(1, 2, 3)).mean()

    print("\nper-frame rel-L2 vs TRUE (frames t=11..20):")
    print("  floor(truncated restart):",
          " ".join(f"{v:.4f}" for v in floor_step))
    print(f"  full-window floor:        {floor_full:.4f}")
    print("  lyapunov:                ",
          " ".join(f"{v:.4f}" for v in pert_step))
    print(f"  full-window lyapunov:     {pert_full:.4f}")
    amp = [float(pert_step[i + 1] / pert_step[i]) for i in range(9)]
    print("  per-frame amplification:  ",
          " ".join(f"{a:.2f}" for a in amp))

    out = {
        "nsims": nsims, "sim_n": sim_n, "n_out": n_out, "dt": dt,
        "floor_per_frame": [round(float(v), 4) for v in floor_step],
        "floor_full_window": round(float(floor_full), 4),
        "lyapunov_eps": eps,
        "lyapunov_per_frame": [round(float(v), 4) for v in pert_step],
        "lyapunov_full_window": round(float(pert_full), 4),
        "lyapunov_amplification_per_frame": [round(a, 3) for a in amp],
    }
    print("\n" + json.dumps(out))
    with open("logs/ns_predictability.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(*sys.argv[1:])
