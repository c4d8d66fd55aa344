#!/usr/bin/env python
"""Post-reboot host-side cache regeneration chain (round 3c).

The environment reboot wiped ``data/synthetic/`` (gitignored), so every
synthetic cache the accuracy queue consumes must be rebuilt.  This host has
ONE cpu core, so the chain is strictly sequential and ordered by
chip-run value per cpu-second:

  1. elasticity FEM caches n1250 + n5000   (~20 min; enables elas canonical + 4x)
  2. darcy official-recipe hires cache     (~1 h;   enables darcy500 hires)
  3. pipe FEM cache n1250                  (corrected-J physics; pipe500)
  4. plasticity FEM cache n1125            (~2 h;   enables plas900)
  5. airfoil Karman-Trefftz cache n1250    (fast;   airfoil fallback regime)
  6. airfoil transonic cache n1250         (~4-7 h, chunk-resumable; whatever
                                            lands before the round ends)

Each step is independent; a failure logs and moves on.  Chunked tools
(darcy/plas/transonic) resume across invocations.
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["TBNSS_PLATFORM"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

SYNTH = os.path.join(REPO, "data", "synthetic")


def step(name, fn):
    t0 = time.time()
    print(f"=== {name}: start {time.strftime('%H:%M:%S')}", flush=True)
    try:
        fn()
        print(f"=== {name}: done in {time.time() - t0:.0f}s", flush=True)
    except Exception as e:  # keep the chain moving
        print(f"=== {name}: FAILED after {time.time() - t0:.0f}s: {e!r}",
              flush=True)


def have(name):
    return os.path.exists(os.path.join(SYNTH, name))


def gen_elas():
    from transformerbasednavierstokesolver_tpu.data import datasets as D

    for sn in (1000, 4000):
        if have(f"elas_fem_n{sn + sn // 4}.npz"):
            print(f"elas n{sn + sn // 4} cache exists, skip", flush=True)
            continue
        D.load_elasticity("/nonexistent", ntrain=1, ntest=1, synth_n=sn)
        print(f"elas synth_n={sn} cached", flush=True)


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, cwd=REPO, check=True)


def gen_darcy():
    if have("darcy_hires_s85_n1000_200.npz"):
        print("darcy hires cache exists, skip", flush=True)
        return
    run([sys.executable, "tools/gen_darcy_hires.py"])


def gen_pipe():
    if have("pipe_pde_n1250.npz"):
        print("pipe cache exists, skip", flush=True)
        return
    from transformerbasednavierstokesolver_tpu.data import datasets as D

    D.load_pipe("/nonexistent", ntrain=1, ntest=1, synth_n=1000)


def gen_plas():
    if have("plas_fem_n1125.npz"):
        print("plas cache exists, skip", flush=True)
        return
    run([sys.executable, "tools/gen_plas_chunked.py", "--synth_n", "900"])


def gen_airfoil_kt():
    if have("airfoil_pde_n1250.npz"):
        print("airfoil KT cache exists, skip", flush=True)
        return
    from transformerbasednavierstokesolver_tpu.data import datasets as D

    D.load_airfoil("/nonexistent", ntrain=1, ntest=1, synth_n=1000)


def gen_airfoil_transonic():
    if have("airfoil_tsn_n1250.npz"):
        print("airfoil transonic cache exists, skip", flush=True)
        return
    run([sys.executable, "tools/gen_airfoil_transonic.py"])


def main():
    step("elas", gen_elas)
    step("darcy_hires", gen_darcy)
    step("pipe", gen_pipe)
    step("plas", gen_plas)
    step("airfoil_kt", gen_airfoil_kt)
    step("airfoil_transonic", gen_airfoil_transonic)
    print("HOST_GEN_CHAIN_DONE", flush=True)


if __name__ == "__main__":
    main()
