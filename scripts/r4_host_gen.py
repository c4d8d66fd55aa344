#!/usr/bin/env python
"""Round-4 host-side cache regeneration chain (post third environment wipe).

Same machinery as scripts/r3c_host_gen.py, reordered by round-4 value per
cpu-second on this ONE-core host (VERDICT.md "Next round" items 2/3 first):

  1. plasticity FEM cache n1125      (~2 h; unblocks the plas-900 full
                                      schedule, VERDICT item 3)
  2. airfoil transonic cache n1250   (~4-7 h, chunk-resumable; VERDICT
                                      item 2 -- the only move that can fix
                                      the 8.7x airfoil gap)
  3. pipe FEM cache n1250            (pipe retrains)
  4. darcy official-recipe hires     (darcy retrains)
  5. airfoil Karman-Trefftz n1250    (fallback regime only)

Elasticity n1250/n5000 are already banked in git and restored on clone.
Each step is independent and chunk-resumable where the underlying tool is.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.r3c_host_gen import (  # noqa: E402
    step, gen_plas, gen_airfoil_transonic, gen_pipe, gen_darcy,
    gen_airfoil_kt, gen_elas,
)


def main():
    step("elas", gen_elas)  # no-op when the banked caches are present
    step("plas", gen_plas)
    step("airfoil_transonic", gen_airfoil_transonic)
    step("pipe", gen_pipe)
    step("darcy_hires", gen_darcy)
    step("airfoil_kt", gen_airfoil_kt)
    print("HOST_GEN_CHAIN_DONE", flush=True)


if __name__ == "__main__":
    main()
