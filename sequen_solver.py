#!/usr/bin/env python
"""SequenSolver entry point (reference: SequenSolverMerged.py / SequenSolver.py).

``--variant merged`` (default) is the reference's SequenSolverMerged
(causal multi-head temporal attention + jointly learned slice weights);
``--variant original`` is the reference's SequenSolver (2-phase gt-slice
schedule).
"""
from transformerbasednavierstokesolver_tpu.cli.sequen_solver import main

if __name__ == "__main__":
    main()
