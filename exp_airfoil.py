#!/usr/bin/env python
"""Entry point (CLI-compatible with the reference exp_airfoil.py)."""
from transformerbasednavierstokesolver_tpu.cli.exp_airfoil import main

if __name__ == "__main__":
    main()
