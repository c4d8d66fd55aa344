#!/usr/bin/env python
"""Darcy benchmark entry point (CLI-compatible with the reference exp_darcy.py)."""
from transformerbasednavierstokesolver_tpu.cli.exp_darcy import main

if __name__ == "__main__":
    main()
