#!/usr/bin/env python
"""Entry point (CLI-compatible with the reference exp_plas.py)."""
from transformerbasednavierstokesolver_tpu.cli.exp_plas import main

if __name__ == "__main__":
    main()
