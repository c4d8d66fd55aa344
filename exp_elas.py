#!/usr/bin/env python
"""Entry point (CLI-compatible with the reference exp_elas.py)."""
from transformerbasednavierstokesolver_tpu.cli.exp_elas import main

if __name__ == "__main__":
    main()
