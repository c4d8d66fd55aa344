#!/usr/bin/env python
"""NS benchmark entry point (CLI-compatible with the reference exp_ns.py)."""
from transformerbasednavierstokesolver_tpu.cli.exp_ns import main

if __name__ == "__main__":
    main()
