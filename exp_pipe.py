#!/usr/bin/env python
"""Entry point (CLI-compatible with the reference exp_pipe.py)."""
from transformerbasednavierstokesolver_tpu.cli.exp_pipe import main

if __name__ == "__main__":
    main()
