#!/usr/bin/env python
"""Entry point (CLI-compatible with the reference auto_encoder.py)."""
from transformerbasednavierstokesolver_tpu.cli.auto_encoder import main

if __name__ == "__main__":
    main()
