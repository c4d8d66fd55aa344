#!/usr/bin/env python
"""Entry point (CLI-compatible with the reference ns_velocity.py)."""
from transformerbasednavierstokesolver_tpu.cli.ns_velocity import main

if __name__ == "__main__":
    main()
