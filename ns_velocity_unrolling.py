#!/usr/bin/env python
"""Entry point (CLI-compatible with the reference ns_velocity_unrolling.py)."""
from transformerbasednavierstokesolver_tpu.cli.unrolling import ns_velocity_unrolling_main

if __name__ == "__main__":
    ns_velocity_unrolling_main()
