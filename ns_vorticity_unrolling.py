#!/usr/bin/env python
"""Entry point (CLI-compatible with the reference ns_vorticity_unrolling.py)."""
from transformerbasednavierstokesolver_tpu.cli.unrolling import ns_vorticity_unrolling_main

if __name__ == "__main__":
    ns_vorticity_unrolling_main()
