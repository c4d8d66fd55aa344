#!/usr/bin/env python
"""Entry point (CLI-compatible with the reference ns_unrolling2_with_t.py)."""
from transformerbasednavierstokesolver_tpu.cli.unrolling import ns_unrolling2_with_t_main

if __name__ == "__main__":
    ns_unrolling2_with_t_main()
