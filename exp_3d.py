#!/usr/bin/env python
"""3D structured-mesh scaling entry point (exercises Transolver_Structured_Mesh_3D)."""
from transformerbasednavierstokesolver_tpu.cli.exp_3d import main

if __name__ == "__main__":
    main()
