from .spectral_ns import (
    mcwilliams_vorticity_hat,
    simulate_vorticity,
    generate_vorticity_dataset,
    generate_velocity_dataset,
)
from .datasets import (
    load_darcy,
    load_ns_vorticity,
    load_ns_velocity_npy,
    load_airfoil,
    load_pipe,
    load_elasticity,
    load_plasticity,
    meshgrid_pos,
)

__all__ = [
    "mcwilliams_vorticity_hat",
    "simulate_vorticity",
    "generate_vorticity_dataset",
    "generate_velocity_dataset",
    "load_darcy",
    "load_ns_vorticity",
    "load_ns_velocity_npy",
    "load_airfoil",
    "load_pipe",
    "load_elasticity",
    "load_plasticity",
    "meshgrid_pos",
]
