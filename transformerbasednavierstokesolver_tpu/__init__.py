"""TPU-native rebuild of the Transolver PDE-solving stack.

A JAX / Flax / Pallas / pjit re-design of the capabilities of
``OnurBasci/TransformerBasedNavierStokeSolver`` (a fork of Transolver's
PDE-Solving-StandardBenchmark): Physics-Attention neural operators for the six
standard PDE benchmarks (Elasticity, Plasticity, Navier-Stokes, Darcy, Airfoil,
Pipe), autoregressive solver-in-the-loop trainers, a latent-space temporal
transformer (SequenSolver), slice-weight predictors, and a pseudo-spectral
2D Navier-Stokes data generator -- all designed TPU-first:

* compute path: jnp einsum/conv kernels shaped for the MXU, with a fused
  Pallas physics-attention kernel for the hot path;
* scaling: ``jax.sharding.Mesh`` + sharding constraints (data-parallel batch
  axis, space-parallel mesh-point axis) with XLA-inserted collectives;
* training: jitted ``lax.scan`` BPTT loops for the autoregressive trainers;
* checkpointing: orbax + a torch ``.pt`` state-dict importer.
"""

__version__ = "0.1.0"
