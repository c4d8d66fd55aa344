"""Test harness: force the CPU backend with 8 virtual devices.

The environment's axon TPU plugin overrides JAX_PLATFORMS at interpreter
start via jax.config, so the override must go through jax.config too, before
any backend is initialized.  Sharding tests then see an 8-device CPU mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_active_mesh():
    """The active-mesh registry (parallel.mesh) is process-global state set
    by dp_put()/sharded tests; clear it so mesh-aware dispatch (the fused
    block's `supported`) is not polluted across tests."""
    yield
    from transformerbasednavierstokesolver_tpu.parallel import set_active_mesh

    set_active_mesh(None)
