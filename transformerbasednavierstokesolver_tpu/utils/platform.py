"""Backend selection helper.

The axon TPU plugin in this environment pins ``jax_platforms`` at interpreter
start; honoring a user's CPU request therefore requires a jax.config update,
not just an environment variable.  Call early, before any jax computation.
"""

import os


def select_platform(platform=None):
    """platform: None (leave as configured) | 'cpu' | 'tpu'/'axon'."""
    import jax

    platform = platform or os.environ.get("TBNSS_PLATFORM")
    if not platform:
        return
    if platform == "tpu":
        platform = "axon,cpu" if _has_axon() else "tpu,cpu"
    jax.config.update("jax_platforms", platform)


def _has_axon():
    try:
        from jax._src import xla_bridge

        return "axon" in xla_bridge.backends()
    except Exception:
        return False
