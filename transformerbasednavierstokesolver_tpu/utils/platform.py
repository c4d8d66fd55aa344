"""Backend selection helper.

The axon TPU plugin in this environment pins ``jax_platforms`` at interpreter
start; honoring a user's CPU request therefore requires a jax.config update,
not just an environment variable.  Call early, before any jax computation.
"""

import os


def select_platform(platform=None):
    """platform: None (leave as configured) | 'cpu' | 'tpu'/'axon'."""
    import jax

    enable_compile_cache()
    platform = platform or os.environ.get("TBNSS_PLATFORM")
    if not platform:
        return
    if platform == "tpu":
        platform = "axon,cpu" if _has_axon() else "tpu,cpu"
    jax.config.update("jax_platforms", platform)


def enable_compile_cache(path=None):
    """Persist compiled executables across processes.

    The canonical runs use a relaunch-on-hang watcher + ``--resume``; without
    a persistent cache every relaunch repays the multi-minute XLA/Mosaic
    compile.  Harmless if the backend cannot serialize executables (JAX just
    skips caching).  Opt out with TBNSS_COMPILE_CACHE=0.
    """
    import jax

    if os.environ.get("TBNSS_COMPILE_CACHE", "1") == "0":
        return
    path = path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ".jax_cache",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def cpu_fallback_if_relay_dead(timeout=120):
    """Pin the CPU backend when the TPU relay is unreachable.

    The axon relay process can die mid-session (observed r3), and its
    plugin then HANGS device init rather than raising; probe it in a
    killable subprocess and fall back to CPU.  No-op when the user already
    pinned a platform via TBNSS_PLATFORM.  Returns True if the fallback
    was applied (callers mark the downgrade in their records).
    """
    if os.environ.get("TBNSS_PLATFORM"):
        return False
    import subprocess
    import sys

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout, check=True, capture_output=True,
        )
        return False
    except Exception:
        import jax

        jax.config.update("jax_platforms", "cpu")
        return True


def _has_axon():
    try:
        from jax._src import xla_bridge

        return "axon" in xla_bridge.backends()
    except Exception:
        return False
