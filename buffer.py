#!/usr/bin/env python
"""Device sanity check (reference ``buffer.py`` printed CUDA availability)."""
import jax

print(f"backend: {jax.default_backend()}")
print(f"devices: {jax.devices()}")
print(f"local device count: {jax.local_device_count()}")
