"""Fused Pallas TPU kernel for the physics-attention core.

Placeholder for the fused slice->aggregate->attend->deslice kernel; the XLA
einsum path in ``attention.py`` is the reference implementation.  Until the
kernel lands, ``supported`` returns False and callers fall back to XLA.
"""


def supported(x_mid, slice_kernel) -> bool:
    return False


def slice_attention_fused(*args, **kwargs):
    raise NotImplementedError("pallas fused physics-attention not yet implemented")
