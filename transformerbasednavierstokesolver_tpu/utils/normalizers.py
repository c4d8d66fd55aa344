"""Field normalizers, as immutable pytrees.

``UnitTransformer`` matches ``utils/normalizer.py:30-53`` (mean/std over dims
(0, 1) keepdim, ``std + 1e-8``); ``UnitGaussianNormalizer`` matches
``utils/normalizer.py:70-97`` (FNO-style per-location stats over dim 0).
``IdentityTransformer`` is the no-op variant (``utils/normalizer.py:5-27``).

Being ``flax.struct`` dataclasses they pass freely through jit / pjit / scan.
Note: torch ``std`` uses the unbiased (ddof=1) estimator -- preserved here.
"""

import jax.numpy as jnp
from flax import struct


def _std(x, axis):
    return jnp.std(x, axis=axis, keepdims=True, ddof=1)


@struct.dataclass
class IdentityTransformer:
    mean: jnp.ndarray
    std: jnp.ndarray

    @classmethod
    def fit(cls, x):
        return cls(mean=jnp.mean(x, 0, keepdims=True), std=_std(x, 0) + 1e-8)

    def encode(self, x):
        return x

    def decode(self, x):
        return x


@struct.dataclass
class UnitTransformer:
    mean: jnp.ndarray
    std: jnp.ndarray

    @classmethod
    def fit(cls, x):
        return cls(
            mean=jnp.mean(x, axis=(0, 1), keepdims=True),
            std=_std(x, (0, 1)) + 1e-8,
        )

    def encode(self, x):
        return (x - self.mean) / self.std

    def decode(self, x):
        return x * self.std + self.mean

    def transform(self, x, inverse=True):
        # Reference's `component` branch is dead code (`normalizer.py:56` is
        # always-true); only the 'all' path is reproduced.
        if inverse:
            return x * (self.std - 1e-8) + self.mean
        return (x - self.mean) / self.std


@struct.dataclass
class UnitGaussianNormalizer:
    mean: jnp.ndarray
    std: jnp.ndarray
    eps: float = struct.field(pytree_node=False, default=1e-5)

    @classmethod
    def fit(cls, x, eps=1e-5):
        return cls(mean=jnp.mean(x, 0), std=jnp.std(x, 0, ddof=1), eps=eps)

    def encode(self, x):
        return (x - self.mean) / (self.std + self.eps)

    def decode(self, x, sample_idx=None):
        if sample_idx is None:
            return x * (self.std + self.eps) + self.mean
        return x * (self.std[sample_idx] + self.eps) + self.mean[sample_idx]
