"""Relative/absolute Lp losses and the Darcy gradient regularizer.

``rel_lp`` matches ``utils/testloss.py:31-42`` (per-sample relative Lp norm
over flattened non-batch dims, then mean or sum over the batch); ``abs_lp``
matches ``utils/testloss.py:15-29``; ``central_diff`` matches
``exp_darcy.py:59-68`` (zero-padded central differences on a square grid).
"""

from typing import Optional

import jax.numpy as jnp


def _norms(x, p):
    if p == 2:
        return jnp.sqrt(jnp.sum(x * x, axis=-1))
    return jnp.sum(jnp.abs(x) ** p, axis=-1) ** (1.0 / p)


def rel_lp(x, y, p: int = 2, reduction: Optional[str] = "mean"):
    """sum/mean over batch of ||x - y||_p / ||y||_p, flattening non-batch dims."""
    b = x.shape[0]
    xf = x.reshape(b, -1)
    yf = y.reshape(b, -1)
    rel = _norms(xf - yf, p) / _norms(yf, p)
    if reduction == "mean":
        return jnp.mean(rel)
    if reduction == "sum":
        return jnp.sum(rel)
    return rel


def abs_lp(x, y, d: int = 2, p: int = 2, reduction: Optional[str] = "mean"):
    """h-scaled absolute Lp norm, h = 1/(size(1) - 1)."""
    b = x.shape[0]
    h = 1.0 / (x.shape[1] - 1.0)
    norms = (h ** (d / p)) * _norms(x.reshape(b, -1) - y.reshape(b, -1), p)
    if reduction == "mean":
        return jnp.mean(norms)
    if reduction == "sum":
        return jnp.sum(norms)
    return norms


class RelLpLoss:
    """Callable mirroring the reference ``TestLoss`` constructor surface."""

    def __init__(self, d=2, p=2, size_average=True, reduction=True):
        assert d > 0 and p > 0
        self.d = d
        self.p = p
        if not reduction:
            self.reduction = None
        else:
            self.reduction = "mean" if size_average else "sum"

    def abs(self, x, y):
        return abs_lp(x, y, d=self.d, p=self.p, reduction=self.reduction)

    def rel(self, x, y):
        return rel_lp(x, y, p=self.p, reduction=self.reduction)

    def __call__(self, x, y):
        return self.rel(x, y)


def central_diff(x, h, resolution):
    """Central differences with one-cell zero padding (periodic-BC surrogate).

    x: [B, N, C] with N = resolution**2 row-major. Returns (grad_x, grad_y)
    each [B, resolution, resolution, C].  grad_x differentiates along the
    fast (W) axis and grad_y along the slow (H) axis, matching
    ``exp_darcy.py:59-68``.
    """
    b, n, c = x.shape
    xg = x.reshape(b, resolution, resolution, c)
    xp = jnp.pad(xg, ((0, 0), (1, 1), (1, 1), (0, 0)))
    grad_x = (xp[:, 1:-1, 2:, :] - xp[:, 1:-1, :-2, :]) / (2 * h)
    grad_y = (xp[:, 2:, 1:-1, :] - xp[:, :-2, 1:-1, :]) / (2 * h)
    return grad_x, grad_y
