"""Darcy-flow data generation: piecewise-constant coefficients + FD solve.

The reference downloads the FNO ``piececonst_r421_N1024_smooth*`` files
(``README.md:29``); here equivalent samples can be generated on-device:
coefficient a(x) = 12 where a periodic GRF >= 0 else 3 (the FNO convention),
forcing f = 1, and the Darcy problem ``-div(a grad u) = f`` with homogeneous
Dirichlet BCs solved by conjugate gradients on a flux-form 5-point stencil
with harmonic face averaging.  Everything jits; samples are vmapped.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def grf_coefficient(key, s, alpha=2.0, tau=3.0, hi=12.0, lo=3.0):
    """Threshold a periodic Gaussian random field into {lo, hi} on an s x s grid."""
    k = jnp.fft.fftfreq(s, d=1.0 / s) * 2 * jnp.pi
    kx, ky = jnp.meshgrid(k, k, indexing="ij")
    coef = (kx**2 + ky**2 + tau**2) ** (-alpha / 2.0) * s
    kr, ki = jax.random.split(key)
    noise = jax.random.normal(kr, (s, s)) + 1j * jax.random.normal(ki, (s, s))
    f_hat = coef * noise
    f_hat = f_hat.at[0, 0].set(0.0)
    g = jnp.fft.ifft2(f_hat).real
    return jnp.where(g >= 0, hi, lo)


def _face_coeffs(a):
    def hmean(x, y):
        return 2.0 * x * y / (x + y)

    ax_e = hmean(a[:, :-1], a[:, 1:])  # east faces [s, s-1]
    ay_s = hmean(a[:-1, :], a[1:, :])  # south faces [s-1, s]
    pad_e = jnp.pad(ax_e, ((0, 0), (0, 1)))
    pad_w = jnp.pad(ax_e, ((0, 0), (1, 0)))
    pad_s = jnp.pad(ay_s, ((0, 1), (0, 0)))
    pad_n = jnp.pad(ay_s, ((1, 0), (0, 0)))
    bc_e = jnp.zeros_like(a).at[:, -1].set(2 * a[:, -1])
    bc_w = jnp.zeros_like(a).at[:, 0].set(2 * a[:, 0])
    bc_s = jnp.zeros_like(a).at[-1, :].set(2 * a[-1, :])
    bc_n = jnp.zeros_like(a).at[0, :].set(2 * a[0, :])
    diag = pad_e + pad_w + pad_s + pad_n + bc_e + bc_w + bc_s + bc_n
    return pad_e, pad_w, pad_s, pad_n, diag


def _darcy_diag(a, h):
    return _face_coeffs(a)[-1] / (h * h)


def _darcy_matvec(a, u, h):
    """Flux-form 5-point stencil of -div(a grad u), Dirichlet-0 boundary.

    a, u: [s, s].  Face coefficients are harmonic means of cell values;
    boundary fluxes use the cell's own coefficient against u=0 (Dirichlet).
    """
    pad_e, pad_w, pad_s, pad_n, diag = _face_coeffs(a)

    u_e = jnp.pad(u[:, 1:], ((0, 0), (0, 1)))
    u_w = jnp.pad(u[:, :-1], ((0, 0), (1, 0)))
    u_s = jnp.pad(u[1:, :], ((0, 1), (0, 0)))
    u_n = jnp.pad(u[:-1, :], ((1, 0), (0, 0)))

    flux = (
        diag * u - pad_e * u_e - pad_w * u_w - pad_s * u_s - pad_n * u_n
    )
    return flux / (h * h)


@partial(jax.jit, static_argnums=(1,))
def solve_darcy(a, s, f=1.0, maxiter=4000, tol=1e-7):
    """CG solve of -div(a grad u) = f on [0,1]^2, u=0 on the boundary."""
    h = 1.0 / (s - 1)
    rhs = jnp.full((s, s), f)
    mv = lambda u: _darcy_matvec(a, u, h)
    # Jacobi preconditioner on the exact stencil diagonal
    diag = _darcy_diag(a, h)
    precond = lambda r: r / jnp.maximum(diag, 1e-8)
    u, _ = jax.scipy.sparse.linalg.cg(
        mv, rhs, tol=tol, maxiter=maxiter, M=precond
    )
    return u


def generate_darcy_dataset(key, n_samples, s=85):
    """[n, s, s] coefficients and solutions, FNO-style, generated on device."""
    keys = jax.random.split(key, n_samples)
    coeffs = jax.vmap(lambda k: grf_coefficient(k, s))(keys)
    sols = jax.vmap(lambda a: solve_darcy(a, s))(coeffs)
    return np.asarray(coeffs, np.float32), np.asarray(sols, np.float32)


# --------------------------------------------------------------------------
# High-resolution (official-recipe) generation: solve at 421^2 NODES with
# the boundary pinned exactly to zero, then subsample pointwise ::r -- the
# FNO pipeline the reference's files come from (``exp_darcy.py:77-91``
# consumes ``piececonst_r421_*`` and does ``[:, ::r, ::r]``).  The direct
# 85^2 cell-flux solve above leaves ~4%-of-max values on the boundary ring
# where the official data is exactly 0 (round-3 generator audit).
# --------------------------------------------------------------------------


def _node_face_coeffs(a):
    """Per-edge harmonic-mean coefficients for a node-centered grid.

    Returns (east, west, south, north) [s, s] arrays holding the
    coefficient of the edge from each node toward that neighbor (0 where
    the neighbor is off-grid), plus their sum (the stencil diagonal).
    """

    def hmean(x, y):
        return 2.0 * x * y / (x + y)

    ax = hmean(a[:, :-1], a[:, 1:])  # edge between (i,j) and (i,j+1)
    ay = hmean(a[:-1, :], a[1:, :])  # edge between (i,j) and (i+1,j)
    e = jnp.pad(ax, ((0, 0), (0, 1)))
    w = jnp.pad(ax, ((0, 0), (1, 0)))
    s_ = jnp.pad(ay, ((0, 1), (0, 0)))
    n = jnp.pad(ay, ((1, 0), (0, 0)))
    return e, w, s_, n, e + w + s_ + n


@partial(jax.jit, static_argnums=(1,))
def solve_darcy_nodes(a, s, f=1.0, maxiter=20000, tol=1e-7):
    """Node-centered CG solve of -div(a grad u) = f, u = 0 pinned on the
    boundary nodes (so subsampled fields are exactly 0 there, matching the
    official data).  The operator acts as the identity on boundary nodes,
    which keeps it SPD on the full grid while the zero rhs keeps them 0.
    """
    h = 1.0 / (s - 1)
    mask = jnp.zeros((s, s)).at[1:-1, 1:-1].set(1.0)
    rhs = jnp.broadcast_to(jnp.asarray(f, jnp.float32), (s, s)) * mask
    e, w, s_, n, diag = _node_face_coeffs(a)

    def mv(u):
        u = u * mask
        u_e = jnp.pad(u[:, 1:], ((0, 0), (0, 1)))
        u_w = jnp.pad(u[:, :-1], ((0, 0), (1, 0)))
        u_s = jnp.pad(u[1:, :], ((0, 1), (0, 0)))
        u_n = jnp.pad(u[:-1, :], ((1, 0), (0, 0)))
        flux = (diag * u - e * u_e - w * u_w - s_ * u_s - n * u_n) / (h * h)
        return jnp.where(mask == 1.0, flux, u)

    pdiag = jnp.where(mask == 1.0, diag / (h * h), 1.0)
    precond = lambda r: r / pdiag
    u, _ = jax.scipy.sparse.linalg.cg(
        mv, rhs, tol=tol, maxiter=maxiter, M=precond
    )
    return u * mask


def generate_darcy_dataset_hires(key, n_samples, s_fine=421, r=5, batch=25):
    """[n, s, s] coefficient/solution pairs at s = (s_fine-1)/r + 1 via the
    official recipe: GRF threshold + node-centered solve at ``s_fine``^2,
    pointwise ``[::r, ::r]`` subsample (FNO convention; both endpoints are
    grid nodes since r divides s_fine - 1)."""
    assert (s_fine - 1) % r == 0
    keys = jax.random.split(key, n_samples)
    gen = jax.jit(
        jax.vmap(
            lambda k: _hires_sample(k, s_fine, r), in_axes=0, out_axes=(0, 0)
        ),
        static_argnums=(),
    )
    cs, us = [], []
    for i in range(0, n_samples, batch):
        c, u = gen(keys[i : i + batch])
        cs.append(np.asarray(c, np.float32))
        us.append(np.asarray(u, np.float32))
    return np.concatenate(cs), np.concatenate(us)


def _hires_sample(k, s_fine, r):
    a = grf_coefficient(k, s_fine)
    u = solve_darcy_nodes(a, s_fine)
    return a[::r, ::r], u[::r, ::r]
