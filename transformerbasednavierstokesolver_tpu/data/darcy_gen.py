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
