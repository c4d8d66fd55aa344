"""Pseudo-spectral 2D incompressible Navier-Stokes ground-truth generator.

TPU-native replacement for the reference's phiflow pipeline
(``data_generation.ipynb`` cells 3-4: McWilliams random vorticity ->
``make_incompressible`` -> semi-Lagrangian advection at dt=0.5 on a 64x64
periodic grid) and for the downloaded FNO vorticity benchmark data
(``README.md:29``).

Method: vorticity-streamfunction formulation on a periodic square,
``w_t + u . grad(w) = nu lap(w) + f``, solved in Fourier space with 2/3-rule
dealiasing, Crank-Nicolson for the viscous term and Heun (RK2) for the
nonlinear term.  Everything is ``jnp.fft`` + elementwise ops under
``lax.scan``; batches of simulations run under ``vmap`` on device.

Initial conditions:
  * ``mcwilliams_vorticity_hat``: McWilliams (1984) random realizability
    ensemble -- |psi_k|^2 ~ k^-1 (1 + (k/k0)^4)^-1, random phases,
    normalized to unit kinetic energy (what the fork's external
    ``2D-Turbulence-Python`` package produces);
  * ``gaussian_random_field_hat``: the FNO-style periodic GRF
    ~ N(0, 7^{3/2} (-lap + 49 I)^{-2.5}) used for the vorticity benchmark.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# Default forcing of the FNO NS benchmark: 0.1 (sin + cos)(2 pi (x + y)).
def fno_forcing(n):
    t = jnp.linspace(0, 1, n + 1)[:-1]
    X, Y = jnp.meshgrid(t, t, indexing="ij")
    return 0.1 * (jnp.sin(2 * jnp.pi * (X + Y)) + jnp.cos(2 * jnp.pi * (X + Y)))


def _wavenumbers(n, domain=1.0):
    k = jnp.fft.fftfreq(n, d=1.0 / n) * (2 * jnp.pi / domain)
    kx, ky = jnp.meshgrid(k, k, indexing="ij")
    k2 = kx**2 + ky**2
    k2_safe = jnp.where(k2 == 0, 1.0, k2)
    return kx, ky, k2, k2_safe


def _dealias_mask(n):
    k = jnp.fft.fftfreq(n, d=1.0 / n) * n  # integer wavenumbers
    kx, ky = jnp.meshgrid(k, k, indexing="ij")
    cutoff = n / 3.0
    return (jnp.abs(kx) <= cutoff) & (jnp.abs(ky) <= cutoff)


def mcwilliams_vorticity_hat(key, n, k0=6.0, domain=2 * jnp.pi):
    """McWilliams-84 random initial vorticity, returned in Fourier space."""
    kx, ky, k2, k2_safe = _wavenumbers(n, domain)
    kmag = jnp.sqrt(k2)
    # |psi_k| ~ (k (1 + (k/k0)^4))^{-1/2}
    spectrum = jnp.where(
        k2 > 0,
        (kmag * (1 + (kmag / k0) ** 4)) ** -0.5,
        0.0,
    )
    kr, ki = jax.random.split(key)
    phase = jax.random.normal(kr, (n, n)) + 1j * jax.random.normal(ki, (n, n))
    psi_hat = spectrum * phase
    # Hermitian-symmetrize so psi is real and u/v/w stay exactly consistent
    psi_hat = jnp.fft.fft2(jnp.fft.ifft2(psi_hat).real)
    # normalize kinetic energy KE = 0.5 <|u|^2 + |v|^2> to 0.5
    u = jnp.fft.ifft2(1j * ky * psi_hat).real
    v = jnp.fft.ifft2(-1j * kx * psi_hat).real
    ke = 0.5 * jnp.mean(u**2 + v**2)
    psi_hat = psi_hat / jnp.sqrt(2 * ke)
    w_hat = k2 * psi_hat  # w = -lap psi  ->  w_hat = k2 psi_hat
    return w_hat


def gaussian_random_field_hat(key, n, alpha=2.5, tau=7.0):
    """FNO-style GRF ~ N(0, tau^(2 alpha - 2) (-lap + tau^2)^(-alpha)), periodic."""
    kx, ky, k2, _ = _wavenumbers(n, domain=1.0)
    # eigenvalues of (-lap + tau^2 I) on [0,1]^2 with 2pi-wavenumbers
    coef = (k2 + tau**2) ** (-alpha / 2.0)
    coef = coef * tau ** (alpha - 1) * n  # scale to match FNO's normalization
    kr, ki = jax.random.split(key)
    noise = jax.random.normal(kr, (n, n)) + 1j * jax.random.normal(ki, (n, n))
    f_hat = coef * noise
    # zero mean
    f_hat = f_hat.at[0, 0].set(0.0)
    f = jnp.fft.ifft2(f_hat).real
    return jnp.fft.fft2(f)


def velocity_from_vorticity_hat(w_hat, domain=1.0):
    """(u, v) physical fields from spectral vorticity via the streamfunction."""
    n = w_hat.shape[-1]
    kx, ky, k2, k2_safe = _wavenumbers(n, domain)
    psi_hat = w_hat / k2_safe
    psi_hat = psi_hat * (k2 > 0)
    u = jnp.fft.ifft2(1j * ky * psi_hat).real
    v = jnp.fft.ifft2(-1j * kx * psi_hat).real
    return u, v


def _nonlinear_hat(w_hat, kx, ky, k2_safe, k2, mask):
    """Dealiased spectral advection term -(u . grad w)."""
    psi_hat = jnp.where(k2 > 0, w_hat / k2_safe, 0.0)
    u = jnp.fft.ifft2(1j * ky * psi_hat).real
    v = jnp.fft.ifft2(-1j * kx * psi_hat).real
    wx = jnp.fft.ifft2(1j * kx * w_hat).real
    wy = jnp.fft.ifft2(1j * ky * w_hat).real
    adv = u * wx + v * wy
    return -(mask * jnp.fft.fft2(adv))


@partial(jax.jit, static_argnums=(2, 3, 6))
def simulate_vorticity(w_hat0, f_hat, n_steps: int, record_every: int,
                       dt, nu, domain: float = 1.0):
    """Integrate spectral vorticity; returns [n_records, n, n] physical snapshots.

    Heun for advection + Crank-Nicolson for diffusion per substep; records a
    physical-space snapshot every ``record_every`` substeps.
    """
    n = w_hat0.shape[-1]
    kx, ky, k2, k2_safe = _wavenumbers(n, domain)
    mask = _dealias_mask(n)

    def substep(w_hat, _):
        nl1 = _nonlinear_hat(w_hat, kx, ky, k2_safe, k2, mask) + f_hat
        denom = 1.0 + 0.5 * dt * nu * k2
        w_mid = (w_hat * (1.0 - 0.5 * dt * nu * k2) + dt * nl1) / denom
        nl2 = _nonlinear_hat(w_mid, kx, ky, k2_safe, k2, mask) + f_hat
        w_new = (
            w_hat * (1.0 - 0.5 * dt * nu * k2) + 0.5 * dt * (nl1 + nl2)
        ) / denom
        return w_new, None

    def record_step(w_hat, _):
        w_hat, _ = lax.scan(substep, w_hat, None, length=record_every)
        return w_hat, jnp.fft.ifft2(w_hat).real

    n_records = n_steps // record_every
    _, frames = lax.scan(record_step, w_hat0, None, length=n_records)
    return frames


def generate_vorticity_dataset(
    key, sims, frames, n=64, nu=1e-5, dt=1e-3, frame_dt=1.0,
    init="grf", forced=True, warmup_frames=0,
):
    """FNO-benchmark-style dataset: [sims, n, n, frames] vorticity snapshots."""
    keys = jax.random.split(key, sims)
    f_hat = jnp.fft.fft2(fno_forcing(n)) if forced else jnp.zeros((n, n), jnp.complex64)
    record_every = max(int(round(frame_dt / dt)), 1)
    n_steps = record_every * (frames + warmup_frames)

    def one(k):
        if init == "grf":
            w0 = gaussian_random_field_hat(k, n)
        else:
            w0 = mcwilliams_vorticity_hat(k, n)
        traj = simulate_vorticity(w0, f_hat, n_steps, record_every, dt, nu)
        return traj[warmup_frames:]

    frames_t = jax.vmap(one)(keys)  # [sims, frames, n, n]
    return np.asarray(frames_t.transpose(0, 2, 3, 1), dtype=np.float32)


def generate_velocity_dataset(
    key, sims, frames, n=64, re=100.0, dt=1e-2, frame_dt=0.5,
):
    """Fork-style velocity dataset: [sims, n, n, 2*frames], channels
    interleaved [vel1x, vel1y, vel2x, vel2y, ...] like
    ``data_generation.ipynb`` cell 6.  Decaying McWilliams turbulence,
    nu = 1/Re on a 2pi-periodic domain."""
    keys = jax.random.split(key, sims)
    nu = 1.0 / re
    domain = 2 * np.pi
    f_hat = jnp.zeros((n, n), jnp.complex64)
    record_every = max(int(round(frame_dt / dt)), 1)
    n_steps = record_every * frames

    kx, ky, k2, k2_safe = _wavenumbers(n, domain)

    def one(k):
        w0 = mcwilliams_vorticity_hat(k, n, domain=domain)
        traj = simulate_vorticity(
            w0, f_hat, n_steps, record_every, dt, nu, domain
        )  # [frames, n, n]

        def to_uv(w):
            w_hat = jnp.fft.fft2(w)
            u, v = velocity_from_vorticity_hat(w_hat, domain)
            return jnp.stack([u, v], axis=-1)

        uv = jax.vmap(to_uv)(traj)  # [frames, n, n, 2]
        return uv

    uv = jax.vmap(one)(keys)  # [sims, frames, n, n, 2]
    sims_, fr, nn, _, _ = uv.shape
    out = uv.transpose(0, 2, 3, 1, 4).reshape(sims_, nn, nn, 2 * fr)
    return np.asarray(out, dtype=np.float32)
