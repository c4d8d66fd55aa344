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
    # fftfreq(n, d=1/n) already returns integer wavenumbers -n/2..n/2-1.
    # (Round 1 multiplied by n again, so the mask kept only k=0 and silently
    # zeroed the whole nonlinear term -- the generator was integrating pure
    # forced diffusion.  Caught by the manufactured-advection test in
    # tests/test_spectral.py::test_nonlinear_term_manufactured_solution.)
    k = jnp.fft.fftfreq(n, d=1.0 / n)
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
    """FNO GRF w0 ~ N(0, tau^(2 alpha - 2) (-lap + tau^2 I)^(-alpha)), periodic.

    Matches the benchmark's GaussianRF sampler exactly (Li et al. 2020;
    the nu=1e-5 data the reference downloads, ``README.md:29``):
    sqrt_eig(k) = n^2 sqrt(2) tau^(alpha-1) (4 pi^2 |k|^2 + tau^2)^(-alpha/2),
    complex standard-normal coefficients, real part -> E|w_hat(k)|^2 =
    sqrt_eig^2.  (Round 1 scaled by n instead of n^2 sqrt(2): fields ~90x
    too weak, leaving the flow in the near-linear regime -- the root cause
    of the implausibly easy round-1 synthetic NS data.)
    """
    kx, ky, k2, _ = _wavenumbers(n, domain=1.0)
    # k2 = 4 pi^2 |k_int|^2: eigenvalues of -lap on the unit torus
    coef = (k2 + tau**2) ** (-alpha / 2.0)
    coef = coef * tau ** (alpha - 1) * np.sqrt(2.0) * n * n
    kr, ki = jax.random.split(key)
    noise = jax.random.normal(kr, (n, n)) + 1j * jax.random.normal(ki, (n, n))
    f_hat = coef * noise
    # zero mean
    f_hat = f_hat.at[0, 0].set(0.0)
    f = jnp.fft.ifft2(f_hat).real
    return jnp.fft.fft2(f)


def spectral_downsample(fields, n_out):
    """Fourier-truncate real [..., N, N] fields to [..., n_out, n_out].

    The FNO benchmark solves nu=1e-5 vorticity on a 256^2 grid and
    downsamples to 64^2 (Li et al. 2020, appendix; the reference consumes
    the downloaded 64^2 product, ``README.md:29``).  Mode truncation keeps
    the resolved part of the 256^2 solution bit-consistent with its own
    low-pass, which direct 64^2 integration at nu=1e-5 does not (it is
    badly under-resolved -- see tests/test_spectral.py).
    """
    n_in = fields.shape[-1]
    if n_in == n_out:
        return fields
    h = n_out // 2
    f_hat = jnp.fft.fft2(fields)
    corners = jnp.concatenate(
        [
            jnp.concatenate([f_hat[..., :h, :h], f_hat[..., :h, -h:]], axis=-1),
            jnp.concatenate([f_hat[..., -h:, :h], f_hat[..., -h:, -h:]], axis=-1),
        ],
        axis=-2,
    )
    return jnp.fft.ifft2(corners).real * (n_out / n_in) ** 2


def radial_energy_spectrum(w, domain=1.0):
    """Radially-binned kinetic-energy spectrum E(k) of a vorticity field.

    Returns (k_bins [n//2], E [n//2]) with E(k) = sum over the annulus
    |k_int - k| < 1/2 of 0.5 |u_hat|^2 / n^4 (KE per integer wavenumber).
    """
    n = w.shape[-1]
    kx, ky, k2, k2_safe = _wavenumbers(n, domain)
    w_hat = jnp.fft.fft2(w)
    # |u_hat|^2 = |k x psi_hat|^2 = k2 |psi_hat|^2 = |w_hat|^2 / k2
    e_density = jnp.where(k2 > 0, 0.5 * jnp.abs(w_hat) ** 2 / k2_safe, 0.0)
    e_density = e_density / n**4  # Parseval: mean KE = sum(e_density)
    scale = domain / (2 * jnp.pi)  # bin by integer mode index
    kmag = jnp.sqrt(k2) * scale
    nbins = n // 2
    idx = jnp.clip(jnp.round(kmag).astype(jnp.int32), 0, nbins)
    spec = jnp.zeros(nbins + 1).at[idx.ravel()].add(e_density.ravel())
    return jnp.arange(1, nbins), spec[1:nbins]


def enstrophy(w):
    """Mean enstrophy 0.5 <w^2> of physical vorticity fields."""
    return 0.5 * jnp.mean(w**2, axis=(-2, -1))


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
    init="grf", forced=True, warmup_frames=0, sim_n=None, batch=None,
):
    """FNO-benchmark-style dataset: [sims, n, n, frames] vorticity snapshots.

    ``sim_n`` (default ``n``): solver resolution.  The benchmark regime for
    nu=1e-5 is sim_n=256, dt=1e-4, frame_dt=1 (Li et al. 2020): the IC is
    drawn at sim_n and the recorded frames are Fourier-truncated to ``n``.
    ``batch``: chunk the vmap over sims to bound memory at high sim_n.
    """
    sim_n = sim_n or n
    keys = jax.random.split(key, sims)
    f_hat = (jnp.fft.fft2(fno_forcing(sim_n)) if forced
             else jnp.zeros((sim_n, sim_n), jnp.complex64))
    record_every = max(int(round(frame_dt / dt)), 1)
    n_steps = record_every * (frames + warmup_frames)

    def one(k):
        if init == "grf":
            w0 = gaussian_random_field_hat(k, sim_n)
        else:
            w0 = mcwilliams_vorticity_hat(k, sim_n)
        traj = simulate_vorticity(w0, f_hat, n_steps, record_every, dt, nu)
        return spectral_downsample(traj[warmup_frames:], n)

    batch = batch or sims
    chunks = []
    for i in range(0, sims, batch):
        chunks.append(jax.vmap(one)(keys[i:i + batch]))
    frames_t = jnp.concatenate(chunks, 0)  # [sims, frames, n, n]
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
