"""Physics sanity checks for the pseudo-spectral NS data generator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformerbasednavierstokesolver_tpu.data.spectral_ns import (
    fno_forcing,
    gaussian_random_field_hat,
    generate_velocity_dataset,
    generate_vorticity_dataset,
    mcwilliams_vorticity_hat,
    simulate_vorticity,
    velocity_from_vorticity_hat,
)


def test_mcwilliams_kinetic_energy_normalized():
    """Initial fields are normalized to KE = 0.5 (the 0.5<|u|^2> convention)."""
    w_hat = mcwilliams_vorticity_hat(jax.random.PRNGKey(0), 64, domain=2 * np.pi)
    u, v = velocity_from_vorticity_hat(w_hat, domain=2 * np.pi)
    ke = 0.5 * float(jnp.mean(u**2 + v**2))
    assert ke == pytest.approx(0.5, rel=1e-3)


def test_velocity_is_divergence_free():
    w_hat = mcwilliams_vorticity_hat(jax.random.PRNGKey(1), 64, domain=2 * np.pi)
    u, v = velocity_from_vorticity_hat(w_hat, domain=2 * np.pi)
    k = jnp.fft.fftfreq(64, d=1 / 64)
    kx, ky = jnp.meshgrid(k, k, indexing="ij")
    div_hat = 1j * kx * jnp.fft.fft2(u) + 1j * ky * jnp.fft.fft2(v)
    div = jnp.fft.ifft2(div_hat).real
    assert float(jnp.abs(div).max()) < 1e-4 * float(jnp.abs(u).max())


def test_unforced_viscous_decay():
    """Without forcing, enstrophy must decay monotonically (viscosity)."""
    w0 = mcwilliams_vorticity_hat(jax.random.PRNGKey(2), 32, domain=2 * np.pi)
    f0 = jnp.zeros((32, 32), jnp.complex64)
    frames = simulate_vorticity(w0, f0, 40, 10, 1e-2, 1e-2, 2 * np.pi)
    ens = [float((f**2).mean()) for f in frames]
    assert all(b < a for a, b in zip(ens, ens[1:])), ens


def test_forced_simulation_stays_bounded():
    w0 = gaussian_random_field_hat(jax.random.PRNGKey(3), 64)
    f_hat = jnp.fft.fft2(fno_forcing(64))
    frames = simulate_vorticity(w0, f_hat, 200, 50, 5e-3, 1e-3)
    assert np.isfinite(np.asarray(frames)).all()
    assert float(jnp.abs(frames[-1]).max()) < 100.0


def test_dataset_shapes_and_determinism():
    u1 = generate_vorticity_dataset(jax.random.PRNGKey(5), 2, 3, n=32, dt=5e-3)
    u2 = generate_vorticity_dataset(jax.random.PRNGKey(5), 2, 3, n=32, dt=5e-3)
    assert u1.shape == (2, 32, 32, 3)
    np.testing.assert_array_equal(u1, u2)

    v = generate_velocity_dataset(jax.random.PRNGKey(6), 2, 2, n=32)
    assert v.shape == (2, 32, 32, 4)  # interleaved [u1,v1,u2,v2]
    assert np.isfinite(v).all()
