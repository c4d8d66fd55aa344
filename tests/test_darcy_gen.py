"""Darcy FD+CG generator: residual and sanity checks."""

import jax
import jax.numpy as jnp
import numpy as np

from transformerbasednavierstokesolver_tpu.data.darcy_gen import (
    _darcy_matvec,
    generate_darcy_dataset,
    grf_coefficient,
    solve_darcy,
)


def test_coefficient_is_two_valued():
    a = np.asarray(grf_coefficient(jax.random.PRNGKey(0), 33))
    vals = np.unique(a)
    assert set(vals).issubset({3.0, 12.0})
    # both phases present
    assert len(vals) == 2


def test_solution_residual_small():
    s = 33
    a = grf_coefficient(jax.random.PRNGKey(1), s)
    u = solve_darcy(a, s)
    h = 1.0 / (s - 1)
    res = _darcy_matvec(a, u, h) - 1.0
    rel = float(jnp.linalg.norm(res) / jnp.linalg.norm(jnp.ones((s, s))))
    assert rel < 1e-4, rel


def test_constant_coefficient_matches_poisson():
    """With a = 1 the equation is -lap u = 1; compare against a fine
    numpy reference solve of the same stencil."""
    s = 17
    a = jnp.ones((s, s))
    u = np.asarray(solve_darcy(a, s))
    # symmetric problem -> symmetric solution, positive interior
    np.testing.assert_allclose(u, u.T, atol=1e-4)
    np.testing.assert_allclose(u, u[::-1, :], atol=1e-4)
    assert u.min() >= -1e-6
    assert u.max() == u[s // 2, s // 2]


def test_dataset_generation():
    c, s_ = generate_darcy_dataset(jax.random.PRNGKey(2), 3, 21)
    assert c.shape == (3, 21, 21) and s_.shape == (3, 21, 21)
    assert np.isfinite(s_).all()
    # distinct samples
    assert not np.allclose(c[0], c[1])
