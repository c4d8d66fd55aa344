"""Darcy FD+CG generator: residual and sanity checks."""

import jax
import jax.numpy as jnp
import numpy as np

from transformerbasednavierstokesolver_tpu.data.darcy_gen import (
    _darcy_matvec,
    generate_darcy_dataset,
    generate_darcy_dataset_hires,
    grf_coefficient,
    solve_darcy,
    solve_darcy_nodes,
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


# --------------------------------------------------------------------------
# Node-centered hires solver (official-recipe regime)
# --------------------------------------------------------------------------


def test_nodes_manufactured_variable_coefficient():
    """a = 1 + 0.5 sin(2 pi x) cos(2 pi y), u* = sin(pi x) sin(pi y):
    f = -div(a grad u*) analytically; the node-centered solve must
    converge to u* at second order."""

    def run(s):
        x = jnp.linspace(0, 1, s)
        X, Y = jnp.meshgrid(x, x, indexing="ij")
        pi = jnp.pi
        a = 1.0 + 0.5 * jnp.sin(2 * pi * X) * jnp.cos(2 * pi * Y)
        u_star = jnp.sin(pi * X) * jnp.sin(pi * Y)
        ux = pi * jnp.cos(pi * X) * jnp.sin(pi * Y)
        uy = pi * jnp.sin(pi * X) * jnp.cos(pi * Y)
        ax = pi * jnp.cos(2 * pi * X) * jnp.cos(2 * pi * Y)
        ay = -pi * jnp.sin(2 * pi * X) * jnp.sin(2 * pi * Y)
        lap = -2 * pi**2 * u_star
        f = -(ax * ux + ay * uy + a * lap)
        sol = solve_darcy_nodes(a, s, f=f, tol=1e-9)
        err = jnp.linalg.norm(sol - u_star) / jnp.linalg.norm(u_star)
        return float(err)

    e33, e65 = run(33), run(65)
    assert e33 < 5e-3, e33
    # ~2nd order: halving h should cut the error ~4x (allow slack)
    assert e65 < e33 / 2.5, (e33, e65)


def test_hires_dataset_boundary_exactly_zero():
    c, u = generate_darcy_dataset_hires(
        jax.random.PRNGKey(3), 2, s_fine=61, r=5, batch=2
    )
    assert c.shape == (2, 13, 13) and u.shape == (2, 13, 13)
    # the official data is exactly 0 on the boundary ring; the node-pinned
    # solve + node-aligned subsample must reproduce that bit-exactly
    assert (u[:, 0, :] == 0).all() and (u[:, -1, :] == 0).all()
    assert (u[:, :, 0] == 0).all() and (u[:, :, -1] == 0).all()
    assert np.isfinite(u).all() and u.max() > 0
    # coefficients keep the two-phase convention after subsampling
    assert set(np.unique(c)).issubset({3.0, 12.0})


def test_nodes_solver_symmetry():
    s = 33
    a = jnp.ones((s, s))
    u = np.asarray(solve_darcy_nodes(a, s))
    np.testing.assert_allclose(u, u.T, atol=1e-5)
    assert abs(u).max() > 0 and u[0, :].max() == 0
