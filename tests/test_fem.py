"""Verification of the Q1 FEM engine behind the synthetic benchmark solvers:
patch tests (exact for uniform strain), analytic Poisson, uniaxial tension."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformerbasednavierstokesolver_tpu.data import fem


def _unit_grid(s1, s2):
    x = np.linspace(0, 1, s1)
    y = np.linspace(0, 1, s2)
    X, Y = np.meshgrid(x, y, indexing="ij")
    return jnp.asarray(np.stack([X, Y], -1))


def test_elastic_patch_uniform_stretch():
    """Prescribing u = (a x, -nu a y) on the whole boundary reproduces the
    exact uniform plane-stress solution in the interior (Q1 patch test)."""
    s = 9
    nodes = _unit_grid(s, s)
    a, nu = 0.02, 0.3
    exact = jnp.stack([a * nodes[..., 0], -nu * a * nodes[..., 1]], -1)
    fixed = jnp.zeros((s, s, 2))
    fixed = fixed.at[0].set(1.0).at[-1].set(1.0)
    fixed = fixed.at[:, 0].set(1.0).at[:, -1].set(1.0)
    e_elem = jnp.ones((s - 1) * (s - 1))
    u = fem.solve_elasticity(
        nodes, e_elem, fixed, exact, jnp.zeros((s, s, 2)), nu=nu
    )
    assert float(jnp.abs(u - exact).max()) < 1e-6

    strain = fem.element_strain(nodes, u)
    np.testing.assert_allclose(np.asarray(strain[:, 0]), a, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(strain[:, 1]), -nu * a, rtol=1e-5
    )
    # uniaxial plane stress: von Mises = sigma_xx = E a (E=1 here)
    vm = fem.von_mises_plane(strain, e_elem, nu=nu)
    np.testing.assert_allclose(np.asarray(vm), a, rtol=1e-4)


def test_elastic_traction_consistency():
    """Bottom clamped, uniform nodal tension on top: average eyy matches
    sigma/E for a uniform-modulus strip (plane stress, nu=0)."""
    s1, s2 = 5, 17
    nodes = _unit_grid(s1, s2)
    fixed = jnp.zeros((s1, s2, 2))
    fixed = fixed.at[:, 0, 1].set(1.0)  # v=0 at bottom
    fixed = fixed.at[0, 0, 0].set(1.0)  # pin one corner in x
    t = 0.5
    dx = 1.0 / (s1 - 1)
    f = jnp.zeros((s1, s2, 2))
    f = f.at[:, -1, 1].set(t * dx)
    f = f.at[0, -1, 1].set(t * dx / 2).at[-1, -1, 1].set(t * dx / 2)
    e_elem = 2.0 * jnp.ones((s1 - 1) * (s2 - 1))
    u = fem.solve_elasticity(
        nodes, e_elem, fixed, jnp.zeros((s1, s2, 2)), f, nu=0.0
    )
    eyy = fem.element_strain(nodes, u)[:, 1]
    np.testing.assert_allclose(np.asarray(eyy), t / 2.0, rtol=1e-4)


def test_poisson_square_analytic():
    """-lap u = 1 on the unit square, u=0 on the boundary: center value
    matches the exact series solution 0.07367..."""
    s = 33
    nodes = _unit_grid(s, s)
    fixed = jnp.zeros((s, s))
    fixed = fixed.at[0].set(1.0).at[-1].set(1.0)
    fixed = fixed.at[:, 0].set(1.0).at[:, -1].set(1.0)
    u = fem.solve_poisson(nodes, fixed, jnp.zeros((s, s)), source=1.0)
    assert float(u[s // 2, s // 2]) == pytest.approx(0.0736713, rel=2e-3)


def test_poisson_deformed_mesh_matches_mapped_exact():
    """Sheared mesh: the FEM solves the PDE on the *physical* domain, so a
    pure shear of the unit square (area-preserving affine map) must leave
    the solution values at mapped nodes unchanged."""
    s = 25
    base = _unit_grid(s, s)
    shear = base.at[..., 0].add(0.3 * base[..., 1])
    fixed = jnp.zeros((s, s))
    fixed = fixed.at[0].set(1.0).at[-1].set(1.0)
    fixed = fixed.at[:, 0].set(1.0).at[:, -1].set(1.0)
    u_base = fem.solve_poisson(base, fixed, jnp.zeros((s, s)))

    # Affine maps preserve the Q1 space, but the PDE itself is not
    # shear-invariant; instead verify mesh-size convergence on the sheared
    # domain: refining the mesh changes the solution by O(h^2).
    s2 = 2 * s - 1
    fine = _unit_grid(s2, s2)
    fine = fine.at[..., 0].add(0.3 * fine[..., 1])
    fixed2 = jnp.zeros((s2, s2))
    fixed2 = fixed2.at[0].set(1.0).at[-1].set(1.0)
    fixed2 = fixed2.at[:, 0].set(1.0).at[:, -1].set(1.0)
    u_shear = fem.solve_poisson(shear, fixed, jnp.zeros((s, s)))
    u_fine = fem.solve_poisson(fine, fixed2, jnp.zeros((s2, s2)))
    coarse_on_fine = u_fine[::2, ::2]
    err = float(jnp.abs(u_shear - coarse_on_fine).max())
    assert err < 5e-4, err
    # sanity: shearing changes the solution measurably vs the square
    assert float(jnp.abs(u_shear - u_base).max()) > 1e-3


def test_element_gradient_patch_sheared():
    """Linear patch test on a sheared element: dN/dx must reproduce the
    exact constant gradient of a linear field u(x) = p.x for ANY affine
    element.  Guards the J^-1 orientation in _element_geometry (the
    round-3 review found it transposed, which silently solved a distorted
    anisotropic operator on the wavy pipe meshes: 23% rel-L2 field error)."""
    import numpy as np

    A = np.array([[1.0, 0.3], [-0.2, 0.9]])  # non-symmetric shear
    ref = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    xe = jnp.asarray(ref @ A.T)
    dndx, detJ = fem._element_geometry(xe)
    p = np.array([0.7, -1.3])
    u_nodal = jnp.asarray(ref @ A.T @ p)
    grad = jnp.einsum("a,gae->ge", u_nodal, dndx)
    np.testing.assert_allclose(np.asarray(grad), np.tile(p, (4, 1)),
                               rtol=1e-5, atol=1e-5)
    # the affine |J| is constant: det(A) scaled by the [-1,1]^2 -> unit
    # square reference-to-physical factor (1/2)^2
    np.testing.assert_allclose(
        np.asarray(detJ), np.linalg.det(A) / 4.0, rtol=1e-5
    )
