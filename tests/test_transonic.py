"""Transonic full-potential airfoil solver: physics validation.

Reference context: the benchmark the reference consumes is transonic
(``/root/reference/exp_airfoil.py:50-68``); ``data/transonic.py`` is the
shock-capturing generator.  Tests use a coarser O-mesh than the 221x51
production shape to keep CI fast; the discretization is shape-agnostic.
"""

import numpy as np
import pytest

from transformerbasednavierstokesolver_tpu.data.transonic import (
    FullPotentialSolver,
    kt_mesh,
    transonic_sample,
)

NA, NR = 121, 31  # CI mesh


def _mask(shape, band=6):
    m = np.ones(shape, bool)
    m[:, -1] = False
    for di in range(-band, band + 1):
        m[di, :2] = False  # TE corner band: d^(te/pi) speed cusp
    return m


@pytest.fixture(scope="module")
def lifting_geom():
    return kt_mesh(0.08, 0.04, 10.0, np.deg2rad(2.0), NA, NR)


def test_incompressible_matches_exact_conformal(lifting_geom):
    """M_inf -> 0: the FP solve must reproduce the exact incompressible
    conformal-map solution (field + Kutta circulation) on the same mesh."""
    g = lifting_geom
    s = FullPotentialSolver(g["X"], g["Y"], mach_inf=0.05, alpha=g["alpha"])
    phi, gam, info = s.solve(gamma0=0.0, kutta=True, n_sweeps=3000,
                             omega=1.7, ramp=0, tol=1e-11)
    assert abs(gam - g["gamma_inc"]) < 0.05 * abs(g["gamma_inc"]), (
        gam, g["gamma_inc"])
    u, v = s.node_velocity(phi, gam)
    q = np.hypot(u, v)
    qe = g["speed_inc"][:-1]
    m = _mask(q.shape)
    rel = np.linalg.norm((q - qe)[m]) / np.linalg.norm(qe[m])
    assert rel < 0.03, rel


def test_wall_flux_is_zero(lifting_geom):
    """The converged solution's wall-normal mass flux must vanish: check
    the FV residual of the wall row, whose only eta-flux is the (i, 1/2)
    face (the wall face is imposed as exactly zero)."""
    g = lifting_geom
    s = FullPotentialSolver(g["X"], g["Y"], mach_inf=0.05, alpha=g["alpha"])
    phi, gam, _ = s.solve(gamma0=g["gamma_inc"], kutta=False, n_sweeps=2500,
                          omega=1.7, ramp=0, tol=1e-11)
    R = s.residual(phi, gam)
    assert np.abs(R).max() < 1e-6


def test_subcritical_matches_karman_tsien(lifting_geom):
    """M_inf = 0.4 (shock-free): the nonlinear FP Mach field must agree
    with the Karman-Tsien correction of the exact incompressible solution
    to a couple of percent (KT is itself an approximation)."""
    g = lifting_geom
    s = FullPotentialSolver(g["X"], g["Y"], mach_inf=0.4, alpha=g["alpha"])
    phi, gam, _ = s.solve(gamma0=g["gamma_inc"], kutta=True, n_sweeps=3500,
                          omega=1.7, ramp=100, tol=1e-10)
    mach = s.mach_field(phi, gam)
    assert float(mach.max()) < 1.0  # subcritical everywhere

    qe = g["speed_inc"][:-1]
    minf, gg = 0.4, 1.4
    cp_inc = 1.0 - qe**2
    kt = minf**2 / (1 + np.sqrt(1 - minf**2))
    cp = cp_inc / (np.sqrt(1 - minf**2) + kt * cp_inc / 2)
    pr = np.clip(1 + 0.5 * gg * minf**2 * cp, 1e-3, None)
    m2 = 2 / (gg - 1) * ((1 + 0.5 * (gg - 1) * minf**2) * pr ** (-(gg - 1) / gg) - 1)
    mach_kt = np.sqrt(np.clip(m2, 0, None))
    m = _mask(mach.shape)
    rel = np.linalg.norm((mach - mach_kt)[m]) / np.linalg.norm(mach_kt[m])
    assert rel < 0.03, rel


def test_transonic_pocket_and_shock(lifting_geom):
    """M_inf = 0.72: a supersonic pocket must form on the upper surface and
    terminate in a captured shock (abrupt surface Mach drop through 1),
    with the far field staying at the freestream Mach."""
    g = lifting_geom
    s = FullPotentialSolver(g["X"], g["Y"], mach_inf=0.72, alpha=g["alpha"],
                            mcrit2=0.90, mu_scale=2.5, rho_relax=0.25)
    phi, gam, info = s.solve(gamma0=g["gamma_inc"], kutta=True,
                             n_sweeps=6000, omega=1.3, ramp=500, tol=1e-6)
    mach = s.mach_field(phi, gam)
    mach[0, 0] = 0.0
    assert np.isfinite(mach).all()
    # pocket: supersonic nodes exist, peak within FP validity
    n_ss = int((mach > 1.0).sum())
    assert n_ss > 10, n_ss
    assert 1.05 < float(mach.max()) < 1.8, float(mach.max())
    # shock: somewhere on the surface Mach falls through 1 by >= 0.12
    # within four cells (first-order artificial density smears the jump
    # over a few cells at this CI resolution)
    msurf = mach[:, 0]
    drop4 = msurf[:-4] - msurf[4:]
    shocky = (msurf[:-4] > 1.02) & (drop4 > 0.12)
    assert shocky.any()
    # far-field row ~ freestream
    far = mach[:, -2]
    assert abs(float(far.mean()) - 0.72) < 0.03
    # converged enough for data generation
    assert info["corr"] < 1e-4, info["corr"]


def test_transonic_sample_layout():
    rng = np.random.default_rng(0)
    X, Y, Q, meta = transonic_sample(rng, n_around=NA, n_radial=NR,
                                     n_sweeps=2500, tol=1e-6)
    assert X.shape == Y.shape == Q.shape == (NA, NR)
    # duplicated wrap column, zeroed TE node, finite fields
    np.testing.assert_array_equal(X[0], X[-1])
    np.testing.assert_array_equal(Q[0, 0], 0.0)
    assert np.isfinite(Q).all()
    assert 0.5 < Q.max() < 2.0
