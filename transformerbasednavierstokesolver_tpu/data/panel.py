"""Exact potential-flow airfoil solutions on structured O-meshes.

Synthetic stand-in for the Geo-FNO transonic-airfoil benchmark
(``/root/reference/exp_airfoil.py:50-68``: NACA C-meshes 221 x 51, output =
the velocity/Mach channel ``Q[:, 4]``).  Instead of a parametric toy
(round 1), each sample is the *exact* solution of the governing PDE
(Laplace / full potential around a lifting body):

* airfoil family: Karman-Trefftz conformal maps of a circle -- thickness,
  camber and trailing-edge angle vary per sample;
* flow: incompressible potential flow with the Kutta condition imposed at
  the trailing edge (circulation set analytically on the circle plane);
* mesh: the conformal images of concentric circles give a smooth,
  guaranteed-non-degenerate body-fitted O-mesh (221 around x 51 radial,
  geometric stretching to ~15 chords), the O-grid analogue of the
  reference's C-mesh;
* output: local Mach number from the Karman-Tsien compressibility
  correction at a subsonic freestream Mach, mirroring the benchmark's
  Mach-field channel.

All pure numpy (generation is host-side, cached by ``datasets._cache``).
"""

import numpy as np


def karman_trefftz_sample(rng, n_around=221, n_radial=51, r_far=15.0,
                          mach_inf=0.4):
    """One airfoil sample: returns X, Y [n_around, n_radial], mach [same]."""
    # airfoil shape: circle center offset (thickness, camber), TE angle
    eps_x = rng.uniform(0.03, 0.12)   # thickness
    eps_y = rng.uniform(0.0, 0.08)    # camber
    te_deg = rng.uniform(2.0, 16.0)   # trailing-edge included angle
    alpha = np.deg2rad(rng.uniform(-2.0, 6.0))  # angle of attack

    n_exp = 2.0 - te_deg / 180.0      # KT exponent
    c = 1.0                           # TE preimage at zeta = +c
    zc = complex(-eps_x, eps_y)       # circle center
    R = abs(c - zc)                   # circle passes through zeta = c

    # O-mesh in the circle plane: theta around, geometric radii out
    th = np.linspace(0.0, 2 * np.pi, n_around, endpoint=True)
    ratio = (r_far) ** (1.0 / (n_radial - 1))
    rr = R * ratio ** np.arange(n_radial)
    TH, RR = np.meshgrid(th, rr, indexing="ij")
    zeta = zc + RR * np.exp(1j * TH)

    # Karman-Trefftz map zeta -> z (TE angle pi*(2-n))
    num = (1 + c / zeta) ** n_exp
    den = (1 - c / zeta) ** n_exp
    z = n_exp * c * (num + den) / (num - den)

    # complex potential around the circle with Kutta circulation
    # W(zeta) = U [ e^{-ia}(zeta-zc) + R^2 e^{ia}/(zeta-zc) ]
    #           - i Gamma/(2 pi) log(zeta-zc)
    # Kutta: dW/dzeta = 0 at the TE preimage zeta = c.  Solve for Gamma
    # exactly from that condition (the result is real by construction,
    # Gamma = 4 pi U R sin(alpha + beta) in textbook form):
    zr0 = c - zc
    gamma = float(np.real(
        2 * np.pi * zr0 * (np.exp(-1j * alpha)
                           - R**2 * np.exp(1j * alpha) / zr0**2) / 1j
    ))
    zeta_r = zeta - zc
    dw = (
        np.exp(-1j * alpha)
        - (R**2) * np.exp(1j * alpha) / zeta_r**2
        - 1j * gamma / (2 * np.pi) / zeta_r
    )
    # dz/dzeta of the KT map
    dnum = n_exp * (1 + c / zeta) ** (n_exp - 1) * (-c / zeta**2)
    dden = n_exp * (1 - c / zeta) ** (n_exp - 1) * (c / zeta**2)
    f = num - den
    dz = n_exp * c * ((dnum + dden) * f - (num + den) * (dnum - dden)) / f**2

    with np.errstate(divide="ignore", invalid="ignore"):
        vel = dw / dz
    speed = np.abs(vel)
    # The TE is a critical point of the map where dw/dz is 0/0.  With the
    # Kutta condition the physical limit at a FINITE-angle trailing edge
    # (te_deg in [2,16] here) is a stagnation point, so isolated non-finite
    # samples take speed 0 -- the earlier global-median patch injected a
    # spurious ~freestream value at the most geometry-sensitive node
    # (round-3 review finding).
    bad = ~np.isfinite(speed)
    if bad.any():
        speed[bad] = 0.0

    # Karman-Tsien: q/q_inc correction, then local Mach (isentropic, g=1.4)
    cp_inc = 1.0 - speed**2
    kt = mach_inf**2 / (1 + np.sqrt(1 - mach_inf**2))
    cp = cp_inc / (np.sqrt(1 - mach_inf**2) + kt * cp_inc / 2)
    # local Mach from Cp (isentropic relation), clipped to the subsonic branch
    g = 1.4
    pr = np.clip(1 + 0.5 * g * mach_inf**2 * cp, 1e-3, None)
    m2 = 2 / (g - 1) * (
        (1 + 0.5 * (g - 1) * mach_inf**2) * pr ** (-(g - 1) / g) - 1
    )
    mach = np.sqrt(np.clip(m2, 0.0, None))

    # normalize the geometry to unit chord, LE at x=0
    x = np.real(z)
    y = np.imag(z)
    xle, xte = x[:, 0].min(), x[:, 0].max()
    chord = xte - xle
    x = (x - xle) / chord
    y = y / chord
    return (
        x.astype(np.float32),
        y.astype(np.float32),
        mach.astype(np.float32),
    )


def generate_airfoil_dataset(seed, n_samples, n_around=221, n_radial=51):
    """[n, 221, 51] X/Y/Mach arrays in the reference's Q-channel layout."""
    rng = np.random.default_rng(seed)
    xs, ys, qs = [], [], []
    for _ in range(n_samples):
        X, Y, Q = karman_trefftz_sample(rng, n_around, n_radial)
        xs.append(X)
        ys.append(Y)
        qs.append(Q)
    return np.stack(xs), np.stack(ys), np.stack(qs)
