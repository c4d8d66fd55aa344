"""Transonic full-potential airfoil solver on Karman-Trefftz O-meshes.

The Geo-FNO airfoil benchmark the reference consumes
(``/root/reference/exp_airfoil.py:50-68``) is TRANSONIC: its difficulty is
shock resolution, while the subsonic potential-flow stand-in
(``data/panel.py``) is smooth and shock-free (documented round-3
regime-fidelity caveat, docs/RESULTS.md).  This module closes that gap
with the classical conservative full-potential method:

* equation: div(rho grad phi) = 0 with the isentropic density
  rho = [1 + (g-1)/2 M_inf^2 (1 - q^2)]^{1/(g-1)}  (q nondimensionalized
  by the freestream speed);
* shock capturing: first-order artificial density (Hafez/Jameson):
  each face density is shifted upwind by mu = max(0, 1 - Mc^2/M^2),
  which adds the type-dependent dissipation that makes the scheme stable
  in supersonic pockets and captures shocks over a few cells;
* mesh: the same Karman-Trefftz O-meshes as ``panel.py`` but rotated so a
  grid node sits exactly on the trailing edge (the cut of the O-mesh
  emanates from the TE);
* circulation: a potential jump Gamma across the cut, updated from the
  Kutta condition (one-sided extrapolations of phi to the TE from both
  surfaces must agree across the branch);
* solver: zebra line-relaxation (implicit in the radial direction,
  vectorized Thomas across the wrap direction) with SOR acceleration.

Validation (tests/test_transonic.py): at low Mach the solver matches the
exact incompressible conformal-map solution on the same mesh to ~1% field
rel-L2; at transonic freestream it develops a supersonic pocket terminated
by a shock whose pre/post states are checked for sanity.

All pure numpy (generation is host-side, cached by ``datasets._cache``).
"""

import numpy as np

GAMMA = 1.4


# --------------------------------------------------------------------------
# Geometry: Karman-Trefftz O-mesh with a node ON the trailing edge
# --------------------------------------------------------------------------


def kt_mesh(eps_x, eps_y, te_deg, alpha, n_around=221, n_radial=51,
            r_far=15.0):
    """O-mesh + exact incompressible solution, TE-aligned.

    Same construction as ``panel.karman_trefftz_sample`` except the
    angular grid starts exactly at the TE preimage angle, so i = 0 (and
    the duplicate i = n_around-1) is the trailing-edge node.  Returns a
    dict with normalized X, Y [n_around, n_radial], the exact
    incompressible speed field (freestream 1), and the analytic Kutta
    circulation (normalized to unit chord).
    """
    n_exp = 2.0 - te_deg / 180.0
    c = 1.0
    zc = complex(-eps_x, eps_y)
    R = abs(c - zc)
    th_te = np.angle(c - zc)

    th = th_te + np.linspace(0.0, 2 * np.pi, n_around, endpoint=True)
    ratio = r_far ** (1.0 / (n_radial - 1))
    rr = R * ratio ** np.arange(n_radial)
    TH, RR = np.meshgrid(th, rr, indexing="ij")
    zeta = zc + RR * np.exp(1j * TH)

    num = (1 + c / zeta) ** n_exp
    den = (1 - c / zeta) ** n_exp
    z = n_exp * c * (num + den) / (num - den)

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
    dnum = n_exp * (1 + c / zeta) ** (n_exp - 1) * (-c / zeta**2)
    dden = n_exp * (1 - c / zeta) ** (n_exp - 1) * (c / zeta**2)
    f = num - den
    dz = n_exp * c * ((dnum + dden) * f - (num + den) * (dnum - dden)) / f**2
    with np.errstate(divide="ignore", invalid="ignore"):
        speed = np.abs(dw / dz)
    speed[~np.isfinite(speed)] = 0.0  # TE node: Kutta stagnation limit

    x, y = np.real(z), np.imag(z)
    xle, xte = x[:, 0].min(), x[:, 0].max()
    chord = xte - xle
    x = (x - xle) / chord
    y = y / chord
    # gamma is a circulation (units U * length): normalize by the chord;
    # the exact SPEED field is scale-invariant.
    return dict(
        X=x.astype(np.float64), Y=y.astype(np.float64),
        speed_inc=speed.astype(np.float64), gamma_inc=gamma / chord,
        alpha=alpha,
    )


# --------------------------------------------------------------------------
# Conservative full-potential solver with artificial density
# --------------------------------------------------------------------------


def _thomas(a, b, c, d):
    """Vectorized Thomas solve of tridiagonal systems along the LAST axis.

    a/b/c: sub/main/super diagonals [..., n] (a[...,0], c[...,n-1] unused),
    d: rhs [..., n].  Returns x [..., n].
    """
    n = d.shape[-1]
    cp = np.empty_like(d)
    dp = np.empty_like(d)
    cp[..., 0] = c[..., 0] / b[..., 0]
    dp[..., 0] = d[..., 0] / b[..., 0]
    for k in range(1, n):
        m = b[..., k] - a[..., k] * cp[..., k - 1]
        cp[..., k] = c[..., k] / m
        dp[..., k] = (d[..., k] - a[..., k] * dp[..., k - 1]) / m
    x = np.empty_like(d)
    x[..., -1] = dp[..., -1]
    for k in range(n - 2, -1, -1):
        x[..., k] = dp[..., k] - cp[..., k] * x[..., k + 1]
    return x


class FullPotentialSolver:
    """Conservative FP discretization on one O-mesh (unique wrap nodes).

    phi is stored at the N = n_around-1 unique wrap positions; the branch
    cut runs along i = 0 (the TE radial line): crossing it CCW adds the
    circulation Gamma to phi.
    """

    def __init__(self, X, Y, mach_inf, alpha, mcrit2=0.92, mu_scale=2.0,
                 rho_relax=0.3):
        # drop the duplicated wrap column
        self.X, self.Y = X[:-1].copy(), Y[:-1].copy()
        self.N, self.M = self.X.shape
        self.minf, self.alpha = float(mach_inf), float(alpha)
        self.mcrit2 = mcrit2
        self.mu_scale = mu_scale      # artificial-density strength
        self.rho_relax = rho_relax    # density under-relaxation (Picard)
        self._rho = None              # relaxed node density state
        self._metrics()

    # -- metrics -----------------------------------------------------------
    def _wrap_diff(self, F):
        """F[i+1] - F[i-1] over the wrap axis (geometry: no branch jump)."""
        return np.roll(F, -1, 0) - np.roll(F, 1, 0)

    def _metrics(self):
        X, Y = self.X, self.Y
        # node-centred derivatives (central; one-sided at j ends)
        x_xi = 0.5 * self._wrap_diff(X)
        y_xi = 0.5 * self._wrap_diff(Y)
        x_et = np.gradient(X, axis=1)
        y_et = np.gradient(Y, axis=1)
        J = x_xi * y_et - x_et * y_xi
        self.sgn = -1.0 if np.median(J) < 0 else 1.0
        J = J * self.sgn  # make the Jacobian positive
        # TE node (i=0, j=0) is the map's critical point: J -> 0.  Clamp
        # so inverse metrics stay finite; the node is excluded from updates.
        self.J = np.maximum(np.abs(J), 1e-12) * np.sign(J + 1e-30)
        self.x_xi, self.y_xi, self.x_et, self.y_et = x_xi, y_xi, x_et, y_et

        def coefs(x_xi, y_xi, x_et, y_et):
            Jf = (x_xi * y_et - x_et * y_xi) * self.sgn
            Jf = np.where(np.abs(Jf) < 1e-12, 1e-12, Jf)
            A = (x_et**2 + y_et**2) / Jf
            B = -(x_xi * x_et + y_xi * y_et) / Jf
            C = (x_xi**2 + y_xi**2) / Jf
            return A, B, C

        # xi-face metrics at (i+1/2, j): xi-derivatives are exact face
        # differences; eta-derivatives averaged from the two nodes
        x_xi_f = np.roll(X, -1, 0) - X
        y_xi_f = np.roll(Y, -1, 0) - Y
        x_et_f = 0.5 * (x_et + np.roll(x_et, -1, 0))
        y_et_f = 0.5 * (y_et + np.roll(y_et, -1, 0))
        self.Axi, self.Bxi, _ = coefs(x_xi_f, y_xi_f, x_et_f, y_et_f)

        # eta-face metrics at (i, j+1/2), j = 0..M-2
        x_et_g = X[:, 1:] - X[:, :-1]
        y_et_g = Y[:, 1:] - Y[:, :-1]
        x_xi_g = 0.5 * (x_xi[:, 1:] + x_xi[:, :-1])
        y_xi_g = 0.5 * (y_xi[:, 1:] + y_xi[:, :-1])
        _, self.Bet, self.Cet = coefs(x_xi_g, y_xi_g, x_et_g, y_et_g)

    # -- potential helpers --------------------------------------------------
    def freestream(self, gamma):
        """Freestream + cut-consistent vortex potential (initial / far BC)."""
        a = self.alpha
        phi = self.X * np.cos(a) + self.Y * np.sin(a)
        # continuous polar angle around the airfoil measured from the TE
        # ray so it is single-valued off the cut: use the angular index
        # fraction (the O-mesh wraps uniformly in the circle plane, and any
        # smooth potential with the right branch jump works with the cut)
        frac = (np.arange(self.N) / self.N)[:, None] * np.ones((1, self.M))
        return phi + gamma * frac

    def _shift(self, phi, gamma, d):
        """phi[i+d] with the branch jump across the cut (d = +-1)."""
        out = np.roll(phi, -d, 0)
        if d == 1:
            out[-1] += gamma
        else:
            out[0] -= gamma
        return out

    def node_velocity(self, phi, gamma):
        """Physical velocity (u, v) at nodes.

        At the wall row the eta-derivative uses the no-flux identity
        V = B phi_xi + C phi_eta = 0 (exact for the continuum solution)
        instead of the first-order one-sided difference, which would
        otherwise dominate the surface-speed error.
        """
        p_xi = 0.5 * (self._shift(phi, gamma, 1) - self._shift(phi, gamma, -1))
        p_et = np.gradient(phi, axis=1)
        J = self.J
        Bn = -(self.x_xi * self.x_et + self.y_xi * self.y_et) / J
        Cn = (self.x_xi**2 + self.y_xi**2) / J
        p_et[:, 0] = -(Bn[:, 0] / np.where(np.abs(Cn[:, 0]) < 1e-12, 1e-12,
                                           Cn[:, 0])) * p_xi[:, 0]
        u = (self.y_et * p_xi - self.y_xi * p_et) / J * self.sgn
        v = (-self.x_et * p_xi + self.x_xi * p_et) / J * self.sgn
        return u, v

    def density(self, q2):
        m2 = self.minf**2
        base = 1.0 + 0.5 * (GAMMA - 1) * m2 * (1.0 - q2)
        return np.clip(base, 1e-3, None) ** (1.0 / (GAMMA - 1))

    def local_mach2(self, q2):
        m2 = self.minf**2
        a2 = 1.0 / m2 + 0.5 * (GAMMA - 1) * (1.0 - q2)  # (a/q_inf)^2
        return q2 / np.clip(a2, 1e-6, None)

    def mach_field(self, phi, gamma):
        u, v = self.node_velocity(phi, gamma)
        return np.sqrt(self.local_mach2(u * u + v * v))

    # -- residual assembly ---------------------------------------------------
    def _face_quantities(self, phi, gamma):
        """Upwinded face densities and face gradient terms."""
        phi_p = self._shift(phi, gamma, 1)
        phi_m = self._shift(phi, gamma, -1)

        u, v = self.node_velocity(phi, gamma)
        q2 = u * u + v * v
        rho = self.density(q2)
        if self.rho_relax < 1.0:
            # Picard under-relaxation of the density field: the main
            # stabilizer of the transonic fixed-point iteration
            if self._rho is None or self._rho.shape != rho.shape:
                self._rho = rho
            rho = self._rho + self.rho_relax * (rho - self._rho)
            self._rho = rho
        mach2 = self.local_mach2(q2)
        mu = self.mu_scale * np.maximum(
            0.0, 1.0 - self.mcrit2 / np.clip(mach2, 1e-9, None)
        )
        # cap for stability at strong shocks (full upwinding at mu = 1)
        mu = np.minimum(mu, 1.0)

        # xi faces (i+1/2, j): full-cell upwind density shift
        # rho~_{i+1/2} = rho_{i+1/2} - mu (rho_{i+1/2} - rho_{i-+1/2})
        p_xi_f = phi_p - phi
        p_et_f = 0.5 * (np.gradient(phi, axis=1)
                        + np.gradient(phi_p, axis=1))
        U_f = self.Axi * p_xi_f + self.Bxi * p_et_f
        rho_f = 0.5 * (rho + np.roll(rho, -1, 0))
        mu_f = np.maximum(mu, np.roll(mu, -1, 0))
        rho_shift = np.where(U_f >= 0, np.roll(rho_f, 1, 0),
                             np.roll(rho_f, -1, 0))
        rho_xi = rho_f - mu_f * (rho_f - rho_shift)

        # eta faces (i, j+1/2)
        p_et_g = phi[:, 1:] - phi[:, :-1]
        p_xi_g = 0.5 * ((phi_p - phi_m)[:, 1:] + (phi_p - phi_m)[:, :-1]) * 0.5
        V_g = self.Bet * p_xi_g + self.Cet * p_et_g
        rho_g = 0.5 * (rho[:, 1:] + rho[:, :-1])
        mu_g = np.maximum(mu[:, 1:], mu[:, :-1])
        pad_lo = np.concatenate([rho_g[:, :1], rho_g[:, :-1]], axis=1)
        pad_hi = np.concatenate([rho_g[:, 1:], rho_g[:, -1:]], axis=1)
        rho_shiftg = np.where(V_g >= 0, pad_lo, pad_hi)
        rho_et = rho_g - mu_g * (rho_g - rho_shiftg)

        return rho_xi, U_f, rho_et, V_g

    def _assemble(self, phi, gamma):
        """FV residual + face arrays.  The wall row is a HALF cell
        (eta in [0, 1/2]): its xi-face difference enters with weight 1/2,
        the wall face (j = -1/2) contributes zero flux, and the (i, 1/2)
        eta-face is full length."""
        rho_xi, U_f, rho_et, V_g = self._face_quantities(phi, gamma)
        Fxi = rho_xi * U_f                       # flux through (i+1/2, j)
        Fet = rho_et * V_g                       # flux through (i, j+1/2)
        R = Fxi - np.roll(Fxi, 1, 0)             # xi-face difference
        R[:, 0] *= 0.5                           # wall half-cell
        R[:, 0] += Fet[:, 0]
        R[:, 1:-1] += Fet[:, 1:] - Fet[:, :-1]
        R[:, -1] = 0.0                           # far field: Dirichlet
        R[0, 0] = 0.0                            # TE node: pinned
        return R, rho_xi, rho_et

    def residual(self, phi, gamma):
        """FV residual at interior nodes (j = 0 wall .. M-2); far-field
        row j = M-1 is Dirichlet and reported as 0."""
        return self._assemble(phi, gamma)[0]

    # -- relaxation ----------------------------------------------------------
    def _half_sweep(self, phi, gamma, omega, color):
        """Line relaxation (implicit in eta) applied to wrap columns of one
        parity ('zebra' coloring: the other color is frozen, which keeps
        over-relaxation stable in the wrap direction)."""
        R, rho_xi, rho_et = self._assemble(phi, gamma)

        # tridiagonal (in j) correction operator: d/dphi of the eta-flux
        # differences plus the xi-face diagonal contribution
        lo = np.zeros_like(phi)   # coupling to j-1
        up = np.zeros_like(phi)   # coupling to j+1
        di = np.zeros_like(phi)
        ce = rho_et * self.Cet    # [N, M-1] face conductances
        di[:, 0] += ce[:, 0]
        up[:, 0] -= ce[:, 0]
        di[:, 1:-1] += ce[:, 1:] + ce[:, :-1]
        up[:, 1:-1] -= ce[:, 1:]
        lo[:, 1:-1] -= ce[:, :-1]
        # xi-face diagonal: both adjacent faces contribute A_face
        # (halved on the wall half-cell row, matching the residual)
        axi = rho_xi * self.Axi
        dxi = axi + np.roll(axi, 1, 0)
        dxi[:, 0] *= 0.5
        di += dxi
        # Dirichlet far row and pinned TE node
        di[:, -1] = 1.0
        lo[:, -1] = up[:, -1] = 0.0

        # T = -(dR/dphi) restricted to the j-line (positive definite), so
        # the Newton-like correction is +T^{-1} R
        corr = _thomas(lo, di, up, omega * R)
        corr[color::2] = 0.0      # update only the OTHER parity
        corr[0, 0] = 0.0
        return phi + corr, float(np.max(np.abs(corr)))

    def sweep(self, phi, gamma, omega=1.6):
        """One full zebra sweep (both colors); returns max |correction|."""
        phi, c0 = self._half_sweep(phi, gamma, omega, color=1)  # update even i
        phi, c1 = self._half_sweep(phi, gamma, omega, color=0)  # update odd i
        # keep the pinned TE node consistent with its neighbours
        phi[0, 0] = 0.5 * (phi[1, 0] + (phi[-1, 0] - gamma))
        return phi, max(c0, c1)

    def measured_jump(self, phi, gamma, k0=None, k1=None):
        """Potential jump at the TE measured by quadratic-in-arc-length
        extrapolation of the surface potential from stations OUTSIDE the
        corner band (where the d^(te_angle/pi) speed cusp degrades
        pointwise accuracy; the band is a roughly fixed number of nodes,
        so stations scale with the wrap resolution).  Kutta holds iff
        this equals the imposed circulation."""
        if k0 is None:
            k0 = max(3, self.N // 36)
        if k1 is None:
            k1 = max(k0 + 5, self.N // 15)
        X0, Y0 = self.X[:, 0], self.Y[:, 0]
        seg = np.hypot(np.diff(np.r_[X0, X0[0]]), np.diff(np.r_[Y0, Y0[0]]))
        # arc distance from the TE along each surface
        s_up = np.cumsum(seg)            # s_up[i-1] = arc TE -> node i
        s_lo = np.cumsum(seg[::-1])      # s_lo[k-1] = arc TE -> node N-k

        def extrap(svals, fvals):
            # linear in s: the quadratic term amplifies near-band noise
            A = np.vstack([np.ones_like(svals), svals]).T
            coef, *_ = np.linalg.lstsq(A, fvals, rcond=None)
            return coef[0]

        idx = np.arange(k0, k1 + 1)
        te_plus = extrap(s_up[idx - 1], phi[idx, 0])     # branch at lap start
        te_minus = extrap(s_lo[idx - 1], phi[-idx, 0])   # branch at lap end
        # the physical potential gains exactly the circulation over one CCW
        # lap, so smooth TE flow (Kutta) <=> te_minus - te_plus == gamma
        return float(te_minus - te_plus)

    def solve(self, gamma0=0.0, n_sweeps=2000, omega=1.6, kutta=True,
              tol=1e-7, ramp=150, kutta_every=10, gamma_relax=0.5):
        """Relax to convergence; returns (phi, gamma, info).

        Circulation: gamma relaxes toward the measured TE potential jump,
        interleaved with the field relaxation (the classical FP update).
        """
        # ramp the freestream Mach in early sweeps for transonic robustness
        minf_target = self.minf
        gamma = float(gamma0)
        phi = self.freestream(gamma)
        hist = []
        self._rho = None  # fresh density state per solve
        for it in range(n_sweeps):
            if ramp and it < ramp:
                self.minf = minf_target * min(1.0, 0.5 + 0.5 * it / ramp)
            else:
                self.minf = minf_target
            phi, corr = self.sweep(phi, gamma, omega)
            if kutta and it % kutta_every == kutta_every - 1 and it > 20:
                jump = self.measured_jump(phi, gamma)
                gamma += gamma_relax * (jump - gamma)
                # move the far-field row to the new circulation
                phi[:, -1] = self.freestream(gamma)[:, -1]
            hist.append(corr)
            if it > ramp and corr < tol:
                break
        self.minf = minf_target
        return phi, gamma, dict(
            iters=it + 1, corr=hist[-1], hist=hist,
            kutta_mismatch=self.measured_jump(phi, gamma) - gamma,
        )


# --------------------------------------------------------------------------
# Dataset generation
# --------------------------------------------------------------------------


def transonic_sample(rng, n_around=221, n_radial=51, n_sweeps=6000,
                     tol=1e-6, params=None):
    """One transonic sample: returns (X, Y, mach [n_around, n_radial], meta).

    Geometry sampled like ``panel.karman_trefftz_sample``; freestream Mach
    in [0.64, 0.74] -- solidly transonic for these thicknesses/AoA (most
    samples develop a supersonic pocket terminated by a captured shock)
    while staying inside the full-potential method's validity (local Mach
    <~ 1.6) and the solver's robust band.

    ``params``: optional (eps_x, eps_y, te_deg, alpha, minf) tuple that
    bypasses the rng draw — used by the grid-refinement noise-floor probe
    (tools/airfoil_noise_floor.py) to solve the SAME case at nested
    resolutions.
    """
    if params is not None:
        eps_x, eps_y, te_deg, alpha, minf = params
    else:
        eps_x = rng.uniform(0.04, 0.12)
        eps_y = rng.uniform(0.0, 0.06)
        te_deg = rng.uniform(4.0, 14.0)
        alpha = np.deg2rad(rng.uniform(-1.0, 5.0))
        minf = rng.uniform(0.64, 0.74)

    g = kt_mesh(eps_x, eps_y, te_deg, alpha, n_around, n_radial)
    s = FullPotentialSolver(g["X"], g["Y"], mach_inf=minf, alpha=alpha,
                            mcrit2=0.90, mu_scale=2.5, rho_relax=0.25)
    phi, gamma, info = s.solve(
        gamma0=g["gamma_inc"], kutta=True, n_sweeps=n_sweeps, omega=1.3,
        ramp=500, tol=tol,
    )
    mach = s.mach_field(phi, gamma)
    mach[0, 0] = 0.0  # TE corner node: Kutta stagnation limit (cf. panel.py)
    # restore the duplicated wrap column of the reference layout
    X = np.concatenate([s.X, s.X[:1]], 0)
    Y = np.concatenate([s.Y, s.Y[:1]], 0)
    mach = np.concatenate([mach, mach[:1]], 0)
    meta = dict(minf=minf, alpha=alpha, gamma=gamma, iters=info["iters"],
                corr=info["corr"], max_mach=float(mach.max()),
                supersonic_nodes=int((mach > 1).sum()))
    return (X.astype(np.float32), Y.astype(np.float32),
            mach.astype(np.float32), meta)


def generate_airfoil_dataset_transonic(seed, n_samples, n_around=221,
                                       n_radial=51, progress=None,
                                       n_sweeps=6000):
    """[n, 221, 51] X/Y/Mach arrays (reference Q-channel layout), transonic
    full-potential regime -- the shock-capturing analogue of
    ``panel.generate_airfoil_dataset``."""
    rng = np.random.default_rng(seed)
    xs, ys, qs = [], [], []
    for k in range(n_samples):
        X, Y, Q, meta = transonic_sample(rng, n_around, n_radial,
                                         n_sweeps=n_sweeps)
        xs.append(X)
        ys.append(Y)
        qs.append(Q)
        if progress:
            progress(k, meta)
    return np.stack(xs), np.stack(ys), np.stack(qs)
