"""Real-PDE synthetic data for the Elasticity / Pipe / Plasticity benchmarks.

Round 1 shipped parametric toys for these three (VERDICT item 3); these
builders generate each sample by solving the governing equations with the
Q1 FEM engine in ``fem.py``, in the reference's shapes and regimes:

* **elasticity** (``/root/reference/exp_elas.py:54-66``): plane-stress unit
  cell with a random star-shaped void (soft inclusion, E ratio 1e-3),
  clamped bottom / uniform tension top; output = nodal von Mises stress at
  972 sampled material points (point-cloud layout like
  ``Random_UnitCell_*_10.npy``);
* **pipe** (``/root/reference/exp_pipe.py:52-77``): laminar axial flow
  through a randomly-curved channel, fully-developed approximation
  -lap u = G/mu on the *deformed* 129 x 129 mesh with no-slip walls
  (the same mesh layout as ``Pipe_X/Y.npy``; output = axial velocity,
  the reference's ``Q[:, 0]`` channel);
* **plasticity** (``/root/reference/exp_plas.py:105-116``): plane-strain
  forging of a 101 x 31 workpiece by a rigid die with a random profile;
  20 proportional load steps of Hencky (deformation-theory) J2 plasticity
  with linear hardening, solved by secant-modulus fixed-point iteration;
  output channels per step = (u_x, u_y, equivalent strain, von Mises).

Everything is JAX under the hood; builders are called once per cache key by
``datasets._cache`` (CPU backend) and vmapped/scanned where it pays.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from . import fem


# --------------------------------------------------------------------------
# Elasticity: plane-stress void cell
# --------------------------------------------------------------------------

def _void_modulus(grid_s, rng, e_solid=1.0, e_void=1e-3):
    """Per-element modulus for a random star-shaped void; also returns the
    void predicate evaluated at nodes (True = inside the void)."""
    c = rng.uniform(0.42, 0.58, 2)
    r0 = rng.uniform(0.12, 0.22)
    k = rng.integers(2, 6)
    amp = rng.uniform(0.0, 0.35) * r0
    ph = rng.uniform(0, 2 * np.pi)

    def inside(x, y):
        th = np.arctan2(y - c[1], x - c[0])
        rad = r0 + amp * np.sin(k * th + ph)
        return (x - c[0]) ** 2 + (y - c[1]) ** 2 < rad**2

    t = np.linspace(0, 1, grid_s)
    X, Y = np.meshgrid(t, t, indexing="ij")
    node_in = inside(X, Y)
    tc = 0.5 * (t[:-1] + t[1:])
    Xc, Yc = np.meshgrid(tc, tc, indexing="ij")
    elem_in = inside(Xc, Yc)
    e_elem = np.where(elem_in, e_void, e_solid).reshape(-1)
    return e_elem.astype(np.float32), node_in


@functools.lru_cache(maxsize=4)
def _elas_solver(grid_s, tension, weighted=False):
    t = np.linspace(0, 1, grid_s)
    X, Y = np.meshgrid(t, t, indexing="ij")
    nodes = jnp.asarray(np.stack([X, Y], -1), jnp.float32)
    fixed = jnp.zeros((grid_s, grid_s, 2))
    fixed = fixed.at[:, 0, 1].set(1.0)      # bottom: v = 0
    fixed = fixed.at[0, 0, 0].set(1.0)      # pin a corner in x
    dx = 1.0 / (grid_s - 1)
    f = jnp.zeros((grid_s, grid_s, 2))
    f = f.at[:, -1, 1].set(tension * dx)
    f = f.at[0, -1, 1].set(tension * dx / 2)
    f = f.at[-1, -1, 1].set(tension * dx / 2)

    @jax.jit
    def solve(e_elem):
        u = fem.solve_elasticity(
            nodes, e_elem, fixed, jnp.zeros((grid_s, grid_s, 2)),
            f, nu=0.3, tol=1e-7, maxiter=4000,
        )
        strain = fem.element_strain(nodes, u)
        vm_e = fem.von_mises_plane(strain, e_elem, nu=0.3)
        # weighted: modulus-weighted nodal averaging = one-sided stress at
        # the void interface (see fem.element_to_node)
        w = e_elem if weighted else None
        return fem.element_to_node(vm_e[:, None], grid_s, grid_s,
                                   weights=w)[..., 0]

    return solve


def elasticity_sample(rng, grid_s=64, n_pts=972, tension=100.0,
                      e_solid=2.0e5, sampling="band"):
    """One void-cell sample -> (xy [n_pts, 2], sigma_vm [n_pts]).

    Two sampling regimes:

    * ``"band"`` (round-1..3 default): points within ~1.5 cells of the
      void interface are excluded — the MIXED nodal stress average there
      carries O(1) discretization noise that no operator can recover from
      972 point samples (an irreducible ~0.3 rel-L2 floor at grid_s=48).
    * ``"iface"`` (round 4, VERDICT item 6): the reference's point clouds
      concentrate near the void boundary
      (``/root/reference/exp_elas.py:54-60`` — Random_UnitCell_XY are
      body-fitted mesh nodes), so the band exclusion trains on the wrong
      distribution.  The mixing noise is removed at the SOURCE instead:
      modulus-weighted nodal averaging gives a one-sided (material-side)
      stress at interface nodes, only true void-interior nodes are
      dropped, and sampling is importance-weighted 4x within 3 cells of
      the interface to mirror the reference's concentration.
    """
    e_elem, node_in = _void_modulus(grid_s, rng, e_solid, e_solid * 1e-3)
    t = np.linspace(0, 1, grid_s)
    X, Y = np.meshgrid(t, t, indexing="ij")
    iface = sampling == "iface"
    vm = np.asarray(
        _elas_solver(grid_s, tension, weighted=iface)(jnp.asarray(e_elem)))

    from scipy.ndimage import binary_dilation

    if iface:
        keep = ~node_in  # material nodes only; interface stress is clean
        band = binary_dilation(node_in, iterations=3) & keep
        cand = np.stack([X[keep], Y[keep]], -1)
        vals = vm[keep]
        p = np.where(band[keep], 4.0, 1.0)
        p /= p.sum()
        idx = rng.choice(cand.shape[0], size=n_pts,
                         replace=cand.shape[0] < n_pts, p=p)
        return cand[idx].astype(np.float32), vals[idx].astype(np.float32)

    # exclude the interface band: nodes whose 5x5 neighborhood mixes
    # void and material
    near = binary_dilation(node_in, iterations=2)
    keep = ~near
    # sample material points (outside the void), reproducible density
    cand = np.stack([X[keep], Y[keep]], -1)
    vals = vm[keep]
    idx = rng.permutation(cand.shape[0])
    # oversample by repetition if the void ate too many nodes
    reps = int(np.ceil(n_pts / cand.shape[0]))
    idx = np.tile(idx, reps)[:n_pts]
    return cand[idx].astype(np.float32), vals[idx].astype(np.float32)


def generate_elasticity_dataset(seed, n_samples, grid_s=64, n_pts=972,
                                sampling="band"):
    rng = np.random.default_rng(seed)
    xys, sig = [], []
    for _ in range(n_samples):
        xy, vm = elasticity_sample(rng, grid_s, n_pts, sampling=sampling)
        xys.append(xy)
        sig.append(vm)
    return np.stack(xys), np.stack(sig)


# --------------------------------------------------------------------------
# Pipe: duct flow on a deformed mesh
# --------------------------------------------------------------------------

def pipe_sample(rng, s1=129, s2=129):
    """One wavy-channel sample -> (X [s1, s2], Y, u_axial)."""
    t1 = np.linspace(0, 1, s1, dtype=np.float32)
    t2 = np.linspace(0, 1, s2, dtype=np.float32)
    U, V = np.meshgrid(t1, t2, indexing="ij")
    amp = rng.uniform(0.05, 0.25, 2).astype(np.float32)
    ph = rng.uniform(0, 2 * np.pi, 2).astype(np.float32)
    center = 0.5 + amp[0] * np.sin(2 * np.pi * U + ph[0])
    width = 0.3 + amp[1] * 0.3 * np.cos(2 * np.pi * U + ph[1])
    X = U * 10.0
    Y = center + (V - 0.5) * width

    u = _pipe_solver(s1, s2)(jnp.asarray(np.stack([X, Y], -1)))
    return X, Y, np.asarray(u, np.float32)


@functools.lru_cache(maxsize=4)
def _pipe_solver(s1, s2, maxiter=3000):
    fixed = jnp.zeros((s1, s2))
    fixed = fixed.at[:, 0].set(1.0).at[:, -1].set(1.0)  # no-slip walls

    @jax.jit
    def solve(nodes):
        return fem.solve_poisson(
            nodes, fixed, jnp.zeros((s1, s2)), source=8.0, tol=1e-7,
            maxiter=maxiter,
        )

    return solve


def generate_pipe_dataset(seed, n_samples, s1=129, s2=129):
    rng = np.random.default_rng(seed)
    xs, ys, qs = [], [], []
    for _ in range(n_samples):
        X, Y, Q = pipe_sample(rng, s1, s2)
        xs.append(X)
        ys.append(Y)
        qs.append(Q)
    return np.stack(xs), np.stack(ys), np.stack(qs)


# --------------------------------------------------------------------------
# Plasticity: die forging with Hencky deformation plasticity
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=2)
def _plas_solver(s1, s2, n_steps, e_mod, eps_y, hard, n_secant,
                 maxiter=3000):
    x = np.linspace(0, 1.0, s1)
    y = np.linspace(0, 0.3, s2)
    X, Y = np.meshgrid(x, y, indexing="ij")
    nodes = jnp.asarray(np.stack([X, Y], -1))

    fixed = jnp.zeros((s1, s2, 2))
    fixed = fixed.at[:, 0, 1].set(1.0)   # bottom: v = 0
    fixed = fixed.at[0, :, 0].set(1.0)   # left symmetry: u = 0
    fixed = fixed.at[:, -1, 1].set(1.0)  # top: die-prescribed v

    nE = (s1 - 1) * (s2 - 1)

    def eps_eq_of(u):
        st = fem.element_strain(nodes, u)
        exx, eyy, gxy = st[:, 0], st[:, 1], st[:, 2]
        # von Mises equivalent strain, plane strain (ezz = 0): J2 flow is
        # driven by the DEVIATORIC strain e - tr(e)/3.  The round-1..3 form
        # assumed incompressibility (ezz = -(exx+eyy)), which lets purely
        # hydrostatic strain 'yield' -- inconsistent with the compressible
        # nu=0.3 solve (round-3 review finding; 3x overestimate under
        # uniform in-plane compression).
        t3 = (exx + eyy) / 3.0
        eq = jnp.sqrt(
            (2.0 / 3.0) * ((exx - t3) ** 2 + (eyy - t3) ** 2 + t3**2)
            + (1.0 / 3.0) * gxy**2
        )
        return eq, st

    @jax.jit
    def solve_traj(bc_j):
        def one_step(e_sec, load):
            u_fix = jnp.zeros((s1, s2, 2)).at[:, -1, 1].set(-load * bc_j)

            def secant_iter(_, carry):
                e_s, _u = carry
                u = fem.solve_elasticity(
                    nodes, e_s, fixed, u_fix, jnp.zeros((s1, s2, 2)),
                    nu=0.3, plane_stress=False, tol=1e-7, maxiter=maxiter,
                )
                eps_eq, _ = eps_eq_of(u)
                sig_eq = jnp.where(
                    eps_eq <= eps_y,
                    e_mod * eps_eq,
                    e_mod * eps_y + hard * e_mod * (eps_eq - eps_y),
                )
                e_s = jnp.where(eps_eq > 1e-12, sig_eq / eps_eq, e_mod)
                return e_s, u

            e_sec, u = jax.lax.fori_loop(
                0, n_secant, secant_iter,
                (e_sec, jnp.zeros((s1, s2, 2))),
            )
            eps_eq, strain = eps_eq_of(u)
            vm_e = fem.von_mises_plane(
                strain, e_sec, nu=0.3, plane_stress=False
            )
            eps_n = fem.element_to_node(eps_eq[:, None], s1, s2)[..., 0]
            vm_n = fem.element_to_node(vm_e[:, None], s1, s2)[..., 0]
            frame = jnp.stack([u[..., 0], u[..., 1], eps_n, vm_n], -1)
            return e_sec, frame

        loads = jnp.arange(1, n_steps + 1) / n_steps
        _, frames = jax.lax.scan(one_step, jnp.full((nE,), e_mod), loads)
        return jnp.transpose(frames, (1, 2, 0, 3))  # [s1, s2, T, 4]

    return solve_traj


def plasticity_sample(rng, s1=101, s2=31, n_steps=20, e_mod=1.0,
                      eps_y=0.02, hard=0.1, n_secant=4):
    """One forging trajectory -> y [s1, s2, n_steps, 4], bc [s1].

    The die profile bc(x) >= 0 presses the top face down by t * bc over 20
    proportional load steps; per step, deformation-theory J2 plasticity is
    solved by iterating the per-element secant modulus
    E_s = sigma_eq(eps_eq) / eps_eq with linear hardening.
    """
    t1 = np.linspace(0, 1, s1, dtype=np.float32)
    a = rng.uniform(0.5, 2.0, 3)
    bc = (
        a[0] * np.sin(np.pi * t1)
        + a[1] * np.sin(2 * np.pi * t1) ** 2
        + a[2] * t1 * (1 - t1)
    )
    bc = (bc - bc.min()) * 0.06 / max(bc.max() - bc.min(), 1e-6)
    solve = _plas_solver(s1, s2, n_steps, e_mod, eps_y, hard, n_secant)
    yout = solve(jnp.asarray(bc))
    return np.asarray(yout, np.float32), bc.astype(np.float32)


def generate_plasticity_dataset(seed, n_samples, s1=101, s2=31, n_steps=20):
    rng = np.random.default_rng(seed)
    ys, bcs = [], []
    for _ in range(n_samples):
        y, bc = plasticity_sample(rng, s1, s2, n_steps)
        ys.append(y)
        bcs.append(bc)
    return np.stack(bcs), np.stack(ys)
