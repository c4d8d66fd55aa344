"""Benchmark dataset loaders with identical shapes/semantics to the reference.

Each loader reproduces the slicing/normalization layout of the corresponding
``exp_*.py`` data section (cited per function).  When the FNO/Geo-FNO data
files are absent (they are external downloads, ``README.md:25-33``), loaders
fall back to deterministic on-device synthetic generation by solving each
benchmark's governing PDE: Darcy (FD+CG), Navier-Stokes (pseudo-spectral,
FNO generation regime), Elasticity/Plasticity/Pipe (Q1 FEM, ``solvers.py``),
Airfoil (exact Karman-Trefftz potential flow, ``panel.py``) -- cached under
``data/synthetic/``.
"""

import os
import warnings

import numpy as np

_SYNTH_DIR = os.environ.get(
    "TBNSS_SYNTH_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "data", "synthetic"),
)


def _cache(name, builder):
    os.makedirs(_SYNTH_DIR, exist_ok=True)
    path = os.path.join(_SYNTH_DIR, name + ".npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    # data generation runs on the CPU backend: the spectral solver uses
    # jnp.fft and the Darcy solver CG while-loops, neither of which the
    # experimental axon TPU backend implements
    import jax

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            out = builder()
    else:
        out = builder()
    np.savez_compressed(path, **out)
    return out


def _warn_synth(what, path):
    warnings.warn(
        f"{what}: data file {path!r} not found -- generating deterministic "
        f"synthetic data by solving the governing PDE in the benchmark's "
        f"regime (cached in {_SYNTH_DIR}). Accuracy numbers are comparable "
        f"in kind but not literally to the published benchmark values.",
        stacklevel=3,
    )


def _loadmat(path, keys):
    try:
        import scipy.io as scio

        d = scio.loadmat(path)
        return {k: np.asarray(d[k]) for k in keys}
    except (NotImplementedError, ValueError):
        # NotImplementedError: real MATLAB v7.3 (HDF5 + userblock);
        # ValueError "Unknown mat file type": raw HDF5 without the MATLAB
        # userblock (h5py-written caches) -- both go through the h5py path
        import h5py

        with h5py.File(path, "r") as f:
            # MATLAB v7.3 stores transposed
            return {k: np.asarray(f[k]).T for k in keys}


def meshgrid_pos(h, w=None):
    """[1, h*w, 2] uniform unit-square coordinates, matching
    ``exp_darcy.py:103-107`` (np.meshgrid xy-indexing + column stack)."""
    w = h if w is None else w
    x = np.linspace(0, 1, h, dtype=np.float32)
    y = np.linspace(0, 1, w, dtype=np.float32)
    xx, yy = np.meshgrid(x, y)
    pos = np.stack([xx.ravel(), yy.ravel()], axis=-1)
    return pos[None]


# --------------------------------------------------------------------------
# Darcy (exp_darcy.py:77-107)
# --------------------------------------------------------------------------

def load_darcy(data_path, ntrain=1000, ntest=200, r=5, synth_n=None):
    """Returns (x_train [nt, s*s], y_train, x_test, y_test, s)."""
    s = int(((421 - 1) / r) + 1)
    train_path = os.path.join(data_path, "piececonst_r421_N1024_smooth1.mat")
    test_path = os.path.join(data_path, "piececonst_r421_N1024_smooth2.mat")
    if os.path.exists(train_path) and os.path.exists(test_path):
        tr = _loadmat(train_path, ["coeff", "sol"])
        te = _loadmat(test_path, ["coeff", "sol"])
        x_train = tr["coeff"][:ntrain, ::r, ::r][:, :s, :s]
        y_train = tr["sol"][:ntrain, ::r, ::r][:, :s, :s]
        x_test = te["coeff"][:ntest, ::r, ::r][:, :s, :s]
        y_test = te["sol"][:ntest, ::r, ::r][:, :s, :s]
    else:
        _warn_synth("darcy", train_path)
        import jax

        from .darcy_gen import generate_darcy_dataset, generate_darcy_dataset_hires

        n_tr = min(ntrain, synth_n or 64)
        n_te = min(ntest, max((synth_n or 64) // 4, 8))

        # 'hires' = the official FNO recipe (node-centered 421^2 solve with
        # a pinned-zero boundary, pointwise ::r subsample); 'direct' = the
        # cheaper direct-85^2 cell-flux solve (round <= 3 canonical data,
        # which leaves ~4%-of-max values on the boundary ring -- see the
        # regime-fidelity caveats in docs/RESULTS.md).  Opt-in by env so
        # resumed runs keep training on the data they started on.
        regime = os.environ.get("TBNSS_DARCY_REGIME", "direct")
        if regime == "hires":

            def build():
                ctr, str_ = generate_darcy_dataset_hires(
                    jax.random.PRNGKey(0), n_tr, r=r
                )
                cte, ste = generate_darcy_dataset_hires(
                    jax.random.PRNGKey(1), n_te, r=r
                )
                return dict(x_train=ctr, y_train=str_, x_test=cte, y_test=ste)

            cache_name = f"darcy_hires_s{s}_n{n_tr}_{n_te}"
        else:

            def build():
                ctr, str_ = generate_darcy_dataset(jax.random.PRNGKey(0), n_tr, s)
                cte, ste = generate_darcy_dataset(jax.random.PRNGKey(1), n_te, s)
                return dict(x_train=ctr, y_train=str_, x_test=cte, y_test=ste)

            cache_name = f"darcy_s{s}_n{n_tr}_{n_te}"

        z = _cache(cache_name, build)
        x_train, y_train = z["x_train"], z["y_train"]
        x_test, y_test = z["x_test"], z["y_test"]
        ntrain, ntest = n_tr, n_te

    fl = lambda a: np.ascontiguousarray(a.reshape(a.shape[0], -1), dtype=np.float32)
    return fl(x_train), fl(y_train), fl(x_test), fl(y_test), s


# --------------------------------------------------------------------------
# Navier-Stokes vorticity (exp_ns.py:64-94)
# --------------------------------------------------------------------------

def load_ns_vorticity(
    data_path, ntrain=50, ntest=50, T_in=10, T=10, r=1, synth_sims=None,
    resolution=64,
):
    """Returns (train_a [nt, h*h, T_in], train_u [nt, h*h, T], test_a, test_u, h).

    ``resolution`` > 64 only applies to synthetic generation (the FNO file is
    64^2) -- the BASELINE 256x256 rollout config runs on generated data.
    """
    h = int(((resolution - 1) / r) + 1)
    path = data_path
    if os.path.isdir(data_path):
        path = os.path.join(data_path, "NavierStokes_V1e-5_N1200_T20.mat")
    if os.path.exists(path):
        u = _loadmat(path, ["u"])["u"]  # (N, 64, 64, 20)
    else:
        _warn_synth("ns_vorticity", path)
        import jax

        from .spectral_ns import generate_vorticity_dataset

        sims = synth_sims or max(ntrain + ntest, 32)
        # 'fno' = the benchmark generation regime (Li et al. 2020: solve at
        # 256^2 with dt=1e-4, Fourier-truncate to 64^2) -- ~20x the substep
        # cost of 'fast', so it is opt-in for the canonical accuracy runs;
        # 'fast' keeps CPU smokes cheap but yields smoother, easier data.
        regime = os.environ.get("TBNSS_NS_REGIME", "fast")
        if regime != "fno" and sims >= 100:
            # a benchmark-size request in the fast regime is almost always
            # a forgotten TBNSS_NS_REGIME=fno: the data would be badly
            # under-resolved at nu=1e-5 and NOT comparable to the
            # published numbers (round-3 review finding).  The fno-cache
            # preference below rescues the case where the right cache
            # already exists; warn loudly either way.
            import warnings

            warnings.warn(
                f"generating {sims} NS sims in the 'fast' regime "
                "(64^2-resolved, nu=1e-5 -> under-resolved): benchmark "
                "runs must set TBNSS_NS_REGIME=fno"
            )
        # 'pointwise' reproduces the official script's ``sol[::sub, ::sub]``
        # (retains aliased high-k content; the official 64^2 files are
        # pointwise products); default 'spectral' is the alias-free
        # truncation the round <= 3 canonical caches were built with.
        ds_mode = os.environ.get("TBNSS_NS_DOWNSAMPLE", "spectral")
        if regime == "fno":
            # dt = the recipe's 1e-4 halved: step-halving convergence measured
            # at rel-L2 1.8e-4 per time unit between dt=1e-4 and 2e-4 (far
            # below the 0.090 target band); 2x cheaper generation.
            sim_n, dt, warmup = max(resolution, 256), 2e-4, 0
            tag = "fnopw_" if ds_mode == "pointwise" else "fno_"
        else:
            sim_n, dt, warmup, tag = resolution, 2e-3, 2, ""

        def build():
            # Wipe resilience: the IC stream (jax.random.split(key, sims))
            # is prefix-stable, so sims 0..k-1 of ANY larger same-regime
            # cache are bit-identical to a fresh k-sim generation.  Slice
            # the smallest larger cache instead of regenerating for hours
            # (fifth-environment-wipe lesson: the assembled npz is
            # gitignored-by-size, only the chunk bank survives —
            # scripts/gen_ns_fno_ext.py reassembles it).
            import glob
            import re as _re

            pat = _re.compile(
                rf"ns_v1e-5_{tag}s(\d+)_t{T_in + T}_r{resolution}\.npz$"
            )
            cands = []
            for f in glob.glob(os.path.join(_SYNTH_DIR, "ns_v1e-5_*.npz")):
                m = pat.search(os.path.basename(f))
                if m and int(m.group(1)) >= sims:
                    cands.append((int(m.group(1)), f))
            if cands:
                _, src = min(cands)
                _warn = f"slicing first {sims} sims of larger cache {src}"
                print(f"ns_vorticity: {_warn}")
                return dict(u=np.load(src)["u"][:sims])
            return dict(
                u=generate_vorticity_dataset(
                    jax.random.PRNGKey(42), sims, T_in + T, n=resolution,
                    nu=1e-5, dt=dt, frame_dt=1.0, warmup_frames=warmup,
                    sim_n=sim_n, batch=min(sims, 64 if regime == "fno" else sims),
                    downsample=ds_mode,
                )
            )

        name = f"ns_v1e-5_{tag}s{sims}_t{T_in + T}_r{resolution}"
        fno_name = f"ns_v1e-5_fno_s{sims}_t{T_in + T}_r{resolution}"
        if regime != "fno" and os.path.exists(
            os.path.join(_SYNTH_DIR, fno_name + ".npz")
        ):
            # A benchmark-regime dataset of the requested size already exists
            # on disk; prefer it over regenerating easier 'fast'-regime data.
            # (Without this, launching a canonical run minus the
            # TBNSS_NS_REGIME=fno env silently burns hours regenerating.)
            name = fno_name
        u = _cache(name, build)["u"]
        # honor the requested split as long as train/test don't overlap
        # (round 2 clamped ntrain to sims//2, which silently halved the
        # benchmark's 1000/200 split even with enough sims generated).
        # When the request overflows the cache, preserve a meaningful TEST
        # set and shrink train: the round-3 clamp preferred train and
        # silently collapsed ntest to 1 sim whenever ntrain >= sims (e.g.
        # auto_encoder --ntrain 100 on a 100-sim cache evaluated on a
        # single simulation).
        if ntrain + ntest > sims:
            import warnings

            ntest = min(ntest, max(sims // 5, 1))
            # never grow train past the request (a 'train on N sims' study
            # must not silently train on more)
            ntrain = min(ntrain, sims - ntest)
            warnings.warn(
                f"NS split request overflows the {sims}-sim cache; "
                f"clamped to {ntrain} train / {ntest} test"
            )

    def prep(block):
        return np.ascontiguousarray(
            block.reshape(block.shape[0], -1, block.shape[-1]), np.float32
        )

    train_a = prep(u[:ntrain, ::r, ::r, :T_in][:, :h, :h, :])
    train_u = prep(u[:ntrain, ::r, ::r, T_in : T + T_in][:, :h, :h, :])
    test_a = prep(u[-ntest:, ::r, ::r, :T_in][:, :h, :h, :])
    test_u = prep(u[-ntest:, ::r, ::r, T_in : T + T_in][:, :h, :h, :])
    return train_a, train_u, test_a, test_u, h


# --------------------------------------------------------------------------
# Fork velocity .npy (ns_velocity.py:40,68-83): (sims, 64, 64, 2*frames)
# --------------------------------------------------------------------------

def load_ns_velocity_npy(path, sims=100, frames=20):
    if os.path.exists(path):
        return np.load(path).astype(np.float32)
    _warn_synth("ns_velocity", path)
    import jax

    from .spectral_ns import generate_velocity_dataset

    def build():
        return dict(
            v=generate_velocity_dataset(jax.random.PRNGKey(7), sims, frames)
        )

    return _cache(f"ns_vel_s{sims}_f{frames}", build)["v"]


# --------------------------------------------------------------------------
# Airfoil (exp_airfoil.py:50-79) / Pipe (exp_pipe.py:52-82)
# --------------------------------------------------------------------------

def _load_geofno(data_path, prefix, q_channel, full_shape, kind,
                 ntrain, ntest, r1, r2, synth_n):
    s1 = int(((full_shape[0] - 1) / r1) + 1)
    s2 = int(((full_shape[1] - 1) / r2) + 1)
    px = os.path.join(data_path, f"{prefix}_X.npy")
    py = os.path.join(data_path, f"{prefix}_Y.npy")
    pq = os.path.join(data_path, f"{prefix}_Q.npy")
    if all(os.path.exists(p) for p in (px, py, pq)):
        X = np.load(px).astype(np.float32)
        Y = np.load(py).astype(np.float32)
        Q = np.load(pq)[:, q_channel].astype(np.float32)
    else:
        _warn_synth(kind, px)
        n = (synth_n or 64) + max((synth_n or 64) // 4, 8)

        # 'transonic' (airfoil only) = shock-capturing full-potential solves
        # matching the official benchmark's regime (round-3 fidelity audit);
        # default 'subsonic' = the exact potential-flow data the round <= 3
        # canonical runs used.  Opt-in by env with its own cache.
        regime = os.environ.get("TBNSS_AIRFOIL_REGIME", "subsonic")
        transonic = kind == "airfoil" and regime == "transonic"

        def build():
            # real PDE solves (VERDICT round-1 item 3): potential flow on
            # Karman-Trefftz airfoils / FEM duct flow on wavy channels
            if transonic:
                from .transonic import generate_airfoil_dataset_transonic

                X_, Y_, Q_ = generate_airfoil_dataset_transonic(
                    0, n, full_shape[0], full_shape[1]
                )
            elif kind == "airfoil":
                from .panel import generate_airfoil_dataset

                X_, Y_, Q_ = generate_airfoil_dataset(
                    0, n, full_shape[0], full_shape[1]
                )
            else:
                from .solvers import generate_pipe_dataset

                X_, Y_, Q_ = generate_pipe_dataset(
                    0, n, full_shape[0], full_shape[1]
                )
            return dict(X=X_, Y=Y_, Q=Q_)

        cache_name = f"{kind}_tsn_n{n}" if transonic else f"{kind}_pde_n{n}"
        z = _cache(cache_name, build)
        X, Y, Q = z["X"], z["Y"], z["Q"]
        ntrain = min(ntrain, synth_n or 64)
        ntest = min(ntest, X.shape[0] - ntrain)

    inp = np.stack([X, Y], axis=-1)
    x_train = inp[:ntrain, ::r1, ::r2][:, :s1, :s2].reshape(ntrain, -1, 2)
    y_train = Q[:ntrain, ::r1, ::r2][:, :s1, :s2].reshape(ntrain, -1)
    x_test = inp[-ntest:, ::r1, ::r2][:, :s1, :s2].reshape(ntest, -1, 2)
    y_test = Q[-ntest:, ::r1, ::r2][:, :s1, :s2].reshape(ntest, -1)
    return (
        np.ascontiguousarray(x_train), np.ascontiguousarray(y_train),
        np.ascontiguousarray(x_test), np.ascontiguousarray(y_test),
        s1, s2,
    )


def load_airfoil(data_path, ntrain=1000, ntest=200, r1=1, r2=1, synth_n=None):
    """NACA transonic-flow benchmark: 221 x 51 C-mesh, output Q channel 4."""
    return _load_geofno(
        data_path, "NACA_Cylinder", 4, (221, 51), "airfoil",
        ntrain, ntest, r1, r2, synth_n,
    )


def load_pipe(data_path, ntrain=1000, ntest=200, r1=1, r2=1, synth_n=None):
    """Pipe-flow benchmark: 129 x 129 deformed mesh, output Q channel 0."""
    return _load_geofno(
        data_path, "Pipe", 0, (129, 129), "pipe",
        ntrain, ntest, r1, r2, synth_n,
    )


# --------------------------------------------------------------------------
# Elasticity point clouds (exp_elas.py:54-66)
# --------------------------------------------------------------------------

def load_elasticity(data_path, ntrain=1000, ntest=200, synth_n=None):
    """Returns (train_xy [nt, 972, 2], train_s [nt, 972], test_xy, test_s)."""
    ps = os.path.join(data_path, "elasticity", "Meshes", "Random_UnitCell_sigma_10.npy")
    pxy = os.path.join(data_path, "elasticity", "Meshes", "Random_UnitCell_XY_10.npy")
    if os.path.exists(ps) and os.path.exists(pxy):
        sigma = np.load(ps).astype(np.float32).T  # (samples, 972)
        xy = np.load(pxy).astype(np.float32).transpose(2, 0, 1)  # (samples, 972, 2)
    else:
        _warn_synth("elasticity", ps)
        n = (synth_n or 64) + max((synth_n or 64) // 4, 8)
        n_pts = 972
        # TBNSS_ELAS_SAMPLING=iface: near-interface sampling regime
        # (VERDICT round-4 item 6; solvers.elasticity_sample docstring)
        sampling = os.environ.get("TBNSS_ELAS_SAMPLING", "band")
        key = f"elas_fem_n{n}" if sampling == "band" else \
            f"elas_fem_{sampling}_n{n}"

        def build():
            # plane-stress FEM on random void cells (solvers.py), replacing
            # the round-1 parametric toy (VERDICT item 3)
            from .solvers import generate_elasticity_dataset

            xy_, vm_ = generate_elasticity_dataset(3, n, n_pts=n_pts,
                                                   sampling=sampling)
            return dict(xy=xy_, sigma=vm_)

        z = _cache(key, build)
        sigma, xy = z["sigma"], z["xy"]
        ntrain = min(ntrain, synth_n or 64)
        ntest = min(ntest, sigma.shape[0] - ntrain)
    return (
        xy[:ntrain], sigma[:ntrain], xy[-ntest:], sigma[-ntest:],
    )


# --------------------------------------------------------------------------
# Plasticity (exp_plas.py:105-116)
# --------------------------------------------------------------------------

def load_plasticity(data_path, ntrain=900, ntest=80, synth_n=None):
    """Returns (x [n, 101*31, 1] bc-extruded, y [n, 101*31, 4, 20]).

    Reference: input is a (N, 101) boundary condition extruded over the 31
    rows; output is the (N, 101, 31, 20, 4) deformation trajectory reshaped
    to (N, N_pts, 4, T).
    """
    path = os.path.join(data_path, "plas_N987_T20.mat")
    s1, s2, T, out_dim = 101, 31, 20, 4
    if os.path.exists(path):
        d = _loadmat(path, ["input", "output"])
        x = d["input"].astype(np.float32)  # (N, 101)
        y = d["output"].astype(np.float32)  # (N, 101, 31, 20, 4)
    else:
        _warn_synth("plasticity", path)
        n = (synth_n or 32) + max((synth_n or 32) // 4, 8)

        def build():
            # incremental Hencky-plasticity FEM forging (solvers.py),
            # replacing the round-1 separable toy (VERDICT item 3)
            from .solvers import generate_plasticity_dataset

            bc_, y_ = generate_plasticity_dataset(11, n, s1, s2, T)
            # y_: [n, s1, s2, T, 4] -> reference layout (N, s1, s2, T, 4)
            return dict(x=bc_, y=y_)

        z = _cache(f"plas_fem_n{n}", build)
        x, y = z["x"], z["y"]
        ntrain = min(ntrain, synth_n or 32)
        ntest = min(ntest, x.shape[0] - ntrain)

    x_ext = np.broadcast_to(x[:, :, None], (x.shape[0], s1, s2)).reshape(
        x.shape[0], s1 * s2, 1
    )
    y_flat = y.transpose(0, 1, 2, 4, 3).reshape(y.shape[0], s1 * s2, out_dim, T)
    return (
        np.ascontiguousarray(x_ext[:ntrain], np.float32),
        np.ascontiguousarray(y_flat[:ntrain], np.float32),
        np.ascontiguousarray(x_ext[-ntest:], np.float32),
        np.ascontiguousarray(y_flat[-ntest:], np.float32),
        s1, s2, T, out_dim,
    )
