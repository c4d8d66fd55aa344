"""Official-data loading paths, exercised on tiny fixtures in the exact
published schemas (round-2 VERDICT missing item 4).

Each fixture reproduces the key names, array shapes, and axis order of the
real downloads so a wrong key / transpose / slice in the loaders surfaces
here instead of on download day.  Schemas: /root/reference/exp_darcy.py:77-91
(coeff/sol .mat), exp_ns.py:64-80 (u, MATLAB v7.3), exp_plas.py:105-116
(input/output .mat), exp_airfoil.py:50-68 + exp_pipe.py:52-77 (X/Y/Q .npy),
exp_elas.py:54-60 (sigma/XY .npy).
"""

import numpy as np
import pytest
import scipy.io as scio

from transformerbasednavierstokesolver_tpu.data import datasets as D


def _rng(seed):
    return np.random.default_rng(seed)


def test_darcy_official_mat(tmp_path):
    # piececonst_r421_N1024_smooth{1,2}.mat, keys coeff/sol, (N, 421, 421)
    r = _rng(0)
    tr = dict(coeff=r.normal(size=(3, 421, 421)), sol=r.normal(size=(3, 421, 421)))
    te = dict(coeff=r.normal(size=(2, 421, 421)), sol=r.normal(size=(2, 421, 421)))
    scio.savemat(tmp_path / "piececonst_r421_N1024_smooth1.mat", tr)
    scio.savemat(tmp_path / "piececonst_r421_N1024_smooth2.mat", te)

    x_tr, y_tr, x_te, y_te, s = D.load_darcy(str(tmp_path), ntrain=3, ntest=2, r=5)
    assert s == 85
    assert x_tr.shape == (3, 85 * 85) and y_te.shape == (2, 85 * 85)
    # orientation: flattened row-major over the ::5-strided grid
    expect = tr["coeff"][1, ::5, ::5][:85, :85].ravel()
    np.testing.assert_allclose(x_tr[1], expect.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(
        y_te[0], te["sol"][0, ::5, ::5][:85, :85].ravel().astype(np.float32),
        rtol=1e-6,
    )


def test_ns_official_mat_v73(tmp_path):
    # NavierStokes_V1e-5_N1200_T20.mat, key u, (N, 64, 64, 20) stored
    # MATLAB-v7.3 style (HDF5, reversed axis order)
    import h5py

    u = _rng(1).normal(size=(6, 64, 64, 20)).astype(np.float64)
    with h5py.File(tmp_path / "NavierStokes_V1e-5_N1200_T20.mat", "w") as f:
        f["u"] = u.T  # v7.3 stores column-major == reversed dims

    tr_a, tr_u, te_a, te_u, h = D.load_ns_vorticity(
        str(tmp_path), ntrain=4, ntest=2, T_in=10, T=10
    )
    assert h == 64
    assert tr_a.shape == (4, 64 * 64, 10) and tr_u.shape == (4, 64 * 64, 10)
    assert te_a.shape == (2, 64 * 64, 10) and te_u.shape == (2, 64 * 64, 10)
    np.testing.assert_allclose(
        tr_a[2], u[2, :, :, :10].reshape(-1, 10).astype(np.float32), rtol=1e-6
    )
    # test split comes from the END of the file (reference: [-ntest:])
    np.testing.assert_allclose(
        te_u[-1], u[-1, :, :, 10:20].reshape(-1, 10).astype(np.float32),
        rtol=1e-6,
    )


def test_plasticity_official_mat(tmp_path):
    # plas_N987_T20.mat: input (N, 101), output (N, 101, 31, 20, 4);
    # reference transposes (-2, -1) then reshapes to (N, 3131, 4, T)
    r = _rng(2)
    inp = r.normal(size=(5, 101)).astype(np.float64)
    out = r.normal(size=(5, 101, 31, 20, 4)).astype(np.float64)
    scio.savemat(tmp_path / "plas_N987_T20.mat", dict(input=inp, output=out))

    x_tr, y_tr, x_te, y_te, s1, s2, T, od = D.load_plasticity(
        str(tmp_path), ntrain=3, ntest=2
    )
    assert (s1, s2, T, od) == (101, 31, 20, 4)
    assert x_tr.shape == (3, 101 * 31, 1) and y_tr.shape == (3, 101 * 31, 4, 20)
    # bc is extruded across the 31 columns: every row block is constant
    np.testing.assert_allclose(
        x_tr[1, :, 0].reshape(101, 31),
        np.broadcast_to(inp[1][:, None], (101, 31)).astype(np.float32),
        rtol=1e-6,
    )
    # y layout matches torch's transpose(-2, -1) + reshape
    expect = out[0].transpose(0, 1, 3, 2).reshape(101 * 31, 4, 20)
    np.testing.assert_allclose(y_tr[0], expect.astype(np.float32), rtol=1e-6)


@pytest.mark.parametrize(
    "loader,prefix,shape,qch,nq",
    [
        (D.load_airfoil, "NACA_Cylinder", (221, 51), 4, 5),
        (D.load_pipe, "Pipe", (129, 129), 0, 2),
    ],
)
def test_geofno_official_npy(tmp_path, loader, prefix, shape, qch, nq):
    # {prefix}_X/Y.npy (N, s1, s2); {prefix}_Q.npy (N, nq, s1, s2)
    r = _rng(3)
    n = 5
    X = r.normal(size=(n, *shape)).astype(np.float32)
    Y = r.normal(size=(n, *shape)).astype(np.float32)
    Q = r.normal(size=(n, nq, *shape)).astype(np.float32)
    np.save(tmp_path / f"{prefix}_X.npy", X)
    np.save(tmp_path / f"{prefix}_Y.npy", Y)
    np.save(tmp_path / f"{prefix}_Q.npy", Q)

    x_tr, y_tr, x_te, y_te, s1, s2 = loader(str(tmp_path), ntrain=3, ntest=2)
    assert (s1, s2) == shape
    n_pts = shape[0] * shape[1]
    assert x_tr.shape == (3, n_pts, 2) and y_te.shape == (2, n_pts)
    # input = stack([X, Y], -1); output = Q[:, qch]
    np.testing.assert_allclose(x_tr[2, :, 0], X[2].ravel(), rtol=1e-6)
    np.testing.assert_allclose(x_tr[2, :, 1], Y[2].ravel(), rtol=1e-6)
    np.testing.assert_allclose(y_tr[1], Q[1, qch].ravel(), rtol=1e-6)
    np.testing.assert_allclose(y_te[-1], Q[-1, qch].ravel(), rtol=1e-6)


def test_elasticity_official_npy(tmp_path):
    # Random_UnitCell_sigma_10.npy (972, N) -> .T; XY_10.npy (972, 2, N)
    # -> permute(2, 0, 1)
    r = _rng(4)
    n = 6
    sigma = r.normal(size=(972, n)).astype(np.float32)
    xy = r.normal(size=(972, 2, n)).astype(np.float32)
    d = tmp_path / "elasticity" / "Meshes"
    d.mkdir(parents=True)
    np.save(d / "Random_UnitCell_sigma_10.npy", sigma)
    np.save(d / "Random_UnitCell_XY_10.npy", xy)

    tr_xy, tr_s, te_xy, te_s = D.load_elasticity(str(tmp_path), ntrain=4, ntest=2)
    assert tr_xy.shape == (4, 972, 2) and te_s.shape == (2, 972)
    np.testing.assert_allclose(tr_s[3], sigma[:, 3], rtol=1e-6)
    np.testing.assert_allclose(tr_xy[1], xy[:, :, 1], rtol=1e-6)
    np.testing.assert_allclose(te_xy[-1], xy[:, :, -1], rtol=1e-6)


def test_ns_synth_split_overflow_preserves_test(tmp_path, monkeypatch):
    # Regression: the round-3 clamp preferred train and collapsed ntest to 1
    # sim whenever ntrain >= sims (auto_encoder --ntrain 100 on a 100-sim
    # cache evaluated on a single simulation).  The overflow clamp must keep
    # a meaningful test set and shrink train instead.
    u = _rng(7).normal(size=(100, 64, 64, 20)).astype(np.float32)
    monkeypatch.setattr(D, "_cache", lambda name, build: {"u": u})

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # synth-fallback + clamp warnings
        tr_a, tr_u, te_a, te_u, h = D.load_ns_vorticity(
            str(tmp_path), ntrain=100, ntest=20, T_in=10, T=10,
            synth_sims=100,
        )
    assert tr_a.shape[0] == 80 and te_a.shape[0] == 20
    # test block is the cache tail, disjoint from train
    np.testing.assert_allclose(
        te_u[-1], u[-1, :, :, 10:].reshape(-1, 10), rtol=1e-6
    )
    # an exactly-fitting request is untouched
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tr_a, _, te_a, _, _ = D.load_ns_vorticity(
            str(tmp_path), ntrain=90, ntest=10, T_in=10, T=10, synth_sims=100,
        )
    assert tr_a.shape[0] == 90 and te_a.shape[0] == 10
    # the clamp must never GROW train past the request either (a
    # 'train on N sims' study with a large ntest overflowing the cache)
    u30 = u[:30]
    monkeypatch.setattr(D, "_cache", lambda name, build: {"u": u30})
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tr_a, _, te_a, _, _ = D.load_ns_vorticity(
            str(tmp_path), ntrain=15, ntest=20, T_in=10, T=10, synth_sims=30,
        )
    assert tr_a.shape[0] == 15 and te_a.shape[0] == 6  # 30 // 5
