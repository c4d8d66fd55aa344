"""Losses/normalizers cross-checked against independent torch computations."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from transformerbasednavierstokesolver_tpu.utils import (
    RelLpLoss,
    UnitGaussianNormalizer,
    UnitTransformer,
    abs_lp,
    central_diff,
    rel_lp,
)


@pytest.fixture
def xy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 30)).astype(np.float32)
    y = rng.normal(size=(4, 30)).astype(np.float32)
    return x, y


def torch_rel(x, y, reduce_sum):
    tx, ty = torch.tensor(x), torch.tensor(y)
    d = torch.norm(tx.reshape(4, -1) - ty.reshape(4, -1), 2, 1)
    n = torch.norm(ty.reshape(4, -1), 2, 1)
    r = d / n
    return (r.sum() if reduce_sum else r.mean()).item()


def test_rel_lp_matches_torch(xy):
    x, y = xy
    assert rel_lp(jnp.asarray(x), jnp.asarray(y), reduction="sum") == pytest.approx(
        torch_rel(x, y, True), rel=1e-5
    )
    assert rel_lp(jnp.asarray(x), jnp.asarray(y), reduction="mean") == pytest.approx(
        torch_rel(x, y, False), rel=1e-5
    )


def test_rel_lp_loss_class(xy):
    x, y = xy
    loss = RelLpLoss(size_average=False)
    assert float(loss(jnp.asarray(x), jnp.asarray(y))) == pytest.approx(
        torch_rel(x, y, True), rel=1e-5
    )


def test_abs_lp_matches_torch(xy):
    x, y = xy
    h = 1.0 / (x.shape[1] - 1.0)
    tx, ty = torch.tensor(x), torch.tensor(y)
    expect = (h * torch.norm(tx - ty, 2, 1)).mean().item()
    got = float(abs_lp(jnp.asarray(x), jnp.asarray(y), d=2, p=2, reduction="mean"))
    assert got == pytest.approx(expect, rel=1e-5)


def test_unit_transformer_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.normal(loc=3.0, scale=2.0, size=(10, 25)).astype(np.float32)
    tr = UnitTransformer.fit(jnp.asarray(x))
    enc = tr.encode(jnp.asarray(x))
    # matches torch mean/std over dims (0,1) with unbiased std
    tstd = torch.tensor(x).std(dim=(0, 1), keepdim=True) + 1e-8
    tmean = torch.tensor(x).mean(dim=(0, 1), keepdim=True)
    expect = ((torch.tensor(x) - tmean) / tstd).numpy()
    np.testing.assert_allclose(np.asarray(enc), expect, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tr.decode(enc)), x, rtol=1e-4, atol=1e-5)


def test_unit_gaussian_normalizer_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(16, 5, 3)).astype(np.float32)
    tr = UnitGaussianNormalizer.fit(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(tr.decode(tr.encode(jnp.asarray(x)))), x, rtol=1e-4, atol=1e-5
    )


def test_central_diff_matches_manual():
    res = 6
    rng = np.random.default_rng(3)
    f = rng.normal(size=(2, res * res, 1)).astype(np.float32)
    h = 1.0 / res
    gx, gy = central_diff(jnp.asarray(f), h, res)
    fg = np.pad(f.reshape(2, res, res, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    exp_gx = (fg[:, 1:-1, 2:, :] - fg[:, 1:-1, :-2, :]) / (2 * h)
    exp_gy = (fg[:, 2:, 1:-1, :] - fg[:, :-2, 1:-1, :]) / (2 * h)
    np.testing.assert_allclose(np.asarray(gx), exp_gx, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), exp_gy, rtol=1e-5)
