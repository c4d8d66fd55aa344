"""Reference encoder checkpoint (autoencoder variant) import + function test."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

CKPT = "/root/reference/sequential_checkpoints/encoder_ep20_head_1.pt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference encoder checkpoint not available"
)


@pytest.fixture(scope="module")
def encoder():
    from transformerbasednavierstokesolver_tpu.models import Transolver
    from transformerbasednavierstokesolver_tpu.train.checkpoint import (
        import_torch_state_dict,
    )

    params = import_torch_state_dict(CKPT, geometry="grid2d", variant="encoder")
    model = Transolver(
        space_dim=2, n_layers=8, n_hidden=32, n_head=1, slice_num=16,
        fun_dim=1, out_dim=1, unified_pos=True, ref=8,
        geometry="grid2d", variant="encoder", H=64, W=64, precision="highest",
    )
    return model, params


def test_import_param_count(encoder):
    _, params = encoder
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert n == 211753  # full reference encoder state dict


def test_pretrained_autoencoder_reconstructs(encoder):
    """The reference encoder is an identity AE; the imported weights must
    reconstruct an arbitrary field through encode->decode to ~1% rel-L2 --
    an end-to-end numerics check of the whole encoder-variant pipeline."""
    model, params = encoder
    x = jnp.zeros((2, 4096, 2))
    fx = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4096, 1)), jnp.float32
    )
    out = model.apply({"params": params}, x, fx)
    rel = float(jnp.linalg.norm(out - fx) / jnp.linalg.norm(fx))
    assert rel < 0.05, rel

    # functional encode/decode path equals forward
    code, w = model.apply({"params": params}, x, fx, method="encode")
    assert code.shape == (2, 1, 16, 32)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)
    dec, _ = model.apply({"params": params}, code, w, method="decode")
    np.testing.assert_allclose(
        np.asarray(dec), np.asarray(out), rtol=1e-4, atol=1e-5
    )
