"""Anti-diagonal torus-roll augmentation (``--aug_roll``).

The FNO NS forcing 0.1(sin+cos)(2pi(x+y)) is invariant under the torus
translation x->x+s, y->y-s, so rolling input AND target frames by a shared
(s,-s) is an exact symmetry of the benchmark dynamics (deliberate addition
over /root/reference/exp_ns.py, which trains unaugmented).  These tests pin
(a) the geometric property the augmentation relies on and (b) that both
trainer paths (scan-epoch and per-batch) run with the flag on.
"""

import numpy as np

import jax
import jax.numpy as jnp


def _roll(field, s):
    # same transform the trainer applies: (side, side, c) rolled by (s, -s)
    return jnp.roll(field, (s, -s), (0, 1))


def test_antidiagonal_roll_preserves_forcing_phase():
    # any function of (x+y) mod 1 — the forcing in particular — is
    # invariant under the (s, -s) roll, for every shift
    side = 16
    i, j = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    forcing = np.sin(2 * np.pi * (i + j) / side) + np.cos(
        2 * np.pi * (i + j) / side
    )
    for s in [0, 1, 5, side - 1]:
        rolled = np.asarray(_roll(jnp.asarray(forcing)[..., None], s))[..., 0]
        np.testing.assert_allclose(rolled, forcing, atol=1e-6)


def test_roll_batch_is_a_permutation_and_invertible():
    side = 8
    rng = np.random.default_rng(0)
    f = rng.normal(size=(side, side, 3)).astype(np.float32)
    s = 3
    rolled = np.asarray(_roll(jnp.asarray(f), s))
    # same multiset of values (pure permutation, no interpolation)
    np.testing.assert_allclose(np.sort(rolled.ravel()), np.sort(f.ravel()))
    # inverse roll restores the field
    back = np.asarray(_roll(jnp.asarray(rolled), -s % side))
    np.testing.assert_allclose(back, f)
    # and the index map is exactly new[i, j] = old[i - s, j + s]
    np.testing.assert_allclose(rolled[4, 2], f[(4 - s) % side, (2 + s) % side])


def test_exp_ns_trains_with_aug_roll_scan_path():
    # ntrain % bsz == 0 on one device -> the lax.scan epoch path
    from transformerbasednavierstokesolver_tpu.cli import exp_ns

    final = exp_ns.main([
        "--epochs", "2", "--synth_n", "8", "--batch-size", "2",
        "--n-hidden", "16", "--n-layers", "2", "--n-heads", "2",
        "--slice_num", "4", "--aug_roll", "1", "--ntrain", "4",
        "--save_name", "aug_roll_scan_test",
    ])
    assert np.isfinite(float(final))


def test_exp_ns_trains_with_aug_roll_batch_path(monkeypatch):
    monkeypatch.setenv("TBNSS_EPOCH_SCAN", "0")
    from transformerbasednavierstokesolver_tpu.cli import exp_ns

    final = exp_ns.main([
        "--epochs", "1", "--synth_n", "8", "--batch-size", "2",
        "--n-hidden", "16", "--n-layers", "2", "--n-heads", "2",
        "--slice_num", "4", "--aug_roll", "1", "--ntrain", "4",
        "--save_name", "aug_roll_batch_test",
    ])
    assert np.isfinite(float(final))
