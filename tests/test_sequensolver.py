"""SequenSolver latent-rollout stack tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformerbasednavierstokesolver_tpu.models.sequensolver import (
    SequenSolver,
    SequenSolverMerged,
    sinusoidal_token_pe,
    z_score,
)
from transformerbasednavierstokesolver_tpu.models.slice_learners import (
    LearnSlice,
    SliceLearner,
)
from transformerbasednavierstokesolver_tpu.ops.embedding import unified_pos_grid_2d

H = W = 8
T = 4
M, C = 4, 8


def _merged():
    return SequenSolverMerged(
        T=T, H=H, W=W, M=M, C=C, layers=2, sequential_head=4,
        encoder_layers=2, slice_hidden=16,
    )


@pytest.fixture(scope="module")
def merged_setup():
    model = _merged()
    pos = jnp.asarray(unified_pos_grid_2d(H, W, 8))
    fx = jax.random.normal(jax.random.PRNGKey(0), (2, H * W, T))
    x = jnp.broadcast_to(pos, (2,) + pos.shape[1:])
    params = model.init(jax.random.PRNGKey(1), x, fx, use_gt=False)["params"]
    return model, params, x, fx


def test_merged_forward_shape(merged_setup):
    model, params, x, fx = merged_setup
    out = model.apply({"params": params}, x, fx)
    assert out.shape == (2, H * W, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_merged_batched_encoding_matches_per_frame(merged_setup):
    """The single batched encoder call must equal T separate encode calls."""
    model, params, x, fx = merged_setup
    tokens = model.apply(
        {"params": params}, x, fx, method=SequenSolverMerged.encode_frames
    )
    enc_apply = lambda frame: model.apply(
        {"params": params}, x, frame, method=SequenSolverMerged.encode_frames
    )
    for i in range(T):
        tok_i = enc_apply(fx[..., i : i + 1])  # [B, 1, 1, M*C]
        np.testing.assert_allclose(
            np.asarray(tokens[:, :, i]), np.asarray(tok_i[:, :, 0]),
            rtol=2e-4, atol=1e-5,
        )


def test_merged_causal_mask(merged_setup):
    """With causal attention, only the LAST token is read out -- but every
    input frame may affect it; verify instead that a pure future-position
    perturbation of the PE'd sequence cannot affect earlier positions."""
    model, params, x, fx = merged_setup
    tokens = model.apply(
        {"params": params}, x, fx, method=SequenSolverMerged.encode_frames
    )

    def blocks_out(tok):
        return model.apply(
            {"params": params}, tok, method=SequenSolverMerged.predict_code
        )

    # predict_code reads tokens[:, :, -1]; check causality at the block level
    # by perturbing the last frame only: earlier rows of the attended
    # sequence must stay unchanged.
    bound = model.bind({"params": params})
    seq = tokens + sinusoidal_token_pe(T, M * C)
    out1 = bound.block(seq)
    seq2 = seq.at[:, :, -1].add(1.0)
    out2 = bound.block(seq2)
    np.testing.assert_allclose(
        np.asarray(out1[:, :, :-1]), np.asarray(out2[:, :, :-1]),
        rtol=1e-4, atol=1e-6,
    )
    assert not np.allclose(np.asarray(out1[:, :, -1]), np.asarray(out2[:, :, -1]))


def test_merged_slice_weights_normalized(merged_setup):
    model, params, x, fx = merged_setup
    tokens = model.apply(
        {"params": params}, x, fx, method=SequenSolverMerged.encode_frames
    )
    code = model.apply(
        {"params": params}, tokens, method=SequenSolverMerged.predict_code
    )
    w = model.apply(
        {"params": params}, x, fx, code, method=SequenSolverMerged.forward_slice
    )
    assert w.shape == (2, 1, H * W, M)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)


def test_original_variant_gt_vs_predicted():
    model = SequenSolver(T=T, H=H, W=W, M=M, C=C, layers=2, encoder_layers=2)
    pos2d = jax.random.uniform(jax.random.PRNGKey(2), (2, H * W, 2))
    fx = jax.random.normal(jax.random.PRNGKey(0), (2, H * W, T))
    y = jax.random.normal(jax.random.PRNGKey(3), (2, H * W, 1))
    params = model.init(jax.random.PRNGKey(1), pos2d, fx, y, use_gt=False)["params"]
    out_gt = model.apply({"params": params}, pos2d, fx, y, use_gt=True)
    out_pred = model.apply({"params": params}, pos2d, fx, y, use_gt=False)
    assert out_gt.shape == out_pred.shape == (2, H * W, 1)
    assert not np.allclose(np.asarray(out_gt), np.asarray(out_pred))


def test_pe_matches_torch_formula():
    import torch

    num, dim = 5, 16
    pe = np.asarray(sinusoidal_token_pe(num, dim))[0, 0]
    pos = torch.arange(num, dtype=torch.float).unsqueeze(1)
    div = 10000 ** (torch.arange(0, dim, 2).float() / dim)
    ref = torch.zeros(num, dim)
    ref[:, 0::2] = torch.sin(pos / div)
    ref[:, 1::2] = torch.cos(pos / div)
    np.testing.assert_allclose(pe, ref.numpy(), rtol=1e-5, atol=1e-6)


def test_z_score():
    x = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    z = np.asarray(z_score(x))
    assert abs(z.mean()) < 1e-6
    np.testing.assert_allclose(z.std(), 1.0, atol=1e-4)


def test_slice_learner_normalized():
    sl = SliceLearner(
        space_dim=2, n_hidden=16, fun_dim=T, unified_pos=True, H=H, W=W,
        slice_num=M, ref=4,
    )
    x = jnp.zeros((2, H * W, 2))
    fx = jax.random.normal(jax.random.PRNGKey(0), (2, H * W, T))
    params = sl.init(jax.random.PRNGKey(1), x, fx)
    w = sl.apply(params, x, fx)
    assert w.shape == (2, 1, H * W, M)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)


def test_learn_slice_heads():
    ls = LearnSlice(unified_pos=True, use_code_for_vorticity=True, H=H, W=W,
                    M=M, C=C, n_hidden=16)
    pos = jnp.asarray(unified_pos_grid_2d(H, W, 8))
    x = jnp.broadcast_to(pos, (1,) + pos.shape[1:])
    fx = jax.random.normal(jax.random.PRNGKey(0), (1, H * W, 10))
    code = jax.random.normal(jax.random.PRNGKey(1), (1, 1, M, C))

    def init_all(m, x_, fx_, code_):
        a = m(code_[:, 0], x_)
        b = m.forward_previous_slice(
            jnp.zeros((1, 1, H * W, M)), code_
        )
        c = m.forward_from_vorticity(x_, fx_, code_)
        return a, b, c

    params = ls.init(jax.random.PRNGKey(2), x, fx, code, method=init_all)
    a, b, c = ls.apply(params, x, fx, code, method=init_all)
    assert a.shape == (1, 1, H * W, M)
    np.testing.assert_allclose(np.asarray(a.sum(-1)), 1.0, atol=1e-5)
    assert b.shape == (1, 1, H * W, M)
    assert c.shape == (1, 1, H * W, M)
    np.testing.assert_allclose(np.asarray(c.sum(-1)), 1.0, atol=1e-5)


def test_teacher_forced_fast_path_matches_loop(merged_setup):
    model, params, x, fx = merged_setup
    yy = jax.random.normal(jax.random.PRNGKey(9), (2, H * W, 3))
    fast = model.apply(
        {"params": params}, x, fx, yy,
        method=SequenSolverMerged.teacher_forced_outputs,
    )
    f = fx
    outs = []
    for t in range(3):
        outs.append(model.apply({"params": params}, x, f))
        f = jnp.concatenate([f[..., 1:], yy[..., t : t + 1]], -1)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(jnp.concatenate(outs, -1)),
        rtol=1e-5, atol=1e-6,
    )


def test_solve_with_slice_learner(merged_setup):
    """External slice weights drive the decode (SequenSolver.py:182-291)."""
    model, params, x, fx = merged_setup
    n = H * W
    w = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(5), (2, 1, n, M)), axis=-1
    )
    out = model.apply(
        {"params": params}, x, fx, w,
        method=SequenSolverMerged.solve_with_slice_learner,
    )
    assert out.shape == (2, n, 1)
    # different weights must change the output
    w2 = jnp.roll(w, 1, axis=-1)
    out2 = model.apply(
        {"params": params}, x, fx, w2,
        method=SequenSolverMerged.solve_with_slice_learner,
    )
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_incremental_closed_loop_matches_step_loop(merged_setup):
    model, params, x, fx = merged_setup
    fast = model.apply(
        {"params": params}, x, fx, 3,
        method=SequenSolverMerged.closed_loop_outputs,
    )
    f = fx
    outs = []
    for _ in range(3):
        im = model.apply({"params": params}, x, f)
        outs.append(im)
        f = jnp.concatenate([f[..., 1:], im], -1)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(jnp.concatenate(outs, -1)),
        rtol=1e-5, atol=1e-6,
    )
