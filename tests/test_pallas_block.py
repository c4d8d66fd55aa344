"""Parity tests for the fused Transolver-block megakernel (ops/pallas_block.py).

Runs in Pallas interpret mode on the CPU backend; compares forward and full
gradients against the XLA TransolverBlock composition at float32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformerbasednavierstokesolver_tpu.models.transolver import TransolverBlock
from transformerbasednavierstokesolver_tpu.ops import pallas_block


def _extract_params(tree):
    """TransolverBlock param tree -> flat megakernel param dict."""
    attn = tree["Attn"]
    return {
        "ln1_scale": tree["ln_1"]["scale"],
        "ln1_bias": tree["ln_1"]["bias"],
        "conv_kernel": jnp.concatenate(
            [attn["in_project_x"]["kernel"], attn["in_project_fx"]["kernel"]],
            axis=-1,
        ),
        "conv_bias": jnp.concatenate(
            [attn["in_project_x"]["bias"], attn["in_project_fx"]["bias"]]
        ),
        "slice_kernel": attn["in_project_slice_kernel"],
        "slice_bias": attn["in_project_slice_bias"],
        "temperature": attn["temperature"],
        "wq": attn["to_q_kernel"],
        "wk": attn["to_k_kernel"],
        "wv": attn["to_v_kernel"],
        "out_kernel": attn["to_out"]["kernel"],
        "out_bias": attn["to_out"]["bias"],
        "ln2_scale": tree["ln_2"]["scale"],
        "ln2_bias": tree["ln_2"]["bias"],
        "w1": tree["mlp"]["linear_pre"]["kernel"],
        "b1": tree["mlp"]["linear_pre"]["bias"],
        "w2": tree["mlp"]["linear_post"]["kernel"],
        "b2": tree["mlp"]["linear_post"]["bias"],
    }


def _setup(H=16, W=16, C=64, heads=4, G=8, mlp_ratio=2, B=2, seed=0):
    block = TransolverBlock(
        num_heads=heads, hidden_dim=C, mlp_ratio=mlp_ratio, slice_num=G,
        geometry="grid2d", grid_shape=(H, W),
    )
    rng = np.random.default_rng(seed)
    fx = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(seed), fx)
    return block, variables, fx


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


@pytest.mark.parametrize(
    "shape",
    [
        (16, 16, 64, 4, 8),   # R | H: unpadded fast path
        (17, 12, 32, 2, 16),  # prime H: padded masked row tail
        (12, 10, 32, 2, 8),   # H < padded R (single padded row block)
    ],
)
def test_forward_parity(shape):
    H, W, C, heads, G = shape
    block, variables, fx = _setup(H, W, C, heads, G)
    ref = block.apply(variables, fx)
    mp = _extract_params(variables["params"])
    got = pallas_block.fused_transolver_block(
        fx, mp, grid_shape=(H, W), heads=heads, slice_num=G,
        mlp_hidden=C * 2,
    )
    assert _rel(got, ref) < 1e-5


def test_gradient_parity():
    H, W, C, heads, G = 16, 16, 64, 4, 8
    block, variables, fx = _setup(H, W, C, heads, G)
    mp = _extract_params(variables["params"])
    ct = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, H * W, C)), jnp.float32
    )

    def loss_ref(fx_, tree):
        return jnp.sum(block.apply({"params": tree}, fx_) * ct)

    def loss_mega(fx_, mp_):
        out = pallas_block.fused_transolver_block(
            fx_, mp_, grid_shape=(H, W), heads=heads, slice_num=G,
            mlp_hidden=C * 2,
        )
        return jnp.sum(out * ct)

    gfx_ref, gtree = jax.grad(loss_ref, argnums=(0, 1))(fx, variables["params"])
    gfx, gmp = jax.grad(loss_mega, argnums=(0, 1))(fx, mp)

    assert _rel(gfx, gfx_ref) < 1e-5
    gmp_ref = _extract_params(gtree)
    for key in gmp:
        # 1e-4: f32 accumulation-order noise on near-cancelling slice grads
        assert _rel(gmp[key], gmp_ref[key]) < 1e-4, key


def test_gradient_parity_padded_tail():
    """Full fwd+bwd parity when R does not divide H (masked row tail).

    H=12 forces padding (no multiple-of-8 divisor): the padded rows must
    contribute nothing to slice tokens/norms, parameter gradients, or the
    input gradient."""
    H, W, C, heads, G = 12, 10, 32, 2, 8
    block, variables, fx = _setup(H, W, C, heads, G)
    mp = _extract_params(variables["params"])
    ct = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, H * W, C)), jnp.float32
    )

    def loss_ref(fx_, tree):
        return jnp.sum(block.apply({"params": tree}, fx_) * ct)

    def loss_mega(fx_, mp_):
        out = pallas_block.fused_transolver_block(
            fx_, mp_, grid_shape=(H, W), heads=heads, slice_num=G,
            mlp_hidden=C * 2,
        )
        return jnp.sum(out * ct)

    gfx_ref, gtree = jax.grad(loss_ref, argnums=(0, 1))(fx, variables["params"])
    gfx, gmp = jax.grad(loss_mega, argnums=(0, 1))(fx, mp)

    assert _rel(gfx, gfx_ref) < 1e-5
    gmp_ref = _extract_params(gtree)
    for key in gmp:
        assert _rel(gmp[key], gmp_ref[key]) < 1e-4, key


def test_gradient_parity_bf16_temperature():
    """bf16 compute stores ``w`` rounded to bf16; the backward recovers the
    temperature gradient from log(w) (pallas_block._bwd_slice_kernel), so the
    recovery must stay within bf16-level agreement of the f32 XLA gradient.
    Guards the saved-w reuse against low-precision residuals specifically."""
    H, W, C, heads, G = 16, 16, 64, 4, 8
    block, variables, fx = _setup(H, W, C, heads, G)
    mp = _extract_params(variables["params"])
    ct = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, H * W, C)), jnp.float32
    )

    def loss_ref(tree):
        return jnp.sum(block.apply({"params": tree}, fx) * ct)

    def loss_mega(mp_):
        out = pallas_block.fused_transolver_block(
            fx.astype(jnp.bfloat16), mp_, grid_shape=(H, W), heads=heads,
            slice_num=G, mlp_hidden=C * 2,
        )
        return jnp.sum(out.astype(jnp.float32) * ct)

    gtree = jax.grad(loss_ref)(variables["params"])
    gmp = jax.grad(loss_mega)(mp)
    gt_ref = _extract_params(gtree)["temperature"]
    # bf16 inputs/residuals: expect ~1e-2 relative agreement, not 1e-4
    assert _rel(gmp["temperature"], gt_ref) < 5e-2


def test_supported_gates():
    ok = pallas_block.supported((2, 256, 64), jnp.float32, (16, 16), 4, 8, 128)
    assert ok
    # dropout active -> unsupported
    assert not pallas_block.supported(
        (2, 256, 64), jnp.float32, (16, 16), 4, 8, 128, dropout_active=True
    )
    # non-2D grid -> unsupported
    assert not pallas_block.supported(
        (2, 256, 64), jnp.float32, (16, 16, 4), 4, 8, 128
    )


def test_padded_tail_plans():
    """All four previously XLA-only benchmark grids get masked-tail plans.

    Round-3 regression history: darcy-hires (85^2) picked R=17 and failed
    Mosaic lowering ('block shape ... divisible by 8'); then R was
    restricted to multiple-of-8 divisors, which excluded 85/101/129/221
    entirely.  The masked row tail (pad H to the next multiple of R,
    ``_row_validity`` + w-mask) now covers them; every plan's R must still
    honor the %8 rule and Hp must be the least padded multiple.
    """
    for Hrows, W, C, G in [
        (85, 85, 128, 64),    # darcy-hires
        (101, 31, 128, 64),   # plasticity
        (129, 129, 128, 64),  # pipe
        (221, 51, 128, 64),   # airfoil
    ]:
        plan = pallas_block._plan_blocks(Hrows, W, C, 8 * G, 256)
        assert plan is not None, (Hrows, W)
        R, Hp, Rn = plan
        assert R % 8 == 0 and Rn % 8 == 0
        assert Hp % R == 0 and Hp >= Hrows and Hp - Hrows < R
        assert (Hp * W) % Rn == 0
        assert pallas_block.supported(
            (4, Hrows * W, C), jnp.bfloat16, (Hrows, W), 8, G, 256
        )
    # the flagship 64^2 grid keeps its unpadded plan
    R, Hp, Rn = pallas_block._plan_blocks(64, 64, 256, 8 * 32, 512)
    assert Hp == 64 and 64 % R == 0


def test_padded_tail_gated_on_compiled_backends(monkeypatch):
    """Padded plans are ON by default; TBNSS_MEGA_PADDED=0 opts out.

    History: the session-4 padded-grid training NaN (plasticity 101x31
    resume, logs/plas900_r5.log) gated padded plans to opt-in; round 5
    root-caused it to the packed softmax's default-precision max
    broadcast (exp overflow at |logits/temp| ~ 2e4 — fixed by
    _seg_dot/_softmax_z_guard, see ops/pallas_block._padded_ok) and the
    pinned-trajectory replay now runs clean, so the default flipped back
    on.  The opt-out env stays for A/B tooling.
    """
    monkeypatch.setattr(pallas_block, "_interpret", lambda: False)
    monkeypatch.delenv("TBNSS_MEGA_PADDED", raising=False)
    # default: padded plans available on compiled backends
    assert pallas_block._plan_blocks(101, 31, 128, 8 * 64, 256) is not None
    assert pallas_block.supported(
        (4, 101 * 31, 128), jnp.bfloat16, (101, 31), 8, 64, 256
    )
    # divisible heights are unaffected
    assert pallas_block._plan_blocks(64, 64, 256, 8 * 32, 512) is not None
    # the explicit opt-out gates padded plans off (A/B + probe tooling)
    monkeypatch.setenv("TBNSS_MEGA_PADDED", "0")
    assert pallas_block._plan_blocks(101, 31, 128, 8 * 64, 256) is None
    assert not pallas_block.supported(
        (4, 101 * 31, 128), jnp.bfloat16, (101, 31), 8, 64, 256
    )
    monkeypatch.setenv("TBNSS_MEGA_PADDED", "1")
    assert pallas_block._plan_blocks(101, 31, 128, 8 * 64, 256) is not None
    # unsupported shapes raise a clear error instead of a None-unpack
    import pytest

    monkeypatch.setenv("TBNSS_MEGA_PADDED", "0")  # re-gate for the error path
    with pytest.raises(ValueError, match="no kernel plan"):
        pallas_block._make_cfg(
            jnp.zeros((1, 101 * 31, 128)), (101, 31), 8, 64, 256, True
        )
