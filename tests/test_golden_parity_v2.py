"""Golden parity v2: the REFERENCE torch modules as the oracle.

Round-1 parity tests compared against a torch-functional recomputation
written here; a common-mode bug would pass.  These tests import the actual
reference ``nn.Module`` classes from ``/root/reference/model`` (pure
torch + einops) and assert forward AND gradient parity:

* standard 2D on both shipped checkpoints
  (``checkpoints/ep400_sim100.pt``, ``ns_curl_ep400_sim100_unified.pt``);
* the encoder variant on ``sequential_checkpoints/encoder_ep20_head_1.pt``
  (forward + ``encode`` slice tokens);
* randomly initialized irregular and 3D models round-tripped through
  ``export_torch_state_dict`` into the reference classes.

The reference package needs two environment shims (test-local, read-only):
``timm`` is absent here (only ``trunc_normal_`` is imported from it, for
init -- aliased to ``torch.nn.init.trunc_normal_``), and the models call
``.cuda()`` inside ``get_grid`` (torch is CPU-only -- made a no-op).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
CKPT_2D = [
    f"{REF}/checkpoints/ep400_sim100.pt",
    f"{REF}/checkpoints/ns_curl_ep400_sim100_unified.pt",
]
CKPT_ENC = f"{REF}/sequential_checkpoints/encoder_ep20_head_1.pt"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(f"{REF}/model"), reason="reference repo not available"
)


@pytest.fixture(scope="module")
def refmod():
    """Make the reference `model` package importable on CPU-only torch."""
    import torch

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models, models.layers = models, layers
        sys.modules.update(
            {"timm": timm, "timm.models": models, "timm.models.layers": layers}
        )
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    import model.Transolver_Irregular_Mesh as irr
    import model.Transolver_Structured_Mesh2D_Encoder as enc2d
    import model.Transolver_Structured_Mesh_2D as m2d
    import model.Transolver_Structured_Mesh_3D as m3d

    return types.SimpleNamespace(m2d=m2d, m3d=m3d, irr=irr, enc2d=enc2d)


def _to_torch_sd(sd_np):
    import torch

    return {k: torch.tensor(np.asarray(v)) for k, v in sd_np.items()}


def _rel(a, b):
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


# --- standard 2D: both shipped checkpoints, forward + gradients ------------


@pytest.mark.parametrize("ckpt", CKPT_2D, ids=["ep400", "ns_curl_unified"])
def test_2d_checkpoint_forward_and_grad_parity(refmod, ckpt):
    import torch

    from transformerbasednavierstokesolver_tpu.models import Transolver
    from transformerbasednavierstokesolver_tpu.train.checkpoint import (
        export_torch_state_dict,
        import_torch_state_dict,
    )

    tm = refmod.m2d.Model(
        space_dim=2, n_layers=8, n_hidden=64, n_head=8, fun_dim=10, out_dim=1,
        slice_num=32, ref=8, unified_pos=True, H=64, W=64, mlp_ratio=1,
    )
    sd = torch.load(ckpt, map_location="cpu", weights_only=True)
    tm.load_state_dict(sd, strict=True)
    tm.eval()

    rng = np.random.default_rng(0)
    fx = rng.normal(size=(2, 4096, 10)).astype(np.float32)
    x = np.zeros((2, 4096, 2), np.float32)
    cot = rng.normal(size=(2, 4096, 1)).astype(np.float32)

    fx_t = torch.tensor(fx, requires_grad=True)
    out_t = tm(torch.tensor(x), fx_t)
    (out_t * torch.tensor(cot)).sum().backward()
    out_ref = out_t.detach().numpy()
    dfx_ref = fx_t.grad.numpy()
    grads_ref = {
        k: p.grad.detach().numpy()
        for k, p in tm.named_parameters()
        if p.grad is not None
    }

    params = import_torch_state_dict(ckpt, geometry="grid2d")
    model = Transolver(
        space_dim=2, n_layers=8, n_hidden=64, n_head=8, fun_dim=10, out_dim=1,
        slice_num=32, ref=8, unified_pos=True, geometry="grid2d", H=64, W=64,
        precision="highest",
    )

    def loss(p, fx_):
        out = model.apply({"params": p}, jnp.asarray(x), fx_)
        return (out * jnp.asarray(cot)).sum(), out

    (_, out_j), (gp, gfx) = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        params, jnp.asarray(fx)
    )
    assert _rel(np.asarray(out_j), out_ref) < 1e-3
    assert _rel(np.asarray(gfx), dfx_ref) < 1e-3

    # parameter gradients, via the export mapping (same tree structure)
    grads_sd = export_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, gp), geometry="grid2d"
    )
    # `placeholder` is unused when fx is given (grid2d adds it only for
    # fx=None, transolver.py:269-271): torch reports no grad, jax a zero one
    assert set(grads_ref) == set(grads_sd) - {"placeholder"}
    assert np.abs(grads_sd["placeholder"]).max() == 0.0
    for k in grads_ref:
        assert _rel(grads_sd[k], grads_ref[k]) < 2e-3, k


# --- encoder variant: shipped encoder checkpoint ---------------------------


def test_encoder_checkpoint_forward_and_encode_parity(refmod):
    import torch

    from transformerbasednavierstokesolver_tpu.models import Transolver
    from transformerbasednavierstokesolver_tpu.train.checkpoint import (
        import_torch_state_dict,
    )

    tm = refmod.enc2d.Model(
        space_dim=2, n_layers=8, n_hidden=32, n_head=1, fun_dim=1, out_dim=1,
        slice_num=16, ref=8, unified_pos=True, H=64, W=64, mlp_ratio=1,
    )
    sd = torch.load(CKPT_ENC, map_location="cpu", weights_only=True)
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    # the reference class has buffers/aux the checkpoint lacks or vice versa;
    # all actual parameters must load
    assert not [k for k in missing if not k.endswith("num_batches_tracked")]
    tm.eval()

    rng = np.random.default_rng(1)
    fx = rng.normal(size=(2, 4096, 1)).astype(np.float32)
    x = np.zeros((2, 4096, 2), np.float32)

    with torch.no_grad():
        out_ref = tm(torch.tensor(x), torch.tensor(fx)).numpy()
        code_ref = tm.encode(torch.tensor(x), torch.tensor(fx)).numpy()
        w_ref = tm.get_attention_slice().numpy()

    params = import_torch_state_dict(CKPT_ENC, geometry="grid2d", variant="encoder")
    model = Transolver(
        space_dim=2, n_layers=8, n_hidden=32, n_head=1, fun_dim=1, out_dim=1,
        slice_num=16, ref=8, unified_pos=True, geometry="grid2d",
        variant="encoder", H=64, W=64, precision="highest",
    )
    out_j = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(fx))
    code_j, w_j = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(fx),
        method=Transolver.encode,
    )
    assert _rel(np.asarray(out_j), out_ref) < 1e-3
    assert _rel(np.asarray(code_j), code_ref) < 1e-3
    assert _rel(np.asarray(w_j), w_ref) < 1e-3


# --- random-init irregular + 3D models through the export path -------------


def _export_into(refmodel, params, geometry):
    from transformerbasednavierstokesolver_tpu.train.checkpoint import (
        export_torch_state_dict,
    )

    sd = export_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, params), geometry=geometry
    )
    refmodel.load_state_dict(_to_torch_sd(sd), strict=True)
    refmodel.eval()
    return refmodel


def test_irregular_random_init_parity(refmod):
    import torch

    from transformerbasednavierstokesolver_tpu.models import Transolver

    kw = dict(space_dim=2, n_layers=2, n_hidden=32, n_head=4, fun_dim=0,
              out_dim=1, slice_num=8, ref=8, unified_pos=False, mlp_ratio=1)
    model = Transolver(geometry="irregular", precision="highest", **kw)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 972, 2)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), None)["params"]

    tm = _export_into(refmod.irr.Model(**kw), params, "irregular")
    with torch.no_grad():
        out_ref = tm(torch.tensor(x), None).numpy()
    out_j = model.apply({"params": params}, jnp.asarray(x), None)
    assert _rel(np.asarray(out_j), out_ref) < 1e-3


def test_3d_random_init_parity(refmod):
    import torch

    from transformerbasednavierstokesolver_tpu.models import Transolver

    s = 8
    kw = dict(space_dim=3, n_layers=2, n_hidden=16, n_head=2, fun_dim=2,
              out_dim=1, slice_num=4, ref=4, unified_pos=False, mlp_ratio=1)
    model = Transolver(geometry="grid3d", H=s, W=s, D=s, precision="highest",
                       **kw)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, s**3, 3)).astype(np.float32)
    fx = rng.normal(size=(2, s**3, 2)).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(fx)
    )["params"]

    tm = _export_into(
        refmod.m3d.Model(H=s, W=s, D=s, **kw), params, "grid3d"
    )
    with torch.no_grad():
        out_ref = tm(torch.tensor(x), torch.tensor(fx)).numpy()
    out_j = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(fx))
    assert _rel(np.asarray(out_j), out_ref) < 1e-3
