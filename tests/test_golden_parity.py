"""Golden-value parity against the shipped reference checkpoints.

Loads ``/root/reference/checkpoints/ep400_sim100.pt`` (Transolver-2D,
n_hidden=64, 8 heads, slice 32, 8 layers, unified_pos, fun_dim=10) through
the torch importer and compares this package's forward pass against an
independent torch-functional recomputation of the same architecture, weight
by weight.  Target: max abs deviation well under the 1e-3 rel-L2 budget.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

CKPT = "/root/reference/checkpoints/ep400_sim100.pt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference checkpoint not available"
)


def torch_reference_forward(sd, fx_np, H=64, W=64, heads=8, ref=8):
    """Independent torch-functional Transolver-2D forward from a state dict."""
    import torch
    import torch.nn.functional as F

    t = {k: v.float() for k, v in sd.items()}
    B = fx_np.shape[0]
    N = H * W

    # unified-pos anchor distances
    gx = torch.linspace(0, 1, H)
    gy = torch.linspace(0, 1, W)
    mx, my = torch.meshgrid(gx, gy, indexing="ij")
    pts = torch.stack([mx.reshape(-1), my.reshape(-1)], -1)
    ax = torch.linspace(0, 1, ref)
    amx, amy = torch.meshgrid(ax, ax, indexing="ij")
    anchors = torch.stack([amx.reshape(-1), amy.reshape(-1)], -1)
    pos = torch.sqrt(((pts[:, None] - anchors[None]) ** 2).sum(-1))  # [N, 64]
    pos = pos[None].repeat(B, 1, 1)

    fx = torch.tensor(fx_np)
    z = torch.cat([pos, fx], -1)
    z = F.gelu(F.linear(z, t["preprocess.linear_pre.0.weight"], t["preprocess.linear_pre.0.bias"]))
    z = F.linear(z, t["preprocess.linear_post.weight"], t["preprocess.linear_post.bias"])

    n_layers = 8
    hidden = z.shape[-1]
    dim_head = hidden // heads
    for i in range(n_layers):
        p = f"blocks.{i}."
        h1 = F.layer_norm(z, (hidden,), t[p + "ln_1.weight"], t[p + "ln_1.bias"])
        # conv projections on [B, C, H, W]
        img = h1.reshape(B, H, W, hidden).permute(0, 3, 1, 2)
        fx_mid = F.conv2d(img, t[p + "Attn.in_project_fx.weight"], t[p + "Attn.in_project_fx.bias"], padding=1)
        x_mid = F.conv2d(img, t[p + "Attn.in_project_x.weight"], t[p + "Attn.in_project_x.bias"], padding=1)

        def split(a):
            return (
                a.permute(0, 2, 3, 1).reshape(B, N, heads, dim_head).permute(0, 2, 1, 3)
            )

        fx_mid, x_mid = split(fx_mid), split(x_mid)
        logits = F.linear(x_mid, t[p + "Attn.in_project_slice.weight"], t[p + "Attn.in_project_slice.bias"])
        temp = torch.clamp(t[p + "Attn.temperature"], 0.1, 5.0)
        w = torch.softmax(logits / temp, -1)  # [B, H, N, G]
        tok = torch.einsum("bhnd,bhng->bhgd", fx_mid, w)
        tok = tok / (w.sum(2) + 1e-5)[..., None]
        q = F.linear(tok, t[p + "Attn.to_q.weight"])
        k = F.linear(tok, t[p + "Attn.to_k.weight"])
        v = F.linear(tok, t[p + "Attn.to_v.weight"])
        attn = torch.softmax(q @ k.transpose(-1, -2) * dim_head**-0.5, -1)
        otok = attn @ v
        out = torch.einsum("bhgd,bhng->bhnd", otok, w)
        out = out.permute(0, 2, 1, 3).reshape(B, N, hidden)
        out = F.linear(out, t[p + "Attn.to_out.0.weight"], t[p + "Attn.to_out.0.bias"])
        z = out + z
        h2 = F.layer_norm(z, (hidden,), t[p + "ln_2.weight"], t[p + "ln_2.bias"])
        m = F.gelu(F.linear(h2, t[p + "mlp.linear_pre.0.weight"], t[p + "mlp.linear_pre.0.bias"]))
        m = F.linear(m, t[p + "mlp.linear_post.weight"], t[p + "mlp.linear_post.bias"])
        z = m + z
    h3 = F.layer_norm(z, (hidden,), t["blocks.7.ln_3.weight"], t["blocks.7.ln_3.bias"])
    return F.linear(h3, t["blocks.7.mlp2.weight"], t["blocks.7.mlp2.bias"]).numpy()


def test_forward_parity_vs_reference_checkpoint():
    import torch

    from transformerbasednavierstokesolver_tpu.models import Transolver
    from transformerbasednavierstokesolver_tpu.train.checkpoint import (
        import_torch_state_dict,
    )

    sd = torch.load(CKPT, map_location="cpu", weights_only=True)
    params = import_torch_state_dict(CKPT, geometry="grid2d")

    model = Transolver(
        space_dim=2, n_layers=8, n_hidden=64, n_head=8, fun_dim=10, out_dim=1,
        slice_num=32, ref=8, unified_pos=True, geometry="grid2d", H=64, W=64,
        precision="highest",
    )
    rng = np.random.default_rng(0)
    fx = rng.normal(size=(2, 4096, 10)).astype(np.float32)
    x = np.zeros((2, 4096, 2), np.float32)  # unified_pos replaces x

    out_jax = np.asarray(
        model.apply({"params": params}, jnp.asarray(x), jnp.asarray(fx))
    )
    out_ref = torch_reference_forward(sd, fx)

    err = np.abs(out_jax - out_ref).max()
    rel = np.linalg.norm(out_jax - out_ref) / np.linalg.norm(out_ref)
    assert rel < 1e-3, (err, rel)
    assert err < 5e-3, (err, rel)


def test_import_export_roundtrip():
    import torch

    from transformerbasednavierstokesolver_tpu.train.checkpoint import (
        export_torch_state_dict,
        import_torch_state_dict,
    )

    sd = torch.load(CKPT, map_location="cpu", weights_only=True)
    params = import_torch_state_dict(CKPT, geometry="grid2d")
    back = export_torch_state_dict(params, geometry="grid2d")
    for k, v in sd.items():
        np.testing.assert_allclose(
            back[k], v.numpy(), rtol=1e-6, atol=1e-7, err_msg=k
        )
