"""Distribution probe: reference-trained AE vs our synthetic NS frames.

The reference ships ``sequential_checkpoints/encoder_ep50_head_1.pt``, an
autoencoder trained on the REAL ``NavierStokes_V1e-5_N1200_T20.mat`` frames
(reference ``auto_encoder.py:37-88``: raw ``u``, no normalization, 100 sims x
20 frames).  Running that checkpoint on OUR spectral-solver frames measures
distribution shift: if our generator reproduces the real data's amplitude and
spectral content, the frozen AE should reconstruct our frames at a rel-L2
close to its ~1.2% on real data; a large or strongly time-dependent error
localizes where our regime diverges from the benchmark's.

Usage: python tools/probe_data_distribution.py [path/to/ns_npz]
"""

import sys
import types

import numpy as np

REF = "/root/reference"


def load_ref_encoder(ckpt_path):
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
    import model.Transolver_Structured_Mesh2D_Encoder as enc2d

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    n_hidden = sd["preprocess.linear_post.weight"].shape[0]
    slice_num = sd["blocks.0.Attn.in_project_slice.weight"].shape[0]
    in_dim = sd["preprocess.linear_pre.0.weight"].shape[1]  # fun_dim + ref^2
    ref = int(round((in_dim - 1) ** 0.5))
    model = enc2d.Model(
        space_dim=2, n_layers=n_layers, n_hidden=n_hidden, dropout=0.0,
        n_head=1, Time_Input=False, mlp_ratio=1, fun_dim=1, out_dim=1,
        slice_num=slice_num, ref=ref, unified_pos=1, H=64, W=64,
    )
    model.load_state_dict(sd)
    model.eval()
    print(f"loaded {ckpt_path}: layers={n_layers} hidden={n_hidden} "
          f"slice={slice_num} ref={ref}")
    return model


def main():
    import torch

    npz = sys.argv[1] if len(sys.argv) > 1 else \
        "data/synthetic/ns_v1e-5_fno_s1200_t20_r64.npz"
    u = np.load(npz)["u"]  # (S, 64, 64, 20)
    print(f"data {npz}: {u.shape}, global std {u.std():.4f}")
    model = load_ref_encoder(f"{REF}/sequential_checkpoints/encoder_ep50_head_1.pt")

    x = np.linspace(0, 1, 64)
    xx, yy = np.meshgrid(x, x)
    pos = torch.tensor(np.c_[xx.ravel(), yy.ravel()], dtype=torch.float)[None]

    rng = np.random.default_rng(0)
    sims = rng.choice(u.shape[0], size=min(16, u.shape[0]), replace=False)
    T = u.shape[-1]
    print(f"{'t':>3} {'std':>7} {'recon_relL2':>12}")
    per_t = []
    with torch.no_grad():
        for t in range(T):
            frames = torch.tensor(
                u[sims, :, :, t].reshape(len(sims), -1, 1), dtype=torch.float
            )
            p = pos.expand(len(sims), -1, -1)
            out = model(p, fx=frames)
            rel = (np.linalg.norm((out - frames).numpy().reshape(len(sims), -1), axis=1)
                   / np.linalg.norm(frames.numpy().reshape(len(sims), -1), axis=1))
            per_t.append(rel.mean())
            print(f"{t:3d} {u[sims, :, :, t].std():7.3f} {rel.mean():12.4f}")
    print(f"mean recon rel-L2 over frames: {np.mean(per_t):.4f}")
    print("reference's recorded recon on real data: ~0.012 (VERDICT/ROUND_NOTES)")


if __name__ == "__main__":
    main()
