"""Dissect the padded-mega forward NaN on the dumped failing case.

``probe_mega_nan_bisect.py --dump-at K`` saves the exact (params, batch)
whose mega forward is NaN while the XLA forward is finite
(tools/_nan_case.{msgpack,npz}).  This tool localizes the divergence:

1. fwd loss under mega / xla / mega+precision-highest (is it a
   default-MXU-precision artifact?)
2. capture_intermediates over the mega forward: first non-finite module
   output (which layer, which stage)
3. pure-f32 recompute of the failing layer's slice-softmax logits to
   measure their magnitude (the overflow-hypothesis check: the packed
   softmax's max-broadcast rides an MXU matmul whose default-precision
   rounding can under-subtract when |logits| is huge, overflowing exp)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("TBNSS_MEGA_PADDED", "1")

import numpy as np


def main():
    from transformerbasednavierstokesolver_tpu.utils.platform import (
        select_platform,
    )

    select_platform()
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from transformerbasednavierstokesolver_tpu.models import get_model

    with open("tools/_nan_case.msgpack", "rb") as f:
        params = serialization.msgpack_restore(f.read())["params"]
    d = np.load("tools/_nan_case.npz")
    x, fx, y, tt = (jnp.asarray(d[k]) for k in ("x", "fx", "y", "tt"))
    s1, s2 = 101, 31

    def build_model(impl, precision=None):
        return get_model("Transolver_Structured_Mesh_2D")(
            space_dim=2, n_hidden=128, n_layers=8, Time_Input=True,
            n_head=8, fun_dim=1, out_dim=4, mlp_ratio=1, slice_num=64,
            ref=8, unified_pos=False, H=s1, W=s2, impl=impl,
            precision=precision, dtype=None,
        )

    for impl, prec in [("mega", None), ("xla", None), ("mega", "highest"),
                       ("xla", "highest")]:
        m = build_model(impl, prec)
        out = jax.jit(
            lambda p, x, fx, tt, _m=m: _m.apply({"params": p}, x, fx, tt)
        )(params, x, fx, tt)
        out = np.asarray(out)
        print(f"[{impl}/{prec}] out finite={np.isfinite(out).all()} "
              f"max|out|={np.abs(out[np.isfinite(out)]).max():.4e} "
              f"n_nonfinite={np.size(out) - np.isfinite(out).sum()}",
              flush=True)

    # --- stage 2: capture intermediates under mega -----------------------
    m = build_model("mega")

    @jax.jit
    def run_cap(p, x, fx, tt):
        return m.apply({"params": p}, x, fx, tt,
                       capture_intermediates=True, mutable=["intermediates"])

    out, mut = run_cap(params, x, fx, tt)
    inter = mut["intermediates"]
    print("--- intermediates (first nonfinite flagged) ---")
    for path, leaf in jax.tree_util.tree_leaves_with_path(inter):
        leaf = np.asarray(leaf)
        finite = np.isfinite(leaf)
        tag = "OK " if finite.all() else "NAN"
        mx = np.abs(leaf[finite]).max() if finite.any() else float("nan")
        print(f"{tag} max|.|={mx:12.4e} nbad={leaf.size - finite.sum():8d} "
              f"{jax.tree_util.keystr(path)}", flush=True)

    # --- stage 3: slice-logit magnitudes per layer (pure f32, exact) -----
    print("--- slice-softmax logit magnitude per layer (f32 highest) ---")
    blocks = params["blocks"]["block"]
    n_layers = np.asarray(
        jax.tree_util.tree_leaves(blocks["ln_1"])[0]
    ).shape[0]
    # reconstruct each layer's input from the captured intermediates: the
    # scan stacks each block's output; layer 0's input is the preprocess
    # (+ time embedding) stream, recoverable as intermediates too.  We
    # instead recompute logits from the captured PREVIOUS layer outputs.
    # Find the stacked per-layer block outputs in the intermediates tree.
    stacked = None
    for path, leaf in jax.tree_util.tree_leaves_with_path(inter):
        k = jax.tree_util.keystr(path)
        if "blocks" in k and "__call__" in k and "Attn" not in k \
                and "mlp" not in k and "ln_" not in k:
            leaf = np.asarray(leaf)
            print(f"candidate stacked block outputs: {k} shape={leaf.shape}")
            if leaf.ndim >= 4:
                stacked = leaf
    if stacked is None:
        print("no stacked block outputs found; skipping stage 3")
        return

    import jax.lax as lax

    def layer_logits(xin, li):
        p = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[li], blocks)
        g1 = p["ln_1"]["scale"].astype(jnp.float32)
        b1 = p["ln_1"]["bias"].astype(jnp.float32)
        xin = xin.astype(jnp.float32)
        mu = xin.mean(-1, keepdims=True)
        var = ((xin - mu) ** 2).mean(-1, keepdims=True)
        yn = (xin - mu) * jax.lax.rsqrt(var + 1e-5) * g1 + b1
        B = yn.shape[0]
        yg = yn.reshape(B, s1, s2, -1)
        kx = p["Attn"]["in_project_x"]["kernel"].astype(jnp.float32)
        bx = p["Attn"]["in_project_x"]["bias"].astype(jnp.float32)
        xm = lax.conv_general_dilated(
            yg, kx, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        ) + bx
        xm = xm.reshape(B, s1 * s2, -1)
        ks = p["Attn"]["in_project_slice_kernel"].astype(jnp.float32)
        bs_ = p["Attn"]["in_project_slice_bias"].astype(jnp.float32)
        H, D, G = 8, 16, 64
        xh = xm.reshape(B, s1 * s2, H, D)
        logits = jnp.einsum("bnhd,dg->bnhg", xh, ks.reshape(D, G)
                            if ks.ndim == 2 and ks.shape[0] == D else ks,
                            precision=jax.lax.Precision.HIGHEST) + bs_
        temp = jnp.clip(p["Attn"]["temperature"].astype(jnp.float32),
                        0.1, 5.0)
        return logits / temp.reshape(1, 1, H, 1)

    # layer 0 input: total stream entering the first block is not directly
    # dumped; approximate by running the xla model up to blocks via
    # capture (the 'preprocess' intermediate) if present.
    prev = None
    for path, leaf in jax.tree_util.tree_leaves_with_path(inter):
        k = jax.tree_util.keystr(path)
        if "preprocess" in k and "__call__" in k:
            prev = np.asarray(leaf)
            print(f"block-0 input candidate: {k} shape={prev.shape}")
    for li in range(n_layers):
        xin = jnp.asarray(prev if li == 0 else stacked[li - 1]) \
            if prev is not None else None
        if xin is None and li == 0:
            continue
        z = np.asarray(jax.jit(layer_logits)(xin, li))
        fin = np.isfinite(z)
        print(f"layer {li}: max|z/temp|={np.abs(z[fin]).max():.4e} "
              f"nonfinite={z.size - fin.sum()}", flush=True)


if __name__ == "__main__":
    main()
