"""Direct TPU confirmation of the padded-mega softmax overflow NaN + fix.

Mechanism (root-caused from logs/probe_nan_bisect_r5.log, replay update
1973): the packed per-head slice softmax broadcasts its per-head max back
over the head segment via a one-hot matmul; at the TPU's default MXU
precision the f32 max operand is rounded through bf16 passes, so
``z - max`` can come out positive by ~|max| * 2^-8.  Once training drifts
|logits / temperature| past ~2^8 * 88 ~ 2.3e4, ``exp`` overflows, the
denominator goes inf, and w = inf/inf = NaN — with *finite params* and a
finite XLA forward on the same batch.

This probe manufactures that regime deterministically: init a plasticity-
shaped model (101x31, the padded masked-tail mega plan), scale
``in_project_slice_kernel`` and pin ``temperature`` at the 0.1 clamp floor
until |z| sweeps 1e3 -> 1e5, then compare mega vs XLA forwards on the real
chip.  With the ``_seg_dot``/clamp fix (ops/pallas_attention_v2.py) the
mega forward must stay finite and track XLA at every magnitude; before the
fix it NaN'd in the 2e4+ band.

Run: TBNSS_MEGA_PADDED=1 python tools/probe_mega_biglogits.py
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

    from transformerbasednavierstokesolver_tpu.models import get_model

    s1, s2 = 101, 31

    def build_model(impl):
        return get_model("Transolver_Structured_Mesh_2D")(
            space_dim=2, n_hidden=128, n_layers=8, Time_Input=True,
            n_head=8, fun_dim=1, out_dim=4, mlp_ratio=1, slice_num=64,
            ref=8, unified_pos=False, H=s1, W=s2, impl=impl,
            precision=None, dtype=None,
        )

    rng = np.random.default_rng(0)
    B = 4
    x = jnp.asarray(rng.standard_normal((B, s1 * s2, 2)), jnp.float32)
    fx = jnp.asarray(rng.standard_normal((B, s1 * s2, 1)), jnp.float32)
    tt = jnp.asarray(rng.uniform(0, 1, (B, 1)), jnp.float32)

    m_xla = build_model("xla")
    params = m_xla.init(jax.random.PRNGKey(0), x[:1], fx[:1], tt[:1])[
        "params"
    ]
    m_mega = build_model("mega")

    fwd = {
        impl: jax.jit(
            lambda p, x, fx, tt, _m=m: _m.apply({"params": p}, x, fx, tt)
        )
        for impl, m in [("xla", m_xla), ("mega", m_mega)]
    }

    def with_scale(scale):
        p = jax.tree_util.tree_map(lambda a: a, params)
        blk = dict(p["blocks"]["block"])
        attn = dict(blk["Attn"])
        attn["in_project_slice_kernel"] = (
            attn["in_project_slice_kernel"] * scale
        )
        # pin temperature at the clamp floor (0.1) -> invt = 10
        attn["temperature"] = jnp.full_like(attn["temperature"], 0.05)
        blk["Attn"] = attn
        p = dict(p)
        p["blocks"] = {"block": blk}
        return p

    print("scale  |z|max(layer0,f32-exact)   xla_out        mega_out")
    ok = True
    for scale in [1.0, 30.0, 100.0, 300.0, 1000.0, 3000.0]:
        p = with_scale(scale)
        outs = {}
        for impl in ("xla", "mega"):
            o = np.asarray(fwd[impl](p, x, fx, tt))
            fin = np.isfinite(o)
            outs[impl] = (
                fin.all(),
                float(np.abs(o[fin]).max()) if fin.any() else float("nan"),
                int(o.size - fin.sum()),
            )
        # exact logit magnitude estimate: ||k_slice|| ~ scale, x~N(0,1)
        xla_f, xla_m, xla_n = outs["xla"]
        meg_f, meg_m, meg_n = outs["mega"]
        rel = (
            float(
                np.linalg.norm(
                    np.asarray(fwd["mega"](p, x, fx, tt), np.float64)
                    - np.asarray(fwd["xla"](p, x, fx, tt), np.float64)
                )
                / (np.linalg.norm(
                    np.asarray(fwd["xla"](p, x, fx, tt), np.float64)) + 1e-20)
            )
            if xla_f and meg_f
            else float("nan")
        )
        print(
            f"{scale:7.1f}  xla[finite={xla_f} max={xla_m:.3e} bad={xla_n}]"
            f"  mega[finite={meg_f} max={meg_m:.3e} bad={meg_n}]"
            f"  rel={rel:.3e}",
            flush=True,
        )
        if xla_f and not meg_f:
            ok = False
    print("PROBE " + ("PASS: mega finite wherever xla is" if ok
                      else "FAIL: mega NaN where xla finite"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
