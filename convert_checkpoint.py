#!/usr/bin/env python
"""Checkpoint converter: reference torch ``.pt`` <-> native flax ``.ckpt``.

Examples:
    # import a reference checkpoint (geometry inferred from the state dict)
    python convert_checkpoint.py import checkpoints/ns_curl_ep400_sim100_unified.pt \
        checkpoints/ns_curl.ckpt --geometry grid2d

    # export a native checkpoint back to a torch-loadable state dict
    python convert_checkpoint.py export checkpoints/darcy_Transolver.ckpt \
        checkpoints/darcy_Transolver.pt --geometry grid2d
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("direction", choices=["import", "export"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--geometry", default="grid2d",
                   choices=["grid2d", "grid3d", "irregular"])
    p.add_argument("--variant", default="standard",
                   choices=["standard", "encoder"])
    args = p.parse_args(argv)

    # conversion is host-side work; don't touch (or hang on) an accelerator
    import jax

    jax.config.update("jax_platforms", "cpu")

    from transformerbasednavierstokesolver_tpu.train.checkpoint import (
        export_torch_state_dict,
        import_torch_state_dict,
        save_params,
    )

    if args.direction == "import":
        params = import_torch_state_dict(
            args.src, geometry=args.geometry, variant=args.variant
        )
        save_params(args.dst, params)
        import jax

        n = sum(x.size for x in jax.tree_util.tree_leaves(params))
        print(f"imported {args.src} -> {args.dst} ({n} params)")
    else:
        import torch

        # structure comes from the file itself (msgpack restore with None
        # template rebuilds the saved tree)
        from flax import serialization

        with open(args.src, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        params = payload["params"]
        sd = export_torch_state_dict(params, geometry=args.geometry)
        torch.save({k: torch.tensor(v) for k, v in sd.items()}, args.dst)
        print(f"exported {args.src} -> {args.dst} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
