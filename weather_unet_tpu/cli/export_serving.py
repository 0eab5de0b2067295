"""Export the serving forward to a portable StableHLO artifact.

The reference deploys by shipping ``.pt`` pickles plus the whole source tree
(``demo.py:51-54`` rebuilds the nn.Module to unpickle into); this CLI emits
the TPU-native replacement: a self-contained, shape-polymorphic compiler
artifact (``core/export.py``) a consumer runs with jax alone — no model
code, no checkpoint, any batch size.

Example:
  wut-export-serving --cp_path cp/transfer/run/ckpt.msgpack \
      --out artifacts/cunet_b256 --dtype bf16 --check
"""

from __future__ import annotations

import argparse
import json


def build_parser():
    p = argparse.ArgumentParser(description="export serving StableHLO artifact")
    p.add_argument("--cp_path", required=True,
                   help="msgpack checkpoint or reference .pt GAN bundle")
    p.add_argument("--out", required=True, help="artifact directory to write")
    p.add_argument("--input_size", type=int, default=256)
    p.add_argument("--num_classes", type=int, default=5)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    p.add_argument("--batch", type=int, default=None,
                   help="pin the batch dimension (default: symbolic — the "
                        "artifact accepts any batch size)")
    p.add_argument("--platforms", type=str, default=None,
                   help="comma list, e.g. 'tpu,cpu' for a multi-platform "
                        "module (default: current backend only)")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and verify it matches the live "
                        "model on a small batch before reporting success")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np
    import jax.numpy as jnp

    from weather_unet_tpu.cli.common import load_transfer
    from weather_unet_tpu.core.export import (export_transfer, save_artifact,
                                              load_artifact)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model, variables = load_transfer(args.cp_path,
                                     num_classes=args.num_classes,
                                     dtype=dtype)
    platforms = args.platforms.split(",") if args.platforms else None
    exps = export_transfer(model, variables, size=args.input_size,
                           batch=args.batch, platforms=platforms)
    save_artifact(args.out, exps, extra={
        "checkpoint": args.cp_path,
        "input_size": args.input_size,
        "num_classes": args.num_classes,
        "dtype": args.dtype,
    })
    if args.check:
        b = args.batch or 2
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(
            (b, args.input_size, args.input_size, 3)).astype(np.float32)
            ).astype(dtype)
        c = jnp.asarray(np.eye(args.num_classes, dtype=np.float32)[
            rng.integers(0, args.num_classes, b)]).astype(dtype)
        got = load_artifact(args.out)["translate"](x, c)
        want = model.apply(variables, x, c)
        mae = float(jnp.abs(got.astype(jnp.float32)
                            - want.astype(jnp.float32)).max())
        if mae > 1e-5:
            raise SystemExit(f"export check FAILED: max abs diff {mae}")
    print(json.dumps({"artifact": args.out,
                      "modules": sorted(exps.keys()),
                      "batch": args.batch or "symbolic",
                      "checked": bool(args.check)}))


if __name__ == "__main__":
    main()
