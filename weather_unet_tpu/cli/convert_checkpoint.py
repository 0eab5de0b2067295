"""Checkpoint converter: our msgpack ⇄ reference PyTorch formats.

Subcommands:
  to-torch    msgpack GAN/resnet checkpoint -> .pt (reference layout)
  from-torch  reference .pt -> msgpack

Examples:
  python -m weather_unet_tpu.cli.convert_checkpoint to-torch \
      --kind gan --input cp/transfer/run/ckpt_s0000001000.msgpack --output gan.pt
  python -m weather_unet_tpu.cli.convert_checkpoint from-torch \
      --kind resnet --input est_resnet101.pt --output est.msgpack
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="checkpoint format conversion")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("to-torch", "from-torch"):
        s = sub.add_parser(name)
        s.add_argument("--kind", choices=["gan", "resnet"], required=True)
        s.add_argument("--input", required=True)
        s.add_argument("--output", required=True)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np

    from weather_unet_tpu.compat import torch_io
    from weather_unet_tpu.train import checkpoint as ckpt

    if args.cmd == "to-torch":
        state = ckpt.restore_checkpoint(args.input, None)
        if args.kind == "gan":
            ckpt.export_torch_gan(
                args.output,
                {"params": state["gen"]["params"]},
                {"params": state["disc"]["params"], "spectral": state["spectral"]},
                int(np.asarray(state.get("epoch", 0))),
                int(np.asarray(state.get("global_step", 0))))
        else:
            import torch

            sd = torch_io.resnet_to_torch(
                {"params": state["params"], "batch_stats": state["batch_stats"]})
            torch.save({k: torch.from_numpy(np.array(v, copy=True))
                        for k, v in sd.items()}, args.output)
    else:  # from-torch
        if args.kind == "gan":
            bundle = torch_io.gan_checkpoint_from_torch(args.input)
            tree = {
                "gen": {"params": bundle["inference"]["params"]},
                "disc": {"params": bundle["discriminator"]["params"]},
                "spectral": bundle["discriminator"]["spectral"],
                "epoch": bundle["epoch"], "global_step": bundle["global_step"],
            }
        else:
            variables = torch_io.resnet_from_torch(
                torch_io.load_torch_file(args.input))
            tree = variables
        # honor --output LITERALLY (it used to land at
        # <dir>/<name>/ckpt_s0000000000.msgpack, so the file the user named
        # never existed — review finding, round 5; to-torch always honored
        # it)
        path = ckpt.save_checkpoint_file(args.output, tree)
        print(f"wrote {path}")
        return
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
