"""Train the ResNet-101 5-class weather classifier.

Rebuild of reference ``classifier.py`` (flags ``classifier.py:10-22``):
cross-entropy on i2w classes, Adam(1e-4, wd 1e-4), imbalanced sampler,
eval every 500 iterations, checkpoint every 5 epochs.
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="train weather classifier")
    p.add_argument("--image_root", type=str, default=None,
                   help="parity flag; paths come from the split pkl")
    p.add_argument("--pkl_path", type=str, required=True,
                   help="i2w split pickle {'train': paths, 'test': paths}")
    p.add_argument("--save_path", type=str, default="cp/classifier")
    p.add_argument("--log_dir", type=str, default="runs")
    p.add_argument("--name", type=str, default="noname-classifier")
    p.add_argument("--gpu", type=str, default="0", help="parity flag; ignored")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--wd", type=float, default=1e-4)
    p.add_argument("--num_epoch", type=int, default=100)
    p.add_argument("--batch_size", "-bs", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--augmentation", action="store_true")
    p.add_argument("--pre_trained", action="store_true")
    p.add_argument("--decode_cache", type=str, default=None,
                   help="decoded-image memmap cache dir: JPEGs decode once "
                        "(first epoch), later epochs only augment "
                        "(data/cache.py)")
    p.add_argument("--aot_cache", type=str, default=None,
                   help="directory for serialized compiled step "
                        "executables (core/aot.py)")
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                   help="compute dtype (params stay f32)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from weather_unet_tpu.parallel.launch import maybe_initialize

    maybe_initialize()   # multi-host: must run before backend init
    from weather_unet_tpu.core.profiling import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from weather_unet_tpu.core.optim import torch_adam
    from weather_unet_tpu.core.state import TrainState
    from weather_unet_tpu.data.datasets import ClassImageDataset
    from weather_unet_tpu.data.pipeline import BatchLoader
    from weather_unet_tpu.data.sampler import ImbalancedSampler
    from weather_unet_tpu.data.transforms import make_train_augment
    from weather_unet_tpu.cli.common import ResNet101
    from weather_unet_tpu.train.loops import train_supervised
    from weather_unet_tpu.train.metrics import SummaryWriter, run_comment
    from weather_unet_tpu.train.supervised import (
        make_classifier_step, make_eval_metrics, resnet_pretrained_mask)

    import pandas as pd

    sep = pd.read_pickle(args.pkl_path)
    base = args.input_size if not args.augmentation else int(args.input_size * 1.15)
    aug = make_train_augment(args.input_size, resized_crop=args.augmentation,
                      brightness=0.5 if args.augmentation else 0.0,
                      contrast=0.3 if args.augmentation else 0.0,
                      saturation=0.3 if args.augmentation else 0.0)
    from weather_unet_tpu.cli.common import wrap_decode_cache

    from weather_unet_tpu.data.datasets import filter_i2w_paths

    aug = wrap_decode_cache(aug, args.decode_cache, base,
                            filter_i2w_paths(sep["train"]))
    train_set = ClassImageDataset(sep["train"], out_size=base, transform=aug)
    test_set = ClassImageDataset(sep["test"], out_size=args.input_size)

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = ResNet101(num_classes=5, dtype=dt)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, args.input_size, args.input_size, 3)))
    mask = resnet_pretrained_mask(variables["params"]) if args.pre_trained else None
    state = TrainState.create(
        variables["params"], torch_adam(args.lr, weight_decay=args.wd),
        extra=variables["batch_stats"])

    def train_loader():
        return BatchLoader(train_set, batch_size=args.batch_size,
                           sampler=ImbalancedSampler(train_set),
                           num_workers=args.num_workers, process_shard=True)

    def test_loader():
        # single-process: keep the tail (the eval sweep pads+masks it —
        # train/loops.py::_padded_eval_batches — matching the reference
        # DataLoader's drop_last=False); multi-process: drop it, all ranks
        # must assemble identical global batch shapes in lockstep
        return BatchLoader(test_set, batch_size=args.batch_size,
                           drop_last=jax.process_count() > 1,
                           num_workers=args.num_workers, process_shard=True)

    writer = SummaryWriter(log_dir=args.log_dir, comment=run_comment(
        args.lr, args.batch_size, args.num_epoch, args.name))

    train_supervised(
        model, make_classifier_step(model, mask),
        make_eval_metrics(model, "classifier"),
        train_loader, test_loader, state=state, batch_size=args.batch_size,
        num_epoch=args.num_epoch,
        writer=writer, input_size=args.input_size, save_dir=args.save_path, name=args.name,
        eval_per_iter=500, target_dtype=jnp.int32,
        aot_cache=args.aot_cache)
    print("Done: training")


if __name__ == "__main__":
    main()
