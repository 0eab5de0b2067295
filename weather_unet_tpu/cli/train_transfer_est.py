"""Semi-supervised GAN transfer training with the signal estimator.

Rebuild of reference ``t_est_train.py`` (flag parity with
``t_est_train.py:4-30``): conditions are the 5 soft z-scored weather signals
predicted by a frozen ResNet-101 estimator; content and random-condition
streams are two loaders over the train split zipped per step.
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="train weather transfer (estimator)")
    p.add_argument("--image_root", type=str, required=True)
    p.add_argument("--name", type=str, default="cUNet")
    p.add_argument("--gpu", type=str, default="0", help="parity flag; ignored")
    p.add_argument("--save_dir", type=str, default="cp/transfer")
    p.add_argument("--log_dir", type=str, default="runs")
    p.add_argument("--pkl_path", type=str, default=None,
                   help="dataframe pickle (required unless --image_only — "
                        "the reference's image_only branch never reads it, "
                        "t_est_train.py:13,116-121)")
    p.add_argument("--stats_pkl", type=str, default=None,
                   help="without-outlier frame for z-scoring (t_est_train.py:126)")
    p.add_argument("--estimator_path", type=str, required=True)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lmda", type=float, default=None)
    p.add_argument("--num_epoch", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--GD_train_ratio", type=int, default=1)
    p.add_argument("--sampler", action="store_true")
    p.add_argument("--augmentation", action="store_true")
    p.add_argument("--image_only", action="store_true")
    p.add_argument("--export_torch", action="store_true",
                   help="also write reference-format .pt checkpoints")
    p.add_argument("--nan_guard", action="store_true",
                   help="on non-finite metrics, roll back to the newest "
                        "checkpoint and retry with a re-seeded RNG stream "
                        "(bounded; see WeatherTransferTrainer)")
    p.add_argument("--aot_cache", type=str, default=None,
                   help="directory for serialized compiled step executables; "
                        "a restarted run skips the multi-minute XLA step "
                        "compile (core/aot.py)")
    p.add_argument("--decode_cache", type=str, default=None,
                   help="decoded-image memmap cache dir: JPEGs decode once "
                        "(first epoch), later epochs only augment — lifts "
                        "loader-bound training on decode-poor hosts "
                        "(data/cache.py; bench_trainer_loop.py --real-data)")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="channel-shard the WHOLE train state K-way over the "
                        "mesh 'model' axis (Megatron column/row split per "
                        "double conv, parallel/tp.py); remaining devices "
                        "form the 'data' axis")
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                   help="compute dtype for the train step (params stay f32); "
                        "bf16 is the measured TPU config — 332 img/s at "
                        "B=128 vs 189 img/s f32 B=8 (bench_train.py)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if not args.image_only and args.pkl_path is None:
        raise SystemExit("--pkl_path is required unless --image_only")
    from weather_unet_tpu.parallel.launch import maybe_initialize

    multiproc = maybe_initialize()   # multi-host: must run before backend init
    from weather_unet_tpu.core.profiling import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from weather_unet_tpu.cli.common import load_estimator, load_flickr_frame
    from weather_unet_tpu.data.datasets import (
        FlickrDataset, SIGNAL_COLUMNS, flickr_image_path)
    from weather_unet_tpu.data.pipeline import BatchLoader
    from weather_unet_tpu.data.sampler import ImbalancedSampler
    from weather_unet_tpu.data.transforms import normalize_batch
    from weather_unet_tpu.train.gan import GanConfig
    from weather_unet_tpu.train.loops import WeatherTransferTrainer

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = GanConfig(
        num_classes=len(SIGNAL_COLUMNS), lr=args.lr,
        input_size=args.input_size, batch_size=args.batch_size,
        gd_train_ratio=args.GD_train_ratio, mode="est",
        lmda=args.lmda, num_epoch=args.num_epoch, dtype=dt)

    est_apply = load_estimator(args.estimator_path, dtype=dt)

    from weather_unet_tpu.data.transforms import make_train_augment

    # host-side train augmentation in the loader threads (reference CPU-worker
    # design, t_est_train.py:76-103); device path only normalizes
    aug = make_train_augment(args.input_size, resized_crop=args.augmentation,
                      brightness=0.5 if args.augmentation else 0.0,
                      contrast=0.3 if args.augmentation else 0.0,
                      saturation=0.3 if args.augmentation else 0.0)
    base = args.input_size if not args.augmentation else int(args.input_size * 1.15)
    from weather_unet_tpu.cli.common import wrap_decode_cache

    if args.image_only:
        # raw directory, 70/30 split (t_est_train.py:116-121); conditions come
        # entirely from the frozen estimator
        from weather_unet_tpu.cli.common import list_images
        from weather_unet_tpu.data.datasets import ImagePathDataset

        paths = list_images(args.image_root)
        pivot = int(len(paths) * 0.7)
        aug = wrap_decode_cache(aug, args.decode_cache, base, paths[:pivot])
        train_set = ImagePathDataset(paths[:pivot], out_size=base, transform=aug)
        test_df = None
    else:
        df, _, _ = load_flickr_frame(args.pkl_path, stats_pkl=args.stats_pkl)
        # multi-host: every process must draw the SAME shuffle (the loaders
        # re-shard each batch by process rank), so pin the random_state there
        df = df.sample(frac=1, random_state=0 if multiproc else None)
        train_df = df[df["mode"] == "train"]
        test_df = df[df["mode"] == "test"]
        aug = wrap_decode_cache(
            aug, args.decode_cache, base,
            [flickr_image_path(args.image_root, pid)
             for pid in train_df["photo"]])
        mk = lambda d, imb: FlickrDataset(args.image_root, d, SIGNAL_COLUMNS,
                                          out_size=base, imbalance=imb,
                                          transform=aug)
        train_set = mk(train_df, False)

    # independent keyed-RNG stream for the random loader (same rationale as
    # train_transfer_cls: shared transform = scheduling-dependent k race)
    from weather_unet_tpu.data.datasets import with_transform
    from weather_unet_tpu.data.transforms import fork_stream

    rand_set = with_transform(train_set, fork_stream(aug))

    def train_loader():
        return BatchLoader(train_set, batch_size=args.batch_size, shuffle=True,
                           num_workers=args.num_workers, process_shard=True)

    def random_loader():
        if args.sampler:
            # reference t_est builds the sampled loader over the SAME dataset
            # (condition2 class labels), not w_condition (t_est_train.py:183-189)
            return BatchLoader(rand_set, batch_size=args.batch_size,
                               sampler=ImbalancedSampler(rand_set),
                               num_workers=args.num_workers, process_shard=True)
        return BatchLoader(rand_set, batch_size=args.batch_size, shuffle=True,
                           seed=1, num_workers=args.num_workers,
                           process_shard=True)

    # two cached test batches (t_est_train.py:198-207)
    test_batches = None
    if test_df is not None and len(test_df) >= 2 * args.batch_size:
        test_set = FlickrDataset(args.image_root, test_df, SIGNAL_COLUMNS,
                                 out_size=args.input_size)
        it = iter(BatchLoader(test_set, batch_size=args.batch_size, shuffle=True,
                              num_workers=args.num_workers))
        tb = []
        for _ in range(2):
            imgs_u8, conds, _ = next(it)
            tb.append((normalize_batch(jnp.asarray(imgs_u8)),
                       jnp.asarray(conds)))
        test_batches = tuple(tb)

    plan = None
    if args.tensor_parallel > 1:
        from weather_unet_tpu.parallel.mesh import make_mesh

        plan = make_mesh(model=args.tensor_parallel,
                         batch_size=args.batch_size)
    trainer = WeatherTransferTrainer(
        cfg, est_apply, save_dir=args.save_dir, name=args.name,
        log_dir=args.log_dir, augment=args.augmentation,
        export_torch=args.export_torch, nan_guard=args.nan_guard,
        aot_cache=args.aot_cache, plan=plan,
        tensor_parallel=args.tensor_parallel > 1)
    trainer.fit(train_loader, random_loader, test_batches=test_batches)


if __name__ == "__main__":
    main()
