"""GAN transfer training with class conditions (classifier variant).

Rebuild of reference ``t_cls_train.py``: one-hot (supervised) or
classifier-softmax (semi-supervised) conditions over 5 weather classes, on the
i2w directory dataset or the flickr dataframe (``t_cls_train.py:110-144``).
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="train weather transfer (classifier)")
    p.add_argument("--image_root", type=str, required=True)
    p.add_argument("--name", type=str, default="cUNet")
    p.add_argument("--gpu", type=str, default="0", help="parity flag; ignored")
    p.add_argument("--save_dir", type=str, default="cp/transfer")
    p.add_argument("--log_dir", type=str, default="runs")
    p.add_argument("--pkl_path", type=str, default=None,
                   help="dataframe / split pickle (required unless --image_only)")
    p.add_argument("--estimator_path", type=str, required=True,
                   help="frozen classifier .pt / msgpack")
    p.add_argument("--dataset", type=str, default="flicker", choices=["flicker", "i2w"])
    p.add_argument("--supervised", action="store_true")
    p.add_argument("--cross_ent", action="store_true")
    p.add_argument("--one_hot", action="store_true",
                   help="parity flag; evaluation labels are ALWAYS one-hotted "
                        "here.  Both datasets yield int class ids for the "
                        "cached test batches, and the reference's non-one_hot "
                        "branch crashes on them (t_cls_train.py:330-337: "
                        "torch.cat over 0-d int labels), so there is no "
                        "working non-one_hot behavior to reproduce")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lmda", type=float, default=None)
    p.add_argument("--num_epoch", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--GD_train_ratio", type=int, default=1)
    p.add_argument("--sampler", action="store_true")
    p.add_argument("--augmentation", action="store_true")
    p.add_argument("--image_only", action="store_true",
                   help="train from a raw image directory (no pkl), 70/30 "
                        "split, conditions entirely from the frozen "
                        "classifier; skips evaluation like the reference "
                        "(t_cls_train.py:119,138-144,441)")
    p.add_argument("--export_torch", action="store_true")
    p.add_argument("--decode_cache", type=str, default=None,
                   help="decoded-image memmap cache dir: JPEGs decode once "
                        "(first epoch), later epochs only augment — lifts "
                        "loader-bound training on decode-poor hosts "
                        "(data/cache.py; bench_trainer_loop.py --real-data)")
    p.add_argument("--nan_guard", action="store_true",
                   help="on non-finite metrics, roll back to the newest "
                        "checkpoint and retry with a re-seeded RNG stream "
                        "(bounded; see WeatherTransferTrainer)")
    p.add_argument("--aot_cache", type=str, default=None,
                   help="directory for serialized compiled step executables; "
                        "a restarted run skips the multi-minute XLA step "
                        "compile (core/aot.py)")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="channel-shard the WHOLE train state K-way over the "
                        "mesh 'model' axis (Megatron column/row split per "
                        "double conv, parallel/tp.py); remaining devices "
                        "form the 'data' axis")
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                   help="compute dtype for the train step (params stay f32); "
                        "bf16 is the measured TPU config (bench_train.py)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.image_only:
        # a bare directory has no labels: supervised conditions
        # (t_cls_train.py:421 one-hots dataset class ids) and the imbalance
        # sampler (needs per-item classes) are impossible — the reference
        # would crash later (its image_only branch never sets num_classes,
        # t_cls_train.py:110-116); refuse up front instead
        if args.supervised:
            raise SystemExit("--image_only has no dataset labels; "
                             "--supervised requires them")
        if args.sampler:
            raise SystemExit("--image_only has no class labels for the "
                             "imbalance sampler; drop --sampler")
    elif args.pkl_path is None:
        raise SystemExit("--pkl_path is required unless --image_only")
    from weather_unet_tpu.parallel.launch import maybe_initialize

    multiproc = maybe_initialize()   # multi-host: must run before backend init
    from weather_unet_tpu.core.profiling import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from weather_unet_tpu.cli.common import load_estimator
    from weather_unet_tpu.data.datasets import (
        ClassImageDataset, FlickrDataset, SIGNAL_COLUMNS, flickr_image_path)
    from weather_unet_tpu.data.pipeline import BatchLoader
    from weather_unet_tpu.data.sampler import ImbalancedSampler
    from weather_unet_tpu.data.transforms import normalize_batch
    from weather_unet_tpu.train.gan import GanConfig
    from weather_unet_tpu.train.loops import WeatherTransferTrainer

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = GanConfig(
        num_classes=5, lr=args.lr, input_size=args.input_size,
        batch_size=args.batch_size, gd_train_ratio=args.GD_train_ratio,
        mode="cls", supervised=args.supervised, cross_ent=args.cross_ent,
        # image_only has no dataset labels: cross_ent targets must come from
        # the classifier's argmax (the 'flicker' semi-supervised branch of
        # the step, train/gan.py) rather than from c_r
        dataset="flicker" if args.image_only else args.dataset,
        lmda=args.lmda, num_epoch=args.num_epoch, dtype=dt)

    # raw logits; gan step softmaxes
    est_apply = load_estimator(args.estimator_path, dtype=dt)

    import pandas as pd

    from weather_unet_tpu.data.transforms import make_train_augment

    # host-side train augmentation in the loader threads (reference CPU-worker
    # design, t_cls_train.py:81-102); device path only normalizes
    aug = make_train_augment(args.input_size, resized_crop=args.augmentation,
                      brightness=0.5 if args.augmentation else 0.0,
                      contrast=0.3 if args.augmentation else 0.0,
                      saturation=0.3 if args.augmentation else 0.0)
    base = args.input_size if not args.augmentation else int(args.input_size * 1.15)
    from weather_unet_tpu.cli.common import wrap_decode_cache

    if args.image_only:
        # raw directory, 70/30 split; conditions come entirely from the
        # frozen classifier and evaluation is skipped
        # (t_cls_train.py:119,138-144,441)
        from weather_unet_tpu.cli.common import list_images
        from weather_unet_tpu.data.datasets import ImagePathDataset

        paths = list_images(args.image_root)
        pivot = int(len(paths) * 0.7)
        aug = wrap_decode_cache(aug, args.decode_cache, base, paths[:pivot])
        train_set = ImagePathDataset(paths[:pivot], out_size=base, transform=aug)
        test_set = None
    elif args.dataset == "i2w":
        sep = pd.read_pickle(args.pkl_path)  # {'train': paths, 'test': paths}
        from weather_unet_tpu.data.datasets import filter_i2w_paths

        aug = wrap_decode_cache(aug, args.decode_cache, base,
                                filter_i2w_paths(sep["train"]))
        mk = lambda split: ClassImageDataset(sep[split], out_size=base,
                                             transform=aug)
        train_set = mk("train")
        test_set = ClassImageDataset(sep["test"], out_size=args.input_size)
    else:
        # multi-host: identical shuffle on every process (loaders re-shard rows)
        df = pd.read_pickle(args.pkl_path).sample(
            frac=1, random_state=0 if multiproc else None)
        aug = wrap_decode_cache(
            aug, args.decode_cache, base,
            [flickr_image_path(args.image_root, pid)
             for pid in df[df["mode"] == "train"]["photo"]])
        mk = lambda d, imb: FlickrDataset(args.image_root, d, SIGNAL_COLUMNS,
                                          out_size=base, class_id=False,
                                          imbalance=imb, transform=aug)
        train_set = mk(df[df["mode"] == "train"], args.sampler)
        test_set = FlickrDataset(args.image_root, df[df["mode"] == "test"],
                                 SIGNAL_COLUMNS, out_size=args.input_size,
                                 class_id=False)

    # Independent keyed-RNG stream for the random loader: sharing ONE
    # transform between the two zipped loaders makes the per-path draw
    # counter scheduling-dependent (both streams race for k=0/1 on a path
    # in flight in both) — transforms.fork_stream.
    from weather_unet_tpu.data.datasets import with_transform
    from weather_unet_tpu.data.transforms import fork_stream

    rand_set = with_transform(train_set, fork_stream(aug))

    def train_loader():
        return BatchLoader(train_set, batch_size=args.batch_size, shuffle=True,
                           num_workers=args.num_workers, process_shard=True)

    def random_loader():
        if args.sampler:
            return BatchLoader(rand_set, batch_size=args.batch_size,
                               sampler=ImbalancedSampler(rand_set),
                               num_workers=args.num_workers, process_shard=True)
        return BatchLoader(rand_set, batch_size=args.batch_size, shuffle=True,
                           seed=1, num_workers=args.num_workers,
                           process_shard=True)

    test_batches = None
    if test_set is not None and len(test_set) >= 2 * args.batch_size:
        it = iter(BatchLoader(test_set, batch_size=args.batch_size, shuffle=True,
                              num_workers=args.num_workers))
        tb = []
        for _ in range(2):
            imgs_u8, cls_ids = next(it)[:2]
            labels = jnp.eye(5)[jnp.asarray(cls_ids)]  # t_cls_train.py:327-329
            tb.append((normalize_batch(jnp.asarray(imgs_u8)), labels))
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
    # image_only batches are (img, True) with no class ids (labeled=False);
    # the step then runs fully semi-supervised (conditions = classifier softmax)
    trainer.fit(train_loader, random_loader, test_batches=test_batches,
                labeled=not args.image_only)


if __name__ == "__main__":
    main()
