"""Inception Score CLI — rebuild of reference ``eval/inception_score.py``.

The reference metric (``eval/inception_score.py:29,64-76``) scores a
directory with *stock torchvision* ``inception_v3(pretrained=True,
transform_input=False)``: images resized to ``--input_size``, normalized to
[-1,1], bilinear-upsampled to 299, softmax over the 1000-way ImageNet head,
IS over ``--splits`` chunks.

Weight handling (no egress in this environment — a checkpoint must be
provided locally, mirroring the FID CLI's policy in ``evaluation/fid.py``):

* 1000-way torchvision ``inception_v3`` ``.pth``  → the reference-comparable
  metric (stock graph: count_include_pad avg pools, Mixed_7c avg pool).
* 1008-way TF-ported FID checkpoint (pt_inception-2015-12-05) → scored with
  the FID graph and labeled loudly: a *different* metric, NOT comparable to
  the reference's torchvision IS.
* no weights → refused unless ``--allow-random-weights`` (structure-only
  smoke scoring), symmetric with FID's random-weight refusal.
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="Inception Score")
    p.add_argument("--image_dir", type=str, required=True)
    p.add_argument("--input_size", type=int, default=224,
                   help="pre-resize before the 299 upsample "
                        "(eval/inception_score.py:14,104-107)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--splits", type=int, default=10)
    p.add_argument("--weights", type=str, default=None,
                   help="local torchvision inception_v3 .pth (1000-way, "
                        "reference-comparable) or TF-ported FID checkpoint "
                        "(1008-way, labeled non-comparable)")
    p.add_argument("--allow-random-weights", action="store_true",
                   help="permit structure-only smoke scoring with random "
                        "weights (meaningless as a metric)")
    p.add_argument("--gpu", type=str, default="", help="parity flag; ignored")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np
    import jax
    import jax.numpy as jnp

    from weather_unet_tpu.cli.common import list_images
    from weather_unet_tpu.evaluation.fid import _image_batches
    from weather_unet_tpu.evaluation.inception_score import inception_score_from_probs
    from weather_unet_tpu.models.inception_fid import InceptionV3FID

    files = list_images(args.image_dir)

    if args.weights:
        from weather_unet_tpu.compat.torch_io import inception_from_torch, load_torch_file

        variables = inception_from_torch(load_torch_file(args.weights))
        if "fc" not in variables["params"]:
            raise SystemExit(
                f"{args.weights} has no fc head; Inception Score needs class "
                "logits (a pool3-only checkpoint can score FID, not IS)")
        num_logits = variables["params"]["fc"]["bias"].shape[0]
        torchvision_stock = num_logits == 1000
        model = InceptionV3FID(with_logits=True, num_logits=num_logits,
                               tf_variant=not torchvision_stock)
        if torchvision_stock:
            print("torchvision inception_v3 weights (1000-way): "
                  "reference-comparable Inception Score")
        else:
            print(f"WARNING: {num_logits}-way TF-variant head: scoring with "
                  "the FID graph. This is a DIFFERENT metric from the "
                  "reference's torchvision IS; numbers are not comparable.")
    elif args.allow_random_weights:
        model = InceptionV3FID(with_logits=True, num_logits=1000,
                               tf_variant=False)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
        print("WARNING: random Inception weights; scores are structural "
              "smoke values only, meaningless as a metric")
    else:
        raise SystemExit(
            "Inception Score with random weights is meaningless; provide a "
            "local checkpoint via --weights (torchvision inception_v3 .pth "
            "for the reference metric) or pass --allow-random-weights for a "
            "structure-only smoke run")

    @jax.jit
    def probs_fn(batch):
        # [0,1] input; normalize_input gives the reference's Normalize(0.5)
        # [-1,1]; resize_input the nn.Upsample(299) (align_corners=False) —
        # eval/inception_score.py:67,104-107
        logits = model.apply(variables, jnp.asarray(batch, jnp.float32))
        return jax.nn.softmax(logits, axis=1)

    probs = np.concatenate(
        [np.asarray(probs_fn(b))
         for b in _image_batches(files, args.batch_size, size=args.input_size)])
    mean, std = inception_score_from_probs(probs, splits=args.splits)
    print(f"IS: {mean:.4f} +/- {std:.4f}")
    return mean, std


if __name__ == "__main__":
    main()
