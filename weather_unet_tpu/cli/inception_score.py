"""Inception Score CLI — rebuild of reference ``eval/inception_score.py``.

Scores a directory of images with an ImageNet classifier's 1000-way softmax
(10 splits).  Uses a locally provided torchvision inception checkpoint when
given; otherwise falls back to the FID Inception graph with random weights
(structure-only smoke scoring, documented: no egress in this environment).
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="Inception Score")
    p.add_argument("--image_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--splits", type=int, default=10)
    p.add_argument("--weights", type=str, default=None)
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

    files = list_images(args.image_dir)

    from weather_unet_tpu.models.inception_fid import InceptionV3FID

    if args.weights:
        from weather_unet_tpu.compat.torch_io import inception_from_torch, load_torch_file

        variables = inception_from_torch(load_torch_file(args.weights))
        with_head = "fc" in variables["params"]
        model = InceptionV3FID(with_logits=with_head)
    else:
        model = InceptionV3FID()
        with_head = False
        variables = model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
        print("WARNING: random Inception weights (no local checkpoint given); "
              "scores are structural smoke values only")

    @jax.jit
    def probs_fn(batch):
        out = model.apply(variables, jnp.asarray(batch, jnp.float32))
        # with real TF-ported weights: softmax over the 1008-way fc head;
        # otherwise truncate random features to 1000 pseudo-classes.
        logits = out if with_head else out[:, :1000]
        return jax.nn.softmax(logits, axis=1)

    probs = np.concatenate(
        [np.asarray(probs_fn(b)) for b in _image_batches(files, args.batch_size)])
    mean, std = inception_score_from_probs(probs, splits=args.splits)
    print(f"IS: {mean:.4f} +/- {std:.4f}")
    return mean, std


if __name__ == "__main__":
    main()
