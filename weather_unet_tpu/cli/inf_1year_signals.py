"""Time-lapse inference: one photo through a year of hourly weather signals.

Rebuild of reference ``inference/inf_1year_signals.py``: z-score the station's
year of signals against itself, translate the fixed photo per hour, save
frames named by UTC timestamp.
"""

from __future__ import annotations

import argparse
import datetime
import os

import numpy as np
import jax.numpy as jnp


def build_parser():
    p = argparse.ArgumentParser(description="1-year weather-signal time lapse")
    p.add_argument("--gpu", type=str, default="0", help="parity flag; ignored")
    p.add_argument("--image_root", type=str, required=True)
    p.add_argument("--pkl_path", type=str, required=True)
    p.add_argument("--photo_id", type=str, required=True)
    p.add_argument("--city", type=str, default=None, help="station name override")
    p.add_argument("--output_dir", type=str, default="results_1year")
    p.add_argument("--cp_path", type=str, required=True)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=16)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    from weather_unet_tpu.cli.common import (load_flickr_frame, load_transfer,
                                             save_image)
    from weather_unet_tpu.data.datasets import OneYearWeatherSignals, SIGNAL_COLUMNS
    from weather_unet_tpu.data.transforms import normalize_batch

    os.makedirs(args.output_dir, exist_ok=True)
    model, variables = load_transfer(args.cp_path)

    # z-score the year frame against itself (inf_1year_signals.py:62-69)
    df, _, _ = load_flickr_frame(args.pkl_path)
    ds = OneYearWeatherSignals(args.image_root, df, SIGNAL_COLUMNS,
                               args.photo_id, out_size=args.input_size,
                               name=args.city)

    x1 = normalize_batch(jnp.asarray(ds.image[None]))

    @jax.jit
    def translate(conds):
        batch = jnp.tile(x1, (conds.shape[0], 1, 1, 1))
        return model.apply(variables, batch, conds)

    bs = args.batch_size
    n = len(ds)
    for start in range(0, n, bs):
        idx = range(start, min(start + bs, n))
        conds = jnp.asarray(np.stack([ds.conditions[i] for i in idx]))
        if conds.shape[0] < bs:  # pad to keep one compiled shape
            pad = bs - conds.shape[0]
            conds = jnp.concatenate([conds, jnp.zeros((pad, conds.shape[1]),
                                                      conds.dtype)])
        outs = np.asarray(translate(conds))
        for j, i in enumerate(idx):
            ts = datetime.datetime.fromtimestamp(
                int(ds.s_times[i]), datetime.timezone.utc)
            name = ts.strftime("%Y%m%d_%H%M%S") + ".jpg"
            # per-image min-max like the reference's torchvision
            # save_image(normalize=True) (inf_1year_signals.py:105)
            save_image(os.path.join(args.output_dir, name),
                       outs[j][None], nrow=1)
    print(f"Done: {n} frames in {args.output_dir}")


if __name__ == "__main__":
    main()
