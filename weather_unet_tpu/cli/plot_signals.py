"""Signal-distribution histograms — rebuild of reference ``plot.py:1-47``:
plots ground-truth signal distributions against estimator predictions / L1
errors from pickled arrays."""

from __future__ import annotations

import argparse
import pickle


def build_parser():
    p = argparse.ArgumentParser(description="plot signal histograms")
    p.add_argument("--gt_pkl", type=str, required=True,
                   help="pickled (N, num_signals) ground-truth array or errors.pkl")
    p.add_argument("--pred_pkl", type=str, default=None)
    p.add_argument("--output", type=str, default="signals_hist.png")
    p.add_argument("--bins", type=int, default=50)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from weather_unet_tpu.data.datasets import SIGNAL_COLUMNS

    def load(path):
        with open(path, "rb") as f:
            obj = pickle.load(f)
        if isinstance(obj, dict):
            obj = obj.get("signed_l1", next(iter(obj.values())))
        return np.asarray(obj)

    gt = load(args.gt_pkl)
    pred = load(args.pred_pkl) if args.pred_pkl else None

    n = gt.shape[1]
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 3))
    for i in range(n):
        axes[i].hist(gt[:, i], bins=args.bins, alpha=0.6, label="gt")
        if pred is not None:
            axes[i].hist(pred[:, i], bins=args.bins, alpha=0.6, label="pred")
        axes[i].set_title(SIGNAL_COLUMNS[i] if i < len(SIGNAL_COLUMNS) else str(i))
        axes[i].legend()
    fig.savefig(args.output, bbox_inches="tight")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
