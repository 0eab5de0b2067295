"""Quick pickle inspector — CLI replacement for the reference's ad-hoc
``ipynb/pkl_viewer.ipynb`` notebook: show type, shape/columns, head, and
mode/class distributions of dataset pickles."""

from __future__ import annotations

import argparse
import pickle


def build_parser():
    p = argparse.ArgumentParser(description="inspect dataset pickles")
    p.add_argument("pkl", type=str)
    p.add_argument("--head", type=int, default=5)
    p.add_argument("--column", type=str, default=None,
                   help="show value counts of this column")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    with open(args.pkl, "rb") as f:
        obj = pickle.load(f)
    print(f"type: {type(obj).__name__}")
    try:
        import pandas as pd

        if isinstance(obj, pd.DataFrame):
            print(f"shape: {obj.shape}")
            print(f"columns: {list(obj.columns)}")
            print(obj.head(args.head))
            for col in ([args.column] if args.column else
                        [c for c in ("mode", "condition2", "w_condition")
                         if c in obj]):
                print(f"\n{col} value counts:")
                print(obj[col].value_counts())
            return
    except ImportError:
        pass
    if isinstance(obj, dict):
        for k, v in obj.items():
            desc = f"len {len(v)}" if hasattr(v, "__len__") else repr(v)[:60]
            print(f"  {k}: {type(v).__name__} ({desc})")
            if isinstance(v, (list, tuple)) and v:
                print(f"    head: {v[:args.head]}")
    elif isinstance(obj, (list, tuple)):
        print(f"len: {len(obj)}")
        print(f"head: {obj[:args.head]}")
    else:
        print(repr(obj)[:500])


if __name__ == "__main__":
    main()
