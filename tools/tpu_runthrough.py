"""Scripted user run-through on the REAL accelerator: train -> infer -> eval.

The suite chains these CLIs in-process on CPU
(``tests/test_cli_integration.py::test_cli_chain_train_infer_eval``); this
script runs the same assembled pipeline the way a user would — three real
subprocesses on whatever backend the host offers (the tunneled TPU here) —
and reports per-stage wall times.  Reference workflow being mirrored:
``t_cls_train.py:450-452`` -> ``inference/inf_transfer_c.py:101-124`` ->
``eval/eval_class_transfer.py:106-143``.

Usage (from the repo root; ~5-15 min on the tunneled v5e, compile-dominated):

    python tools/tpu_runthrough.py [--workdir DIR] [--cpu]

``--cpu`` forces the CPU backend via the WUT env contract (smoke mode).
The synthetic world (i2w class tree + split pkl + random full-depth
ResNet-101 classifier ``.pt``) is built host-side first; artifacts land
under ``--workdir`` (default: a fresh temp dir).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# In-process import path only — do NOT export PYTHONPATH to the stages
# (overriding it hides the axon plugin's site dir; the subprocesses run
# with cwd=REPO instead, which needs no path override).
sys.path.insert(0, REPO)


def build_world(root: str) -> dict:
    """Tiny i2w world: 5 classes x 3 images + split pkl + ResNet-101 .pt.

    One recipe shared with the suite's chain test
    (``weather_unet_tpu.testing`` — the on-device run-through must exercise
    the same world the in-process chain test pins)."""
    from weather_unet_tpu.testing import (build_i2w_world,
                                          build_random_classifier_pt)

    w = build_i2w_world(root)
    est_path = build_random_classifier_pt(
        os.path.join(root, "classifier101.pt"))
    return {"split_pkl": w["split_pkl"], "est": est_path}


def stage(name: str, argv: list, env: dict, timeout: int = 3600) -> float:
    print(f"--- {name}: {' '.join(argv)}", flush=True)
    t0 = time.perf_counter()
    r = subprocess.run(argv, cwd=REPO, env=env, timeout=timeout)
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        raise SystemExit(f"{name} failed (rc={r.returncode})")
    print(f"--- {name}: OK in {dt:.1f}s", flush=True)
    return dt


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (WUT_CPU_DEVICES=1)")
    ap.add_argument("--aot_cache", default=None,
                    help="pass through to the training CLI: a repeat "
                         "run-through skips the GAN-step compile (measured "
                         "24 min through the tunnel's slow window; the AOT "
                         "first-dispatch cost is session-dependent — "
                         "docs/PERF.md 'Cold start')")
    args = ap.parse_args(argv)

    root = args.workdir or __import__("tempfile").mkdtemp(prefix="wut_run_")
    os.makedirs(root, exist_ok=True)
    # A reused workdir would make the measurement hollow, not just stale:
    # the trainer auto-resumes from the previous run's terminal checkpoint,
    # so the train stage would fit() ZERO steps and the reported wall time
    # would measure backend init while infer/eval consume the old artifact.
    stale = [d for d in ("cp", "runs", "out_imgs", "ev")
             if os.path.exists(os.path.join(root, d))]
    if stale:
        raise SystemExit(
            f"workdir {root} already holds run artifacts {stale}; a rerun "
            f"would auto-resume past training and measure nothing — use a "
            f"fresh --workdir (keep --aot_cache to skip the recompile)")
    print(f"workdir: {root}", flush=True)

    # The parent only builds host-side fixtures — it must never grab the
    # (single-tenant, tunneled) TPU; the CLI subprocesses own the device.
    import jax

    jax.config.update("jax_platforms", "cpu")
    world = build_world(root)

    env = dict(os.environ)
    if args.cpu:
        env["WUT_CPU_DEVICES"] = "1"
    py = sys.executable
    times = {}

    times["train"] = stage("train (t_cls_train parity)", [
        py, "-m", "weather_unet_tpu.cli.train_transfer_cls",
        "--image_root", os.path.join(root, "i2w"),
        "--pkl_path", world["split_pkl"], "--estimator_path", world["est"],
        "--dataset", "i2w", "--supervised", "--cross_ent", "--name", "run",
        "--save_dir", os.path.join(root, "cp"),
        "--log_dir", os.path.join(root, "runs"),
        "--input_size", "32", "--batch_size", "4", "--num_epoch", "1",
        "--num_workers", "2"]
        + (["--aot_cache", args.aot_cache] if args.aot_cache else []), env)

    # the training run's own terminal checkpoint drives the next stages
    from weather_unet_tpu.train.checkpoint import latest_checkpoint

    cp = latest_checkpoint(os.path.join(root, "cp"), "run")
    assert cp, "training produced no checkpoint"
    print(f"--- checkpoint: {cp}", flush=True)

    out_dir = os.path.join(root, "out_imgs")
    times["infer"] = stage("infer (inf_transfer_c parity)", [
        py, "-m", "weather_unet_tpu.cli.inf_transfer_c",
        # one class dir (list_images is non-recursive, like the reference's
        # --image_only globbing): 3 images x 5 target classes = 15 outputs
        "--image_root", os.path.join(root, "i2w", "sunny"), "--cp_path", cp,
        "--output_dir", out_dir, "--input_size", "32", "--batch_size", "3",
        "--image_only"], env)
    n_out = len(os.listdir(out_dir))
    assert n_out == 3 * 5, f"expected 15 translated images, got {n_out}"

    times["eval"] = stage("eval (eval_class_transfer parity)", [
        py, "-m", "weather_unet_tpu.cli.eval_class_transfer",
        "--pkl_path", world["split_pkl"], "--cp_path", cp,
        "--classifier_path", world["est"],
        "--output_dir", os.path.join(root, "ev"),
        "--input_size", "32", "--batch_size", "4"], env)
    assert os.path.exists(os.path.join(root, "ev", "cm.pkl"))

    print(json.dumps({"workdir": root, "stages_s":
                      {k: round(v, 1) for k, v in times.items()},
                      "translated_images": n_out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
