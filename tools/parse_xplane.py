"""Offline xplane-trace analyzer: per-op device-time breakdown, no TensorBoard.

Reads the newest ``*.xplane.pb`` under a trace dir (as written by
``jax.profiler.start_trace``) via ``jax.profiler.ProfileData`` and prints,
for each device plane: total busy time, and ops aggregated by name and by
coarse category (convolution / fusion / copy / all-reduce / ...), sorted by
self time.  Used for the round-3 kernel studies (docs/UPSAMPLE_STUDY.md) and
the GAN-step profile — the tunnel TPU has no TensorBoard, so this is the
only practical trace reader here.

Usage: python tools/parse_xplane.py /tmp/gan_profile [--top 40] [--line "XLA Ops"]
"""
import argparse
import collections
import glob
import os
import re
import sys


_OPCODE_RE = re.compile(
    # "%name = <shape-or-tuple> OPCODE(" — the HLO opcode, not the operand
    # text (matching the whole instruction string mis-filed e.g. a fusion
    # consuming %copy-done.123 under copy/relayout, and anything containing
    # "convert" under convolution; categories were badly skewed)
    r"=\s*(?:\([^)]*\)|\S+)\s+([a-z][a-z0-9._-]*)\(")


def categorize(name: str) -> str:
    m = _OPCODE_RE.search(name)
    # fall back to the leading %token (events sometimes carry bare op names)
    op = m.group(1) if m else name.lower().lstrip("%").split(" ")[0]
    op = op.split(".")[0]          # %copy-start.2106 -> copy-start
    for pat, cat in [
        (r"^convolution", "convolution"),
        (r"^(all-reduce|all-gather|reduce-scatter|collective|permute)",
         "collective"),
        (r"^(copy|transpose|bitcast)", "copy/relayout"),
        (r"fusion", "fusion"),
        (r"^(dot|matmul|einsum)", "dot"),
        (r"^(reduce|select-and-scatter)", "reduce"),
        (r"^(dynamic-update|dynamic-slice|slice|gather|scatter|pad|concat"
         r"|reshape)", "data-movement"),
        (r"^(rng|random)", "rng"),
        (r"^(infeed|outfeed|host|send|recv)", "host-io"),
        (r"^custom-call", "custom-call"),
    ]:
        if re.search(pat, op):
            return cat
    return "other"


_COMPUTATION_RE = re.compile(r"^\s*%?([\w.-]+)\s*(?:\([^)]*\))?\s*->.*\{\s*$")
_CALLS_RE = re.compile(r"calls=%?([\w.-]+)")
_BODY_OP_RE = re.compile(r"=\s*(?:\([^)]*\)|\S+)\s+([a-z][a-z0-9._-]*)\(")


def load_hlo_fusion_map(path: str) -> dict:
    """Map fusion-instruction name -> category, from optimized HLO text.

    xplane events carry only op NAMES; on TPU the convolutions (and most of
    the FLOPs) live inside anonymous ``%fusion.N`` instructions, so a
    name-only category rollup files ~90% of the step under "fusion".  The
    HLO module text (``compiled.as_text()``, e.g. ``bench_gan_profile.py
    --dump_hlo``) names each fusion's called computation; classifying the
    computation's BODY opcodes recovers an honest breakdown."""
    comp_ops: dict = {}
    fusion_calls: dict = {}
    current = None
    with open(path) as f:
        for raw in f:
            m = _COMPUTATION_RE.match(raw)
            if m and "=" not in raw.split("->")[0]:
                current = m.group(1)
                comp_ops[current] = set()
                continue
            if raw.startswith("}"):
                current = None
                continue
            mo = _BODY_OP_RE.search(raw)
            if mo and current is not None:
                comp_ops[current].add(mo.group(1).split(".")[0])
            if " fusion(" in raw:
                lhs = raw.split("=")[0].strip().lstrip("%")
                mc = _CALLS_RE.search(raw)
                if mc:
                    fusion_calls[lhs] = mc.group(1)

    def classify(ops: set) -> str:
        if "convolution" in ops:
            return "convolution (fused)"
        if "dot" in ops:
            return "dot (fused)"
        if "rng-bit-generator" in ops:
            return "rng (fused)"
        if ops & {"reduce", "reduce-window", "select-and-scatter"}:
            return "reduce (fused)"
        if ops & {"transpose", "copy"}:
            return "copy/relayout (fused)"
        return "elementwise (fused)"

    return {fusion: classify(comp_ops.get(comp, set()))
            for fusion, comp in fusion_calls.items()}


def categorize_with_hlo(name: str, fusion_map: dict) -> str:
    base = categorize(name)
    if base != "fusion" or not fusion_map:
        return base
    lhs = name.split("=")[0].strip().lstrip("%")
    return fusion_map.get(lhs, "fusion (unmapped)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--line", default=None,
                    help="only lines whose name contains this substring")
    ap.add_argument("--plane", default=None,
                    help="only planes whose name contains this substring "
                         "(default: device planes, i.e. TPU/GPU/device)")
    ap.add_argument("--list", action="store_true",
                    help="just list plane/line names and event counts")
    ap.add_argument("--hlo", default=None,
                    help="optimized HLO text of the traced executable "
                         "(bench_gan_profile.py --dump_hlo); classifies "
                         "anonymous %%fusion.N ops by their computation body")
    args = ap.parse_args()
    fusion_map = load_hlo_fusion_map(args.hlo) if args.hlo else {}

    import jax  # noqa: F401  (ProfileData lives under jax.profiler)
    jax.config.update("jax_platforms", "cpu")
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        sys.exit(f"no *.xplane.pb under {args.trace_dir}")
    path = paths[-1]
    print(f"# {path}")
    data = ProfileData.from_file(path)

    for plane in data.planes:
        pname = plane.name
        if args.plane is not None:
            if args.plane not in pname:
                continue
        elif not re.search(r"TPU|GPU|[Dd]evice", pname):
            continue
        for line in plane.lines:
            if args.line is not None and args.line not in line.name:
                continue
            events = list(line.events)
            if not events:
                continue
            if args.list:
                print(f"plane={pname!r} line={line.name!r} events={len(events)}")
                continue
            by_name = collections.Counter()
            counts = collections.Counter()
            t_min, t_max = None, None
            for ev in events:
                dur = ev.duration_ns
                by_name[ev.name] += dur
                counts[ev.name] += 1
                s = ev.start_ns
                t_min = s if t_min is None else min(t_min, s)
                t_max = max(t_max or 0, s + dur)
            busy = max(sum(by_name.values()), 1)  # zero-duration-only lines
            span = (t_max - t_min) if events else 0
            print(f"\n== plane={pname!r} line={line.name!r} "
                  f"events={len(events)} busy={busy/1e6:.2f}ms "
                  f"span={span/1e6:.2f}ms occupancy={busy/max(span,1):.1%}")
            by_cat = collections.Counter()
            for name, dur in by_name.items():
                by_cat[categorize_with_hlo(name, fusion_map)] += dur
            print("  -- by category --")
            for cat, dur in by_cat.most_common():
                print(f"  {dur/1e6:10.2f} ms  {dur/busy:6.1%}  {cat}")
            print(f"  -- top {args.top} ops --")
            for name, dur in by_name.most_common(args.top):
                print(f"  {dur/1e6:10.2f} ms  x{counts[name]:<5d} "
                      f"{dur/busy:6.1%}  {name[:110]}")

    if args.list:
        # also show host planes for orientation
        for plane in data.planes:
            if re.search(r"TPU|GPU|[Dd]evice", plane.name):
                continue
            n = sum(1 for l in plane.lines for _ in l.events)
            print(f"(host) plane={plane.name!r} lines="
                  f"{[l.name for l in plane.lines]} events={n}")


if __name__ == "__main__":
    main()
