"""Summarize a jax.profiler trace of the north-star rollout into the
committed roofline evidence (VERDICT r2 weak #7).

    python scripts/profile_rollout.py --steps 96 --impl pallas2 --trace /tmp/tr
    python scripts/trace_summary.py /tmp/tr --steps 96 --label pallas2 \
        --out docs/profile/pallas2.json

Parses the Perfetto trace.json.gz (device-side op events for /device:TPU),
attributes time to the scan body and the cell kernels, and derives the
sustained-MXU fraction from the analytic conv FLOPs of the north-star
config (90x144x20 fusion: C=62, ConvLSTM 64/32/16 k=5/3/3, padded
100x154 -> pallas2 column-padded 160).  The trace artifact itself is
committed next to the summary so every number is re-derivable.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os

# v5e peak dense bf16 matmul throughput, per chip
PEAK_BF16_TFLOPS = 197.0


CONFIGS = {
    # (k, cin + h, 4h) per layer of the traced model
    "northstar": [(5, 62 + 64, 256), (3, 64 + 32, 128), (3, 32 + 16, 64)],
    # config #3 closed loop: 6ch surface (5 met + feedback)
    "closedloop6": [(5, 6 + 64, 256), (3, 64 + 32, 128), (3, 32 + 16, 64)],
}


def conv_gflops_per_step(width: int, config: str = "northstar") -> float:
    """Analytic gate-conv FLOPs of one rollout step (batch 1), NHWC
    (100, width) frames: per layer 2*k^2*(Cin+h)*4h*H*W."""
    H = 100
    layers = CONFIGS[config]
    fl = sum(2 * k * k * cin * cout * H * width for k, cin, cout in layers)
    fl += 2 * 16 * 1 * H * width  # 1x1 head tap
    return fl / 1e9


def load_events(trace_dir: str):
    if trace_dir.endswith(".json.gz"):  # a committed artifact directly
        paths = [trace_dir]
    else:
        paths = glob.glob(
            os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
        )
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        return json.load(f)["traceEvents"], sorted(paths)[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, required=True)
    ap.add_argument("--label", required=True)
    ap.add_argument("--width", type=int, default=None,
                    help="conv width for FLOP accounting (default: 160 "
                         "for pallas2 labels — the column-padded layout "
                         "computes margins too — else 154)")
    ap.add_argument("--config", default="northstar", choices=sorted(CONFIGS),
                    help="traced model for analytic FLOP accounting")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    events, path = load_events(args.trace_dir)
    pids = {
        e["pid"]: e["args"].get("name")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = {p for p, n in pids.items() if n and "TPU" in n}
    durs = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev:
            durs[e["name"]] += e.get("dur", 0)  # us

    top = durs.most_common(40)
    total_us = max((d for n, d in top if n.startswith("jit_")), default=0)
    scan_us = max((d for n, d in top if n.startswith("while")), default=0)
    kernel_us = sum(
        d for n, d in top if n.startswith(("closed_call", "custom-call"))
    )
    conv_us = sum(d for n, d in top if "conv" in n.lower())

    width = args.width or (160 if "pallas" in args.label else 154)
    gflops = conv_gflops_per_step(width, args.config)
    dev_ms_step = total_us / 1e3 / args.steps
    tflops = gflops / max(dev_ms_step, 1e-9)  # GFLOP / ms == TFLOP/s
    summary = {
        "label": args.label,
        "config": args.config,
        "steps": args.steps,
        "trace": os.path.relpath(path),
        "device_total_ms": round(total_us / 1e3, 2),
        "device_ms_per_step": round(dev_ms_step, 4),
        "scan_ms": round(scan_us / 1e3, 2),
        "cell_kernel_ms": round(kernel_us / 1e3, 2),
        "conv_op_ms": round(conv_us / 1e3, 2),
        "analytic_gflops_per_step": round(gflops, 2),
        "sustained_tflops": round(tflops, 1),
        "mxu_fraction_of_peak": round(tflops / PEAK_BF16_TFLOPS, 3),
        "top_ops_ms": {
            n[:80]: round(d / 1e3, 3) for n, d in top[:12]
        },
    }
    out = json.dumps(summary, indent=1)
    print(out)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
