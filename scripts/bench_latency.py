"""Serving-latency benchmark: per-batch device latency of the full
detect->crop->pose pipeline at small batch sizes (the serving regime the
throughput bench's batch-128 number does not cover).

Methodology is bench.py's chained difference — N pipeline iterations
chained through a data dependency inside ONE jit, per-iteration time =
(t(1+K) - t(1)) / K — which cancels tunnel RTT, dispatch, and fetch costs
and therefore measures pure device latency per batch. Reference point:
the reference framework reports ~40-50 ms/frame single-image CPU+GPU
inference (README "real-time"); a v5e chip serves one frame in ~2 ms.

Usage:
    python scripts/bench_latency.py [--variants rgb,rgbd] \
        [--batches 1,8,32] [--int8] [--chain 100]

Prints one markdown table (for PERF.md) and one JSON line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _build_pipeline, _timed_chain  # noqa: E402


# Minimum measured interval for an honest chained difference (bench.py uses
# the same floor): below this, tunnel RTT jitter is the same order as the
# signal and short batch-1 chains can report garbage (or even dt<=0).
MIN_DT_S = 0.05
MAX_CHAIN = 3200


def measure(variant: str, batch: int, chain: int, int8: bool):
    import numpy as np

    pipe, frames, K = _build_pipeline(batch, variant)
    if int8:
        pipe.quantize_backbones(np.asarray(frames), np.asarray(K),
                                include_detector=True)
    # adaptive chain: grow until the measured interval clears the honesty
    # floor (fast batch-1 bf16 chains are ~1-2 ms/iter, so a fixed chain
    # length can undershoot on one variant and waste time on another)
    while True:
        t1 = _timed_chain(pipe, frames, K, 1)
        tn = _timed_chain(pipe, frames, K, 1 + chain)
        dt = tn - t1
        if dt >= MIN_DT_S or chain >= MAX_CHAIN:
            break
        chain *= 2
        print(f"[latency] {variant} b{batch}: dt={dt*1e3:.1f} ms below "
              f"{MIN_DT_S*1e3:.0f} ms floor, growing chain to {chain}",
              file=sys.stderr)
    if dt <= 0:
        return None, None, chain
    ms_per_batch = dt / chain * 1e3
    fps = batch * chain / dt
    return ms_per_batch, fps, chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="rgb,rgbd")
    ap.add_argument("--batches", default="1,8,32")
    ap.add_argument("--chain", type=int, default=100)
    ap.add_argument("--int8", action="store_true",
                    help="also measure the int8 PTQ serving mode")
    args = ap.parse_args()

    variants = args.variants.split(",")
    batches = [int(b) for b in args.batches.split(",")]

    rows = []
    for variant in variants:
        for B in batches:
            modes = [("bf16", False)] + ([("int8", True)] if args.int8 else [])
            for mode, int8 in modes:
                ms, fps, chain = measure(variant, B, args.chain, int8)
                if ms is None:
                    # dt<=0 even at MAX_CHAIN: drop the row loudly rather
                    # than letting a NaN corrupt the JSON line
                    print(f"[latency] {variant} b{B} {mode}: non-positive "
                          f"interval at chain {chain}; row dropped",
                          file=sys.stderr)
                    continue
                per_frame = ms / B
                rows.append({"variant": variant, "batch": B, "mode": mode,
                             "ms_per_batch": round(ms, 3),
                             "ms_per_frame": round(per_frame, 3),
                             "fps": round(fps, 1), "chain": chain})
                print(f"[latency] {variant} b{B} {mode}: {ms:.3f} ms/batch "
                      f"({per_frame:.3f} ms/frame, {fps:.1f} fps, "
                      f"chain {chain})", file=sys.stderr)

    print("| variant | batch | mode | ms/batch | ms/frame | fps |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['variant']} | {r['batch']} | {r['mode']} | "
              f"{r['ms_per_batch']} | {r['ms_per_frame']} | {r['fps']} |")
    print(json.dumps({"metric": "serving_latency", "rows": rows},
                     allow_nan=False))


if __name__ == "__main__":
    main()
