"""Trace-measured DEVICE-SIDE single-batch inference latency (p50/p99).

The north-star p50 row (BASELINE.md) is transport-bound on this link:
host-side timing measures the tunnel (~63 ms in degraded windows), and
rounds 2-4 never saw a healthy window to time against.  This script
answers the device half WITHOUT waiting for the tunnel to heal: it
dispatches the flagship single-batch infer program a few hundred times
under ``jax.profiler.trace`` (known to work through the tunnel —
scripts/profile_step.py drove four rounds of kernel tuning with it) and
extracts the per-dispatch DEVICE execution duration from the trace's
"XLA Modules" lane — device-clock timestamps, independent of host↔device
transport stalls.

Output: one JSON line per variant (bf16, int8) with p50/p90/p99/mean
device ms per batch, plus the dispatch count actually found in the
trace.  These are the numbers the BASELINE.md p50 row's "device-side"
half cites; the host-side half remains a dated transport verdict until a
healthy window fires.

Usage:
  python scripts/measure_device_p50.py                 # bf16 + int8, B=256
  python scripts/measure_device_p50.py --variants bf16 # one variant
  python scripts/measure_device_p50.py --tiny          # CPU-sized smoke
  python scripts/measure_device_p50.py --parse /tmp/device_p50_bf16
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def module_durations_ms(outdir: str, name_substr: str) -> list[float]:
    """Per-execution device durations (ms) of modules matching
    ``name_substr`` from the chrome-trace dumps under ``outdir``.

    Module-execution spans live on a dedicated lane (thread named
    "XLA Modules" on TPU device tracks); each span is one dispatched
    executable with device-clock start/duration.  Falls back to ANY lane
    whose span names match when the naming differs (CPU backend smoke).
    """
    paths = glob.glob(
        os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {outdir}")
    by_lane: dict[tuple, list[float]] = {}
    lane_names: dict[tuple, tuple] = {}
    for path in paths:
        with gzip.open(path, "rt") as f:
            trace = json.load(f)
        events = trace.get("traceEvents", [])
        pid_names, tid_names = {}, {}
        for ev in events:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
            elif ev.get("ph") == "M" and ev.get("name") == "thread_name":
                tid_names[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")
        raw: dict[tuple, list[tuple]] = {}
        for ev in events:
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            if name_substr not in ev.get("name", ""):
                continue
            lane = (ev.get("pid"), ev.get("tid"))
            raw.setdefault(lane, []).append((ev["ts"], ev["dur"]))
            lane_names[lane] = (
                pid_names.get(ev.get("pid"), ""),
                tid_names.get((ev.get("pid"), ev.get("tid")), ""),
            )
        # keep only TOP-LEVEL matching spans per lane: a host lane nests a
        # tracing annotation span around the dispatch span of the same
        # name — counting both doubles dispatches and mixes durations
        for lane, spans in raw.items():
            spans.sort(key=lambda s: (s[0], -s[1]))
            end = -1.0
            for ts, dur in spans:
                if ts >= end:
                    by_lane.setdefault(lane, []).append(dur / 1e3)
                    end = ts + dur

    def pick(pred):
        return [
            durs for lane, durs in by_lane.items() if pred(lane_names[lane])
        ]

    # device module lane first (whole-executable spans), then any device
    # lane, then anything that matched at all
    chosen = (
        pick(lambda n: "TPU" in n[0] and "Modules" in n[1])
        or pick(lambda n: "Modules" in n[1])
        or pick(
            lambda n: any(s in n[0] for s in ("TPU", "Tensor", "GPU", "/device:"))
        )
        or list(by_lane.values())
    )
    durs = [d for lane in chosen for d in lane]
    if not durs:
        raise SystemExit(
            f"no '{name_substr}' spans in trace; lanes seen: "
            f"{sorted(set(lane_names.values()))}"
        )
    return durs


def percentile(xs: list[float], q: float) -> float:
    xs = sorted(xs)
    idx = min(int(round(q / 100.0 * (len(xs) - 1))), len(xs) - 1)
    return xs[idx]


def capture(variant: str, b: int, p: int, iters: int, warmup: int,
            outdir: str) -> str:
    import numpy as np
    import jax
    import bench
    from point_cloud_classifier_tpu.models import DeepSets

    shutil.rmtree(outdir, ignore_errors=True)
    model = DeepSets(
        input_dim=6,
        phi_layers=bench.PHI,
        rho_layers=bench.RHO,
        output_dim=1,
        activation="gelu",
        layer_norm=False,  # configs/deep_sets.yaml
        residual_block=True,
        pooling="mean",
        compute_dtype="bfloat16",
        factored_cols=(1,),
        quant="int8" if variant == "int8" else "none",
    )
    batch = bench._batch(b, p, 6, half=True)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    # a NAMED jit so the module spans are greppable in the trace
    @jax.jit
    def infer_p50_probe(v, bt):
        return model.apply(v, bt, train=False)

    # serving semantics: sequential request→response, each dispatch
    # completes (readback) before the next is issued — matches
    # bench.measure_infer_latency's completion-proof host timer, so the
    # device spans here are the device half of exactly that row
    for _ in range(warmup):
        np.asarray(infer_p50_probe(variables, batch))
    with jax.profiler.trace(outdir):
        for _ in range(iters):
            np.asarray(infer_p50_probe(variables, batch))
    return outdir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+", default=["bf16", "int8"],
                    choices=["bf16", "int8"])
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--p", type=int, default=65_536)
    ap.add_argument("--tiny", action="store_true", help="CPU-sized smoke")
    ap.add_argument("--out", default="/tmp/device_p50")
    ap.add_argument("--parse", default=None, metavar="DIR",
                    help="skip capture; parse an existing trace dir")
    args = ap.parse_args()
    if args.tiny:
        args.b, args.p, args.iters, args.warmup = 8, 1024, 20, 3

    if args.parse:
        # label the parsed trace from the capture-dir naming convention
        # (…_bf16 / …_int8) instead of assuming variants[0] — parsing an
        # int8 capture must not emit a bf16-labelled metric line
        base = os.path.basename(os.path.normpath(args.parse))
        suffix = base.rsplit("_", 1)[-1]
        args.variants = [suffix if suffix in ("bf16", "int8") else base]

    for variant in args.variants:
        outdir = args.parse or f"{args.out}_{variant}"
        if not args.parse:
            capture(variant, args.b, args.p, args.iters, args.warmup, outdir)
        durs = module_durations_ms(outdir, "infer_p50_probe")
        print(json.dumps({
            "metric": f"deep_sets_infer_device_p50_{variant}",
            "p50_ms": round(percentile(durs, 50), 4),
            "p90_ms": round(percentile(durs, 90), 4),
            "p99_ms": round(percentile(durs, 99), 4),
            "mean_ms": round(sum(durs) / len(durs), 4),
            "dispatches": len(durs),
            "batch": args.b,
            "points": args.p,
            "unit": "ms/batch device-execution time",
        }))
        if args.parse:
            break


if __name__ == "__main__":
    main()
