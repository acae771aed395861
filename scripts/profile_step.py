"""Profile one fused train step and print the per-op time breakdown.

The round-2 GAT tuning pass was driven by this recipe (CLAUDE.md):
capture ``jax.profiler.trace`` around a few fused steps — it works fine
through the tunnel — then aggregate self-time per op name from the
chrome-trace JSON.  This script packages both halves so the next kernel
session starts from a breakdown, not from scratch.

Usage:
  python scripts/profile_step.py                    # deep_sets flagship
  python scripts/profile_step.py --model graph_net [--gat]
  python scripts/profile_step.py --tiny             # CPU-sized smoke
  python scripts/profile_step.py --parse /tmp/trace_gat   # re-parse only

Prints steady-state throughput, then the top-N trace rows by self time
(device tracks preferred; host/python tracks are skipped unless nothing
else is present).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def capture(args) -> str:
    import numpy as np
    import jax
    import bench
    from point_cloud_classifier_tpu.models import DeepSets, GraphNet, ModelWrapper

    outdir = args.out or (
        f"/tmp/trace_{args.model}{'_gat' if args.gat else ''}"
        f"{'_sag' if args.sag else ''}"
        + (f"_{args.graph_pooling}" if args.graph_pooling != "add" else "")
    )
    shutil.rmtree(outdir, ignore_errors=True)

    fuse = args.fuse
    if args.model == "graph_net":
        b, n, e = (8, 512, 1024) if args.tiny else (256, 65536, 131072)
        model = GraphNet(
            input_dim=4, hidden_dim=128, output_dim=1, activation="tanh",
            deepchem_style=True, compute_dtype="bfloat16", use_gat=args.gat,
            sag_pool=args.sag, local_pooling=args.graph_pooling,
        )
        batches = [
            bench._graph_batch_dense_inrow(b, n, e, 4, seed=s, half=True)
            for s in range(4)
        ]
        unit = "graphs"
    else:
        b, p = (8, 1024) if args.tiny else (256, 65536)
        model = DeepSets(
            input_dim=6, phi_layers=bench.PHI, rho_layers=bench.RHO,
            output_dim=1, activation="gelu", layer_norm=False,
            residual_block=True, pooling="mean", compute_dtype="bfloat16",
            factored_cols=(1,),
        )
        batches = [bench._batch(b, p, 6, seed=s, half=True) for s in range(4)]
        unit = "clouds"

    wrapper = ModelWrapper(model, learning_rate=1e-3, epochs=1, optimizer="adamw")
    wrapper._ensure_initialized(batches[0])
    stacked = {
        k: jax.device_put(np.stack([batches[i % 4][k] for i in range(fuse)]))
        for k in batches[0]
    }

    def run(k):
        loss = None
        for _ in range(max(1, k // fuse)):
            (
                wrapper.params,
                wrapper.batch_stats,
                wrapper.opt_state,
                loss,
            ) = wrapper._train_step_fused(
                wrapper.params, wrapper.batch_stats, wrapper.opt_state, stacked
            )
        jax.block_until_ready(loss)

    run(fuse * 2)  # compile + warm
    t0 = time.perf_counter()
    run(fuse * 4)
    dt = time.perf_counter() - t0
    print(
        f"steady: {fuse * 4 * b / dt:,.0f} {unit}/sec "
        f"({1e3 * dt / (fuse * 4):.3f} ms/step)"
    )
    with jax.profiler.trace(outdir):
        run(fuse * 2)
    print(f"trace captured to {outdir}")
    return outdir


def parse(outdir: str, top: int) -> None:
    """Aggregate self time per op name from the chrome-trace dumps."""
    paths = glob.glob(
        os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {outdir}")
    # aggregate SELF time per (pid, tid): one device pid carries SEPARATE
    # overlapping lanes ("XLA Ops", "XLA Modules", "Steps"), and within a
    # lane spans NEST (a fused-scan `while` span contains every op of its
    # body) — naive dur sums double-count both ways.  Per lane, sort by
    # start time and subtract each span's duration from its enclosing
    # parent's running self time (classic flame-graph self-time pass).
    lane_events = defaultdict(list)  # (proc, thread) -> [(ts, dur, name)]
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
        for ev in events:
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            pid, tid = ev.get("pid"), ev.get("tid")
            track = (
                pid_names.get(pid, str(pid)),
                tid_names.get((pid, tid), str(tid)),
            )
            lane_events[track].append((ev["ts"], ev["dur"], ev["name"]))

    by_track = {}  # (proc, thread) -> name -> self us
    for track, evs in lane_events.items():
        # parents first: earlier start, then longer duration at equal start
        evs.sort(key=lambda e: (e[0], -e[1]))
        ops = defaultdict(float)
        stack = []  # [(end_ts, name, self_us)]
        for ts, dur, name in evs:
            while stack and stack[-1][0] <= ts:
                end, n, s = stack.pop()
                ops[n] += s
            if stack:
                stack[-1] = (stack[-1][0], stack[-1][1], stack[-1][2] - dur)
            stack.append((ts + dur, name, float(dur)))
        for end, n, s in stack:
            ops[n] += s
        by_track[track] = ops

    def pick(pred):
        return {t: ops for t, ops in by_track.items() if pred(t)}

    # the per-op lane of the device track is what kernel tuning wants;
    # fall back to any device lane, then host, if the naming differs
    tracks = (
        pick(lambda t: "TPU" in t[0] and "Ops" in t[1])
        or pick(lambda t: any(s in t[0] for s in ("TPU", "Tensor", "GPU", "/device:")))
        or by_track
    )
    for (proc, thread), ops in sorted(tracks.items()):
        total = sum(ops.values())
        if not total:
            continue
        print(f"\n== {proc} / {thread}  (total {total / 1e3:.2f} ms) ==")
        rows = sorted(ops.items(), key=lambda kv: -kv[1])[:top]
        for name, us in rows:
            print(f"  {us / 1e3:9.3f} ms  {100 * us / total:5.1f}%  {name[:90]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deep_sets", choices=["deep_sets", "graph_net"])
    ap.add_argument("--gat", action="store_true")
    ap.add_argument("--sag", action="store_true")
    ap.add_argument(
        "--graph-pooling", default="add", choices=["add", "mean", "max"],
        help="GraphConv aggregation for --model graph_net (sweep samples "
        "all three; round 4 profiles every dense arm)",
    )
    ap.add_argument("--fuse", type=int, default=16)
    ap.add_argument("--tiny", action="store_true", help="CPU-sized smoke shapes")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--parse", default=None, metavar="DIR",
        help="skip capture; parse an existing trace dir",
    )
    args = ap.parse_args()
    outdir = args.parse or capture(args)
    parse(outdir, args.top)


if __name__ == "__main__":
    main()
