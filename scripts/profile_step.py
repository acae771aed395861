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

    outdir = args.out or f"/tmp/trace_{args.model}{'_gat' if args.gat else ''}"
    shutil.rmtree(outdir, ignore_errors=True)

    fuse = args.fuse
    if args.model == "graph_net":
        b, n, e = (8, 512, 1024) if args.tiny else (256, 65536, 131072)
        model = GraphNet(
            input_dim=4, hidden_dim=128, output_dim=1, activation="tanh",
            deepchem_style=True, compute_dtype="bfloat16", use_gat=args.gat,
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
    by_track = defaultdict(lambda: defaultdict(float))  # track -> name -> us
    for path in paths:
        with gzip.open(path, "rt") as f:
            trace = json.load(f)
        events = trace.get("traceEvents", [])
        pid_names = {
            ev["pid"]: ev["args"].get("name", "")
            for ev in events
            if ev.get("ph") == "M" and ev.get("name") == "process_name"
        }
        for ev in events:
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            track = pid_names.get(ev.get("pid"), str(ev.get("pid")))
            by_track[track][ev["name"]] += ev["dur"]

    # device tracks first (TensorCore / TPU / GPU naming), host otherwise
    device_tracks = {
        t: ops
        for t, ops in by_track.items()
        if any(s in t for s in ("TPU", "Tensor", "GPU", "/device:"))
    }
    tracks = device_tracks or by_track
    for track, ops in sorted(tracks.items()):
        total = sum(ops.values())
        if not total:
            continue
        print(f"\n== {track}  (total {total / 1e3:.2f} ms) ==")
        rows = sorted(ops.items(), key=lambda kv: -kv[1])[:top]
        for name, us in rows:
            print(f"  {us / 1e3:9.3f} ms  {100 * us / total:5.1f}%  {name[:90]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deep_sets", choices=["deep_sets", "graph_net"])
    ap.add_argument("--gat", action="store_true")
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
