"""One-session measurement campaign for BASELINE.md (VERDICT r1 item 2).

Runs every headline benchmark back-to-back in ONE tunnel window so the
numbers are mutually comparable.  Two measurement classes:

- DEVICE-RESIDENT (deep_sets resident, graph_net layouts, GAT kernels):
  batches pinned in HBM + 16-step fusion -> one host dispatch per 16
  steps, so these track the machine, not the tunnel.  Measured in every
  window.  (Observed: resident flagship 253k clouds/sec in a window whose
  stream smoke managed 21k.)
- TUNNEL-BOUND (stream pipeline, infer p50, mesh stream variant): include
  real H2D transfers / per-step dispatch; only meaningful when the smoke
  probe says the window is healthy (>= --min-smoke).  Skipped in degraded
  windows unless --force.

Usage:  python scripts/measure_campaign.py [--min-smoke 100000] [--iters 30]
Prints one JSON blob with every measurement plus the window health, and a
markdown table ready for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-smoke", type=float, default=100_000)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument(
        "--force", action="store_true", help="measure tunnel-bound rows even if degraded"
    )
    args = ap.parse_args()

    results = {"timestamp": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())}

    # 0) window health probe (stream smoke, tiny shapes — measures the TUNNEL)
    smoke = bench.measure_jax(
        64, 4096, 6, iters=20, warmup=5, dtype="bfloat16", pipeline="stream"
    )
    results["smoke_clouds_per_sec"] = round(smoke, 1)
    healthy = smoke >= args.min_smoke
    results["window"] = "healthy" if healthy else "DEGRADED"
    print(f"smoke: {smoke:,.0f} clouds/sec -> {results['window']}", flush=True)

    it, wu = args.iters, 5
    B, P = 256, 65536
    E = 131072

    def record(key, fn, *a, **k):
        t0 = time.time()
        try:
            v = fn(*a, **k)
        except Exception as e:  # transient remote-compile/tunnel errors
            results[key] = f"FAILED: {str(e)[:120]}"
            print(f"{key}: FAILED ({str(e)[:120]})", flush=True)
            return
        results[key] = round(v, 1)
        print(f"{key}: {v:,.1f}  ({time.time()-t0:.0f}s)", flush=True)

    # ---- device-resident rows (valid in any window) ----

    # 1) deep_sets flagship, resident (the bench default), plus deeper
    # fuse to expose dispatch inflation: one dispatch per 256 steps makes
    # the number ~pure device time even when the tunnel quadruples
    # per-dispatch cost (fuse16 ~= fuse256 <=> window dispatch is healthy)
    record("deep_sets_resident", bench.measure_jax,
           B, P, 6, iters=it, warmup=wu, dtype="bfloat16",
           pipeline="resident", fuse=16, pc_layout="dense")
    record("deep_sets_resident_f256", bench.measure_jax,
           B, P, 6, iters=it, warmup=wu, dtype="bfloat16",
           pipeline="resident", fuse=256, pc_layout="dense")
    # flat-wire arm: the pre-dense headline path (one-hot MXU pool) —
    # the dense/flat ratio is the layout win, ~+15% measured 2026-08-18
    record("deep_sets_resident_flat", bench.measure_jax,
           B, P, 6, iters=it, warmup=wu, dtype="bfloat16",
           pipeline="resident", fuse=256, pc_layout="flat")

    # 1b) mesh step-fusion A/B (round 3: fusion works under a mesh) —
    # resident + sharded per-batch device arrays, so device-truth; on the
    # single real chip the mesh is (1, 1) and the pair isolates the
    # fusion mechanism's overhead (measured 2.31x fused-vs-unfused with
    # the unfused arm dispatch-bound, 1.5% off the meshless arm,
    # 2026-08-20)
    record("deep_sets_mesh_fuse16", bench.measure_jax,
           B, P, 6, iters=it, warmup=wu, dtype="bfloat16",
           pipeline="resident", fuse=16, pc_layout="dense", use_mesh=True)
    record("deep_sets_mesh_fuse1", bench.measure_jax,
           B, P, 6, iters=max(10, it // 3), warmup=3, dtype="bfloat16",
           pipeline="resident", fuse=1, pc_layout="dense", use_mesh=True)
    # production fuse depth under the mesh (VERDICT r3 item 4: the 1.5%
    # mesh-overhead claim was measured only at fuse 16) — pair with
    # deep_sets_resident_f256 for the same-window overhead ratio
    record("deep_sets_mesh_fuse256", bench.measure_jax,
           B, P, 6, iters=it, warmup=wu, dtype="bfloat16",
           pipeline="resident", fuse=256, pc_layout="dense", use_mesh=True)

    # 2) graph_net: dense in-row (default) and flat.  fuse 256 (the bench
    # default since round 3: fuse-64 graph rows still carried ~11%
    # dispatch cost in degraded windows — 288.4k vs 322.8k same-window
    # 2026-08-20; the 2026-08-18 campaign had already measured fuse-16
    # graph rows ~40% low in a dispatch-degraded window)
    record("graph_net_dense_inrow", bench.measure_graph_jax,
           B, P, E, iters=it, warmup=wu, dtype="bfloat16",
           pipeline="resident", fuse=256, layout="dense")
    record("graph_net_flat", bench.measure_graph_jax,
           B, P, E, iters=it, warmup=wu, dtype="bfloat16",
           pipeline="resident", fuse=256, layout="flat")
    # graph-family DP evidence at the production fuse depth (VERDICT r3
    # item 4) — pair with graph_net_dense_inrow for the overhead ratio
    record("graph_net_mesh_fuse256", bench.measure_graph_jax,
           B, P, E, iters=it, warmup=wu, dtype="bfloat16",
           pipeline="resident", fuse=256, layout="dense", use_mesh=True)

    # 2b) SAG-pool arm on the dense wire (round 3 lifted the flat-only
    # gate; dense measured 12.4x flat 2026-08-20 — the flat arm is not
    # re-run here, it costs 10x the row's information)
    record("sag_dense", bench.measure_graph_jax,
           B, P, E, iters=max(10, it // 3), warmup=3, dtype="bfloat16",
           pipeline="resident", fuse=256, layout="dense", sag_pool=True)
    record("max_dense", bench.measure_graph_jax,
           B, P, E, iters=max(10, it // 3), warmup=3, dtype="bfloat16",
           pipeline="resident", fuse=256, layout="dense", local_pooling="max")
    # round 4: SAG+max rides dense (the last flat-locked sweep cell)
    record("sag_max_dense", bench.measure_graph_jax,
           B, P, E, iters=max(10, it // 3), warmup=3, dtype="bfloat16",
           pipeline="resident", fuse=256, layout="dense", sag_pool=True,
           local_pooling="max")
    record("gat_sag_dense", bench.measure_graph_jax,
           B, P, E, iters=max(10, it // 3), warmup=3, dtype="bfloat16",
           pipeline="resident", fuse=256, layout="dense", use_gat=True,
           sag_pool=True)

    # 3) GAT: slot-softmax kernel (default) vs dense-form kernel vs the
    # XLA matrix formulation.  fuse 64 — the bench default for dense graph
    # workloads: the 2026-08-19 campaign measured the fuse-16 slot row
    # 53.6k in the same window where the fuse-64 bench CLI said 79.8k
    # (dispatch inflation, same failure mode as the graph rows above)
    record("gat_slot_kernel", bench.measure_graph_jax,
           B, P, E, iters=max(10, it // 3), warmup=3, dtype="bfloat16",
           pipeline="resident", fuse=256, layout="dense", use_gat=True)
    import point_cloud_classifier_tpu.models.wrapper as mw
    import point_cloud_classifier_tpu.ops.gat_pallas as gp

    os.environ["PCC_GAT_KERNEL"] = "dense"
    mw._STEP_CACHE.clear()
    try:
        record("gat_dense_kernel", bench.measure_graph_jax,
               B, P, E, iters=max(10, it // 3), warmup=3, dtype="bfloat16",
               pipeline="resident", fuse=256, layout="dense", use_gat=True)
    finally:
        os.environ.pop("PCC_GAT_KERNEL", None)
        mw._STEP_CACHE.clear()

    shapes_ok = gp._shapes_ok
    gp._shapes_ok = lambda *a, **k: 0
    mw._STEP_CACHE.clear()
    try:
        record("gat_matrix", bench.measure_graph_jax,
               B, P, E, iters=max(10, it // 3), warmup=3, dtype="bfloat16",
               pipeline="resident", fuse=256, layout="dense", use_gat=True)
    finally:
        gp._shapes_ok = shapes_ok
        mw._STEP_CACHE.clear()

    # 4) eval/scoring, device-truth arm (batches resident, scan-fused
    # dispatch): the serving-side analogue of the resident train rows —
    # valid in any window
    # fuse 256 like the train rows: the eval step is ~0.18 ms device, so
    # fuse-16 eval windows are dispatch-dominated whenever the tunnel
    # inflates per-dispatch cost (2026-08-20: fuse-16 eval read 318k in a
    # window whose fuse-256 BASELINE row is 1.41M — same class as the
    # round-3 graph fuse bump)
    record("eval_device", bench.measure_eval_throughput,
           B, P, 6, max(3, it // 8), wu, "bfloat16", fuse=256, resident=True)
    record("graph_eval_device", bench.measure_graph_eval_throughput,
           B, P, E, max(3, it // 8), wu, "bfloat16", fuse=256, resident=True)
    record("gat_eval_device", bench.measure_graph_eval_throughput,
           B, P, E, max(3, it // 8), wu, "bfloat16", fuse=256, use_gat=True,
           resident=True)

    # 5) tabular family (fully_connected_net), resident + deep fuse: the
    # [32, 9] step is microseconds, so only the 1024-step scan amortizes
    # dispatch — device-truth like the rows above
    record("fcn_resident", bench.measure_fcn_jax,
           32, 9, 4096, 1024, "bfloat16", fuse=1024, pipeline="resident")

    # ---- tunnel-bound rows (healthy windows only) ----
    if healthy or args.force:
        record("eval_stream", bench.measure_eval_throughput,
               B, P, 6, max(3, it // 8), wu, "bfloat16", fuse=16)
        record("deep_sets_stream", bench.measure_jax,
               B, P, 6, iters=it, warmup=wu, dtype="bfloat16", pipeline="stream")
        record("infer_p50_ms", bench.measure_infer_latency,
               B, P, 6, iters=50, warmup=10, dtype="bfloat16")
        record("infer_p50_ms_int8", bench.measure_infer_latency,
               B, P, 6, iters=50, warmup=10, dtype="bfloat16", quant="int8")
        # mesh variant (all visible devices over the data axis; fuse=1 —
        # fit() shards batches itself and fusion stacks them first)
        record("deep_sets_mesh", bench.measure_jax,
               B, P, 6, iters=it, warmup=wu, dtype="bfloat16",
               pipeline="stream", use_mesh=True)
    else:
        print("window degraded: skipping stream / latency / mesh rows "
              f"(rerun when smoke >= {args.min_smoke:,.0f}, or pass --force)",
              flush=True)

    print(json.dumps(results))

    # markdown helper
    print("\n| metric | value |")
    print("|---|---|")
    for k, v in results.items():
        print(f"| {k} | {v} |")


if __name__ == "__main__":
    main()
