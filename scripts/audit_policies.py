"""Auto-policy audit at the REFERENCE SWEEP SPACE's shapes (VERDICT r4 item 2).

Every routing decision in the framework — dense-vs-flat layouts, post-pool,
remat, fused-φ, slot-vs-dense GAT, gb — was A/B'd at the flagship bench
shapes (B=256, φ width 256, hidden 128, heads 4).  The reference sweep
samples elsewhere (`/root/reference/sweep.py:70-133`): B ∈ {16,32,64},
φ width to 1024, hidden to 256, heads 8, input_dim 1, pool_ratio 0.3.
This script same-window A/Bs each policy at those extremes and prints a
verdict table for docs/kernels.md; any misroute found here gets fixed in
the auto gates.

All rows are DEVICE-RESIDENT + deep fusion (valid in degraded windows —
BASELINE.md measurement methodology); each scenario's arms run
back-to-back so ratios are same-window by construction.

Usage:
  python scripts/audit_policies.py                 # full table (TPU)
  python scripts/audit_policies.py --only ds_B16_w256_layout
  python scripts/audit_policies.py --tiny          # CPU plumbing smoke
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (batch builders + sync/stack helpers)


def _release_memory():
    """Between arms: drop compiled executables so a long audit doesn't
    accumulate LLVM state (the round-2 sweep-soak OOM, sweep.py's
    _release_run_memory)."""
    import jax

    from point_cloud_classifier_tpu.models import wrapper as mw

    mw._STEP_CACHE.clear()
    jax.clear_caches()
    gc.collect()


def measure_train(model, host_batches, fuse: int, iters: int, warmup: int) -> float:
    """Resident fused train-step throughput (examples/sec) — the
    measurement loop of bench.measure_graph_jax's resident branch, shapes
    parameterized by the caller."""
    from point_cloud_classifier_tpu.models import ModelWrapper

    wrapper = ModelWrapper(
        model, learning_rate=1e-3, epochs=1, optimizer="adamw", fuse_steps=fuse
    )
    wrapper._ensure_initialized(host_batches[0])
    dev_stacked = bench._resident_stacked(host_batches, fuse, None)
    b = host_batches[0]["y"].shape[0]

    def run(k):
        loss = None
        for _ in range(max(1, k // fuse)):
            (
                wrapper.params,
                wrapper.batch_stats,
                wrapper.opt_state,
                loss,
            ) = wrapper._train_step_fused(
                wrapper.params, wrapper.batch_stats, wrapper.opt_state, dev_stacked
            )
        bench._window_sync(loss)
        return max(1, k // fuse) * fuse

    run(warmup)
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        trained = run(iters)
        best = max(best, b * trained / (time.perf_counter() - t0))
    return best


# ---------------------------------------------------------------------------
# scenario builders.  Each returns (model, host_batches, fuse).  Shapes
# follow the reference sweep draws; per-cloud/per-graph size stays at the
# dataset's ~256 so only the POLICY-RELEVANT axis moves.


def _deep_sets(b, p, width, layers=2, pc_layout="dense", fused_phi="auto",
               tiny=False):
    from point_cloud_classifier_tpu.models import DeepSets

    if tiny:
        b, p, width = 4, 512, 64
    model = DeepSets(
        input_dim=6, phi_layers=[width] * layers, rho_layers=[128, 64],
        output_dim=1, activation="gelu", layer_norm=False,
        residual_block=True, pooling="mean", compute_dtype="bfloat16",
        factored_cols=(1,), fused_phi=fused_phi,
    )
    if pc_layout == "flat":
        batches = [bench._batch(b, p, 6, seed=s, half=True) for s in range(4)]
    else:
        batches = [
            bench._batch_dense(b, p, 6, p // b, seed=s, half=True)
            for s in range(4)
        ]
    return model, batches


def _graph(b, n_per, hidden, use_gat=False, heads=4, sag=False,
           pool_ratio=0.5, local_pooling="add", layout="dense",
           input_dim=4, tiny=False):
    from point_cloud_classifier_tpu.models import GraphNet

    if tiny:
        b, n_per, hidden = 4, 64, 32
    n = b * n_per
    e = 2 * n
    model = GraphNet(
        input_dim=input_dim, hidden_dim=hidden, output_dim=1,
        activation="tanh", deepchem_style=True, compute_dtype="bfloat16",
        use_gat=use_gat, gat_heads=heads, sag_pool=sag,
        pool_ratio=pool_ratio, local_pooling=local_pooling,
    )
    mk = bench._graph_batch_dense_inrow if layout == "dense" else bench._graph_batch
    batches = [mk(b, n, e, input_dim, seed=s, half=True) for s in range(4)]
    return model, batches


# scenario = (name, policy question, [(arm, env, builder_kwargs)...], builder)
SCENARIOS = [
    (
        "ds_B16_w256_layout",
        "dense-vs-flat point-cloud wire at the sweep's smallest batch "
        "(B=16; auto gate was tuned at B=256)",
        [
            ("dense", {}, dict(b=16, p=16 * 256, width=256, pc_layout="dense")),
            ("flat", {}, dict(b=16, p=16 * 256, width=256, pc_layout="flat")),
        ],
        _deep_sets,
    ),
    (
        "ds_B32_w256_layout",
        "dense-vs-flat crossover placement: B=32 (flat won 1.07x at B=16)",
        [
            ("dense", {}, dict(b=32, p=32 * 256, width=256, pc_layout="dense")),
            ("flat", {}, dict(b=32, p=32 * 256, width=256, pc_layout="flat")),
        ],
        _deep_sets,
    ),
    (
        "ds_B64_w256_layout",
        "dense-vs-flat crossover placement: B=64 (the sweep's largest draw)",
        [
            ("dense", {}, dict(b=64, p=64 * 256, width=256, pc_layout="dense")),
            ("flat", {}, dict(b=64, p=64 * 256, width=256, pc_layout="flat")),
        ],
        _deep_sets,
    ),
    (
        "ds_B64_w512_remat",
        "remat crossover placement: width 512 (auto won +38% at 256, "
        "lost 1.5% at 1024)",
        [
            ("on", {"PCC_PHI_REMAT": "1"}, dict(b=64, p=64 * 256, width=512)),
            ("off", {"PCC_PHI_REMAT": "0"}, dict(b=64, p=64 * 256, width=512)),
        ],
        _deep_sets,
    ),
    (
        "ds_B128_w256_layout",
        "dense-vs-flat crossover placement: B=128 (flat won at 16/32/64, "
        "dense at 256)",
        [
            ("dense", {}, dict(b=128, p=128 * 256, width=256, pc_layout="dense")),
            ("flat", {}, dict(b=128, p=128 * 256, width=256, pc_layout="flat")),
        ],
        _deep_sets,
    ),
    (
        "ds_B64_w256_remat",
        "remat B-vs-width attribution: B=64 at width 256 (auto won +38% "
        "at B=256/w256, lost at B=64/w512 and w1024)",
        [
            ("on", {"PCC_PHI_REMAT": "1"}, dict(b=64, p=64 * 256, width=256)),
            ("off", {"PCC_PHI_REMAT": "0"}, dict(b=64, p=64 * 256, width=256)),
        ],
        _deep_sets,
    ),
    (
        "ds_B256_w1024_remat",
        "remat B-vs-width attribution: B=256 at width 1024 (completes the "
        "2x2 with the flagship-shape win and the B=64 losses)",
        [
            ("on", {"PCC_PHI_REMAT": "1"},
             dict(b=256, p=256 * 256, width=1024)),
            ("off", {"PCC_PHI_REMAT": "0"},
             dict(b=256, p=256 * 256, width=1024)),
        ],
        _deep_sets,
    ),
    (
        "gat_dal_form",
        "transposed-vs-row dalpha dots in the slot backward (probe: "
        "thin-sublane 0.0059 vs thin-lane 0.0275 us at H=4, plus the "
        "deleted 0.0434 us result transpose — docs/kernels.md seventh "
        "pass)",
        [
            ("t", {"PCC_GAT_DAL": "t"},
             dict(b=256, n_per=256, hidden=128, use_gat=True, heads=4)),
            ("row", {"PCC_GAT_DAL": "row"},
             dict(b=256, n_per=256, hidden=128, use_gat=True, heads=4)),
        ],
        _graph,
    ),
    (
        "gat_dal_form_h8",
        "same dal A/B at heads 8 (probe says the transposed dot is ~free "
        "there)",
        [
            ("t", {"PCC_GAT_DAL": "t"},
             dict(b=32, n_per=256, hidden=256, use_gat=True, heads=8)),
            ("row", {"PCC_GAT_DAL": "row"},
             dict(b=32, n_per=256, hidden=256, use_gat=True, heads=8)),
        ],
        _graph,
    ),
    (
        "ds_B64_w1024_postpool",
        "post-pool final linear at φ width 1024 (decided at 256)",
        [
            ("on", {"PCC_PHI_POSTPOOL": "1"}, dict(b=64, p=64 * 256, width=1024)),
            ("off", {"PCC_PHI_POSTPOOL": "0"}, dict(b=64, p=64 * 256, width=1024)),
        ],
        _deep_sets,
    ),
    (
        "ds_B64_w1024_remat",
        "auto-remat of the per-point φ chain at width 1024 (decided at 256)",
        [
            ("on", {"PCC_PHI_REMAT": "1"}, dict(b=64, p=64 * 256, width=1024)),
            ("off", {"PCC_PHI_REMAT": "0"}, dict(b=64, p=64 * 256, width=1024)),
        ],
        _deep_sets,
    ),
    (
        "ds_B64_w1024_fusedphi",
        "fused-Pallas-vs-XLA φ pair at width 1024 (auto=XLA was decided "
        "at 256/512; 4-layer φ is the sweep's deepest draw).  FLAT wire "
        "on BOTH arms: the dense per-cloud-row wire force-routes "
        "fused_phi to XLA (models/deep_sets.py — in-row padding would "
        "contaminate the fused kernel's segment pooling), so a dense "
        "'pallas' arm silently runs the identical XLA program and the "
        "A/B is vacuous (round-5 review finding; the first audit run "
        "had exactly that bug)",
        [
            ("xla", {}, dict(b=64, p=64 * 256, width=1024, layers=4,
                             pc_layout="flat")),
            ("pallas", {}, dict(b=64, p=64 * 256, width=1024, layers=4,
                                pc_layout="flat", fused_phi="on")),
        ],
        _deep_sets,
    ),
    (
        "graph_B16_h256_layout",
        "dense-vs-flat graph wire at B=16 / hidden 256 (routed dense at "
        "B=256 / h128)",
        [
            ("dense", {}, dict(b=16, n_per=256, hidden=256, layout="dense")),
            ("flat", {}, dict(b=16, n_per=256, hidden=256, layout="flat")),
        ],
        _graph,
    ),
    (
        "gat_h8_kernel",
        "slot-vs-dense GAT kernel at heads 8 / hidden 256 (slot default "
        "was tuned at heads 4 / h128; heads 8 halves dh and reshapes the "
        "slot cost model)",
        [
            ("slot", {"PCC_GAT_KERNEL": "slot"},
             dict(b=32, n_per=256, hidden=256, use_gat=True, heads=8)),
            ("dense", {"PCC_GAT_KERNEL": "dense"},
             dict(b=32, n_per=256, hidden=256, use_gat=True, heads=8)),
        ],
        _graph,
    ),
    (
        "gat_h8_gb",
        "slot-kernel graph-block size at heads 8 (gb=8 was tuned at heads 4)",
        [
            ("gb8", {"PCC_GAT_GB": "8"},
             dict(b=32, n_per=256, hidden=256, use_gat=True, heads=8)),
            ("gb16", {"PCC_GAT_GB": "16"},
             dict(b=32, n_per=256, hidden=256, use_gat=True, heads=8)),
        ],
        _graph,
    ),
    (
        "sag_r03_in1_layout",
        "dense-vs-flat for SAG at pool_ratio 0.3 / input_dim 1 / B=32 "
        "(keep-mask density changes with the ratio; routed dense at 0.5)",
        [
            ("dense", {}, dict(b=32, n_per=256, hidden=64, sag=True,
                               pool_ratio=0.3, input_dim=1, layout="dense")),
            ("flat", {}, dict(b=32, n_per=256, hidden=64, sag=True,
                              pool_ratio=0.3, input_dim=1, layout="flat")),
        ],
        _graph,
    ),
]

_POLICY_KNOBS = (
    "PCC_PHI_POSTPOOL", "PCC_PHI_REMAT", "PCC_GAT_KERNEL", "PCC_GAT_GB",
    "PCC_GAT_DAL",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--warmup", type=int, default=None)
    ap.add_argument("--fuse", type=int, default=64)
    ap.add_argument("--only", default=None)
    ap.add_argument("--tiny", action="store_true", help="CPU plumbing smoke")
    args = ap.parse_args()
    iters = args.iters or (args.fuse if args.tiny else 4 * args.fuse)
    warmup = args.warmup or (args.fuse if args.tiny else 2 * args.fuse)

    results = {"timestamp": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())}
    for name, question, arms, builder in SCENARIOS:
        if args.only and name != args.only:
            continue
        row = {}
        for arm, env, kwargs in arms:
            for k in _POLICY_KNOBS:
                os.environ.pop(k, None)
            os.environ.update(env)
            _release_memory()
            try:
                model, batches = builder(tiny=args.tiny, **kwargs)
                eps = measure_train(model, batches, args.fuse, iters, warmup)
                row[arm] = round(eps, 1)
            except Exception as e:  # noqa: BLE001 — record and move on
                row[arm] = f"FAILED: {str(e)[:120]}"
            print(f"{name}/{arm}: {row[arm]}", flush=True)
        for k in _POLICY_KNOBS:
            os.environ.pop(k, None)
        vals = [v for v in row.values() if isinstance(v, float)]
        if len(vals) == len(row) and min(vals) > 0:
            first_arm = arms[0][0]
            row["ratio_first_over_second"] = round(
                row[first_arm] / row[arms[1][0]], 3
            )
        results[name] = {"question": question, **row}
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
