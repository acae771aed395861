"""Benchmark harness: flagship train-step throughput (point clouds/sec).

North-star metric per BASELINE.md: deep_sets train-step throughput in
clouds/sec on one chip, against the reference's CPU torch implementation.

- default: run our jit'd DeepSets train step on the current jax backend
  (the real TPU chip under the driver) and print ONE JSON line
  ``{"metric", "value", "unit", "vs_baseline"}``.  The default pipeline is
  the steady-state production one — dataset pinned in HBM after a one-time
  upload (``data/resident.py``), 16 steps scanned per dispatch — measuring
  the machine rather than the tunnel; ``--pipeline stream`` instead pays a
  host→device transfer per step inside the window (the reference's
  per-batch ``.to(device)`` shape, `models/wrapper.py:54`)
- ``--smoke``: tiny CPU-safe shapes, same JSON contract
- ``--measure-baseline``: measure the reference-equivalent torch CPU train
  step (same sparse formulation as `models/deep_sets.py:81-114` +
  `models/wrapper.py:51-74`: φ MLP over all points, bincount/split python
  chunk loop, mean pool, ρ, BCEWithLogitsLoss, adamw) on the same workload
  and print its clouds/sec — the number recorded below and in BASELINE.md

Workload: batch of 256 clouds, 65,536 total points (avg 256 points/cloud,
the middle of the reference's 10^2–10^4 event-size range), 6 features,
reference deep_sets config (φ [256,256], ρ [256], gelu, residual, mean pool,
adamw @ 1e-3).  The headline rides the DENSE per-cloud-row wire
(``--pc-layout dense`` default — the length-sorted loader's steady state;
``--pc-layout flat`` keeps the flat one-hot-pool arm for A/B).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# reference-equivalent torch CPU throughput on this workload, measured via
# --measure-baseline on the build host (see BASELINE.md)
REFERENCE_CPU_CLOUDS_PER_SEC = 260.9
# --model fully_connected_net --measure-baseline on the build host
REFERENCE_CPU_FCN_EVENTS_PER_SEC = 22_794.3

B, P, F = 256, 65_536, 6
PHI, RHO = [256, 256], [256]
WARMUP, ITERS = 5, 20


def _window_sync(out):
    """End-of-window completion barrier for the throughput measurements.

    Default: ``jax.block_until_ready``.  Through the axon tunnel that
    call can return BEFORE device completion (proved by the differential
    probe, scripts/probe_mosaic_costs.py — a 38 ms kernel "blocked" in
    0.02 ms); the train/eval windows stay honest anyway because each
    window dispatches hundreds of CHAINED steps whose enqueue is
    back-pressure-throttled, and the device-trace cross-check agrees
    with the bench numbers (docs/kernels.md).  ``PCC_BENCH_SYNC=d2h``
    replaces the barrier with a host readback of one output leaf — a
    true completion proof — for verifying that equivalence in any
    window (measured equal within noise, 2026-08-19)."""
    import jax

    if os.environ.get("PCC_BENCH_SYNC", "block") == "d2h":
        leaves = jax.tree_util.tree_leaves(out)
        if leaves:  # None/empty (zero-batch window) is a no-op like block
            np.asarray(leaves[0]).ravel()[:1]
    else:
        jax.block_until_ready(out)


def _batch(b: int, p: int, f: int, seed: int = 0, half: bool = True):
    """One host batch in the loaders' wire format.

    half=True is the production wire: fp16 features + the counts encoding of
    segment ids (the loaders' ``transfer_dtype="float16"``/
    ``seg_encoding="counts"`` options).
    """
    rng = np.random.default_rng(seed)
    # roughly uniform cloud sizes summing to p, sorted segment ids
    seg = np.sort(rng.integers(0, b, size=(p,))).astype(np.int32)
    out = {
        "y": rng.integers(0, 2, size=(b, 1)).astype(np.float32),
        "y_mask": np.ones((b,), dtype=np.float32),
    }
    if half:
        # production wire: fp16 features, counts-encoded segments, and the
        # per-event-constant energy_total column factored out (col 1)
        out["points"] = rng.normal(size=(p, f - 1)).astype(np.float16)
        out["event_feats"] = rng.normal(size=(b + 1, 1)).astype(np.float16)
        out["seg_counts"] = np.bincount(seg, minlength=b + 1).astype(np.int32)
    else:
        out["points"] = rng.normal(size=(p, f)).astype(np.float32)
        out["seg"] = seg
    return out


def _batch_dense(b: int, p: int, f: int, m: int, seed: int = 0, half: bool = True):
    """One host batch in the DENSE point-cloud wire: points [B, M, Fw] with
    per-cloud rows (padding inside rows), seg_counts for the pool mask.

    ``m == p // b`` emulates the length-sorted loader's steady state
    (consecutive same-size clouds → ~zero padding); a larger ``m`` models
    unsorted batches with real padding waste.
    """
    rng = np.random.default_rng(seed)
    per = p // b
    counts = np.full((b,), min(per, m), dtype=np.int32)
    out = {
        "y": rng.integers(0, 2, size=(b, 1)).astype(np.float32),
        "y_mask": np.ones((b,), dtype=np.float32),
        "seg_counts": np.concatenate([counts, [0]]).astype(np.int32),
    }
    fw = f - 1 if half else f
    feat_t = np.float16 if half else np.float32
    pts = np.zeros((b, m, fw), dtype=feat_t)
    valid = np.arange(m)[None, :] < counts[:, None]
    pts[valid] = rng.normal(size=(int(counts.sum()), fw)).astype(feat_t)
    out["points"] = pts
    if half:
        out["event_feats"] = rng.normal(size=(b + 1, 1)).astype(np.float16)
    return out


def _resident_stacked(host_batches, fuse: int, mesh):
    """The fused resident steady state fit() measures: one pre-stacked
    [K, ...] device window (meshless: a plain ``device_put``; mesh: the
    memoized pre-stacked SHARDED window of ``wrapper._prestack_window``,
    whose in-jit tuple-stack predecessor re-copied the window every
    flush — 9% of the flagship step, BASELINE.md)."""
    import jax

    out = {}
    for k in host_batches[0]:
        arr = np.stack(
            [host_batches[i % len(host_batches)][k] for i in range(fuse)]
        )
        if mesh is not None:
            from point_cloud_classifier_tpu.parallel.mesh import (
                stacked_batch_sharding,
            )

            out[k] = jax.device_put(arr, stacked_batch_sharding(mesh, arr))
        else:
            out[k] = jax.device_put(arr)
    return out


def measure_jax(
    b: int,
    p: int,
    f: int,
    iters: int,
    warmup: int,
    dtype: str = "bfloat16",
    use_mesh: bool = False,
    fuse: int = 1,
    pipeline: str = "resident",
    phi: str = "auto",
    pc_layout: str = "flat",
) -> float:
    import jax

    from point_cloud_classifier_tpu.models import DeepSets, ModelWrapper

    mesh = None
    if use_mesh:
        from point_cloud_classifier_tpu.parallel import default_mesh

        mesh = default_mesh()

    model = DeepSets(
        input_dim=f,
        phi_layers=PHI,
        rho_layers=RHO,
        output_dim=1,
        # PCC_BENCH_ACT: diagnostic override to isolate activation cost in
        # kernel A/Bs (the flagship config is gelu)
        activation=os.environ.get("PCC_BENCH_ACT", "gelu"),
        layer_norm=False,  # configs/deep_sets.yaml; also enables the fused kernel
        residual_block=True,
        pooling="mean",
        compute_dtype=dtype,
        factored_cols=(1,) if dtype == "bfloat16" else (),
        fused_phi=phi,  # "on" forces the Pallas pair for kernel A/B work
    )
    wrapper = ModelWrapper(
        model, learning_rate=1e-3, epochs=1, optimizer="adamw", mesh=mesh,
        fuse_steps=fuse,
    )
    # a stream of distinct host batches in the fp16/int16 wire format, so the
    # measurement includes the real (H2D-transfer-inclusive) input pipeline
    half = dtype == "bfloat16"
    if pc_layout == "flat":
        host_batches = [_batch(b, p, f, seed=s, half=half) for s in range(4)]
    else:
        # "dense" = length-sorted steady state (M = P/B, ~zero padding);
        # "dense-pad" bounds the unsorted case (25% in-row padding)
        m = p // b if pc_layout == "dense" else (p // b) * 5 // 4
        host_batches = [
            _batch_dense(b, p, f, m, seed=s, half=half) for s in range(4)
        ]
    wrapper._ensure_initialized(host_batches[0])

    if pipeline == "resident":
        # steady-state production pipeline for datasets ≪ HBM: the epoch is
        # pinned on device once (data/resident.py) and every later epoch
        # replays it with ZERO host→device traffic.  The one-time upload
        # happens before the measurement windows, exactly as it precedes
        # steady state in a real multi-epoch fit.  Fused rows upload ONLY
        # the stacked window (the per-batch uploads would be dead weight
        # on a tunnel-bound backend); unfused rows pin per-batch.
        if fuse > 1:
            dev_stacked = _resident_stacked(host_batches, fuse, mesh)
        elif mesh is not None:
            from point_cloud_classifier_tpu.parallel.mesh import shard_batch

            dev_batches = [shard_batch(mesh, hb) for hb in host_batches]
        else:
            dev_batches = [
                {k: jax.device_put(v) for k, v in hb.items()} for hb in host_batches
            ]

        def run(n):
            loss = None
            trained = 0
            if fuse > 1:
                for _ in range(max(1, n // fuse)):
                    (
                        wrapper.params,
                        wrapper.batch_stats,
                        wrapper.opt_state,
                        loss,
                    ) = wrapper._train_step_fused(
                        wrapper.params, wrapper.batch_stats, wrapper.opt_state, dev_stacked
                    )
                    trained += fuse
            else:
                for i in range(n):
                    (
                        wrapper.params,
                        wrapper.batch_stats,
                        wrapper.opt_state,
                        loss,
                    ) = wrapper._train_step(
                        wrapper.params,
                        wrapper.batch_stats,
                        wrapper.opt_state,
                        dev_batches[i % len(dev_batches)],
                    )
                    trained += 1
            _window_sync(loss)
            return trained

        run(warmup)
        best = 0.0
        for _ in range(6):
            t0 = time.perf_counter()
            trained = run(iters)
            best = max(best, b * trained / (time.perf_counter() - t0))
        return best

    def run(n):
        """Train on n batches; returns the count actually dispatched."""
        stream = (host_batches[i % len(host_batches)] for i in range(n))
        loss = None
        if fuse > 1:
            # drive through fit's fusion semantics, tail flush included
            bufs, trained = [], 0

            def flush():
                nonlocal loss, trained, bufs
                if not bufs:
                    return
                stacked = {k: np.stack([x[k] for x in bufs]) for k in bufs[0]}
                (
                    wrapper.params,
                    wrapper.batch_stats,
                    wrapper.opt_state,
                    loss,
                ) = wrapper._train_step_fused(
                    wrapper.params, wrapper.batch_stats, wrapper.opt_state, stacked
                )
                trained += len(bufs)
                bufs = []

            for batch in stream:
                bufs.append(batch)
                if len(bufs) == fuse:
                    flush()
            flush()
            _window_sync(loss)
            return trained
        count = 0
        for batch in wrapper._batches(stream):
            wrapper.params, wrapper.batch_stats, wrapper.opt_state, loss = (
                wrapper._train_step(
                    wrapper.params, wrapper.batch_stats, wrapper.opt_state, batch
                )
            )
            count += 1
        _window_sync(loss)
        return count

    run(warmup)
    # best-of-N windows: throughput = capability; the tunneled transport's
    # health oscillates on a minutes scale (CLAUDE.md gotchas), so sampling
    # several windows over time is the only way to measure the machine
    # rather than the link's worst moment
    best = 0.0
    for _ in range(6):
        t0 = time.perf_counter()
        trained = run(iters)
        best = max(best, b * trained / (time.perf_counter() - t0))
    return best


def _graph_batch_dense(b: int, n: int, e: int, f: int, seed: int = 0, half: bool = True):
    """Same workload as :func:`_graph_batch` in the dense adjacency layout:
    ``n`` total valid nodes and ``e`` directed edges spread over ``b``
    graphs, node dim padded to the power-of-two bucket (M=512 at the
    flagship shape)."""
    rng = np.random.default_rng(seed)
    feat_t = np.float16 if half else np.float32
    per = n // b
    # node dim padded like the loader's pow-2 bucketing of the batch's
    # largest graph (~2x the mean size): M=512 at the flagship shape
    m = max(64, 1 << (2 * per - 1).bit_length())
    e_per = e // b
    nodes = np.zeros((b, m, f), dtype=feat_t)
    nodes[:, :per] = rng.normal(size=(b, per, f))
    adj = np.zeros((b, m, m), dtype=feat_t)
    src, dst = _lineage_like_edges(rng, b, per, e_per)
    for g in range(b):
        adj[g, dst[g], src[g]] = 1.0
    node_mask = np.zeros((b, m), dtype=np.float32)
    node_mask[:, :per] = 1.0
    return {
        "nodes": nodes,
        "adj": adj,
        "node_mask": node_mask,
        "y": rng.integers(0, 2, size=(b, 1)).astype(np.float32),
        "y_mask": np.ones((b,), dtype=np.float32),
    }


def _lineage_like_edges(rng, b: int, per: int, e_per: int):
    """Edge endpoints [b, e_per] shaped like the lineage builder's output
    (`utils/data.py:847-929`): bidirectional temporal chains between
    consecutive steps plus parent->child links — in-degree ≤ ~3, unlike
    uniform random endpoints whose max in-degree at 2 edges/node is ~9."""
    chain_n = min(e_per // 2, per - 1)
    src_c = np.arange(chain_n)
    dst_c = src_c + 1
    extra = e_per - 2 * chain_n
    src_x = rng.integers(0, per, size=(b, extra))
    dst_x = (src_x + rng.integers(1, per, size=(b, extra))) % per
    src = np.concatenate(
        [np.broadcast_to(src_c, (b, chain_n)), np.broadcast_to(dst_c, (b, chain_n)), src_x],
        axis=1,
    )
    dst = np.concatenate(
        [np.broadcast_to(dst_c, (b, chain_n)), np.broadcast_to(src_c, (b, chain_n)), dst_x],
        axis=1,
    )
    return src, dst


def _graph_batch_dense_wire(
    b: int, n: int, e: int, f: int, seed: int = 0, half: bool = True
):
    """The dense workload in the device-adjacency wire format
    (``GraphLoader(layout="dense", adj_wire="device")``): per-graph padded
    nodes + flat LOCAL edge lists; the model scatter-builds ``adj`` on
    device, so the host never allocates or ships the B·M² buffer."""
    rng = np.random.default_rng(seed)
    feat_t = np.float16 if half else np.float32
    per = n // b
    # the loader's rung-ladder node bucketing (k*2^j) at the length-sorted
    # steady state: uniform per-graph sizes land on the exact rung.  The
    # old pow2 bucketing doubled M here (512 for 256-node graphs) and the
    # dense step's O(M^2) adjacency work made that 2.27x whole-step
    # (M=512 126.2k vs M=256 285.9k graphs/sec, same-window 2026-08-19)
    from point_cloud_classifier_tpu.data.batching import _dense_rung

    m = max(64, _dense_rung(per))
    if os.environ.get("PCC_BENCH_GRAPH_M"):
        # node-dim bucketing A/B override (pow2 vs rung ladders).  Round up
        # to 8-aligned like the loader (batching._dense_rung): an off-
        # lattice M would silently gate the GAT Pallas kernel off
        # (ops/gat_pallas._shapes_ok rejects m % 8) and the "kernel at M"
        # row would measure the XLA matrix path instead
        m_req = max(per, int(os.environ["PCC_BENCH_GRAPH_M"]))
        m = -(-m_req // 8) * 8
        if m != m_req:
            print(f"# PCC_BENCH_GRAPH_M={m_req}: rounded to 8-aligned M={m}",
                  file=sys.stderr)
    e_per = e // b
    idx_t = np.int16 if (half and m <= 32768) else np.int32
    slot_t = np.int16 if (half and b < 32767) else np.int32
    nodes = np.zeros((b, m, f), dtype=feat_t)
    nodes[:, :per] = rng.normal(size=(b, per, f))
    node_mask = np.zeros((b, m), dtype=np.float32)
    node_mask[:, :per] = 1.0
    src, dst = _lineage_like_edges(rng, b, per, e_per)
    # dedup (slot, dst, src) like _graph_batch_dense's adj[dst, src] = 1.0
    # overwrite semantics, so both layouts carry identical edge multisets
    slot = np.repeat(np.arange(b), e_per)
    flat = (slot * m + dst.reshape(-1)) * m + src.reshape(-1)
    _, keep = np.unique(flat, return_index=True)
    e_pad = 1 << (max(len(keep), 1) - 1).bit_length()
    # wire contract: triples ascending (np.unique's keep is already sorted
    # by the flat key), unique, padding at slot b (dropped by the scatter)
    edge_src = np.zeros((e_pad,), dtype=idx_t)
    edge_dst = np.zeros((e_pad,), dtype=idx_t)
    edge_slot = np.full((e_pad,), b, dtype=slot_t)
    edge_w = np.zeros((e_pad,), dtype=feat_t)
    edge_src[: len(keep)] = src.reshape(-1)[keep]
    edge_dst[: len(keep)] = dst.reshape(-1)[keep]
    edge_slot[: len(keep)] = slot[keep]
    edge_w[: len(keep)] = 1.0
    return {
        "nodes": nodes,
        "node_mask": node_mask,
        "edge_src": edge_src,
        "edge_dst": edge_dst,
        "edge_slot": edge_slot,
        "edge_w": edge_w,
        "y": rng.integers(0, 2, size=(b, 1)).astype(np.float32),
        "y_mask": np.ones((b,), dtype=np.float32),
    }


def _graph_batch_dense_inrow(
    b: int, n: int, e: int, f: int, seed: int = 0, half: bool = True,
    out_rows: bool = False,
):
    """The dense workload in the in-row device wire: per-node padded
    incoming edges ``in_src``/``in_w [B, M, D]`` (D = max in-degree
    bucket); the model builds the adjacency with D broadcast-compare
    passes — no scatter at all."""
    wire = _graph_batch_dense_wire(b, n, e, f, seed=seed, half=half)
    m = wire["nodes"].shape[1]
    live = wire["edge_slot"] < b
    slot = wire["edge_slot"][live].astype(np.int64)
    dst = wire["edge_dst"][live].astype(np.int64)
    src = wire["edge_src"][live]
    w = wire["edge_w"][live]
    idx_t, feat_t = src.dtype, w.dtype

    def rows_of(key_local, val_local):
        row = slot * m + key_local
        order = np.argsort(row, kind="stable")
        row, val, ww = row[order], val_local[order], w[order]
        counts = np.bincount(row, minlength=b * m)
        d_pad = max(4, 1 << (max(int(counts.max()), 1) - 1).bit_length())
        starts = np.concatenate([[0], np.cumsum(counts)])
        pos = np.arange(len(row)) - starts[row]
        vals = np.zeros((b * m, d_pad), dtype=idx_t)
        ws = np.zeros((b * m, d_pad), dtype=feat_t)
        vals[row, pos] = val
        ws[row, pos] = ww
        pos_orig = np.empty(len(row), dtype=idx_t)
        pos_orig[order] = pos  # each edge's slot position, original order
        return vals.reshape(b, m, d_pad), ws.reshape(b, m, d_pad), pos_orig

    for k in ("edge_src", "edge_dst", "edge_slot", "edge_w"):
        del wire[k]
    wire["in_src"], wire["in_w"], pos_in = rows_of(dst, src)
    if out_rows:
        # the mirror routes backwards: the fused kernel aggregates over it,
        # and in-row GAT's gather cotangents ride out_pos (each edge's
        # position in its destination's in-row list)
        wire["out_dst"], wire["out_w"], _ = rows_of(src, dst)
        wire["out_pos"], _, _ = rows_of(src, pos_in)
    return wire


def _graph_batch(b: int, n: int, e: int, f: int, seed: int = 0, half: bool = True):
    rng = np.random.default_rng(seed)
    idx_t = np.int16 if (half and n <= 32768) else np.int32
    feat_t = np.float16 if half else np.float32
    # even per-graph blocks (8 trailing padding nodes) with the same
    # lineage-like edge structure as the dense builders
    per = (n - 8) // b
    node_seg = np.repeat(np.arange(b), per).astype(idx_t)
    node_seg = np.concatenate(
        [node_seg, np.full((n - b * per,), b, dtype=idx_t)]
    )
    src_l, dst_l = _lineage_like_edges(rng, b, per, e // b)
    offsets = (np.arange(b) * per)[:, None]
    out = {
        "nodes": rng.normal(size=(n, f)).astype(feat_t),
        "src": (src_l + offsets).reshape(-1).astype(idx_t),
        "dst": (dst_l + offsets).reshape(-1).astype(idx_t),
        "edge_w": np.ones((e // b * b,), dtype=feat_t),
        "edge_mask": np.ones((e // b * b,), dtype=feat_t),
        "y": rng.integers(0, 2, size=(b, 1)).astype(np.float32),
        "y_mask": np.ones((b,), dtype=np.float32),
    }
    if half:  # production wire: counts encoding for the contiguous node ids
        out["node_seg_counts"] = np.bincount(
            node_seg.astype(np.int64), minlength=b + 1
        ).astype(np.int32)
    else:
        out["node_seg"] = node_seg
    return out


def measure_graph_jax(
    b: int,
    n: int,
    e: int,
    iters: int,
    warmup: int,
    dtype: str,
    pipeline: str = "resident",
    fuse: int = 1,
    layout: str = "dense",
    use_gat: bool = False,
    fused_inrow: bool = False,
    sag_pool: bool = False,
    local_pooling: str = "add",
    use_mesh: bool = False,
) -> float:
    """graph_net train-step throughput (reference config: GraphConv h128 tanh;
    --gat swaps in the GATConv variant, h128 over 4 heads; --sag adds
    SAGPooling at the reference sweep's ratio 0.5; --graph-pooling max
    measures the in-row one-hot max arm the sweep's local_pooling=max
    configs ride; --mesh runs the same step data-parallel over the
    (data, model) mesh — the graph-family DP evidence VERDICT r3 item 4
    asked for, measured at the production fuse depth)."""
    import jax

    from point_cloud_classifier_tpu.models import GraphNet, ModelWrapper

    mesh = None
    if use_mesh:
        from point_cloud_classifier_tpu.parallel import default_mesh

        mesh = default_mesh()

    model = GraphNet(
        input_dim=4,
        hidden_dim=128,
        output_dim=1,
        activation="tanh",
        deepchem_style=True,
        compute_dtype=dtype,
        use_gat=use_gat,
        fused_inrow=fused_inrow,
        sag_pool=sag_pool,
        local_pooling=local_pooling,
    )
    wrapper = ModelWrapper(model, learning_rate=1e-3, epochs=1, mesh=mesh)
    half = dtype == "bfloat16"
    from functools import partial as _partial

    mk = {
        "dense": _partial(_graph_batch_dense_inrow, out_rows=fused_inrow),
        "dense-scatter": _graph_batch_dense_wire,
        "dense-host": _graph_batch_dense,
        "flat": _graph_batch,
    }[layout]
    host_batches = [mk(b, n, e, 4, seed=s, half=half) for s in range(4)]
    wrapper._ensure_initialized(host_batches[0])

    if pipeline == "resident":
        if fuse > 1:
            dev_stacked = _resident_stacked(host_batches, fuse, mesh)
        elif mesh is not None:
            from point_cloud_classifier_tpu.parallel.mesh import shard_batch

            dev_batches = [shard_batch(mesh, hb) for hb in host_batches]
        else:
            dev_batches = [
                {k: jax.device_put(v) for k, v in hb.items()} for hb in host_batches
            ]

        def run(k):
            loss = None
            trained = 0
            if fuse > 1:
                for _ in range(max(1, k // fuse)):
                    (
                        wrapper.params,
                        wrapper.batch_stats,
                        wrapper.opt_state,
                        loss,
                    ) = wrapper._train_step_fused(
                        wrapper.params, wrapper.batch_stats, wrapper.opt_state, dev_stacked
                    )
                    trained += fuse
            else:
                for i in range(k):
                    (
                        wrapper.params,
                        wrapper.batch_stats,
                        wrapper.opt_state,
                        loss,
                    ) = wrapper._train_step(
                        wrapper.params,
                        wrapper.batch_stats,
                        wrapper.opt_state,
                        dev_batches[i % len(dev_batches)],
                    )
                    trained += 1
            _window_sync(loss)
            return trained

    else:

        def run(k):
            loss = None
            stream = (host_batches[i % len(host_batches)] for i in range(k))
            trained = 0
            for batch in wrapper._batches(stream):
                wrapper.params, wrapper.batch_stats, wrapper.opt_state, loss = (
                    wrapper._train_step(
                        wrapper.params, wrapper.batch_stats, wrapper.opt_state, batch
                    )
                )
                trained += 1
            _window_sync(loss)
            return trained

    run(warmup)
    best = 0.0
    for _ in range(6):  # best-of-N (see measure_jax)
        t0 = time.perf_counter()
        trained = run(iters)
        best = max(best, b * trained / (time.perf_counter() - t0))
    return best


def measure_infer_latency(
    b: int, p: int, f: int, iters: int, warmup: int, dtype: str,
    quant: str = "none",
):
    """p50 single-batch inference latency (ms) for the flagship model."""
    import jax

    from point_cloud_classifier_tpu.models import DeepSets
    from point_cloud_classifier_tpu.utils.profiling import StepTimer

    model = DeepSets(
        input_dim=f,
        phi_layers=PHI,
        rho_layers=RHO,
        output_dim=1,
        activation="gelu",
        layer_norm=False,  # configs/deep_sets.yaml
        residual_block=True,
        pooling="mean",
        compute_dtype=dtype,
        factored_cols=(1,) if dtype == "bfloat16" else (),
        quant=quant,  # "int8": φ matmuls on the s8 MXU path (ops/quant.py)
    )
    batch = _batch(b, p, f, half=(dtype == "bfloat16"))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    fwd = jax.jit(lambda v, bt: model.apply(v, bt, train=False))
    # latency is timed TO THE RESULT READBACK: ``block_until_ready`` can
    # return before device completion through the axon tunnel (see
    # _window_sync) and a single un-chained dispatch has no back-pressure
    # to save the measurement — np.asarray of the [B, 1] logits is both a
    # true completion proof and the actual serving endpoint (the caller
    # needs the probabilities on the host).
    for _ in range(warmup):
        np.asarray(fwd(variables, batch))
    timer = StepTimer(examples_per_step=b)
    for _ in range(iters):
        with timer.step():
            np.asarray(fwd(variables, batch))
    return timer.summary()


def measure_eval_throughput(
    b: int, p: int, f: int, iters: int, warmup: int, dtype: str,
    fuse: int = 1, phi: str = "auto", width: int | None = None,
    resident: bool = False, quant: str = "none",
):
    """Validation/scoring throughput (clouds/sec) over a batch stream.

    The batch-scoring path (``train.py evaluate`` / ``infer``):
    ``ModelWrapper._evaluate`` over distinct batches.  ``fuse`` scan-fuses
    K same-shape eval steps into one dispatched program
    (``models/wrapper._eval_dispatch``) — the eval-side analogue of train
    step fusion; fuse=1 is the per-batch baseline arm.

    Two pipelines, mirroring :func:`measure_jax`:

    - stream (default): the full ``_evaluate`` surface over host batches,
      H2D and the per-call blocking readback inside the window —
      tunnel-bound, only meaningful in healthy windows
    - ``resident``: device truth for the eval φ-path policy A/Bs — the
      batches are pinned in HBM, stacked, and the FUSED EVAL PROGRAM
      (``wrapper._eval_step_fused``) is dispatched iters× with one final
      block, exactly like the resident train measurement.  Going through
      ``_evaluate`` here would block on a device_get every call, and in a
      dispatch-degraded window that roundtrip (~50 ms) drowns the ~2 ms
      device signal — both arms of the first policy A/B measured an
      identical 39.5k clouds/sec of pure tunnel noise (2026-08-18).
      ``phi``/``width`` select the fused-Pallas-vs-XLA forward and the φ
      width, since the measured eval crossover is width-dependent — see
      ``DeepSets._use_pallas``.
    """
    import jax

    from point_cloud_classifier_tpu.models import DeepSets, ModelWrapper

    model = DeepSets(
        input_dim=f,
        phi_layers=[width, width] if width else PHI,
        rho_layers=RHO,
        output_dim=1,
        activation="gelu",
        layer_norm=False,  # configs/deep_sets.yaml
        residual_block=True,
        pooling="mean",
        compute_dtype=dtype,
        factored_cols=(1,) if dtype == "bfloat16" else (),
        fused_phi=phi,
        quant=quant,
    )
    wrapper = ModelWrapper(
        model, learning_rate=1e-3, epochs=1, optimizer="adamw",
        fuse_steps=max(fuse, 2) if resident else fuse,  # the resident arm
        # times the FUSED program, which only builds at fuse >= 2
    )
    host_batches = [
        _batch(b, p, f, seed=s, half=(dtype == "bfloat16")) for s in range(8)
    ]
    wrapper._ensure_initialized(host_batches[0])
    if resident:
        # fuse 1 measures the honest per-batch baseline (the unfused
        # eval program); fuse >= 2 measures the scan-fused program at
        # exactly the requested depth.  _ensure_initialized already
        # built both jitted programs — no throwaway _evaluate compile.
        k = max(fuse, 1)
        if k == 1:
            resident_b = {
                key: jax.device_put(v) for key, v in host_batches[0].items()
            }
            step = wrapper._eval_step
        else:
            resident_b = {
                key: jax.device_put(
                    np.stack(
                        [host_batches[s % len(host_batches)][key] for s in range(k)]
                    )
                )
                for key in host_batches[0]
            }
            step = wrapper._eval_step_fused
        jax.block_until_ready(list(resident_b.values()))
        out = None  # warmup=0 callers (scripts import these fns directly)
        for _ in range(warmup):
            out = step(wrapper.params, wrapper.batch_stats, resident_b)
        if out is not None:
            _window_sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(wrapper.params, wrapper.batch_stats, resident_b)
        _window_sync(out)
        dt = time.perf_counter() - t0
        return b * k * iters / dt
    for _ in range(warmup):  # compiles both the fused and single programs
        wrapper._evaluate(host_batches)
    t0 = time.perf_counter()
    for _ in range(iters):
        wrapper._evaluate(host_batches)
    dt = time.perf_counter() - t0
    return b * len(host_batches) * iters / dt


def measure_graph_eval_throughput(
    b: int, n: int, e: int, iters: int, warmup: int, dtype: str,
    fuse: int = 1, use_gat: bool = False, resident: bool = True,
):
    """graph_net scoring throughput (graphs/sec) — the ``train.py
    evaluate`` / ``infer`` path over the dense in-row wire, mirroring
    :func:`measure_eval_throughput`'s two pipelines (resident = device
    truth via the scan-fused eval program; stream = the full
    ``_evaluate`` surface, tunnel-bound)."""
    import jax

    from point_cloud_classifier_tpu.models import GraphNet, ModelWrapper

    model = GraphNet(
        input_dim=4,
        hidden_dim=128,
        output_dim=1,
        activation="tanh",
        deepchem_style=True,
        compute_dtype=dtype,
        use_gat=use_gat,
    )
    wrapper = ModelWrapper(
        model, learning_rate=1e-3, epochs=1,
        fuse_steps=max(fuse, 2) if resident else fuse,
    )
    half = dtype == "bfloat16"
    host_batches = [
        _graph_batch_dense_inrow(b, n, e, 4, seed=s, half=half) for s in range(8)
    ]
    wrapper._ensure_initialized(host_batches[0])
    if resident:
        k = max(fuse, 1)
        if k == 1:
            resident_b = {
                key: jax.device_put(v) for key, v in host_batches[0].items()
            }
            step = wrapper._eval_step
        else:
            resident_b = {
                key: jax.device_put(
                    np.stack(
                        [host_batches[s % len(host_batches)][key] for s in range(k)]
                    )
                )
                for key in host_batches[0]
            }
            step = wrapper._eval_step_fused
        jax.block_until_ready(list(resident_b.values()))
        out = None  # warmup=0 callers (scripts import these fns directly)
        for _ in range(warmup):
            out = step(wrapper.params, wrapper.batch_stats, resident_b)
        if out is not None:
            _window_sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(wrapper.params, wrapper.batch_stats, resident_b)
        _window_sync(out)
        return b * k * iters / (time.perf_counter() - t0)
    for _ in range(warmup):
        wrapper._evaluate(host_batches)
    t0 = time.perf_counter()
    for _ in range(iters):
        wrapper._evaluate(host_batches)
    return b * len(host_batches) * iters / (time.perf_counter() - t0)


def _tabular_batch(b: int, f: int, seed: int = 0):
    """Synthetic tabular batch in the TabularLoader wire format
    (``{"x" [B, F], "y" [B, 1], "y_mask" [B]}``, all f32 — the 9 engineered
    features are scaler outputs, no fp16 wire)."""
    rng = np.random.default_rng(seed)
    return {
        "x": rng.standard_normal((b, f), dtype=np.float32),
        "y": (rng.random((b, 1)) < 0.5).astype(np.float32),
        "y_mask": np.ones((b,), dtype=np.float32),
    }


def measure_fcn_jax(
    b: int, f: int, iters: int, warmup: int, dtype: str = "bfloat16",
    fuse: int = 256, pipeline: str = "resident",
) -> float:
    """fully_connected_net train throughput (events/sec) over the tabular
    wire — configs/fully_connected_net.yaml exactly (9 features, hidden
    [32, 32, 64], masked BatchNorm, adam @ 1e-3, batch 32).  The step is
    microscopic ([B, 9] matmuls), so the row is dispatch-bound unless the
    ``lax.scan`` step fusion amortizes the host round trip — which is the
    point: the tabular family rides the same device-truth methodology as
    the flagship (BASELINE.md)."""
    import jax

    from point_cloud_classifier_tpu.models import FullyConnectedNet, ModelWrapper

    model = FullyConnectedNet(
        input_dim=f,
        hidden_layers=[32, 32, 64],
        batch_normalization=True,
        output_dim=1,
        compute_dtype=dtype,
    )
    wrapper = ModelWrapper(
        model, learning_rate=1e-3, epochs=1, optimizer="adam", fuse_steps=fuse
    )
    host_batches = [_tabular_batch(b, f, seed=s) for s in range(8)]
    wrapper._ensure_initialized(host_batches[0])
    if pipeline == "resident":
        if fuse > 1:
            stacked = {
                k: jax.device_put(
                    np.stack(
                        [host_batches[i % len(host_batches)][k] for i in range(fuse)]
                    )
                )
                for k in host_batches[0]
            }
            step = wrapper._train_step_fused
        else:
            stacked = {k: jax.device_put(v) for k, v in host_batches[0].items()}
            step = wrapper._train_step

        def run(n):
            loss, trained = None, 0
            for _ in range(max(1, n // max(fuse, 1))):
                (
                    wrapper.params,
                    wrapper.batch_stats,
                    wrapper.opt_state,
                    loss,
                ) = step(wrapper.params, wrapper.batch_stats, wrapper.opt_state, stacked)
                trained += max(fuse, 1)
            _window_sync(loss)
            return trained

        run(warmup)
        best = 0.0
        for _ in range(6):
            t0 = time.perf_counter()
            trained = run(iters)
            best = max(best, b * trained / (time.perf_counter() - t0))
        return best

    def run(n):
        loss, count = None, 0
        stream = (host_batches[i % len(host_batches)] for i in range(n))
        for batch in wrapper._batches(stream):
            wrapper.params, wrapper.batch_stats, wrapper.opt_state, loss = (
                wrapper._train_step(
                    wrapper.params, wrapper.batch_stats, wrapper.opt_state, batch
                )
            )
            count += 1
        _window_sync(loss)
        return count

    run(warmup)
    best = 0.0
    for _ in range(6):
        t0 = time.perf_counter()
        trained = run(iters)
        best = max(best, b * trained / (time.perf_counter() - t0))
    return best


def measure_torch_fcn_reference(b: int, f: int, iters: int, warmup: int) -> float:
    """Reference fully_connected_net train step in torch on CPU — the
    verbatim reference module (`models/fully_connected_net.py:5-29`:
    Linear→BatchNorm1d→ReLU per hidden layer, bare output Linear) under
    the reference trainer semantics (`models/wrapper.py:29-38`: adam @
    1e-3, BCEWithLogitsLoss)."""
    import torch
    from torch import nn

    torch.manual_seed(0)
    layers, in_f = [], f
    for hidden in [32, 32, 64]:
        layers += [nn.Linear(in_f, hidden), nn.BatchNorm1d(hidden), nn.ReLU()]
        in_f = hidden
    layers.append(nn.Linear(in_f, 1))
    net = nn.Sequential(*layers)
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    loss_fn = nn.BCEWithLogitsLoss()
    gen = torch.Generator().manual_seed(1)
    xs = [torch.randn(b, f, generator=gen) for _ in range(8)]
    ys = [(torch.rand(b, 1, generator=gen) < 0.5).float() for _ in range(8)]

    def step(i):
        opt.zero_grad()
        loss = loss_fn(net(xs[i % 8]), ys[i % 8])
        loss.backward()
        opt.step()

    for i in range(warmup):
        step(i)
    t0 = time.perf_counter()
    for i in range(iters):
        step(i)
    return b * iters / (time.perf_counter() - t0)


def measure_torch_reference(b: int, p: int, f: int, iters: int, warmup: int) -> float:
    """Reference-semantics deep_sets train step in torch on CPU.

    Mirrors `models/deep_sets.py:81-114` (φ over all points, bincount+split,
    per-chunk python pooling loop, ρ) and `models/wrapper.py:51-74`
    (BCEWithLogitsLoss, adamw, per-batch loss.item() sync).
    """
    import torch
    import torch.nn as nn

    class RefResidual(nn.Module):
        # reference ResidualBlock with layer_norm=False → Identity norm
        # (configs/deep_sets.yaml sets layer_norm: false)
        def __init__(self, dim):
            super().__init__()
            self.lin = nn.Linear(dim, dim)
            self.act = nn.GELU()

        def forward(self, x):
            return x + self.act(self.lin(x))

    def mlp(dims_in, widths):
        layers, d = [], dims_in
        prev_width = None
        for w in widths:
            if prev_width == w:
                layers.append(RefResidual(w))
            else:
                layers += [nn.Linear(d, w), nn.GELU()]
            d, prev_width = w, w
        return nn.Sequential(*layers), d

    class RefDeepSets(nn.Module):
        def __init__(self):
            super().__init__()
            self.phi, phi_out = mlp(f, PHI)
            self.phi_final = nn.Linear(phi_out, phi_out)
            self.rho, rho_out = mlp(phi_out, RHO)
            self.head = nn.Linear(rho_out, 1)

        def forward(self, x, idx, batch_size):
            h = self.phi_final(self.phi(x))
            counts = torch.bincount(idx, minlength=batch_size)
            chunks = torch.split(h, counts.tolist())
            pooled = [c.mean(dim=0) for c in chunks]  # mean pooling
            return self.head(self.rho(torch.stack(pooled)))

    batch = _batch(b, p, f, half=False)
    x = torch.from_numpy(batch["points"])
    idx = torch.from_numpy(batch["seg"]).long()
    y = torch.from_numpy(batch["y"])

    model = RefDeepSets()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    loss_fn = nn.BCEWithLogitsLoss()

    def step():
        opt.zero_grad()
        logits = model(x, idx, b)
        loss = loss_fn(logits, y)
        loss.backward()
        opt.step()
        return loss.item()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    return b * iters / dt


def measure_torch_graph_reference(
    b: int, n: int, e: int, f: int, iters: int, warmup: int
) -> float:
    """Reference-semantics graph_net train step in torch on CPU.

    The actual reference (`models/graph_net.py:8-103`) needs
    torch_geometric, absent here; this mirrors its default config exactly —
    GraphConv(add) h128 ×2 with `x' = W1·aggr(w·x_src) + W2·x`
    (torch_geometric GraphConv semantics), tanh, BatchNorm1d after each
    conv, deepchem_style fc1(128→256)+tanh+bn3 before a global mean pool
    over membership, fc2 head (`models/graph_net.py:73-102`), plus the
    trainer loop shape (`models/wrapper.py:51-74`: BCEWithLogitsLoss, adam
    per configs/graph_net.yaml, per-batch loss.item() sync).
    """
    import torch
    import torch.nn as nn

    class RefGraphConv(nn.Module):
        def __init__(self, dim_in, dim_out):
            super().__init__()
            self.lin_rel = nn.Linear(dim_in, dim_out)
            self.lin_root = nn.Linear(dim_in, dim_out, bias=False)

        def forward(self, x, src, dst, w):
            msg = x[src] * w[:, None]
            agg = torch.zeros(x.shape[0], x.shape[1])
            agg.index_add_(0, dst, msg)
            return self.lin_rel(agg) + self.lin_root(x)

    class RefGraphNet(nn.Module):
        def __init__(self, hidden=128):
            super().__init__()
            self.conv1 = RefGraphConv(f, hidden)
            self.bn1 = nn.BatchNorm1d(hidden)
            self.conv2 = RefGraphConv(hidden, hidden)
            self.bn2 = nn.BatchNorm1d(hidden)
            self.fc1 = nn.Linear(hidden, 256)
            self.bn3 = nn.BatchNorm1d(256)
            self.fc2 = nn.Linear(256, 1)

        def forward(self, x, src, dst, w, membership, batch_size):
            x = self.bn1(torch.tanh(self.conv1(x, src, dst, w)))
            x = self.bn2(torch.tanh(self.conv2(x, src, dst, w)))
            x = self.bn3(torch.tanh(self.fc1(x)))  # deepchem_style
            pooled = torch.zeros(batch_size, x.shape[1])
            pooled.index_add_(0, membership, x)
            counts = torch.bincount(membership, minlength=batch_size).clamp(min=1)
            return self.fc2(pooled / counts[:, None].float())

    rng = np.random.default_rng(0)
    per = n // b
    src_l, dst_l = _lineage_like_edges(rng, b, per, e // b)
    offsets = (np.arange(b) * per)[:, None]
    x = torch.from_numpy(rng.normal(size=(b * per, f)).astype(np.float32))
    src = torch.from_numpy((src_l + offsets).reshape(-1)).long()
    dst = torch.from_numpy((dst_l + offsets).reshape(-1)).long()
    w = torch.ones(len(src))
    membership = torch.from_numpy(np.repeat(np.arange(b), per)).long()
    y = torch.from_numpy(rng.integers(0, 2, size=(b, 1)).astype(np.float32))

    model = RefGraphNet()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    loss_fn = nn.BCEWithLogitsLoss()

    def step():
        opt.zero_grad()
        logits = model(x, src, dst, w, membership, b)
        loss = loss_fn(logits, y)
        loss.backward()
        opt.step()
        return loss.item()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    return b * iters / (time.perf_counter() - t0)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="flagship train-step benchmark")
    parser.add_argument("--smoke", action="store_true", help="tiny CPU-safe shapes")
    parser.add_argument(
        "--measure-baseline",
        action="store_true",
        help="measure the reference-equivalent torch CPU train step instead",
    )
    parser.add_argument("--iters", type=int, default=None)
    parser.add_argument(
        "--dtype",
        default="bfloat16",
        choices=["bfloat16", "float32"],
        help="compute dtype for the jax measurement (params stay f32)",
    )
    parser.add_argument(
        "--model",
        default="deep_sets",
        choices=["deep_sets", "graph_net", "fully_connected_net"],
        help="which train-step workload to measure",
    )
    parser.add_argument(
        "--latency",
        action="store_true",
        help="measure p50 single-batch inference latency instead of training throughput",
    )
    parser.add_argument(
        "--eval-throughput",
        action="store_true",
        help="measure batch-scoring throughput (ModelWrapper._evaluate "
        "over a host batch stream) instead of training; --fuse K scan-"
        "fuses K eval steps per dispatch, --fuse 1 is the baseline arm",
    )
    parser.add_argument(
        "--eval-device",
        action="store_true",
        help="like --eval-throughput but with the batches pinned in HBM "
        "before the window (device truth — the arm for eval phi-path "
        "policy A/Bs; combine with --phi/--phi-width)",
    )
    parser.add_argument(
        "--phi-width",
        type=int,
        default=None,
        help="override the phi hidden width (two layers of this width) — "
        "the eval fused-kernel crossover is width-dependent",
    )
    parser.add_argument(
        "--mesh",
        action="store_true",
        help="shard the flagship train step over all visible devices (data axis)",
    )
    parser.add_argument(
        "--fuse",
        type=int,
        default=None,
        help="scan K train steps per dispatch (step fusion); default 16 for "
        "the resident pipeline, 1 for stream",
    )
    parser.add_argument(
        "--fused-inrow",
        action="store_true",
        help="enable the opt-in Pallas in-row aggregation kernel on the "
        "dense graph layout (A/B-measured slower at bench shapes — see "
        "docs/kernels.md)",
    )
    parser.add_argument(
        "--gat",
        action="store_true",
        help="graph_net workload uses GATConv (4 heads) instead of GraphConv",
    )
    parser.add_argument(
        "--sag",
        action="store_true",
        help="graph_net workload adds SAGPooling (ratio 0.5, the reference "
        "sweep's sag_pool=True arm) — pairs with --gat and --graph-layout "
        "for the dense-vs-flat SAG A/B",
    )
    parser.add_argument(
        "--graph-layout",
        default="dense",
        choices=["dense", "dense-scatter", "dense-host", "flat"],
        help="graph batch layout for --model graph_net: dense batched "
        "adjacency (message passing as MXU matmuls; 'dense': in-row wire, "
        "adj compare-built on device; 'dense-scatter': flat edge triples "
        "+ device scatter; 'dense-host': host-packed B*M*M buffer) or "
        "flat edge lists",
    )
    parser.add_argument(
        "--graph-pooling",
        default="add",
        choices=["add", "mean", "max"],
        help="graph_net GraphConv local_pooling (the reference sweep "
        "samples all three; max rides per-slot one-hot einsums on the "
        "dense wire since round 3)",
    )
    parser.add_argument(
        "--phi",
        default="auto",
        choices=["auto", "on", "off", "tail"],
        help="deep_sets phi path: 'on' forces the fused Pallas fwd+bwd "
        "pair, 'off' forces XLA, 'tail' fuses only the final linear + "
        "pooling (closed-form backward, no recompute), 'auto' is the "
        "shipped policy (models/deep_sets._use_pallas) — for same-window "
        "kernel A/B",
    )
    parser.add_argument(
        "--pc-layout",
        default="dense",
        choices=["flat", "dense", "dense-pad"],
        help="deep_sets point-cloud wire (default 'dense' = the headline: "
        "per-cloud rows [B, M, F], masked matvec pooling, M = P/B — the "
        "length-sorted loader's steady state, dataset.layout auto|dense); "
        "'flat' = concatenated [P, F] + counts (one-hot MXU pool); "
        "'dense-pad' = dense with 25%% in-row padding (unsorted bound) — "
        "for same-window layout A/B",
    )
    parser.add_argument(
        "--quant",
        default="none",
        choices=["none", "int8"],
        help="with --latency: run the φ chain on the int8 MXU path "
        "(dynamic per-row activation × per-channel weight quantization, "
        "ops/quant.py) — serving-path A/B vs the float forward",
    )
    parser.add_argument(
        "--pipeline",
        default="resident",
        choices=["resident", "stream"],
        help="resident: dataset pinned in HBM after a one-time upload "
        "(steady-state production pipeline, data/resident.py); stream: "
        "every batch crosses host→device inside the measurement",
    )
    args = parser.parse_args(argv)
    # warm-start policy (utils/jit_cache.py): reuse compiled executables
    # across bench invocations — steady-state timing loops are unaffected
    # (they time post-compile steps), only cold-start drops
    from point_cloud_classifier_tpu.utils.jit_cache import enable_default_cache

    enable_default_cache()
    if args.fuse is None:
        # Host-wire dense graph batches carry a [B, M, M] adjacency
        # (~134 MB each at the flagship shape), so cap their fused stack
        # at 4 to bound the resident HBM footprint (the device-wire
        # 'dense' layout ships only edge lists — full fusion).  --mesh
        # rides the same fused defaults: the fused steps constrain the
        # stacked window to the data-parallel shardings (_stack_in_jit).
        if args.pipeline == "resident":
            # deep fuse so the headline tracks the DEVICE even when the
            # tunnel inflates per-dispatch cost (measured in one degraded
            # window, deep_sets: fuse 16 -> 2.81 ms/step, 64 -> 1.40,
            # 256 -> 1.03 = the healthy-window device truth).  deep_sets
            # batches are ~0.7 MB on the wire, so 256 of them sit fine in
            # HBM; graph in-row batches are ~4 MB -> 256 stack to ~1 GB,
            # still fine (fuse 64 measured 288.4k vs 256's 322.8k
            # graphs/sec same-window 2026-08-20 — ~11% residual dispatch
            # cost at 64 in degraded windows; GAT/SAG/max rows gain 3-6%
            # too); host-wire dense graph batches carry a [B, M, M]
            # adjacency (~134 MB each at the flagship shape) -> fuse 4
            if args.model == "graph_net":
                args.fuse = 4 if args.graph_layout == "dense-host" else 256
            elif args.model == "fully_connected_net":
                # the tabular step is microseconds, so only a very deep
                # scan amortizes per-dispatch cost; batches are ~1.3 KB,
                # 1024 of them stack to ~1.3 MB on the wire
                args.fuse = 1024
            else:
                args.fuse = 256
        else:
            args.fuse = 1

    if args.smoke:
        b, p, iters, warmup = 32, 2048, 5, 2
        # --smoke is the TUNNEL-health probe (CLAUDE.md: >=100k clouds/sec
        # = healthy window): force per-step H2D + per-step dispatch so it
        # measures the transport, not the device (the deep-fuse resident
        # default reports ~device truth even in degraded windows).  The
        # wire is pinned FLAT: every historical health threshold
        # (>=100k, watcher gates) was calibrated on the flat wire
        if args.pc_layout != "dense":  # non-default => explicitly requested
            print("# --smoke: pinning --pc-layout flat (health thresholds "
                  "are calibrated on the flat wire)", file=sys.stderr)
        args.pipeline, args.fuse, args.pc_layout = "stream", 1, "flat"
    else:
        # resident windows hold several fused dispatches so the per-window
        # device sync (up to ~0.5 s on a degraded tunnel) is amortized
        default_iters = max(ITERS, 4 * args.fuse) if args.pipeline == "resident" else ITERS
        b, p, iters, warmup = B, P, args.iters or default_iters, WARMUP
        # PCC_BENCH_SCALE: diagnostic workload multiplier (B and P scale
        # together).  NOT per-cloud-comparable: the one-hot segment ops
        # (pool contraction [B+1, P] @ [P, H], segment-id broadcast
        # compare) are O(B*P), so scale 2 QUADRUPLES their work — the
        # 2026-08-18 scale-2 row measured 157k vs 489k clouds/sec mostly
        # from that quadratic term, not fixed overhead.  Use same-scale
        # A/Bs only.  Not the headline workload.
        scale = int(os.environ.get("PCC_BENCH_SCALE", "1"))
        if scale > 1:
            b, p = b * scale, p * scale

    if (
        args.pipeline == "stream"
        and not args.smoke
        and args.model in ("graph_net", "fully_connected_net")
        and (args.fuse or 1) > 1
    ):
        # only measure_jax implements stream-side fusion; the graph/fcn
        # stream paths dispatch per batch — say so instead of letting a
        # stream fuse-A/B read as "fusion has no effect"
        print(
            "# note: the graph_net/fcn stream paths are UNFUSED "
            "(--fuse applies to their resident rows only)",
            file=sys.stderr,
        )
    if args.model != "graph_net" and (
        args.gat or args.sag or args.fused_inrow
        or args.graph_layout != "dense"
        or args.graph_pooling != "add"
    ):
        raise SystemExit(
            "--gat/--sag/--fused-inrow/--graph-layout/--graph-pooling are "
            "graph_net arms; pass --model graph_net (refusing beats "
            "silently benching deep_sets)"
        )
    if args.model == "graph_net" and not args.smoke and (
        args.phi != "auto" or args.pc_layout != "dense"
    ):  # --smoke pins pc_layout itself; a graph smoke is not a phi arm
        raise SystemExit(
            "--phi/--pc-layout are deep_sets arms; drop them or drop "
            "--model graph_net"
        )
    if args.phi != "auto" and args.pc_layout != "flat":
        # the fused φ kernels are FLAT-wire ops: on the dense per-cloud-row
        # wire the model reroutes to XLA (models/deep_sets.py dense_wire
        # override), so a --phi kernel A/B on the dense default would
        # silently measure the XLA path in BOTH arms
        print(
            "# --phi != auto: pinning --pc-layout flat "
            "(the fused kernels are flat-wire ops)",
            file=sys.stderr,
        )
        args.pc_layout = "flat"

    if args.quant != "none" and not (
        args.latency or args.eval_throughput or args.eval_device
    ):
        # silently running the float train step "with quant" would hand an
        # A/B reader the wrong number — the int8 path is serving-only
        raise SystemExit(
            "--quant requires --latency or --eval-throughput/--eval-device "
            "(int8 is an inference path)"
        )

    if args.model == "fully_connected_net" and (
        args.eval_throughput or args.eval_device or args.latency
    ):
        raise SystemExit(
            "--model fully_connected_net measures train throughput only "
            "(the serving rows bench the deep_sets / graph_net families)"
        )
    if args.model == "fully_connected_net" and args.mesh:
        # Refusing beats lying: the fcn row has no mesh path, and --mesh
        # also flips the resolved fuse default to 1, so the combo would
        # print a dispatch-bound single-device number under the same
        # metric key as the real fuse-1024 row.
        raise SystemExit(
            "--mesh is not supported for --model fully_connected_net "
            "(mesh rows bench the deep_sets family; the fcn step is "
            "microseconds and gains nothing from sharding)"
        )

    if args.sag and (
        args.model != "graph_net"
        or args.eval_throughput
        or args.eval_device
        or args.latency
    ):
        # refusing beats silently benching a different model (same class as
        # the --gat/--mesh guards): --sag exists for the graph_net TRAIN
        # layout A/B
        raise SystemExit(
            "--sag is the graph_net train workload arm (pairs with --gat/"
            "--graph-layout); it has no eval/latency row"
        )

    if args.eval_throughput or args.eval_device:
        # fuse groups cap at the 8-batch stream regardless of the resolved
        # default; `--fuse 1` is the per-batch baseline arm
        if args.model == "graph_net":
            if args.quant == "int8":
                raise SystemExit("--quant int8 is the deep_sets phi path")
            cps = measure_graph_eval_throughput(
                b, p, 2 * p, max(3, iters // 8), warmup, args.dtype,
                fuse=args.fuse, use_gat=args.gat, resident=args.eval_device,
            )
            metric = "graph_net_eval_graphs_per_sec" + (
                "_gat" if args.gat else ""
            )
            if args.eval_device:
                metric += "_device"
            print(
                json.dumps(
                    {
                        "metric": metric,
                        "value": round(cps, 1),
                        "unit": "graphs/sec",
                        "vs_baseline": None,
                    }
                )
            )
            return
        cps = measure_eval_throughput(
            b, p, F, max(3, iters // 8), warmup, args.dtype, fuse=args.fuse,
            phi=args.phi, width=args.phi_width, resident=args.eval_device,
            quant=args.quant,
        )
        metric = "deep_sets_eval_clouds_per_sec"
        if args.eval_device:
            metric += "_device"
        if args.quant == "int8":
            metric += "_int8"
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": round(cps, 1),
                    "unit": "clouds/sec",
                    "vs_baseline": None,
                }
            )
        )
        return

    if args.latency:
        if args.model != "deep_sets":
            # refusing beats silently benching a different model (the
            # guard policy the --sag/--quant/fcn rows already follow):
            # the latency row is the deep_sets serving path only
            raise SystemExit(
                "--latency benches the deep_sets serving path; "
                f"--model {args.model} has no latency row"
            )
        # raw flag with a 300-sample default (the device-p50 methodology's
        # count): the resident-train 4*fuse default meant 1024 sequential
        # blocking readbacks per latency row
        s = measure_infer_latency(
            b, p, F, max(args.iters or 300, 20), warmup, args.dtype,
            quant=args.quant,
        )
        print(
            json.dumps(
                {
                    "metric": "deep_sets_infer_p50_latency"
                    + ("_int8" if args.quant == "int8" else ""),
                    "value": round(s["p50_ms"], 4),
                    "unit": "ms",
                    "vs_baseline": None,
                }
            )
        )
        return

    if args.model == "fully_connected_net" and not args.measure_baseline:
        # configs/fully_connected_net.yaml batch size, independent of the
        # point-cloud workload's B/P
        eps = measure_fcn_jax(
            32, 9, iters, warmup, args.dtype, fuse=args.fuse,
            pipeline=args.pipeline,
        )
        vs = (
            round(eps / REFERENCE_CPU_FCN_EVENTS_PER_SEC, 2)
            if (REFERENCE_CPU_FCN_EVENTS_PER_SEC and not args.smoke)
            else None
        )
        print(
            json.dumps(
                {
                    "metric": "fully_connected_net_train_events_per_sec",
                    "value": round(eps, 2),
                    "unit": "events/sec",
                    "vs_baseline": vs,
                }
            )
        )
        return

    if args.model == "graph_net" and not args.measure_baseline:
        n, e = (p, 2 * p)
        cps = measure_graph_jax(
            b,
            n,
            e,
            iters,
            warmup,
            args.dtype,
            pipeline=args.pipeline,
            fuse=args.fuse,
            layout=args.graph_layout,
            use_gat=args.gat,
            fused_inrow=args.fused_inrow,
            sag_pool=args.sag,
            local_pooling=args.graph_pooling,
            use_mesh=args.mesh,
        )
        print(
            json.dumps(
                {
                    "metric": "graph_net_train_graphs_per_sec"
                    + ("_sag" if args.sag else "")
                    + (f"_{args.graph_pooling}" if args.graph_pooling != "add" else ""),
                    "value": round(cps, 2),
                    "unit": "graphs/sec",
                    "vs_baseline": None,
                }
            )
        )
        return

    if args.measure_baseline:
        if args.gat or args.sag:
            raise SystemExit(
                "--measure-baseline benches the reference GraphConv config; "
                "torch GAT/SAG references are not implemented here, so "
                "--gat/--sag would make the comparison apples-to-oranges"
            )
        if args.model == "graph_net":
            cps = measure_torch_graph_reference(
                b, p, 2 * p, 4, args.iters or 5, warmup
            )  # raw flag: the 4*fuse resident default is not a torch-CPU count
        elif args.model == "fully_connected_net":
            cps = measure_torch_fcn_reference(32, 9, args.iters or 2000, 200)
            print(
                json.dumps(
                    {
                        "metric": "fully_connected_net_train_events_per_sec"
                        "_torch_cpu_reference",
                        "value": round(cps, 2),
                        "unit": "events/sec",
                        "vs_baseline": 1.0,
                    }
                )
            )
            return
        else:
            cps = measure_torch_reference(b, p, F, args.iters or 5, warmup)
        print(
            json.dumps(
                {
                    "metric": (
                        f"{args.model}_train_"
                        + ("graphs" if args.model == "graph_net" else "clouds")
                        + "_per_sec_torch_cpu_reference"
                    ),
                    "value": round(cps, 2),
                    "unit": "graphs/sec" if args.model == "graph_net" else "clouds/sec",
                    "vs_baseline": 1.0,
                }
            )
        )
        return

    cps = measure_jax(
        b,
        p,
        F,
        iters,
        warmup,
        dtype=args.dtype,
        use_mesh=args.mesh,
        fuse=args.fuse,
        pipeline=args.pipeline,
        phi=args.phi,
        pc_layout=args.pc_layout,
    )
    vs = (
        round(cps / REFERENCE_CPU_CLOUDS_PER_SEC, 2)
        if (REFERENCE_CPU_CLOUDS_PER_SEC and not args.smoke)
        else None
    )
    print(
        json.dumps(
            {
                "metric": "deep_sets_train_clouds_per_sec",
                "value": round(cps, 2),
                "unit": "clouds/sec",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
