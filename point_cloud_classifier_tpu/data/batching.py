"""Static-shape, bucketed batch iterators.

TPU/XLA requires static shapes: every distinct input shape triggers a fresh
compilation.  The reference's ragged collates (`utils/data.py:651-663` sparse
point-cloud collate, `:1228-1261` graph collate) are re-designed here as
**flattened buffers + segment ids, padded to power-of-two buckets**:

- point clouds: ``points [P_pad, F]`` + ``seg [P_pad]`` (event index per
  point, padding rows get segment ``B``), labels ``y [B, 1]`` with ``y_mask``
- graphs: additionally ``src/dst [E_pad]`` edge endpoints (padding edges point
  at a reserved padding node) + ``edge_mask`` / ``edge_weight``
- tabular: fixed ``x [B, F]``; only the final partial batch is padded

This keeps the math identical to the reference's ragged formulation (no
per-event padding waste, exact segment reductions) while giving XLA a small,
bounded set of shapes: the batch dim is always ``B`` and the flattened dims
are rounded up to powers of two.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..native import (
    pack_graph_dense_native,
    pack_graph_flat_native,
    pack_graph_inrow_native,
    pack_pointcloud_dense_native,
    pack_pointcloud_native,
)


def pow2_bucket(n: int, min_size: int = 256, factor: float = 2.0) -> int:
    """Smallest ``min_size * factor^k`` (rounded up to a multiple of 8) that
    covers ``n``.  factor=2.0 keeps the classic power-of-two ladder; smaller
    factors (e.g. 1.25) trade a few extra compiled shapes for up to ~40%
    less padding shipped over the host→device link."""
    if factor <= 1.0:
        # loud: `size *= factor` can never reach n, so a config typo like
        # bucket_factor=1.0 would spin the first __iter__ forever
        raise ValueError(f"bucket factor must be > 1.0, got {factor}")
    size = float(min_size)
    while size < n:
        size *= factor
    return -(-int(round(size)) // 8) * 8


Batch = Dict[str, np.ndarray]


class TabularLoader:
    """Fixed-size feature-matrix batches; final partial batch is mask-padded."""

    def __init__(
        self,
        X: np.ndarray,
        y: np.ndarray,
        batch_size: int,
        shuffle: bool,
        seed: int = 0,
    ):
        self.X = np.ascontiguousarray(X, dtype=np.float32)
        self.y = np.asarray(y, dtype=np.float32).reshape(-1)
        self.batch_size = int(batch_size) if batch_size else len(self.y)
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0

    @property
    def n_examples(self) -> int:
        return len(self.y)

    def __len__(self) -> int:
        return -(-self.n_examples // self.batch_size)

    def __iter__(self) -> Iterator[Batch]:
        n, b = self.n_examples, self.batch_size
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(self.seed + self._epoch).permutation(n)
            self._epoch += 1
        for start in range(0, n, b):
            idx = order[start : start + b]
            k = len(idx)
            x = np.zeros((b, self.X.shape[1]), dtype=np.float32)
            yb = np.zeros((b, 1), dtype=np.float32)
            mask = np.zeros((b,), dtype=np.float32)
            x[:k] = self.X[idx]
            yb[:k, 0] = self.y[idx]
            mask[:k] = 1.0
            yield {"x": x, "y": yb, "y_mask": mask}


def _dense_rung(n: int) -> int:
    """Smallest k·2^j ≥ n with k in 8..15 (and ≥ 8): a float-mantissa-style
    rung ladder — ≤ 14% padding waste, ~8 rungs per octave, so the dense
    point-cloud wire compiles a bounded set of M shapes."""
    n = max(int(n), 8)
    j = max((n - 1).bit_length() - 4, 0)
    return -(-n // (1 << j)) << j


class PointCloudLoader:
    """Flattened point batches: ``points [P_pad, F]`` + segment ids.

    Stores all events as one contiguous array plus offsets, so a batch is a
    cheap row-gather.  Padding points carry segment id ``B`` (one past the
    last event) so a ``segment_sum`` with ``num_segments=B+1`` isolates them.
    """

    def __init__(
        self,
        event_features: Sequence[np.ndarray],
        labels: np.ndarray,
        batch_size: int,
        shuffle: bool,
        seed: int = 0,
        min_bucket: int = 256,
        transfer_dtype: str = "float32",
        seg_encoding: str = "ids",
        factor_event_cols: Sequence[int] = (),
        bucket_factor: float = 2.0,
        length_sorted: bool = False,
        layout: str = "flat",
    ):
        # length_sorted: group similar-size events into the same batch
        # (shuffling BATCH order, not event order) — less padding per
        # batch at the cost of within-batch size correlation
        self.bucket_factor = float(bucket_factor)
        self.length_sorted = bool(length_sorted)
        # layout="dense": per-cloud rows ``points [B, M, Fw]`` (padding
        # INSIDE rows, gated by seg_counts) — segment structure becomes
        # implicit-uniform so the model's pooling is a masked batched
        # matvec instead of the one-hot [P, B+1] MXU contraction (~1/3 of
        # the flagship train step's MACs; +15% whole-step measured).
        # Padding costs φ FLOPs linearly, so dense pairs with
        # length_sorted; "auto" picks per batch whichever layout
        # processes fewer padded points (small tolerance toward dense
        # for the pool saving).  M rides a k·2^j rung ladder (k in
        # 8..15, ≤14% waste, ~8 rungs per octave) to bound compile count.
        if layout not in ("flat", "dense", "auto"):
            raise ValueError("layout must be 'flat', 'dense', or 'auto'")
        self.layout = layout
        # seg_encoding="counts": ship per-event point counts [B+1] (~1KB)
        # instead of the per-point id array (~P*2B); the model reconstructs
        # ids on device with jnp.repeat (sizes are static).  The training
        # pipeline is H2D-bandwidth-bound, so every wire byte counts.
        self.seg_encoding = seg_encoding
        # factor_event_cols: feature columns that are CONSTANT per event
        # (e.g. energy_total) ship once per event as "event_feats" [B, C]
        # instead of replicated per point; the model re-gathers them by
        # segment id — exact, and each factored column saves P×itemsize on
        # the wire.  Stored sorted: event_feats columns are ALWAYS in
        # ascending original-column order (the model relies on this).
        self.factor_event_cols = tuple(sorted(factor_event_cols))
        # "float16" halves the bytes shipped host→device per step (features
        # fp16, segment ids int16); models upcast on device.  The training
        # pipeline is H2D-bandwidth-bound on TPU, so this directly scales
        # throughput.  fp16's 10 mantissa bits superset bf16 compute's 7.
        self.half = transfer_dtype == "float16"
        feat_dtype = np.float16 if self.half else np.float32
        counts = np.array([len(f) for f in event_features], dtype=np.int64)
        self.flat = np.ascontiguousarray(
            np.concatenate(event_features, axis=0), dtype=feat_dtype
        )
        self.offsets = np.ascontiguousarray(
            np.concatenate([[0], np.cumsum(counts)]), dtype=np.int64
        )
        self.counts = counts
        self.labels = np.asarray(labels, dtype=np.float32).reshape(-1)
        self.batch_size = int(batch_size) if batch_size else len(self.labels)
        self.shuffle = shuffle
        self.seed = seed
        self.min_bucket = min_bucket
        self._epoch = 0

    @property
    def n_examples(self) -> int:
        return len(self.labels)

    @property
    def n_points(self) -> int:
        return len(self.flat)

    def __len__(self) -> int:
        return -(-self.n_examples // self.batch_size)

    def _dense_batch(self, idx, k: int, b: int, m: int, keep64, fac64) -> Batch:
        """DENSE wire: ``points [B, M, Fw]`` per-cloud rows + seg_counts.

        Vectorized assembly (no per-event python loop): one ragged-range
        gather of every source row, then a single fancy-index placement
        into the padded rows.
        """
        sizes = self.counts[idx]
        total = int(sizes.sum())
        points = np.zeros((b, m, len(keep64)), dtype=self.flat.dtype)
        event_feats = (
            np.zeros((b + 1, len(fac64)), dtype=self.flat.dtype)
            if len(fac64)
            else None
        )
        seg_counts = np.zeros((b + 1,), dtype=np.int32)

        if not pack_pointcloud_dense_native(
            self.flat,
            self.offsets,
            np.ascontiguousarray(idx, dtype=np.int64),
            b,
            keep64,
            fac64,
            m,
            points.reshape(b * m, -1),
            event_feats,
            seg_counts,
        ):
            starts = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
            # classic ragged-range trick: concat of [off_e, off_e+n_e) ranges
            src = (
                np.repeat(self.offsets[idx] - starts, sizes) + np.arange(total)
            ).astype(np.int64)
            dst_row = np.repeat(np.arange(k, dtype=np.int64), sizes)
            dst_pos = np.arange(total, dtype=np.int64) - np.repeat(starts, sizes)
            # single fused gather (rows x kept columns in one pass): a
            # flat[src] then [:, keep64] pair would copy every point's full
            # feature row twice on what is now the default host path
            points[dst_row, dst_pos] = self.flat[np.ix_(src, keep64)]
            seg_counts[:k] = sizes
            seg_counts[b] = b * m - total  # in-row padding, for observability
            if event_feats is not None:
                nonempty = sizes > 0
                firsts = self.offsets[idx][nonempty]
                event_feats[:k][nonempty] = self.flat[firsts][:, fac64]

        yb = np.zeros((b, 1), dtype=np.float32)
        mask = np.zeros((b,), dtype=np.float32)
        yb[:k, 0] = self.labels[idx]
        mask[:k] = 1.0
        batch = {
            "points": points,
            "y": yb,
            "y_mask": mask,
            "seg_counts": seg_counts,
        }
        if event_feats is not None:
            batch["event_feats"] = event_feats
        return batch

    def __iter__(self) -> Iterator[Batch]:
        n, b = self.n_examples, self.batch_size
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            order = rng.permutation(n)
            self._epoch += 1
        if self.length_sorted:
            # stable sort events by size, batch neighbours, shuffle batches
            order = order[np.argsort(self.counts[order], kind="stable")]
            starts = np.arange(0, n, b)
            if self.shuffle:
                rng.shuffle(starts)
        else:
            starts = np.arange(0, n, b)
        feat_dim = self.flat.shape[1]
        fac = list(self.factor_event_cols)
        keep_cols = [c for c in range(feat_dim) if c not in fac]
        keep64 = np.asarray(keep_cols, dtype=np.int64)
        fac64 = np.asarray(fac, dtype=np.int64)
        for start in starts:
            idx = order[start : start + b]
            k = len(idx)
            total = int(self.counts[idx].sum())
            p_pad = pow2_bucket(total, self.min_bucket, self.bucket_factor)

            if self.layout != "flat":
                m_rung = _dense_rung(int(self.counts[idx].max()) if k else 1)
                dense = self.layout == "dense" or (
                    # auto: dense iff it processes no more than ~10% extra
                    # padded points vs the flat pow2 bucket — the removed
                    # pool contraction is worth about that much — AND the
                    # batch is large enough for the dense row pooling to
                    # pay: the round-5 policy audit measured flat WINNING
                    # at the reference sweep's batch sizes (B=16: +7%,
                    # B=32/64: +2%) with dense winning from B=128 (+1.9%)
                    # through B=256 (+23%) — the [B, M, H] masked-matvec
                    # pool needs enough rows to fill the MXU
                    # (docs/kernels.md round-5 policy table; explicit
                    # layout="dense" still forces)
                    b >= 128
                    and b * m_rung <= p_pad + p_pad // 10
                )
                if dense:
                    yield self._dense_batch(idx, k, b, m_rung, keep64, fac64)
                    continue

            seg_dtype = np.int16 if (self.half and b < 32767) else np.int32
            points = np.zeros((p_pad, len(keep_cols)), dtype=self.flat.dtype)
            event_feats = (
                np.zeros((b + 1, len(fac)), dtype=self.flat.dtype) if fac else None
            )
            seg = np.full((p_pad,), b, dtype=seg_dtype)
            yb = np.zeros((b, 1), dtype=np.float32)
            mask = np.zeros((b,), dtype=np.float32)
            seg_counts = np.zeros((b + 1,), dtype=np.int32)

            if not pack_pointcloud_native(
                self.flat,
                self.offsets,
                np.ascontiguousarray(idx, dtype=np.int64),
                b,
                keep64,
                fac64,
                p_pad,
                points,
                event_feats,
                seg,
                seg_counts,
            ):
                cursor = 0
                for slot, ev in enumerate(idx):
                    lo, hi = self.offsets[ev], self.offsets[ev + 1]
                    rows = self.flat[lo:hi]
                    points[cursor : cursor + (hi - lo)] = rows[:, keep_cols]
                    if fac and len(rows):
                        event_feats[slot] = rows[0, fac]  # constant per event
                    seg[cursor : cursor + (hi - lo)] = slot
                    seg_counts[slot] = hi - lo
                    cursor += hi - lo
                seg_counts[b] = p_pad - cursor  # padding rows → segment B
            yb[:k, 0] = self.labels[idx]
            mask[:k] = 1.0
            batch = {"points": points, "y": yb, "y_mask": mask}
            if fac:
                # which columns were factored is a STATIC wire contract the
                # model mirrors via its factored_cols config (like input_dim)
                batch["event_feats"] = event_feats
            if self.seg_encoding == "counts":
                batch["seg_counts"] = seg_counts
            else:
                batch["seg"] = seg
            yield batch


class GraphLoader:
    """Batched padded graphs with offset edge lists.

    Node layout matches :class:`PointCloudLoader`; edges are endpoint index
    arrays offset per graph (the reference's collate, `utils/data.py:1228-1261`,
    with padding instead of ragged concat).  At least one padding node is
    always reserved so padded edges have a safe target.
    """

    def __init__(
        self,
        graphs: Sequence[Dict[str, np.ndarray]],
        batch_size: int,
        shuffle: bool,
        use_weights: bool = True,
        n_features: Optional[int] = None,
        seed: int = 0,
        min_node_bucket: int = 256,
        min_edge_bucket: int = 512,
        transfer_dtype: str = "float32",
        seg_encoding: str = "ids",
        layout: str = "flat",
        min_dense_nodes: int = 64,
        max_dense_bytes: int = 1 << 28,
        adj_wire: str = "device",
        min_edge_bucket_dense: int = 512,
        length_sorted: bool = False,
        max_in_degree_wire: int = 32,
        emit_out_rows: bool = False,
        dense_w_is_existence: bool = False,
        require_inrow: bool = False,
        flat_if_multigraph: bool = False,
    ):
        # "float16": fp16 features/weights + int16 ids on the wire (see
        # PointCloudLoader) — models upcast on device.  seg_encoding
        # "counts" ships per-graph node counts instead of per-node ids.
        #
        # layout "dense" emits per-graph padded batches with a batched
        # adjacency matrix instead of edge lists — ``nodes [B, M, F]``,
        # ``adj [B, M, M]`` (weights folded in; dst-major rows), ``node_mask
        # [B, M]`` — turning message passing into one batched MXU matmul
        # (no gather/scatter; profiled ~5.3 of 7.1 ms/step on v5e for the
        # flat layout's scatters).  Assumes simple graphs (no duplicate
        # edges — the lineage builder guarantees this) and supports
        # GraphConv add/mean (+SAG); GAT/max stay on the flat layout.
        # "auto" picks dense per batch when B·M² fits ``max_dense_bytes``,
        # falling back to flat for batches with huge events.  NOTE: under
        # dense/auto, duplicate directed edges are MERGED at init (weights
        # summed, multiplicity counted); every wire then carries one entry
        # per unique edge.  Per-occurrence parity with the pure-flat layout
        # is preserved: dense mean divides by the exact in-degree
        # (``in_deg``) and the flat FALLBACK ships edge_w = merged_w/mult
        # with edge_mask = multiplicity (see self.flat_fallback_w), which
        # keeps sums, mean denominators, unweighted max, GAT softmax and
        # SAG score convs exact ON FLAT WIRES.  Dense batches preserve
        # per-occurrence parity for GraphConv add/mean/max only — GAT
        # attention terms and the SAG score conv count a merged edge once
        # there, which is why the factory sets ``flat_if_multigraph`` for
        # GAT/SAG configs (demotes to flat iff a duplicate exists, see
        # below).  Remaining documented divergence: a WEIGHTED max over a
        # multigraph sees one mean-weighted value per unique edge instead
        # of per-occurrence values.
        #
        # adj_wire picks HOW the dense adjacency reaches the device:
        # "device" (default) ships per-graph-padded nodes plus each node's
        # incoming edges in the IN-ROW layout (``in_src``/``in_w``
        # [B, M, D], D = the batch's max-in-degree pow-2 bucket); the model
        # materialises the [B, M, M] adjacency ON DEVICE with D fused
        # broadcast-compare passes — no scatter, and the host never
        # allocates (or zeroes, or ships) the B·M² buffer, which dominated
        # dense batch cost (~60-113 ms/batch and 33+ MB H2D at bench
        # shapes).  Batches with an in-degree outlier past
        # ``max_in_degree_wire`` fall back to the flat (slot, dst, src, w)
        # triple wire + one sorted/unique device scatter.  "host"
        # materialises the adjacency on the host (the layout-parity
        # oracle; also useful when the batch is consumed by numpy).
        # length_sorted: group similar-size graphs into the same batch
        # (shuffling BATCH order, not graph order — see PointCloudLoader).
        # Payoff is QUADRATIC for the dense layout: M is set by the batch's
        # largest graph, so mixing one big graph into a batch of small ones
        # inflates every [M, M] adjacency in the batch.
        if layout not in ("flat", "dense", "auto"):
            raise ValueError(f"Unknown graph layout: {layout}")
        if adj_wire not in ("host", "device"):
            raise ValueError(f"Unknown adj_wire: {adj_wire}")
        # require_inrow (set by the model factory for dense-layout max
        # pooling): the consumer can only digest dense batches that carry
        # the FULL in-row wire (in_src + out rows when emit_out_rows) —
        # max aggregation doesn't factor through an adjacency matmul or
        # the edge_slot fallback triples.  Batches whose in/out-degree
        # overflows max_in_degree_wire ship the flat GLOBAL wire instead
        # (the model's flat path supports max exactly), rather than a
        # dense wire the model would reject mid-epoch.
        self.require_inrow = bool(require_inrow)
        self._warned_inrow_fallback = False
        if self.require_inrow and layout in ("dense", "auto") and adj_wire == "host":
            import warnings

            warnings.warn(
                "GraphLoader(require_inrow=True): the host adjacency wire "
                "never carries in-row lists — demoting layout to 'flat'",
                stacklevel=2,
            )
            layout = "flat"
        self.layout = layout
        self.adj_wire = adj_wire
        self.min_edge_bucket_dense = min_edge_bucket_dense
        self.length_sorted = bool(length_sorted)
        self.max_in_degree_wire = int(max_in_degree_wire)
        # out-row lists are only consumed by the opt-in fused aggregation
        # kernel's backward (GraphNet.fused_inrow); keep the default wire
        # lean and skip packing them unless asked
        self.emit_out_rows = bool(emit_out_rows)
        self.min_dense_nodes = min_dense_nodes
        self.max_dense_bytes = max_dense_bytes
        self.seg_encoding = seg_encoding
        self.half = transfer_dtype == "float16"
        feat_dtype = np.float16 if self.half else np.float32
        # flat contiguous storage (one features/edges/weights buffer + per-
        # graph offsets): batch assembly is then range-memcpy, in Python or
        # in the native packer (native/batch_packer.cpp)
        feat_list, edge_list, weight_list, labels = [], [], [], []
        for g in graphs:
            feats = np.asarray(g["features"], dtype=feat_dtype)
            if n_features is not None:
                feats = feats[:, :n_features]
            feat_list.append(np.ascontiguousarray(feats))
            edge_list.append(np.asarray(g["edges"], dtype=np.int32).reshape(2, -1))
            weight_list.append(np.asarray(g["weights"], dtype=np.float32).reshape(-1))
            labels.append(np.float32(g["label"]))
        node_counts = np.array([len(f) for f in feat_list], dtype=np.int64)
        edge_counts = np.array([e.shape[1] for e in edge_list], dtype=np.int64)
        feat_dim_in = feat_list[0].shape[1] if feat_list else 0
        self.feats = np.ascontiguousarray(
            np.concatenate(feat_list, axis=0)
            if feat_list
            else np.zeros((0, 0), feat_dtype),
            dtype=feat_dtype,
        )
        flat_edges = (
            np.concatenate(edge_list, axis=1)
            if edge_list
            else np.zeros((2, 0), np.int32)
        )
        self.edges_src = np.ascontiguousarray(flat_edges[0], dtype=np.int32)
        self.edges_dst = np.ascontiguousarray(flat_edges[1], dtype=np.int32)
        self.weights = np.ascontiguousarray(
            np.concatenate(weight_list) if weight_list else np.zeros((0,)),
            dtype=np.float32,
        )
        self.node_offsets = np.ascontiguousarray(
            np.concatenate([[0], np.cumsum(node_counts)]), dtype=np.int64
        )
        self.edge_offsets = np.ascontiguousarray(
            np.concatenate([[0], np.cumsum(edge_counts)]), dtype=np.int64
        )
        self.node_counts = node_counts
        self.edge_counts = edge_counts
        self.labels = np.asarray(labels, dtype=np.float32)
        self.feat_dim = feat_dim_in
        # edge multiplicity: 1 per edge unless the dense-layout merge below
        # collapses duplicates; use_weights=False packs aggregate with THIS
        # instead of 1.0 so a duplicated edge still contributes its
        # occurrence count, exactly like the flat layout's scatter-add
        self.edge_mult = np.ones(len(self.weights), dtype=np.float32)
        if layout in ("dense", "auto"):
            # one-time sort of each graph's edges by (dst, src) + merge of
            # duplicate directed edges (weights summed, multiplicities
            # counted — exactly what the adjacency accumulate would do).
            # The device wires then carry one entry per unique edge.
            gid = np.repeat(np.arange(len(edge_counts)), edge_counts)
            order = np.lexsort((self.edges_src, self.edges_dst, gid))
            gid = gid[order]
            es, ed = self.edges_src[order], self.edges_dst[order]
            w = self.weights[order]
            if len(es):
                first = np.concatenate(
                    [
                        [True],
                        (gid[1:] != gid[:-1])
                        | (ed[1:] != ed[:-1])
                        | (es[1:] != es[:-1]),
                    ]
                )
                starts = np.flatnonzero(first)
                self.edges_src = np.ascontiguousarray(es[first])
                self.edges_dst = np.ascontiguousarray(ed[first])
                self.weights = np.add.reduceat(w, starts).astype(np.float32)
                self.edge_mult = np.diff(
                    np.concatenate([starts, [len(es)]])
                ).astype(np.float32)
                merged_counts = np.bincount(
                    gid[first], minlength=len(edge_counts)
                ).astype(np.int64)
                self.edge_counts = merged_counts
                self.edge_offsets = np.ascontiguousarray(
                    np.concatenate([[0], np.cumsum(merged_counts)]), dtype=np.int64
                )
            # exact per-node in-degree in PER-OCCURRENCE terms (sum of
            # merged-edge multiplicities, zero-weight edges included):
            # shipped as ``in_deg [B, M]`` so the dense mean divides by the
            # same denominator as the flat path's segment_count — counting
            # nonzero adjacency entries instead would miss duplicate edges
            # (merged) and drop w==0 edges (e.g. fp16-underflowed gaussian
            # weights)
            self.node_indeg = np.zeros(len(self.feats), dtype=np.float32)
            if len(self.edges_dst):
                gid_d = np.repeat(
                    np.arange(len(self.edge_counts)), self.edge_counts
                )
                np.add.at(
                    self.node_indeg,
                    self.node_offsets[gid_d] + self.edges_dst,
                    self.edge_mult,
                )
            # per-graph max in-degree (edges are (graph, dst)-sorted, so
            # in-degrees are run lengths): one init pass lets each batch
            # size its in-row D bucket with an O(B) lookup
            gid = np.repeat(np.arange(len(self.edge_counts)), self.edge_counts)
            self.graph_max_indeg = np.zeros(len(self.edge_counts), dtype=np.int64)
            if len(self.edges_dst):
                first = np.concatenate(
                    [
                        [True],
                        (gid[1:] != gid[:-1])
                        | (self.edges_dst[1:] != self.edges_dst[:-1]),
                    ]
                )
                starts = np.flatnonzero(first)
                run_len = np.diff(np.concatenate([starts, [len(gid)]]))
                np.maximum.at(self.graph_max_indeg, gid[starts], run_len)
        # OUT-row mirror: each node's outgoing edges, (graph, src)-sorted.
        # The fused aggregation kernel's backward is the same aggregation
        # over the transposed adjacency, which is exactly the out-row lists
        # (ops/inrow_graph.py).  Only built when the wire will ship them.
        if layout in ("dense", "auto") and emit_out_rows:
            gid = np.repeat(np.arange(len(self.edge_counts)), self.edge_counts)
            order_o = np.lexsort((self.edges_dst, self.edges_src, gid))
            self.edges_src_o = np.ascontiguousarray(self.edges_src[order_o])
            self.edges_dst_o = np.ascontiguousarray(self.edges_dst[order_o])
            self.weights_o = np.ascontiguousarray(self.weights[order_o])
            self.edge_mult_o = np.ascontiguousarray(self.edge_mult[order_o])
            # each edge's position in its DESTINATION's in-row list (run
            # index within the dst-sorted (graph, dst) runs), permuted to
            # out-row order: ships as ``out_pos`` so gather-backwards
            # (ops/inrow_graph.inrow_gather) can pick in-row cotangents
            # from out-row slots without a device scatter
            if len(self.edges_dst):
                first_in = np.concatenate(
                    [
                        [True],
                        (gid[1:] != gid[:-1])
                        | (self.edges_dst[1:] != self.edges_dst[:-1]),
                    ]
                )
                starts_in = np.flatnonzero(first_in)
                run_id = np.cumsum(first_in) - 1
                pos_in = np.arange(len(gid)) - starts_in[run_id]
                self.inpos_o = np.ascontiguousarray(
                    pos_in[order_o].astype(np.int32)
                )
            else:
                self.inpos_o = np.zeros(0, np.int32)
            self.graph_max_outdeg = np.zeros(len(self.edge_counts), dtype=np.int64)
            gid_o = gid[order_o] if len(order_o) else gid
            if len(self.edges_src_o):
                first_o = np.concatenate(
                    [
                        [True],
                        (gid_o[1:] != gid_o[:-1])
                        | (self.edges_src_o[1:] != self.edges_src_o[:-1]),
                    ]
                )
                starts_o = np.flatnonzero(first_o)
                run_len_o = np.diff(np.concatenate([starts_o, [len(gid_o)]]))
                np.maximum.at(self.graph_max_outdeg, gid_o[starts_o], run_len_o)
        # wire-dtype copies for the native packers (one conversion at init,
        # after the optional merge, instead of per-edge casts per batch).
        # mult_wire stands in for the weights when use_weights=False.
        self.weights_wire = (
            self.weights.astype(np.float16) if self.half else self.weights
        )
        self.mult_wire = (
            self.edge_mult.astype(np.float16) if self.half else self.edge_mult
        )
        # flat-FALLBACK wires over a merged MULTIGRAPH store (None in the
        # common simple-graph case and for pure layout="flat"): the model's
        # flat path weights messages by edge_w*edge_mask, counts mean
        # denominators as Σ edge_mask, and GAT-softmaxes with exp*edge_mask
        # — so shipping edge_w = merged_w / mult (1.0 unweighted) and
        # edge_mask = mult restores PER-OCCURRENCE semantics (sum, mean
        # denominator, unweighted max, GAT, SAG score conv) over the
        # merged store.  Before this, a fallback batch divided means by
        # the UNIQUE-edge count (code-review finding: auto-layout runs
        # mixed two mean semantics across batches of one epoch).
        self.flat_fallback_w = None
        if layout in ("dense", "auto") and bool((self.edge_mult > 1).any()):
            self.flat_fallback_w = np.ascontiguousarray(
                (self.weights / self.edge_mult).astype(self.weights_wire.dtype)
                if use_weights
                else np.ones_like(self.mult_wire)
            )
        # dense_w_is_existence (set by the model factory for GAT +
        # use_weights configs): the dense wire encodes edge EXISTENCE as
        # w != 0, so a weighted dataset whose WIRE weights contain an
        # exact zero (a gaussian weight underflowing f32 — or fp16 after
        # the half cast, which is why the check runs on weights_wire, the
        # post-merge wire-dtype store) would silently drop that edge from
        # dense attention while the flat path keeps it.  Demote to flat
        # only when a zero actually exists; real lineage data (strictly
        # positive gaussian weights, utils/data.py:835-845 reference
        # semantics) rides the dense layout.  The demotion happens AFTER
        # the flat-fallback wires are built, so per-occurrence parity over
        # a merged multigraph store is preserved exactly like an auto
        # fallback batch.  Before this gate, the factory kept EVERY
        # GAT+use_weights config flat (~40x slower attention) to protect
        # against the rare zero.
        if (
            dense_w_is_existence
            and layout in ("dense", "auto")
            and use_weights
            and bool((self.weights_wire == 0).any())
        ):
            import warnings

            warnings.warn(
                "GraphLoader: dataset contains an exact-zero edge weight; "
                "dense attention would drop that edge (existence is w != 0)"
                " — demoting layout to 'flat' for exactness",
                stacklevel=2,
            )
            layout = self.layout = "flat"
        # flat_if_multigraph (set by the model factory for GAT / SAG
        # configs): the dense wires preserve per-occurrence parity over a
        # duplicate-MERGED store for GraphConv add/mean/max (summed
        # weights / exact in_deg), but NOT for attention softmax terms or
        # the SAG score conv — dense GAT counts a duplicated edge's exp
        # ONCE (existence is w != 0) and the dense SAG score conv
        # aggregates `adj != 0`, where the flat path counts each
        # OCCURRENCE (round-5 review finding: under auto, batches of one
        # epoch would mix the two semantics).  Like the zero-weight gate
        # above, demote to flat only when a duplicate actually exists;
        # the demotion happens AFTER the flat-fallback wires are built,
        # so the flat wires carry the exact per-occurrence semantics.
        if (
            flat_if_multigraph
            and layout in ("dense", "auto")
            and bool((self.edge_mult > 1).any())
        ):
            import warnings

            warnings.warn(
                "GraphLoader: dataset contains duplicate directed edges; "
                "dense attention/SAG-score semantics count a merged edge "
                "once where the flat path counts each occurrence — "
                "demoting layout to 'flat' for exactness",
                stacklevel=2,
            )
            layout = self.layout = "flat"
        if layout in ("dense", "auto") and emit_out_rows:
            self.weights_o_wire = (
                self.weights_o.astype(np.float16) if self.half else self.weights_o
            )
            self.mult_o_wire = (
                self.edge_mult_o.astype(np.float16) if self.half else self.edge_mult_o
            )
        self.batch_size = int(batch_size) if batch_size else len(labels)
        self.shuffle = shuffle
        self.use_weights = use_weights
        self.seed = seed
        self.min_node_bucket = min_node_bucket
        self.min_edge_bucket = min_edge_bucket
        self._epoch = 0

    @property
    def n_examples(self) -> int:
        return len(self.labels)

    def __len__(self) -> int:
        return -(-self.n_examples // self.batch_size)

    def _dense_wire_batch(self, idx, k: int, b: int, m_pad: int, feat_dim: int) -> Batch:
        """Dense layout, device-side adjacency (models/graph_net.py
        ``_dense_forward``): nodes [B, M, F] + this batch's edges.

        Preferred wire — IN-ROW: ``in_src``/``in_w [B, M, D]`` hold each
        node's incoming-edge sources and weights (D = the batch's max
        in-degree, pow-2-bucketed, ≥4); padding slots carry w=0.  The model
        materialises the adjacency with D fused broadcast-compare passes —
        no device scatter (an XLA scalar scatter costs ~14 ns/edge on TPU).

        Fallback wire when an in-degree outlier would blow the D bucket
        past ``max_in_degree_wire``: flat LOCAL (slot, dst, src, w) edge
        triples, strictly ascending (the loader sorts + merges duplicates
        at construction) with padding at out-of-range slot ``b``, consumed
        by one ``indices_are_sorted`` + ``unique_indices`` device scatter.
        """
        feat_t = self.feats.dtype
        small_t = np.float16 if self.half else np.float32
        idx_t = np.int16 if (self.half and m_pad <= 32768) else np.int32
        slot_t = np.int16 if (self.half and b < 32767) else np.int32
        total_edges = int(self.edge_counts[idx].sum())

        nodes = np.zeros((b, m_pad, feat_dim), dtype=feat_t)
        node_mask = np.zeros((b, m_pad), dtype=np.float32)
        yb = np.zeros((b, 1), dtype=np.float32)
        ymask = np.zeros((b,), dtype=np.float32)
        yb[:k, 0] = self.labels[idx]
        ymask[:k] = 1.0
        batch = {
            "nodes": nodes,
            "node_mask": node_mask,
            "in_deg": self._indeg_rows(idx, b, m_pad),
            "y": yb,
            "y_mask": ymask,
        }
        idx64 = np.ascontiguousarray(idx, dtype=np.int64)

        d_max = int(self.graph_max_indeg[idx].max()) if total_edges else 0
        d_pad = max(4, 1 << (max(d_max, 1) - 1).bit_length())
        if d_pad <= self.max_in_degree_wire:
            # use_weights=False aggregates each edge's MULTIPLICITY (1 for
            # simple graphs; duplicates merged at init keep their count) so
            # both wires match the flat layout's per-occurrence scatter-add
            in_src, in_w = self._pack_inrow(
                idx64,
                b,
                m_pad,
                d_pad,
                nodes,
                node_mask,
                total_edges,
                idx_t,
                small_t,
                self.edges_src,
                self.edges_dst,
                self.weights_wire if self.use_weights else self.mult_wire,
            )
            batch["in_src"] = in_src
            batch["in_w"] = in_w
            if self.emit_out_rows:
                # OUT-row mirror (the transposed adjacency): consumed by
                # the fused aggregation kernel's backward (inrow_graph.py)
                do_max = (
                    int(self.graph_max_outdeg[idx].max()) if total_edges else 0
                )
                do_pad = max(4, 1 << (max(do_max, 1) - 1).bit_length())
                if do_pad <= self.max_in_degree_wire:
                    out_dst, out_w = self._pack_inrow(
                        idx64,
                        b,
                        m_pad,
                        do_pad,
                        nodes,
                        node_mask,
                        total_edges,
                        idx_t,
                        small_t,
                        self.edges_dst_o,
                        self.edges_src_o,
                        self.weights_o_wire
                        if self.use_weights
                        else self.mult_o_wire,
                        fill_nodes=False,
                    )
                    batch["out_dst"] = out_dst
                    batch["out_w"] = out_w
                    # the edges' in-row positions in the same out-row slots
                    # (second pack pass over the identical (graph, src)
                    # runs, so slot q of node j names the same edge)
                    out_pos, _ = self._pack_inrow(
                        idx64,
                        b,
                        m_pad,
                        do_pad,
                        nodes,
                        node_mask,
                        total_edges,
                        idx_t,
                        small_t,
                        self.inpos_o,
                        self.edges_src_o,
                        self.weights_o_wire,
                        fill_nodes=False,
                    )
                    batch["out_pos"] = out_pos
            return batch

        src_l, dst_l, slot_l, w_l = self._gather_batch_edges(
            idx, nodes, node_mask, total_edges, small_t
        )
        e_pad = pow2_bucket(max(total_edges, 1), self.min_edge_bucket_dense)
        edge_src = np.zeros((e_pad,), dtype=idx_t)
        edge_dst = np.zeros((e_pad,), dtype=idx_t)
        edge_slot = np.full((e_pad,), b, dtype=slot_t)
        edge_w = np.zeros((e_pad,), dtype=small_t)
        edge_src[:total_edges] = src_l
        edge_dst[:total_edges] = dst_l
        edge_slot[:total_edges] = slot_l
        edge_w[:total_edges] = w_l
        batch["edge_src"] = edge_src
        batch["edge_dst"] = edge_dst
        batch["edge_slot"] = edge_slot
        batch["edge_w"] = edge_w
        return batch

    def _pack_inrow(
        self,
        idx64,
        b,
        m_pad,
        d_pad,
        nodes,
        node_mask,
        total_edges,
        idx_t,
        small_t,
        values,
        keys,
        weights,
        fill_nodes: bool = True,
    ):
        """[B, M, D] per-row lists: cell (slot, keys[e], pos) <- values[e].

        ``keys`` must be run-sorted within each graph (the loader sorts both
        edge directions at init).  For the in-row lists values/keys are
        (src, dst); for the out-row mirror they are (dst_o, src_o) with
        ``fill_nodes=False`` (the first pass already filled nodes/mask).
        """
        out_val = np.zeros((b, m_pad, d_pad), dtype=idx_t)
        out_w = np.zeros((b, m_pad, d_pad), dtype=small_t)
        if not pack_graph_inrow_native(
            self.feats,
            self.node_offsets,
            values,
            keys,
            self.edge_offsets,
            weights,
            True,
            idx64,
            b,
            m_pad,
            d_pad,
            nodes,
            node_mask,
            out_val,
            out_w,
            fill_nodes=fill_nodes,
        ):
            val_l = np.empty((total_edges,), dtype=np.int32)
            key_l = np.empty((total_edges,), dtype=np.int64)
            w_l = np.empty((total_edges,), dtype=small_t)
            cursor = 0
            for slot, g_i in enumerate(idx64):
                nlo, nhi = self.node_offsets[g_i], self.node_offsets[g_i + 1]
                elo, ehi = self.edge_offsets[g_i], self.edge_offsets[g_i + 1]
                n_i, e_i = nhi - nlo, ehi - elo
                if fill_nodes:
                    nodes[slot, :n_i] = self.feats[nlo:nhi]
                    node_mask[slot, :n_i] = 1.0
                val_l[cursor : cursor + e_i] = values[elo:ehi]
                key_l[cursor : cursor + e_i] = keys[elo:ehi] + slot * m_pad
                w_l[cursor : cursor + e_i] = weights[elo:ehi]
                cursor += e_i
            counts = np.bincount(key_l, minlength=b * m_pad)
            starts = np.concatenate([[0], np.cumsum(counts)])
            pos = np.arange(total_edges) - starts[key_l]
            out_val.reshape(b * m_pad, d_pad)[key_l, pos] = val_l
            out_w.reshape(b * m_pad, d_pad)[key_l, pos] = w_l
        return out_val, out_w

    def _indeg_rows(self, idx, b: int, m_pad: int) -> np.ndarray:
        """Per-occurrence in-degree rows ``[B, M]`` for this batch's graphs
        (see the ``node_indeg`` init pass) — B range-copies, negligible."""
        out = np.zeros((b, m_pad), dtype=np.float32)
        for slot, g_i in enumerate(idx):
            nlo, nhi = self.node_offsets[g_i], self.node_offsets[g_i + 1]
            out[slot, : nhi - nlo] = self.node_indeg[nlo:nhi]
        return out

    def _gather_batch_edges(self, idx, nodes, node_mask, total_edges, small_t):
        """Python fallback: fill nodes/node_mask and return this batch's
        flat LOCAL edge arrays (src, dst, slot, wire-dtype weights)."""
        src_l = np.empty((total_edges,), dtype=np.int32)
        dst_l = np.empty((total_edges,), dtype=np.int32)
        slot_l = np.empty((total_edges,), dtype=np.int32)
        w_l = np.empty((total_edges,), dtype=small_t)
        cursor = 0
        for slot, g_i in enumerate(idx):
            nlo, nhi = self.node_offsets[g_i], self.node_offsets[g_i + 1]
            elo, ehi = self.edge_offsets[g_i], self.edge_offsets[g_i + 1]
            n_i, e_i = nhi - nlo, ehi - elo
            nodes[slot, :n_i] = self.feats[nlo:nhi]
            node_mask[slot, :n_i] = 1.0
            src_l[cursor : cursor + e_i] = self.edges_src[elo:ehi]
            dst_l[cursor : cursor + e_i] = self.edges_dst[elo:ehi]
            slot_l[cursor : cursor + e_i] = slot
            if self.use_weights:
                w_l[cursor : cursor + e_i] = self.weights_wire[elo:ehi]
            else:
                w_l[cursor : cursor + e_i] = self.mult_wire[elo:ehi]
            cursor += e_i
        return src_l, dst_l, slot_l, w_l

    def _dense_batch(self, idx, k: int, b: int, m_pad: int, feat_dim: int) -> Batch:
        """Per-graph padded layout with a batched adjacency matrix."""
        feat_t = self.feats.dtype
        small_t = np.float16 if self.half else np.float32
        nodes = np.zeros((b, m_pad, feat_dim), dtype=feat_t)
        adj = np.zeros((b, m_pad, m_pad), dtype=small_t)
        node_mask = np.zeros((b, m_pad), dtype=np.float32)
        yb = np.zeros((b, 1), dtype=np.float32)
        ymask = np.zeros((b,), dtype=np.float32)
        idx64 = np.ascontiguousarray(idx, dtype=np.int64)
        if not pack_graph_dense_native(
            self.feats,
            self.node_offsets,
            self.edges_src,
            self.edges_dst,
            self.edge_offsets,
            self.weights if self.use_weights else self.edge_mult,
            True,
            idx64,
            b,
            m_pad,
            nodes,
            adj,
            node_mask,
        ):
            for slot, g_i in enumerate(idx):
                nlo, nhi = self.node_offsets[g_i], self.node_offsets[g_i + 1]
                elo, ehi = self.edge_offsets[g_i], self.edge_offsets[g_i + 1]
                n_i = nhi - nlo
                nodes[slot, :n_i] = self.feats[nlo:nhi]
                node_mask[slot, :n_i] = 1.0
                src = self.edges_src[elo:ehi]
                dst = self.edges_dst[elo:ehi]
                w = (
                    self.weights[elo:ehi]
                    if self.use_weights
                    else self.edge_mult[elo:ehi]
                )
                # adj[dst, src]: row i holds node i's incoming-edge weights
                # (duplicates are merged at init with summed weights /
                # counted multiplicity, so = and += are equivalent here)
                np.add.at(adj[slot], (dst, src), w.astype(small_t))
        yb[:k, 0] = self.labels[idx]
        ymask[:k] = 1.0
        return {
            "nodes": nodes,
            "adj": adj,
            "node_mask": node_mask,
            "in_deg": self._indeg_rows(idx, b, m_pad),
            "y": yb,
            "y_mask": ymask,
        }

    def __iter__(self) -> Iterator[Batch]:
        n, b = self.n_examples, self.batch_size
        order = np.arange(n)
        rng = None
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            order = rng.permutation(n)
            self._epoch += 1
        if self.length_sorted:
            # stable sort graphs by node count, batch neighbours, shuffle
            # batch order (keeps SGD stochastic while bounding per-batch M)
            order = order[np.argsort(self.node_counts[order], kind="stable")]
            starts = np.arange(0, n, b)
            if rng is not None:
                rng.shuffle(starts)
        else:
            starts = np.arange(0, n, b)
        feat_dim = self.feat_dim
        for start in starts:
            idx = order[start : start + b]
            k = len(idx)
            if self.layout in ("dense", "auto"):
                max_nodes = int(self.node_counts[idx].max())
                # rung ladder, not pow2: the dense step's adjacency work is
                # O(M^2) so padding M costs QUADRATICALLY — pow2's worst
                # case ~2x M measured 2.27x whole-step (bench graph M
                # override A/B 2026-08-19: M=512 126.2k vs M=288 208.5k vs
                # M=256 285.9k graphs/sec).  k*2^j rungs bound the waste
                # at <=14% while keeping ~8 compiled shapes per octave;
                # pairs with length_sorted exactly like the point wire.
                # Rounded UP to a multiple of 8: the GAT Pallas kernels
                # require 8-aligned M (ops/gat_pallas._shapes_ok) and
                # small rungs (j<3) or an unaligned min_dense_nodes would
                # otherwise silently disqualify every batch
                m_pad = max(self.min_dense_nodes, _dense_rung(max_nodes))
                m_pad = -(-m_pad // 8) * 8
                adj_itemsize = 2 if self.half else 4
                dense_bytes = b * m_pad * m_pad * adj_itemsize
                inrow_ok = True
                if self.require_inrow:
                    # the consumer needs the full in-row wire: a degree
                    # outlier past max_in_degree_wire would make
                    # _dense_wire_batch ship the edge_slot fallback (or
                    # omit out rows), which dense max pooling cannot eat —
                    # route this batch to the flat GLOBAL wire instead
                    te = int(self.edge_counts[idx].sum())
                    d_max = int(self.graph_max_indeg[idx].max()) if te else 0
                    d_pad = max(4, 1 << (max(d_max, 1) - 1).bit_length())
                    inrow_ok = d_pad <= self.max_in_degree_wire
                    if inrow_ok and self.emit_out_rows:
                        do_max = (
                            int(self.graph_max_outdeg[idx].max()) if te else 0
                        )
                        do_pad = max(4, 1 << (max(do_max, 1) - 1).bit_length())
                        inrow_ok = do_pad <= self.max_in_degree_wire
                    if not inrow_ok and not self._warned_inrow_fallback:
                        import warnings

                        warnings.warn(
                            "GraphLoader(require_inrow=True): a batch's "
                            "in/out-degree overflows max_in_degree_wire "
                            f"({self.max_in_degree_wire}) — shipping the "
                            "flat layout for such batches",
                            stacklevel=2,
                        )
                        self._warned_inrow_fallback = True
                if dense_bytes <= self.max_dense_bytes and inrow_ok:
                    mk = (
                        self._dense_wire_batch
                        if self.adj_wire == "device"
                        else self._dense_batch
                    )
                    yield mk(idx, k, b, m_pad, feat_dim)
                    continue
                if self.layout == "dense" and inrow_ok:
                    raise ValueError(
                        f"dense graph batch needs {dense_bytes/2**20:.0f} MB "
                        f"(B={b}, M={m_pad}) > max_dense_bytes "
                        f"{self.max_dense_bytes/2**20:.0f} MB; use "
                        "layout='auto' to fall back to the flat layout"
                    )
            total_nodes = int(self.node_counts[idx].sum())
            total_edges = int(self.edge_counts[idx].sum())
            n_pad = pow2_bucket(total_nodes + 1, self.min_node_bucket)
            e_pad = pow2_bucket(max(total_edges, 1), self.min_edge_bucket)

            seg_dtype = np.int16 if (self.half and b < 32767) else np.int32
            idx_dtype = np.int16 if (self.half and n_pad <= 32768) else np.int32
            small_dtype = np.float16 if self.half else np.float32
            nodes = np.zeros((n_pad, feat_dim), dtype=self.feats.dtype)
            node_seg = np.full((n_pad,), b, dtype=seg_dtype)
            # padded edges self-loop on the last (always-padding) node
            src = np.full((e_pad,), n_pad - 1, dtype=idx_dtype)
            dst = np.full((e_pad,), n_pad - 1, dtype=idx_dtype)
            edge_w = np.zeros((e_pad,), dtype=small_dtype)
            edge_mask = np.zeros((e_pad,), dtype=small_dtype)
            yb = np.zeros((b, 1), dtype=np.float32)
            ymask = np.zeros((b,), dtype=np.float32)
            seg_counts = np.zeros((b + 1,), dtype=np.int32)

            # merged multigraph stores swap in the per-occurrence fallback
            # wires (edge_w = mean weight, edge_mask = multiplicity — see
            # the init comment at self.flat_fallback_w); everything else
            # ships weights (or 1.0 via the all-ones mult_wire) with a
            # 1.0 mask fill
            wire_w = self.weights_wire if self.use_weights else self.mult_wire
            mask_w = None
            if self.flat_fallback_w is not None:
                wire_w, mask_w = self.flat_fallback_w, self.mult_wire
            if not pack_graph_flat_native(
                self.feats,
                self.node_offsets,
                self.edges_src,
                self.edges_dst,
                self.edge_offsets,
                wire_w,
                True,
                np.ascontiguousarray(idx, dtype=np.int64),
                b,
                n_pad,
                e_pad,
                nodes,
                node_seg,
                seg_counts,
                src,
                dst,
                edge_w,
                edge_mask,
            ):
                node_cursor = 0
                edge_cursor = 0
                for slot, g_i in enumerate(idx):
                    nlo, nhi = self.node_offsets[g_i], self.node_offsets[g_i + 1]
                    elo, ehi = self.edge_offsets[g_i], self.edge_offsets[g_i + 1]
                    n_i = nhi - nlo
                    e_i = ehi - elo
                    nodes[node_cursor : node_cursor + n_i] = self.feats[nlo:nhi]
                    node_seg[node_cursor : node_cursor + n_i] = slot
                    seg_counts[slot] = n_i
                    src[edge_cursor : edge_cursor + e_i] = (
                        self.edges_src[elo:ehi] + node_cursor
                    )
                    dst[edge_cursor : edge_cursor + e_i] = (
                        self.edges_dst[elo:ehi] + node_cursor
                    )
                    edge_w[edge_cursor : edge_cursor + e_i] = wire_w[elo:ehi]
                    edge_mask[edge_cursor : edge_cursor + e_i] = 1.0
                    node_cursor += n_i
                    edge_cursor += e_i
                seg_counts[b] = n_pad - node_cursor  # padding nodes → segment B
            if mask_w is not None:
                # multiplicities over the live range (same contiguous
                # idx-order layout the packers write); padding stays 0
                cur = 0
                for g_i in idx:
                    elo, ehi = self.edge_offsets[g_i], self.edge_offsets[g_i + 1]
                    edge_mask[cur : cur + (ehi - elo)] = mask_w[elo:ehi]
                    cur += ehi - elo
            yb[:k, 0] = self.labels[idx]
            ymask[:k] = 1.0
            batch = {
                "nodes": nodes,
                "src": src,
                "dst": dst,
                "edge_w": edge_w,
                "edge_mask": edge_mask,
                "y": yb,
                "y_mask": ymask,
            }
            if self.seg_encoding == "counts":
                batch["node_seg_counts"] = seg_counts
            else:
                batch["node_seg"] = node_seg
            yield batch
