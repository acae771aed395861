"""Message-passing graph network over padded batched lineage graphs.

Parity with the reference (`models/graph_net.py:8-103`), which uses
torch_geometric layers; here each is rebuilt as static-shape masked segment
ops (see ``ops/segment.py``):

- **GraphConv** (`:46-51`): out_i = W_rel · aggr_{j→i}(w_ji · x_j) + W_root · x_i,
  aggr ∈ {add, mean, max}, W_root bias-free — torch_geometric GraphConv
  semantics.
- **GATConv** (`:47-48`): multi-head attention with LeakyReLU(0.2) edge
  scores, self-loops added, per-destination softmax, concatenated heads +
  bias.  (torch_geometric's GATConv *asserts* when edge weights are passed
  without ``edge_dim`` — the reference's use_gat+use_weights sweep combo
  crashes there; we ignore the weights instead and train.)
- **SAGPooling** (`:57-58`): scores from an unweighted GraphConv(→1), keep
  the top ``ceil(ratio·n_g)`` nodes per graph scaled by tanh(score), drop
  edges touching dropped nodes.  Implemented as rank-and-mask, never
  compacting — shapes stay static.
- readout (`:86-100`): the reference hardcodes ``global_mean_pool`` at
  `:92,96` regardless of the ``global_pooling`` config — quirk preserved.
  ``deepchem_style`` moves fc1+bn3 before the pool (per-node) vs after
  (per-graph).
- BatchNorm1d over *nodes* between convs — masked so padding/dropped nodes
  never contaminate batch statistics.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from point_cloud_classifier_tpu.models.common import (
    MaskedBatchNorm,
    TorchLinear,
    activation_fn,
    resolve_dtype,
)
from point_cloud_classifier_tpu.ops.segment import (
    counts_to_segment_ids,
    segment_count,
    segment_softmax,
    segment_rank_desc,
    segment_sum,
)


class GraphConv(nn.Module):
    """torch_geometric-style GraphConv with masked static-shape aggregation."""

    features: int
    aggr: str = "add"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        src: jnp.ndarray = None,
        dst: jnp.ndarray = None,
        edge_w: jnp.ndarray = None,
        edge_valid: jnp.ndarray = None,
        agg: jnp.ndarray = None,
    ) -> jnp.ndarray:
        if agg is not None:
            # neighbour aggregate precomputed (dense batched-adjacency
            # layout, or a fused kernel) — same params, no segment ops
            return TorchLinear(self.features)(agg.astype(x.dtype)) + TorchLinear(
                self.features, use_bias=False
            )(x)
        n = x.shape[0]
        # message scatter-aggregation in f32 even under bf16 compute — the
        # matmuls below return to the activation dtype
        msg = (x[src] * (edge_w * edge_valid)[:, None]).astype(jnp.float32)
        if self.aggr == "add":
            agg = segment_sum(msg, dst, n)
        elif self.aggr == "mean":
            counts = segment_count(dst, n, valid=edge_valid)
            agg = segment_sum(msg, dst, n) / jnp.maximum(counts, 1.0)[:, None]
        elif self.aggr == "max":
            # mask with -inf, NOT finfo.min: the isfinite guard below must
            # catch nodes whose incoming edges are ALL masked (padded
            # self-loops, SAG-dropped neighbours), else they'd get ~-3.4e38
            # activations that overflow downstream into NaN batch stats.
            # edge_valid GATES here instead of multiplying: on the merged
            # flat-fallback wire it carries the occurrence count (a SUM
            # weight, meaningless under max) — max takes each edge's value
            # x * edge_w once, exactly like the pure-flat per-occurrence max
            msg_v = (x[src] * edge_w[:, None]).astype(jnp.float32)
            masked = jnp.where(edge_valid[:, None] > 0, msg_v, -jnp.inf)
            agg = jax.ops.segment_max(masked, dst, num_segments=n)
            agg = jnp.where(jnp.isfinite(agg), agg, 0.0)
        else:
            raise ValueError(f"Unknown aggregation: {self.aggr}")
        agg = agg.astype(x.dtype)
        return TorchLinear(self.features)(agg) + TorchLinear(self.features, use_bias=False)(x)


class DenseGraphConv(nn.Module):
    """GraphConv where neighbour aggregation is precomputed densely.

    Same math as :class:`GraphConv` on the equivalent edge list; used by the
    on-device kNN path, where the aggregation comes either from the fused
    Pallas kernel (``ops/knn_pallas``, TPU) or an explicit adjacency matmul
    (``ops/knn.adjacency_aggregate``) — gather/scatter never happen.
    """

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, agg: jnp.ndarray) -> jnp.ndarray:
        return TorchLinear(self.features)(agg) + TorchLinear(self.features, use_bias=False)(x)


class GATConv(nn.Module):
    """Multi-head graph attention (GATv1) with self-loops, concat heads.

    Two execution paths over ONE parameter tree:

    - flat edge lists (``src``/``dst``/``edge_valid``): attention as a
      segment softmax over incoming edges
    - dense batched layout (``adj_mask [B, M, M]``, x ``[B, M, F]``): GATv1
      factorises as ``e_ij = LeakyReLU(s_dst_i + s_src_j)`` with per-node
      scalars ``s`` — attention becomes a masked row softmax over the
      adjacency and aggregation one batched matmul per head.  No gather,
      no scatter, all MXU/VPU.
    """

    features: int  # per-head output width
    heads: int = 4
    negative_slope: float = 0.2

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        src: jnp.ndarray = None,
        dst: jnp.ndarray = None,
        edge_valid: jnp.ndarray = None,
        node_valid: jnp.ndarray = None,
        adj_mask: jnp.ndarray = None,
        in_src: jnp.ndarray = None,
        in_w: jnp.ndarray = None,
    ) -> jnp.ndarray:
        h, d = self.heads, self.features
        glorot = nn.initializers.glorot_uniform()

        if in_src is not None:
            # IN-ROW attention (dense device wire): the fused flash-style
            # Pallas kernel (ops/gat_pallas.py) computes the masked row
            # softmax and per-head aggregation tile-by-tile in VMEM — the
            # [B, M, M] logit matrix never reaches HBM, forward or
            # backward, and nothing gathers or scatters.  Self-loops
            # (torch_geometric add_self_loops) are the mask diagonal.
            # Off-TPU the dispatcher runs the XLA matrix oracle instead.
            from point_cloud_classifier_tpu.ops.gat_pallas import gat_attention

            b, m, _ = x.shape
            xw = nn.Dense(
                h * d, use_bias=False, kernel_init=glorot, dtype=x.dtype
            )(x).reshape(b, m, h, d)
            att_src = self.param("att_src", glorot, (1, h, d))
            att_dst = self.param("att_dst", glorot, (1, h, d))
            # product at the activation dtype (an f32 att_* would promote a
            # [B, M, H, dh] f32 temporary), summed with f32 accumulation
            s_src = jnp.sum(
                xw * att_src.astype(x.dtype), axis=-1, dtype=jnp.float32
            )  # [B, M, H]
            s_dst = jnp.sum(
                xw * att_dst.astype(x.dtype), axis=-1, dtype=jnp.float32
            )
            out = gat_attention(
                s_dst, s_src, in_src.astype(jnp.int32), in_w,
                xw.reshape(b, m, h * d), slope=self.negative_slope,
            )
            bias = self.param("bias", nn.initializers.zeros, (h * d,))
            return out.astype(x.dtype) + bias.astype(x.dtype)

        if adj_mask is not None:
            b, m, _ = x.shape
            xw = nn.Dense(
                h * d, use_bias=False, kernel_init=glorot, dtype=x.dtype
            )(x).reshape(b, m, h, d)
            att_src = self.param("att_src", glorot, (1, h, d))
            att_dst = self.param("att_dst", glorot, (1, h, d))
            # product at the activation dtype (an f32 att_* would promote a
            # [B, M, H, dh] f32 temporary), summed with f32 accumulation
            s_src = jnp.sum(
                xw * att_src.astype(x.dtype), axis=-1, dtype=jnp.float32
            )  # [B, M, H]
            s_dst = jnp.sum(
                xw * att_dst.astype(x.dtype), axis=-1, dtype=jnp.float32
            )
            # self-loops on every node (torch_geometric add_self_loops);
            # the masked-softmax math itself lives in ONE place —
            # ops/gat_pallas.gat_attention_masked, shared with the
            # kernel-parity oracle
            from point_cloud_classifier_tpu.ops.gat_pallas import (
                gat_attention_masked,
            )

            mask = (adj_mask > 0) | jnp.eye(m, dtype=bool)[None]
            out = gat_attention_masked(
                s_dst, s_src, mask, xw.reshape(b, m, h * d),
                slope=self.negative_slope,
            ).astype(x.dtype)
            bias = self.param("bias", nn.initializers.zeros, (h * d,))
            return out + bias.astype(out.dtype)

        n = x.shape[0]
        xw = nn.Dense(
            h * d, use_bias=False, kernel_init=glorot, dtype=x.dtype
        )(x).reshape(n, h, d)
        att_src = self.param("att_src", glorot, (1, h, d))
        att_dst = self.param("att_dst", glorot, (1, h, d))
        alpha_src = jnp.sum(
            xw * att_src.astype(x.dtype), axis=-1, dtype=jnp.float32
        )  # [N, H]
        alpha_dst = jnp.sum(xw * att_dst.astype(x.dtype), axis=-1, dtype=jnp.float32)

        # self-loops on every node (torch_geometric default add_self_loops)
        loops = jnp.arange(n, dtype=src.dtype)
        src_all = jnp.concatenate([src, loops])
        dst_all = jnp.concatenate([dst, loops])
        valid_all = jnp.concatenate([edge_valid, jnp.ones(n, edge_valid.dtype)])

        e = nn.leaky_relu(
            alpha_src[src_all] + alpha_dst[dst_all], negative_slope=self.negative_slope
        )  # [E+N, H]
        alpha = segment_softmax(e, dst_all, n, valid=valid_all[:, None])
        out = segment_sum(
            (alpha[:, :, None] * xw[src_all]).reshape(-1, h * d), dst_all, n
        ).reshape(n, h * d)
        bias = self.param("bias", nn.initializers.zeros, (h * d,))
        # back to the compute dtype: segment_sum accumulates f32, and
        # returning f32 here would silently de-bf16 every downstream layer
        # (the in-row and adj_mask branches both cast)
        return out.astype(x.dtype) + bias.astype(x.dtype)


class SAGPool(nn.Module):
    """Self-attention top-k pooling by rank-and-mask (static shapes)."""

    ratio: float = 0.5

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        node_seg: jnp.ndarray = None,
        src: jnp.ndarray = None,
        dst: jnp.ndarray = None,
        edge_w: jnp.ndarray = None,
        edge_valid: jnp.ndarray = None,
        node_valid: jnp.ndarray = None,
        num_graphs: int = None,
        adj_unw: jnp.ndarray = None,
        node_mask: jnp.ndarray = None,
    ):
        if adj_unw is not None:
            # dense layout: x [B, M, H], adj_unw [B, M, M] 0/1.  Scores from
            # the same unweighted-add GraphConv (identical param tree), then
            # a per-row top-k by rank — no segment sort needed
            agg = jnp.einsum(
                "bij,bjf->bif", adj_unw, x, preferred_element_type=jnp.float32
            ).astype(x.dtype)
            score = GraphConv(1, aggr="add")(x, agg=agg)[..., 0]  # [B, M]
            masked = jnp.where(node_mask > 0, score.astype(jnp.float32), -jnp.inf)
            # rank by descending score within each graph (stable, so ties
            # break by node index — matching segment_rank_desc's lexsort)
            order = jnp.argsort(-masked, axis=1, stable=True)
            ranks = jnp.argsort(order, axis=1, stable=True)
            # COUNT/RANK ARITHMETIC IN f32/int32, not the compute dtype:
            # node_mask arrives as bf16 under the benchmarked configs, and
            # a bf16 sum cannot represent odd counts above 256 (nor can
            # `ranks < kk` compare exactly once int32 ranks promote to
            # bf16) — a 301-node graph's keep set would silently diverge
            # from the flat path / torch reference (round-5 review
            # finding; M rungs run to 512).  The O(B·M) cost is noise.
            n_per_graph = jnp.sum(node_mask.astype(jnp.float32), axis=1)
            kk = jnp.ceil(self.ratio * n_per_graph).astype(jnp.int32)
            keep = node_mask * (ranks < kk[:, None]).astype(node_mask.dtype)
            x = x * jnp.tanh(score)[..., None] * keep[..., None].astype(x.dtype)
            return x, keep
        score = GraphConv(1, aggr="add")(
            x, src, dst, jnp.ones_like(edge_w), edge_valid
        )[:, 0]
        num_segments = num_graphs + 1
        ranks = segment_rank_desc(score, node_seg, num_segments, node_valid)
        n_per_graph = segment_count(node_seg, num_segments, valid=node_valid)
        k = jnp.ceil(self.ratio * n_per_graph)
        keep = node_valid * (ranks < k[node_seg]).astype(node_valid.dtype)

        x = x * jnp.tanh(score)[:, None] * keep[:, None]
        edge_valid = edge_valid * keep[src] * keep[dst]
        return x, edge_valid, keep


class GraphNet(nn.Module):
    input_dim: int
    hidden_dim: int
    output_dim: int
    activation: str
    use_gat: bool = False
    gat_heads: int = 4
    sag_pool: bool = False
    pool_ratio: float = 0.5
    local_pooling: str = "add"
    global_pooling: str = "mean"  # kept for config compat; the reference
    # hardcodes mean at readout (`models/graph_net.py:92,96`) and so do we
    deepchem_style: bool = False
    compute_dtype: str = "float32"  # "bfloat16": conv matmuls in bf16,
    # segment aggregations and norms stay f32
    fused_inrow: bool = False  # opt-in Pallas in-row aggregation kernel on
    # the dense layout (ops/inrow_graph.py) — see the A/B note in
    # _dense_forward before enabling
    knn_k: int = 0  # >0: ignore provided edges and build kNN edges from node
    # positions ON DEVICE inside the jit'd step (ops/knn.py) — the idiomatic
    # TPU alternative to the reference's offline lineage edges (SURVEY §0)

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = True) -> jnp.ndarray:
        if "adj" in batch or "edge_slot" in batch or "in_src" in batch:
            return self._dense_forward(batch, train)
        x = batch["nodes"].astype(resolve_dtype(self.compute_dtype))
        num_graphs = batch["y"].shape[0]
        # loaders may ship compact int16/int32 ids, or the counts wire
        # encoding (graphs are node-contiguous; rebuild ids on device)
        if "node_seg" in batch:
            node_seg = batch["node_seg"].astype(jnp.int32)
        else:
            # gather-free decode (a jnp.repeat lowers to a serial VPU
            # gather — see ops/segment.counts_to_segment_ids)
            node_seg = counts_to_segment_ids(
                batch["node_seg_counts"], x.shape[0]
            )
        adj = None
        if self.knn_k > 0:
            if self.input_dim < 4:
                raise ValueError("knn_k needs position features (n_features=4)")
            if (
                not self.use_gat
                and not self.sag_pool
                and self.local_pooling in ("add", "mean")
            ):
                # fully dense path: implicit adjacency, aggregation fused.
                # On TPU the Pallas kernel computes distances, the top-k
                # threshold, and the aggregation matmul without the [N, N]
                # matrices ever touching HBM (~10x the XLA dense path).
                # positions come from the PRE-cast nodes: building the graph
                # from bf16-rounded coordinates would silently change
                # neighbour topology under mixed precision
                pos3 = batch["nodes"][:, 1:4].astype(jnp.float32)
                from point_cloud_classifier_tpu.ops.dispatch import use_tpu_kernels

                if use_tpu_kernels():
                    from point_cloud_classifier_tpu.ops.knn_pallas import (
                        knn_aggregate_pallas,
                    )

                    adj = lambda h: knn_aggregate_pallas(
                        h, pos3, node_seg, self.knn_k, num_graphs,
                        self.local_pooling, 512, False,
                    )
                else:
                    from point_cloud_classifier_tpu.ops.knn import (
                        adjacency_aggregate,
                        knn_adjacency,
                    )

                    dense_adj = knn_adjacency(
                        pos3, node_seg, self.knn_k, num_graphs
                    )
                    adj = lambda h: adjacency_aggregate(
                        dense_adj, h, self.local_pooling
                    )
                src = dst = edge_w = edge_valid = None
            else:
                from point_cloud_classifier_tpu.ops.knn import knn_edges

                src, dst, edge_valid = knn_edges(
                    batch["nodes"][:, 1:4].astype(jnp.float32),
                    node_seg,
                    self.knn_k,
                    num_graphs,
                )
                edge_w = jnp.ones_like(edge_valid)
        else:
            src = batch["src"].astype(jnp.int32)
            dst = batch["dst"].astype(jnp.int32)
            edge_w, edge_valid = batch["edge_w"], batch["edge_mask"]
        if adj is None:
            edge_w = edge_w.astype(x.dtype)
            edge_valid = edge_valid.astype(x.dtype)
        node_valid = (node_seg < num_graphs).astype(x.dtype)
        act = activation_fn(self.activation)

        def conv(h):
            if adj is not None:
                return DenseGraphConv(self.hidden_dim)(h, adj(h))
            if self.use_gat:
                return GATConv(self.hidden_dim // self.gat_heads, self.gat_heads)(
                    h, src, dst, edge_valid, node_valid
                )
            return GraphConv(self.hidden_dim, self.local_pooling)(
                h, src, dst, edge_w, edge_valid
            )

        x = conv(x)
        x = act(x)
        x = MaskedBatchNorm()(x, mask=node_valid, train=train)

        if self.sag_pool:
            x, edge_valid, node_valid = SAGPool(self.pool_ratio)(
                x, node_seg, src, dst, edge_w, edge_valid, node_valid, num_graphs
            )

        x = conv(x)
        x = act(x)
        x = MaskedBatchNorm()(x, mask=node_valid, train=train)

        def mean_pool(h: jnp.ndarray) -> jnp.ndarray:
            num_segments = num_graphs + 1
            h32 = (h * node_valid[:, None]).astype(jnp.float32)
            total = segment_sum(h32, node_seg, num_segments)
            counts = segment_count(node_seg, num_segments, valid=node_valid)
            pooled = (total / jnp.maximum(counts, 1.0)[:, None])[:num_graphs]
            return pooled.astype(h.dtype)

        if self.deepchem_style:
            x = TorchLinear(256)(x)
            x = act(x)
            x = MaskedBatchNorm()(x, mask=node_valid, train=train)
            x = mean_pool(x)
        else:
            x = mean_pool(x)
            x = TorchLinear(256)(x)
            x = act(x)
            x = MaskedBatchNorm()(x, mask=batch.get("y_mask"), train=train)

        return TorchLinear(self.output_dim)(x).astype(jnp.float32)

    def _dense_forward(self, batch: Dict[str, jnp.ndarray], train: bool) -> jnp.ndarray:
        """Dense batched-adjacency path: message passing as batched matmuls.

        Batch layout (``data/batching.GraphLoader(layout="dense")``):
        ``nodes [B, M, F]``, ``adj [B, M, M]`` (row i = node i's incoming
        edge weights; simple graphs), ``node_mask [B, M]``.  Semantics match
        the flat edge-list path exactly for GraphConv add/mean (+SAG); the
        module instantiation order mirrors the flat branch so both layouts
        share one parameter tree (train flat, serve dense, or vice versa).
        GAT runs dense too — GATv1's ``e_ij = LeakyReLU(s_dst_i + s_src_j)``
        factorisation turns attention into a masked row softmax over the
        adjacency mask plus one matmul per head (see :class:`GATConv`); the
        dense wire encodes edge existence as w ≠ 0, so a weighted GAT
        (which torch_geometric's GATConv rejects outright) would treat
        zero-weight edges as absent.  Max aggregation runs over the in-row
        lists directly (``ops/inrow_graph.inrow_max_aggregate`` — max
        doesn't factor through an adjacency contraction, so the adjacency
        is never built without SAG; under SAG it is built once for the
        score conv and conv2's in-row weights are keep-masked, exactly as
        in the GAT+SAG composition).
        """
        # local_pooling is irrelevant under GAT (the reference picks GATConv
        # OR GraphConv(aggr=local_pooling), `models/graph_net.py:46-51`).
        # max dense-ifies via the in-row lists (it doesn't factor through an
        # adjacency matmul): per-slot one-hot einsums gather the neighbour
        # features (ops/inrow_graph.inrow_max_aggregate — no out-row mirror
        # needed since the round-3 rewrite; autodiff emits transpose
        # einsums, not scatters).  SAG composes the same way it does with
        # the GAT slot kernel: the aggregate's w==0 slot gate means
        # zeroing the in-row weights of edges touching dropped nodes
        # (broadcast-compare keep[src] · keep[dst], never a gather)
        # reproduces the flat path's edge filtering exactly.
        inrow_max = (
            not self.use_gat
            and self.local_pooling == "max"
            and "in_src" in batch
        )
        if self.knn_k > 0 or (
            self.local_pooling == "max" and not self.use_gat and not inrow_max
        ):
            raise ValueError(
                "dense graph layout supports GraphConv add/mean, GAT, and "
                "max over the in-row device wire "
                "(GraphLoader(require_inrow=True) — the factory sets it "
                "for pinned dense/auto max configs; require_inrow routes "
                "degree-outlier batches to the flat wire instead of this "
                "error); use the flat (edge list) layout otherwise / for "
                "knn_k"
            )
        dtype = resolve_dtype(self.compute_dtype)
        x = batch["nodes"].astype(dtype)
        node_mask = batch["node_mask"].astype(jnp.float32)
        b, m, _ = x.shape
        # opt-in: the fused Pallas kernel aggregates straight from the
        # in-row lists (adjacency built tile-by-tile in VMEM, consumed by
        # the matmul in place — [B, M, M] never exists in HBM).  Needs the
        # out-row mirror for its backward, and only GraphConv add/mean
        # without SAG factors this way (SAG reuses/masks the adjacency, GAT
        # needs the full logit matrix).  OFF by default: the same-window
        # A/B (41.5k vs 74.8k graphs/sec, fuse 4) showed that rebuilding
        # the adjacency inside every conv — twice forward, twice backward —
        # costs more VPU arithmetic than the saved HBM traffic is worth;
        # the XLA path builds once and reuses the buffer four times.  Kept
        # for shapes where HBM pressure dominates (huge M / tight memory).
        fused = (
            self.fused_inrow
            and "in_src" in batch
            and "out_dst" in batch
            and not self.use_gat
            and not self.sag_pool
        )
        if fused:
            from point_cloud_classifier_tpu.ops.dispatch import use_tpu_kernels

            fused = use_tpu_kernels()
        if self.fused_inrow and not fused:
            import warnings

            warnings.warn(
                "GraphNet(fused_inrow=True) has no effect on this batch: "
                "it needs the dense in-row wire WITH out-row lists "
                "(GraphLoader(emit_out_rows=True); train.py sets it when "
                "model.fused_inrow is on) and no GAT/SAG; running the "
                "ordinary path instead",
                stacklevel=2,
            )
        # GAT over the in-row wire needs no adjacency at all: the fused
        # flash-style kernel (ops/gat_pallas.py) builds each mask tile in
        # VMEM from the in-row lists and runs softmax + aggregation there,
        # forward AND backward — no [B, M, M] in HBM, no gather/scatter,
        # no out-row mirror needed.  See docs/kernels.md for the A/B.
        #
        # SAG composes with the kernel: slot validity gates on w != 0 and
        # the self-loop row is unconditional (_slot_prep/_mask_tile), so
        # zeroing the in-row weights of edges touching dropped nodes
        # reproduces the masked-adjacency semantics (adj·keep·keepᵀ | eye)
        # exactly — conv2 keeps the slot-softmax kernel instead of falling
        # back to the O(M²)-softmax dense-matrix GAT.  The adjacency is
        # still materialised once for the SAG score conv (one unweighted
        # compare-build + matmul, the same cost class as a dense GraphConv
        # layer).
        inrow_gat = self.use_gat and "in_src" in batch
        if fused:
            from point_cloud_classifier_tpu.ops.inrow_graph import inrow_aggregate

            f_in_src = batch["in_src"].astype(jnp.int32)
            f_in_w = batch["in_w"].astype(dtype)
            f_out_dst = batch["out_dst"].astype(jnp.int32)
            f_out_w = batch["out_w"].astype(dtype)
            adj = None
        elif (inrow_gat or inrow_max) and not self.sag_pool:
            adj = None  # never materialised (SAG needs it for its score conv)
        elif "adj" in batch:
            adj = batch["adj"].astype(dtype)
        else:
            # device-side adjacency (GraphLoader adj_wire="device"): the
            # wire never carries the B·M² buffer; the host also never
            # allocates or zeroes it.
            #
            # Preferred wire: per-node padded incoming edges "in_src"/"in_w"
            # [B, M, D] (D = max in-degree bucket).  The adjacency then
            # materialises as D fused broadcast-compare+fma passes over
            # [B, M, M] — pure vector work, no scatter, no gather (an XLA
            # scalar scatter of E elements costs ~14 ns each on TPU, ~1.8
            # ms at bench shapes; the compare form is ~memset cost).
            # Padding slots carry w=0 so they contribute nothing wherever
            # they point.
            #
            # Fallback wire: flat LOCAL (slot, dst, src, w) edge lists,
            # strictly ascending + duplicate-merged with padding at
            # out-of-range slot b, built with one sorted/unique scatter.
            if "in_src" in batch:
                from point_cloud_classifier_tpu.ops.inrow_graph import (
                    inrow_adjacency_xla,
                )

                adj = inrow_adjacency_xla(
                    batch["in_src"], batch["in_w"], m, dtype
                )
            else:
                adj = (
                    jnp.zeros((b, m, m), dtype)
                    .at[
                        batch["edge_slot"].astype(jnp.int32),
                        batch["edge_dst"].astype(jnp.int32),
                        batch["edge_src"].astype(jnp.int32),
                    ]
                    .add(
                        batch["edge_w"].astype(dtype),
                        mode="drop",
                        # non-decreasing: live triples strictly ascend, then
                        # the repeated (b, 0, 0) padding.  unique_indices is
                        # deliberately NOT promised — the padding repeats,
                        # and lax.scatter declares UB if the promise is
                        # broken even for dropped out-of-bounds entries.
                        # (A/B: the flag made no measurable difference.)
                        indices_are_sorted=True,
                    )
                )
        act = activation_fn(self.activation)
        # mean denominator: the wire's exact per-occurrence in-degree when
        # available (counts duplicate-merged edges per occurrence and keeps
        # w==0 edges, matching the flat path's segment_count exactly);
        # counting nonzero adjacency entries is the fallback for hand-built
        # batches.  After SAG pooling the degree changes dynamically and the
        # count-nonzero form takes over — exact for simple graphs with
        # nonzero weights (the lineage builder's output); multigraphs or
        # zero-weight edges under SAG+mean keep the count-nonzero semantics
        # (documented divergence, mirroring the dense-GAT w!=0 caveat).
        in_deg = batch.get("in_deg")

        def dense_agg(h, a, deg=None):
            # f32 accumulation like the flat path's f32 segment ops
            out = jnp.einsum(
                "bij,bjf->bif", a, h, preferred_element_type=jnp.float32
            )
            if self.local_pooling == "mean":
                if deg is None:
                    deg = jnp.sum((a != 0).astype(jnp.float32), axis=2)
                out = out / jnp.maximum(deg.astype(jnp.float32), 1.0)[..., None]
            return out.astype(h.dtype)

        def bn(mod, h, mask):
            return mod(h.reshape(b * m, -1), mask=mask.reshape(-1), train=train).reshape(
                b, m, -1
            )

        # mutable cells so the SAG block can swap in keep-masked weights for
        # conv2 while conv1 reads the raw wire (nn.compact shares one conv
        # closure across both calls)
        gat_in_w = [batch["in_w"]] if inrow_gat else None
        max_in_w = [batch["in_w"]] if inrow_max else None

        def conv(h):
            if self.use_gat:
                if inrow_gat:
                    return GATConv(
                        self.hidden_dim // self.gat_heads, self.gat_heads
                    )(
                        h,
                        in_src=batch["in_src"].astype(jnp.int32),
                        in_w=gat_in_w[0],
                    )
                return GATConv(self.hidden_dim // self.gat_heads, self.gat_heads)(
                    h, adj_mask=(adj != 0)
                )
            if inrow_max:
                from point_cloud_classifier_tpu.ops.inrow_graph import (
                    inrow_max_aggregate,
                )

                agg = inrow_max_aggregate(
                    h, batch["in_src"].astype(jnp.int32), max_in_w[0]
                )
                return GraphConv(self.hidden_dim, self.local_pooling)(h, agg=agg)
            if fused:
                if self.local_pooling == "mean" and in_deg is not None:
                    # kernel aggregates "add"; the exact-degree division
                    # happens outside so the custom_vjp stays untouched
                    # (division is linear — autodiff composes it correctly)
                    agg = inrow_aggregate(
                        h, f_in_src, f_in_w, f_out_dst, f_out_w, "add"
                    )
                    agg = (
                        agg.astype(jnp.float32)
                        / jnp.maximum(in_deg.astype(jnp.float32), 1.0)[..., None]
                    ).astype(h.dtype)
                else:
                    agg = inrow_aggregate(
                        h, f_in_src, f_in_w, f_out_dst, f_out_w, self.local_pooling
                    )
            else:
                agg = dense_agg(h, adj, in_deg)
            return GraphConv(self.hidden_dim, self.local_pooling)(h, agg=agg)

        x = conv(x)
        x = act(x)
        x = bn(MaskedBatchNorm(), x, node_mask)

        if self.sag_pool:
            adj_unw = (adj != 0).astype(dtype)
            x, keep = SAGPool(self.pool_ratio)(
                x, adj_unw=adj_unw, node_mask=node_mask.astype(dtype)
            )
            keep = keep.astype(jnp.float32)
            if inrow_gat or inrow_max:
                # zero the in-row weights of every edge touching a dropped
                # node (src via a per-row gather of keep, dst via the row
                # mask); slot validity is w != 0 (the GAT kernel's
                # _slot_prep gate and inrow_max_aggregate's where(w != 0)
                # alike), so conv2 sees exactly the masked-adjacency graph
                # (adj·keep·keepᵀ, | eye for GAT's unconditional self-loop
                # row).  keep[src] WITHOUT a gather: jnp.take_along_axis
                # here lowered to an XLA scalar gather at ~14 ns/element —
                # profiled 2.67 ms/step, 44% of the WHOLE GAT+SAG step
                # (fusion.263, 2026-08-20; same pathology as the round-1
                # scatter finding).  D broadcast-compare+reduce passes —
                # the in-step adjacency build's trick — compute the
                # identical 0/1 values for ~an adjacency-build's cost.
                in_src_i = batch["in_src"].astype(jnp.int32)
                iota = jnp.arange(m, dtype=jnp.int32)[None, None, :]
                keep_src = jnp.stack(
                    [
                        jnp.sum(
                            jnp.where(
                                in_src_i[:, :, dd, None] == iota,
                                keep[:, None, :],
                                0.0,
                            ),
                            axis=-1,
                        )
                        for dd in range(in_src_i.shape[-1])
                    ],
                    axis=-1,
                )
                cell = gat_in_w if inrow_gat else max_in_w
                cell[0] = (
                    cell[0]
                    * keep_src.astype(cell[0].dtype)
                    * keep[:, :, None].astype(cell[0].dtype)
                )
            else:
                adj = (
                    adj
                    * keep[:, :, None].astype(dtype)
                    * keep[:, None, :].astype(dtype)
                )
            node_mask = keep
            in_deg = None  # degrees changed; conv2 falls back to count-nonzero

        x = conv(x)
        x = act(x)
        x = bn(MaskedBatchNorm(), x, node_mask)

        def mean_pool(h: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
            h32 = h.astype(jnp.float32) * mask[..., None]
            total = jnp.sum(h32, axis=1)
            counts = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
            return (total / counts[:, None]).astype(h.dtype)

        if self.deepchem_style:
            # The deepchem head runs fc1/act/bn3 PER NODE ([B, M, 256])
            # before the mean pool; its backward round-trips 2-3 residual
            # buffers of B*M*256 bf16 (~33 MB each at bench shapes)
            # through HBM.  nn.remat can recompute the chain from the
            # [B, M, hidden] conv output instead (pool inside, so only
            # the [B, 256] row leaves the checkpoint) — the trade the
            # flagship's φ-chain auto-remat won +38% on.  MEASURED
            # NEGATIVE here (same-window A/Bs, 2026-08-19): GraphConv
            # dense 291.7k (off) vs 272.5k (on, −6.6%), GAT 98.7k vs
            # 96.5k (−2.2%) — the graph steps are matmul-bound (the
            # adjacency einsums / attention kernels saturate compute
            # while XLA overlaps the residual traffic), so the recompute
            # adds FLOPs on the critical path and saves latency nobody
            # was paying.  OFF by default; PCC_GRAPH_REMAT=1 keeps the
            # form for memory-tight regimes (huge M where the residuals
            # would spill).  Grad + batch_stats exactness vs the inline
            # head is pinned by tests/test_dense_graph.py; the lifted fn
            # keeps submodule naming (the flat/dense shared parameter
            # tree) unchanged.
            def _head(mdl, h, mask):
                h = TorchLinear(256)(h)
                h = act(h)
                h = bn(MaskedBatchNorm(), h, mask)
                return mean_pool(h, mask)

            if os.environ.get("PCC_GRAPH_REMAT", "0") == "1":
                x = nn.remat(_head)(self, x, node_mask)
            else:
                x = _head(self, x, node_mask)
        else:
            x = mean_pool(x, node_mask)
            x = TorchLinear(256)(x)
            x = act(x)
            x = MaskedBatchNorm()(x, mask=batch.get("y_mask"), train=train)

        return TorchLinear(self.output_dim)(x).astype(jnp.float32)
