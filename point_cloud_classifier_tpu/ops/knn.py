"""On-device kNN graph construction — the idiomatic TPU alternative.

The reference builds graph edges *offline* from MC-truth particle lineage
(`utils/data.py:847-929`); its own BASELINE description nevertheless calls
the model family "kNN graph construction" (SURVEY §0 note).  This op provides
that alternative natively: k-nearest-neighbour edges computed **inside the
jit'd step** from node positions, so the graph pipeline can skip the offline
edge builder entirely (accuracy parity is still measured against the
lineage-graph pipeline).

TPU mapping: the pairwise squared-distance matrix is one [N, N] MXU matmul
(‖x‖² + ‖y‖² − 2·x·yᵀ); per-row neighbours come from ``lax.top_k``.  Cost is
O(N²) memory — intended for training-batch node counts (N ≤ ~8K, i.e. ≤256MB
f32), not the flattened mega-batches of the throughput benchmark.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def knn_edges(
    positions: jnp.ndarray,
    node_seg: jnp.ndarray,
    k: int,
    num_graphs: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Directed kNN edges within each graph of a flattened node batch.

    Args:
        positions: ``[N, D]`` node coordinates (any float dtype).
        node_seg: ``[N]`` graph id per node; padding nodes carry
            ``num_graphs``.
        k: neighbours per node.
        num_graphs: number of real graphs in the batch.

    Returns:
        ``(src, dst, edge_mask)`` each ``[N*k]``: edge ``src[e] → dst[e]``
        gathers from the neighbour into the node (the aggregation direction
        GraphConv uses); ``edge_mask`` zeroes edges that would cross graphs,
        touch padding, or exceed a graph's real node count.
    """
    n = positions.shape[0]
    # ‖a−b‖² = ‖a‖² + ‖b‖² − 2a·b — the N×N term rides the MXU
    # (shared with knn_adjacency via _masked_sqdist)
    masked, _ = _masked_sqdist(positions, node_seg, num_graphs)
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    neg_d, idx = jax.lax.top_k(-masked, k)  # [N, k] nearest first

    # == repeat(arange(n), k) but pure iota arithmetic, no gather
    dst = jax.lax.iota(jnp.int32, n * k) // k
    src = idx.astype(jnp.int32).reshape(-1)
    edge_mask = (neg_d > -big).reshape(-1).astype(jnp.float32)
    # disallowed picks keep indices from top_k's padding — point them at the
    # node itself so gathers stay in-bounds and masked
    src = jnp.where(edge_mask > 0, src, dst)
    return src, dst, edge_mask


def knn_adjacency(
    positions: jnp.ndarray,
    node_seg: jnp.ndarray,
    k: int,
    num_graphs: int,
) -> jnp.ndarray:
    """Dense [N, N] kNN adjacency: ``A[i, j] = 1`` iff ``j`` is among ``i``'s
    k nearest same-graph neighbours (per-row top-k THRESHOLD on the
    distance matrix).

    Tie semantics (deliberate, round-5 review adjudication): exact
    distance ties at the k-th neighbour admit ALL tied candidates — so on
    exactly-duplicated coordinates (zero-length steps, quantized hits) a
    row's degree can exceed k, and this diverges from ``knn_edges``,
    which picks exactly k (lowest index wins).  The threshold form is
    kept because the fused Pallas kernel (``ops/knn_pallas``) implements
    the SAME admit-ties semantics in-register and this function is its
    test-pinned oracle (`tests/test_knn_pallas.py::test_pallas_tie_
    semantics`) — the two AGGREGATE implementations stay exactly
    equivalent, and the documented divergence is only vs the edge-LIST
    builder on measure-degenerate inputs.  A rank-based exact form was
    written and reverted: it broke the kernel pairing for a case the
    caveat already covers.
    """
    masked, allowed = _masked_sqdist(positions, node_seg, num_graphs)
    # k-th smallest distance per row = the neighbourhood threshold
    neg_topk, _ = jax.lax.top_k(-masked, k)
    kth = -neg_topk[:, -1]
    return (allowed & (masked <= kth[:, None])).astype(jnp.float32)


def _masked_sqdist(positions, node_seg, num_graphs):
    """Shared masked pairwise squared-distance matrix for ``knn_edges`` and
    ``knn_adjacency`` (one implementation — the two copies had already
    drifted stylistically): returns ``(masked [N, N], allowed [N, N])``
    where disallowed pairs (cross-graph, self, padding) carry f32-max."""
    n = positions.shape[0]
    pos = positions.astype(jnp.float32)
    node_seg = node_seg.astype(jnp.int32)
    sq = jnp.sum(pos * pos, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.dot(
        pos, pos.T, preferred_element_type=jnp.float32
    )
    valid_node = node_seg < num_graphs
    allowed = (
        (node_seg[:, None] == node_seg[None, :])
        & ~jnp.eye(n, dtype=bool)
        & valid_node[None, :]
        & valid_node[:, None]
    )
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    return jnp.where(allowed, d2, big), allowed


def adjacency_aggregate(adj: jnp.ndarray, x: jnp.ndarray, aggr: str = "add") -> jnp.ndarray:
    """Neighbour aggregation as one MXU matmul: ``A @ x`` (or its row-mean)."""
    agg = jnp.dot(adj.astype(x.dtype), x, preferred_element_type=jnp.float32)
    if aggr == "mean":
        deg = jnp.sum(adj.astype(jnp.float32), axis=1, keepdims=True)
        agg = agg / jnp.maximum(deg, 1.0)
    elif aggr != "add":
        raise ValueError("aggr must be 'add' or 'mean'")
    return agg.astype(x.dtype)


def knn_aggregate(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    node_seg: jnp.ndarray,
    k: int,
    num_graphs: int,
    aggr: str = "add",
) -> jnp.ndarray:
    """Fused kNN construction + neighbour aggregation — no edge lists at all.

    The fully matmul formulation of a kNN graph convolution's message
    aggregation: implicit adjacency (``knn_adjacency``) times features —
    MXU end to end, no gather, no scatter.  Equivalent to ``knn_edges`` +
    ``segment_sum`` over the edge list (tested), but the edge list never
    exists.
    """
    return adjacency_aggregate(
        knn_adjacency(positions, node_seg, k, num_graphs), x, aggr
    )
