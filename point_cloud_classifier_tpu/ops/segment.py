"""Segment reductions with static segment counts — the TPU workhorses.

The reference's hot ops are ragged per-event reductions done in Python loops
(`models/deep_sets.py:96-104` pools per-event chunks; torch_geometric's
scatter aggregations inside `models/graph_net.py:73,82`).  On TPU these become
dense segment reductions over the flattened batch layouts produced by
``data/batching.py``: every array has a static shape and the segment count is
``B + 1`` (the extra slot collects padding).

Two implementations are provided for the sum:

- ``jax.ops.segment_sum`` (XLA scatter-add)
- a one-hot matmul that runs on the MXU — on TPU a [P, B] one-hot times
  [P, H] data contraction is usually faster than scatter for the sizes here
  (P up to ~64K, B ~33); selected via ``method="matmul"``.

These serve the FLAT wires (arbitrary segment boundaries).  The dense
per-cloud-row point wire (``data/batching.PointCloudLoader(layout=...)``)
sidesteps segment ops entirely — with uniform rows the pool is a masked
batched matvec and the spread a broadcast (``models/deep_sets.py``
dense_wire, +15% whole-step at the flagship shape) — so prefer that wire
when per-batch padding is small; these ops remain the general fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    method: str = "auto",
) -> jnp.ndarray:
    """Sum rows of ``data`` into ``num_segments`` buckets.

    ``method``: "scatter" (XLA scatter-add), "matmul" (one-hot contraction on
    the MXU), or "auto" (matmul on TPU for 2-D data, scatter otherwise).
    """
    if method == "auto":
        on_tpu = jax.default_backend() == "tpu"
        # the one-hot is [P, num_segments]: only worth materializing for the
        # per-event pooling case (small B) — graph message aggregation has
        # num_segments = node count, where scatter is the only sane choice
        onehot_mb = data.shape[0] * num_segments * data.dtype.itemsize / 2**20
        method = (
            "matmul"
            if (on_tpu and data.ndim == 2 and num_segments <= 2048 and onehot_mb <= 128)
            else "scatter"
        )
    if method == "matmul" and data.ndim == 2:
        onehot = jax.nn.one_hot(segment_ids, num_segments, dtype=data.dtype)
        return jnp.einsum(
            "ps,ph->sh", onehot, data, preferred_element_type=jnp.float32
        ).astype(data.dtype)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def counts_to_segment_ids(counts: jnp.ndarray, total: int) -> jnp.ndarray:
    """Per-segment counts ``[S]`` → sorted per-element segment ids ``[total]``.

    The obvious ``jnp.repeat(arange(S), counts, total_repeat_length=total)``
    lowers to a serial VPU gather — profiled at ~0.5 ms for 65K points on
    v5e, the single most expensive op in the flagship train step.  The id of
    element ``i`` is just the number of cumulative segment ends ≤ ``i``, so
    a broadcast compare against the ``[S]`` ends vector plus a row reduce
    computes the whole thing as vectorized VPU work (µs).
    """
    ends = jnp.cumsum(counts.astype(jnp.int32))
    i = jax.lax.broadcasted_iota(jnp.int32, (total, 1), 0)
    return jnp.sum((i >= ends[None, :]).astype(jnp.int32), axis=1)


def spread_by_segment(
    values: jnp.ndarray, segment_ids: jnp.ndarray, dtype=None
) -> jnp.ndarray:
    """Expand per-segment rows ``[S, C]`` to per-element rows ``[N, C]``.

    Gather-free replacement for ``values[segment_ids]`` (a serial VPU gather
    at these sizes): a one-hot ``[N, S]`` contraction on the MXU.  Exact —
    each output row is a single-term sum.  Worth it when N ≫ S (per-event
    constants spread back over points); for genuinely random large tables
    a gather is still the right op.
    """
    dtype = values.dtype if dtype is None else dtype
    s = values.shape[0]
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    onehot = (segment_ids[:, None] == slot).astype(dtype)
    return jnp.dot(
        onehot, values.astype(dtype), preferred_element_type=jnp.float32
    ).astype(dtype)


def segment_count(
    segment_ids: jnp.ndarray, num_segments: int, valid: jnp.ndarray = None
) -> jnp.ndarray:
    ones = jnp.ones(segment_ids.shape, dtype=jnp.float32)
    if valid is not None:
        ones = ones * valid
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    method: str = "auto",
) -> jnp.ndarray:
    total = segment_sum(data, segment_ids, num_segments, method)
    counts = jnp.maximum(segment_count(segment_ids, num_segments), 1.0)
    # divide in f32, cast once: under bf16 data the old total.dtype cast
    # quantized counts above 256 (bf16 integer spacing 2 — a 257-element
    # segment divided by 256/258), the same count-representability class
    # as the round-5 dense-SAG finding
    out = total.astype(jnp.float32) / counts.reshape(
        (-1,) + (1,) * (total.ndim - 1)
    )
    return out.astype(total.dtype)


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    empty_value: float = 0.0,
) -> jnp.ndarray:
    """Per-segment elementwise max; empty segments produce ``empty_value``.

    (torch's ``chunk.max`` never sees empty chunks; padding segments here can
    be empty, and -inf results would poison masked losses downstream.)
    """
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, empty_value)


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    valid: jnp.ndarray = None,
) -> jnp.ndarray:
    """Numerically-stable softmax normalized within each segment.

    Used for GAT attention over each node's incoming edges.  ``valid`` masks
    padded edges out of both the max and the normalization.
    """
    neg = jnp.finfo(logits.dtype).min
    masked = logits if valid is None else jnp.where(valid > 0, logits, neg)
    seg_max = jax.ops.segment_max(masked, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    exp = jnp.exp(masked - seg_max[segment_ids])
    if valid is not None:
        exp = exp * valid
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(denom, jnp.finfo(logits.dtype).tiny)
    return exp / denom[segment_ids]


def segment_rank_desc(
    score: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Rank of each element within its segment by descending score (0 = best).

    Invalid elements rank after all valid ones.  Sort-based (O(N log N)), the
    static-shape replacement for torch_geometric's per-graph ``topk`` used by
    SAGPooling (`models/graph_net.py:57-58,78-80` in the reference).
    """
    n = score.shape[0]
    big = jnp.finfo(score.dtype).max
    sort_key = jnp.where(valid > 0, -score, big)
    order = jnp.lexsort((sort_key, segment_ids))  # segment-major, score-desc
    # position of each sorted element within its segment.  jnp.asarray:
    # ``order`` is a tracer, and numpy fancy-indexing a HOST ndarray by a
    # tracer calls __array__ on it — unreachable inside jit (batches are
    # tracers there) but real under jax.vmap over un-jitted numpy batches
    # (vmap_sweep's vmapped model.init; found by a 24-run vmapped sweep
    # soak on the SAG+max flat arm, 2026-08-19)
    seg_sorted = jnp.asarray(segment_ids)[order]
    idx = jnp.arange(n)
    first_of_seg = jax.ops.segment_min(idx, seg_sorted, num_segments=num_segments)
    rank_sorted = idx - first_of_seg[seg_sorted]
    ranks = jnp.zeros(n, dtype=jnp.int32).at[order].set(rank_sorted.astype(jnp.int32))
    return ranks
