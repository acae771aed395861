"""Pallas kernel: fused in-row adjacency build + neighbour aggregation.

The dense graph layout's production wire is IN-ROW (`data/batching.
GraphLoader._dense_wire_batch`): ``in_src``/``in_w [B, M, D]`` hold each
node's incoming-edge sources and weights.  The XLA path materialises the
[B, M, M] adjacency from them (D broadcast-compare passes) and then runs
``adj @ h`` — at bench shapes that is one 134 MB HBM write plus 2×134 MB
reads per convolution (forward), again in the backward.

This kernel fuses build and aggregation per row tile so the adjacency
never exists outside VMEM:

    grid (B, M/T); per step
      1. adj_tile [T, M] = Σ_d (in_src[b, tile, d] == iota_M) · in_w[...]
         (D static compare+fma passes, VPU)
      2. out[b, tile] = adj_tile @ h[b]          (MXU, f32 accumulation)
      3. aggr == "mean": divide by the tile's in-degree (count of in_w ≠ 0,
         matching the XLA path's ``(adj != 0).sum`` degree exactly — the
         loader merges duplicate edges at construction)

Backward: ``dL/dh = adjᵀ @ g`` is the SAME aggregation over the
transposed adjacency, i.e. this kernel applied to the OUT-row lists
(``out_dst``/``out_w`` — each node's outgoing edges), which the loader
ships alongside the in-row arrays.  Edge data is constant, so no other
cotangent exists.  For "mean" the upstream cotangent is pre-divided by
the forward in-degree.

Semantics oracle: :func:`inrow_aggregate_xla` (also the CPU fallback).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def inrow_adjacency_xla(in_src: jnp.ndarray, in_w: jnp.ndarray, m: int, dtype):
    """[B, M, M] adjacency from in-row lists via D compare passes (no
    scatter).  Padding entries carry w=0, so they contribute nothing."""
    src = in_src.astype(jnp.int32)
    w = in_w.astype(dtype)
    iota = jnp.arange(m, dtype=jnp.int32)[None, None, :]
    adj = jnp.zeros((in_src.shape[0], in_src.shape[1], m), dtype)
    for d in range(in_src.shape[-1]):
        adj = adj + (src[:, :, d, None] == iota) * w[:, :, d, None]
    return adj


def inrow_aggregate_xla(h: jnp.ndarray, in_src: jnp.ndarray, in_w: jnp.ndarray,
                        aggr: str = "add") -> jnp.ndarray:
    """Reference implementation: materialise the adjacency, one einsum."""
    b, m, _ = h.shape
    adj = inrow_adjacency_xla(in_src, in_w, m, h.dtype)
    out = jnp.einsum("bij,bjf->bif", adj, h, preferred_element_type=jnp.float32)
    if aggr == "mean":
        deg = jnp.sum((in_w != 0).astype(jnp.float32), axis=2)
        out = out / jnp.maximum(deg, 1.0)[..., None]
    return out.astype(h.dtype)


def _make_kernel(t: int, m: int, d: int, aggr: str):
    def kernel(src_ref, w_ref, h_ref, out_ref):
        h = h_ref[0]  # [M, H]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (t, m), 1)
        adj = jnp.zeros((t, m), jnp.float32)
        for dd in range(d):
            src_col = src_ref[0, :, pl.ds(dd, 1)]          # [T, 1] i32
            w_col = w_ref[0, :, pl.ds(dd, 1)].astype(jnp.float32)
            adj = adj + jnp.where(src_col == col_ids, w_col, 0.0)
        agg = jax.lax.dot_general(
            adj.astype(h.dtype),
            h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, H]
        if aggr == "mean":
            deg = jnp.zeros((t, 1), jnp.float32)
            for dd in range(d):
                w_col = w_ref[0, :, pl.ds(dd, 1)].astype(jnp.float32)
                deg = deg + jnp.where(w_col != 0.0, 1.0, 0.0)
            agg = agg / jnp.maximum(deg, 1.0)
        out_ref[0] = agg.astype(out_ref.dtype)

    return kernel


def _tile_rows(m: int, width: int, itemsize: int) -> int:
    """Largest pow-2 row tile whose [T, M] f32 adjacency block (~3 live
    compare temporaries) fits what remains of a ~10 MB VMEM budget after
    the resident [M, width] feature block and the [T, width] output; 0 if
    even T=8 doesn't fit (caller falls back to XLA)."""
    resident = m * width * itemsize * 2  # h block, double-buffered
    remaining = (10 << 20) - resident
    budget = remaining // (12 * m) if remaining > 0 else 0
    if budget < 8:
        return 0
    t = 8
    while t * 2 <= min(budget, m):
        t *= 2
    return t


def _inrow_aggregate_impl(h, in_src, in_w, aggr: str, interpret: bool):
    if aggr not in ("add", "mean"):
        # loud: the weighted-sum math silently "works" for any string, and
        # graph_net passes local_pooling straight through — a future
        # branch reorder must not turn 'max' into a silent weighted sum
        raise ValueError(f"inrow_aggregate supports 'add'/'mean', got {aggr!r}")
    from point_cloud_classifier_tpu.ops.dispatch import use_tpu_kernels

    b, m, width = h.shape
    d = in_src.shape[-1]
    t = _tile_rows(m, width, h.dtype.itemsize)
    if (
        t == 0
        or m % t != 0
        or (m & (m - 1)) != 0
        or (not use_tpu_kernels() and not interpret)
    ):
        # XLA fallback: VMEM-infeasible shapes, non-pow2 buckets, and
        # non-TPU backends (Mosaic only interprets elsewhere).  Gate via
        # dispatch.use_tpu_kernels — NOT jax.default_backend directly —
        # so serving's force_xla() export tracing closes this kernel too
        # (a raw backend check would embed tpu_custom_call in a "pure
        # StableHLO" artifact traced on a TPU host)
        return inrow_aggregate_xla(h, in_src, in_w, aggr)
    kernel = _make_kernel(t, m, d, aggr)
    return pl.pallas_call(
        kernel,
        grid=(b, m // t),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, width), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t, width), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, width), h.dtype),
        interpret=interpret,
    )(in_src.astype(jnp.int32), in_w, h)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def inrow_aggregate(h, in_src, in_w, out_dst, out_w, aggr: str = "add",
                    interpret: bool = False):
    """Fused in-row neighbour aggregation; see module docstring.

    ``out_dst``/``out_w`` are only consumed by the backward pass (the
    transposed aggregation); pass ``None`` for inference-only use.
    """
    return _inrow_aggregate_impl(h, in_src, in_w, aggr, interpret)


def _fwd(h, in_src, in_w, out_dst, out_w, aggr, interpret):
    out = _inrow_aggregate_impl(h, in_src, in_w, aggr, interpret)
    return out, (h, in_src, in_w, out_dst, out_w)


def _bwd(aggr, interpret, residuals, g):
    h, in_src, in_w, out_dst, out_w = residuals
    if out_dst is None:
        raise ValueError(
            "inrow_aggregate backward needs the out-row lists "
            "(out_dst/out_w); GraphLoader(emit_out_rows=True) ships them"
        )
    if aggr == "mean":
        # out = (A @ h) / deg with deg piecewise-constant in the weights,
        # so the division folds into the upstream cotangent once
        deg = jnp.sum((in_w != 0).astype(jnp.float32), axis=2)
        g = (g.astype(jnp.float32) / jnp.maximum(deg, 1.0)[..., None]).astype(
            g.dtype
        )
    # adjᵀ aggregation == the same kernel over the out-row lists (always
    # "add": the mean division above already happened on the dst side)
    dh = _inrow_aggregate_impl(g, out_dst, out_w, "add", interpret)
    # true weight cotangent: d out[b,i]/d in_w[b,i,d] = h[b, src_d], so
    # dL/din_w = <g', h[src]> — a row gather + dot.  The model path feeds
    # loader data (never differentiated), but library callers must get the
    # real gradient, not silent zeros.
    bidx = jnp.arange(h.shape[0])[:, None, None]
    gathered = h[bidx, in_src.astype(jnp.int32)]  # [B, M, D, H]
    din_w = jnp.sum(gathered * g[:, :, None, :], axis=-1).astype(in_w.dtype)
    # out_dst/out_w only route the backward; the forward doesn't depend on
    # them, so their cotangent is genuinely zero
    zero_i = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (
        dh,
        zero_i(in_src),
        din_w,
        zero_i(out_dst),
        jnp.zeros_like(out_w),
    )


inrow_aggregate.defvjp(_fwd, _bwd)


def _inrow_gather_impl(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """values [B, M, C] gathered per edge slot: out[b,i,d] = values[b, idx[b,i,d]]."""
    return jnp.take_along_axis(
        values[:, :, None, :], idx.astype(jnp.int32)[..., None], axis=1
    )


@jax.custom_vjp
def inrow_gather(values, in_src, out_dst, out_pos, out_valid):
    """Per-edge row gather with a scatter-free backward.

    Forward: ``out[b, i, d, :] = values[b, in_src[b, i, d], :]`` — the
    per-incoming-edge gather the dense in-row GAT needs for neighbour
    scores and features.

    Backward: the cotangent ``dvalues[b, j] = Σ_{(i,d): in_src[b,i,d]=j}
    g[b, i, d]`` is a scatter-add under plain autodiff — and an XLA scalar
    scatter costs ~14 ns/edge on TPU (docs/kernels.md).  The out-row mirror
    re-expresses it as a GATHER over node j's outgoing slots:
    ``Σ_q g[b, out_dst[b,j,q], out_pos[b,j,q]]`` where ``out_pos`` is each
    outgoing edge's position in its destination's in-row list
    (``GraphLoader`` ships all three with ``emit_out_rows=True``).

    ``out_dst``/``out_pos``/``out_valid`` only route the backward; pass
    ``None`` for inference-only use (the backward then raises).

    Contract: the upstream cotangent must be ZERO on padding slots
    (``in_w == 0``) — the out-row route only visits real edges, while plain
    autodiff would also scatter padding-slot cotangents into node 0.  Any
    masked use satisfies this (attention multiplies padding slots by
    α = 0 before they reach the loss).
    """
    return _inrow_gather_impl(values, in_src)


def _inrow_gather_fwd(values, in_src, out_dst, out_pos, out_valid):
    return _inrow_gather_impl(values, in_src), (
        values,
        in_src,
        out_dst,
        out_pos,
        out_valid,
    )


def _inrow_gather_bwd(residuals, g):
    values, in_src, out_dst, out_pos, out_valid = residuals
    if out_dst is None or out_pos is None:
        raise ValueError(
            "inrow_gather backward needs the out-row mirror (out_dst/"
            "out_pos/out_w); GraphLoader(emit_out_rows=True) ships it"
        )
    b, m, d = in_src.shape
    c = g.shape[-1]
    g_flat = g.reshape(b, m * d, c)
    flat_idx = out_dst.astype(jnp.int32) * d + out_pos.astype(jnp.int32)
    picked = jnp.take_along_axis(
        g_flat[:, :, None, :], flat_idx[..., None], axis=1
    )  # [B, M, Q, C]
    # out_valid carries the out-row WEIGHTS wire (w=0 marks padding); the
    # cotangent route needs pure validity, not a weighting
    mask = (out_valid != 0).astype(jnp.float32)
    dvalues = jnp.sum(
        picked.astype(jnp.float32) * mask[..., None], axis=2
    ).astype(values.dtype)
    zero_i = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (
        dvalues,
        zero_i(in_src),
        zero_i(out_dst),
        zero_i(out_pos),
        jnp.zeros_like(out_valid),
    )


inrow_gather.defvjp(_inrow_gather_fwd, _inrow_gather_bwd)


def inrow_max_aggregate(h, in_src, in_w, out_dst=None, out_pos=None,
                        out_w=None):
    """Masked neighbour max over the in-row lists: ``agg[b,i] = max_d
    in_w[b,i,d] · h[b, in_src[b,i,d]]`` with padding slots (w=0) excluded
    and all-masked rows returning 0 (the flat path's isfinite guard,
    models/graph_net.GraphConv).

    Dense-ifies ``local_pooling="max"`` — max doesn't factor through an
    adjacency contraction, so per-slot neighbour features are gathered as
    D ONE-HOT EINSUMS (``[B, M, M] @ [B, M, C]`` — each one-hot row has
    exactly one nonzero, so the f32-accumulated contraction reproduces
    the gathered value exactly) and the running max folds slot by slot.
    The first cut used ``inrow_gather`` (``take_along_axis`` + the
    out-row-mirror backward) and measured 0.6x the FLAT segment_max
    (10.2k vs 16.8k graphs/sec) — an XLA gather pathology of the same
    family as the round-3 GAT+SAG keep-mask find (14 ns/element; see
    docs/kernels.md).  The one-hot form needs no out-row mirror (its
    backward is the transpose einsums XLA autodiff emits — MXU work, no
    scatter); ``out_dst``/``out_pos``/``out_w`` are accepted and ignored
    for call compatibility.  Parity with the flat layout is exact on
    simple graphs; a duplicate-merged multigraph takes max over UNIQUE
    edges with summed weight/multiplicity (documented divergence, like
    the dense-GAT w≠0 caveat — the lineage builder's graphs are simple).
    """
    b, m, _ = h.shape
    src = in_src.astype(jnp.int32)
    iota = jnp.arange(m, dtype=jnp.int32)[None, None, :]
    agg = None
    for d in range(in_src.shape[-1]):
        oh = (src[:, :, d, None] == iota).astype(h.dtype)  # [B, M, M]
        # f32 einsum output ON PURPOSE (measured, round 4): a bf16 output
        # is exact here (one-hot rows have a single nonzero) and halves
        # the [B, M, C] intermediate, but the explicit f32 cast it then
        # needs before the w multiply breaks the einsum→multiply→max
        # fusion — whole-step A/B/A 130.9k / 135.0k / 131.1k graphs/sec
        # (bf16 −3%), so XLA was already folding the f32 output into the
        # max chain without a full HBM round trip.
        g_d = jnp.einsum(
            "bij,bjf->bif", oh, h, preferred_element_type=jnp.float32
        )  # exact per-slot gather on the MXU
        w_d = in_w[:, :, d, None].astype(jnp.float32)
        m_d = jnp.where(w_d != 0, g_d * w_d, -jnp.inf)
        agg = m_d if agg is None else jnp.maximum(agg, m_d)
    return jnp.where(jnp.isfinite(agg), agg, 0.0).astype(h.dtype)
