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
    b, m, width = h.shape
    d = in_src.shape[-1]
    t = _tile_rows(m, width, h.dtype.itemsize)
    if (
        t == 0
        or m % t != 0
        or (m & (m - 1)) != 0
        or (jax.default_backend() != "tpu" and not interpret)
    ):
        # XLA fallback: VMEM-infeasible shapes, non-pow2 buckets, and
        # non-TPU backends (Mosaic only interprets elsewhere)
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
