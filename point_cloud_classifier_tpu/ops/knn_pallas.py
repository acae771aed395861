"""Pallas kernel: fused kNN graph construction + neighbour aggregation.

The XLA dense formulation (``ops/knn.knn_adjacency`` + matmul) materializes
the [N, N] distance and adjacency matrices in HBM — ~4·N²·4 bytes of traffic
per convolution.  This kernel fuses the whole thing: grid over row tiles,
positions and features resident in VMEM, and per tile

1. distance block ``d2 [T, N]`` = ‖a‖² + ‖b‖² − 2·a·bᵀ  (MXU)
2. k-th-smallest threshold per row via k rounds of min-and-mask (VPU;
   k is small and static)
3. implicit adjacency ``allowed & (d2 ≤ kth)`` → aggregation
   ``adj @ x``  (MXU)

so neither the distances nor the adjacency ever touch HBM.  Semantics match
``knn_aggregate`` exactly, including the tie rule (all candidates tied at
the k-th distance are admitted) and rows with fewer than k valid candidates
(all admitted).

Backward: custom VJP — the adjacency is piecewise-constant in positions
(zero gradient, same as the XLA comparison ops), so the only cotangent is
``dx = adjᵀ @ (g / deg?)``, computed by replaying the XLA implementation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38


def _make_kernel(k: int, num_graphs: int, aggr: str, t: int, n: int):
    def kernel(pos_ref, seg_ref, x_ref, out_ref):
        # pos [3, N] / seg [1, N] are lane-major so their VMEM blocks don't
        # pad 3→128 sublanes (a [N, 3] layout wastes ~40x the space).
        # Everything below stays rank-2: Mosaic's vector lowering dislikes
        # 1-D→2-D reshapes (esp. of i1 masks).
        i = pl.program_id(0)
        pos = pos_ref[:]          # [3, N] f32 (resident)
        seg = seg_ref[:]          # [1, N] i32
        x = x_ref[:]              # [N, H]

        pos_t = pos_ref[:, pl.ds(i * t, t)]           # [3, T]
        seg_tc = jnp.transpose(seg_ref[:, pl.ds(i * t, t)])  # [T, 1]

        sq = jnp.sum(pos * pos, axis=0, keepdims=True)            # [1, N]
        sq_tc = jnp.transpose(jnp.sum(pos_t * pos_t, axis=0, keepdims=True))
        d2 = (
            sq_tc
            + sq
            - 2.0
            * jax.lax.dot_general(
                pos_t,
                pos,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )                                             # [T, N]

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (t, n), 0) + i * t
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (t, n), 1)
        allowed = (
            (seg_tc == seg)
            & (row_ids != col_ids)
            & (seg < num_graphs)
            & (seg_tc < num_graphs)
        )                                             # [T, N]
        masked = jnp.where(allowed, d2, _BIG)

        # exact k-th smallest per row via min-and-mask rounds (k static,
        # small).  Ties are counted, so the threshold stops advancing once
        # k candidates are covered — identical semantics to the XLA
        # top_k-threshold formulation, including duplicate distances and
        # rows with fewer than k valid candidates.
        work = masked
        kth = jnp.full((t, 1), _BIG, dtype=jnp.float32)
        count = jnp.zeros((t, 1), dtype=jnp.int32)
        for _ in range(k):
            cur = jnp.min(work, axis=1, keepdims=True)  # [T, 1]
            hit = work == cur
            kth = jnp.where(count < k, cur, kth)
            count = count + jnp.sum(hit, axis=1, keepdims=True).astype(jnp.int32)
            work = jnp.where(hit, _BIG, work)

        adj = (allowed & (masked <= kth)).astype(x.dtype)  # [T, N]
        agg = jax.lax.dot_general(
            adj,
            x,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if aggr == "mean":
            deg = jnp.sum(adj.astype(jnp.float32), axis=1, keepdims=True)
            agg = agg / jnp.maximum(deg, 1.0)
        out_ref[:] = agg.astype(out_ref.dtype)

    return kernel


def _auto_tile(n: int, cap: int) -> int:
    """Largest power-of-two row tile whose [T, N] f32 working set (~4 live
    temporaries) stays within ~8MB of VMEM alongside the resident arrays."""
    budget = max(8, (8 << 20) // (16 * n))
    t = 8
    while t * 2 <= min(budget, cap, n):
        t *= 2
    return min(t, n)


def _knn_aggregate_pallas_impl(
    x, positions, node_seg, k: int, num_graphs: int, aggr: str, tile: int, interpret: bool
):
    if aggr not in ("add", "mean"):
        raise ValueError("aggr must be 'add' or 'mean'")
    n, h = x.shape
    t = _auto_tile(n, tile)
    if n % t != 0 or (t & (t - 1)) != 0:
        # non-pow2 buffers (fine bucket ladders): mult-of-8-but-not-pow2
        # tiles miscompute on the Mosaic accumulation path — use XLA
        from point_cloud_classifier_tpu.ops.knn import knn_aggregate

        return knn_aggregate(x, positions, node_seg, k, num_graphs, aggr)
    kernel = _make_kernel(k, num_graphs, aggr, t, n)
    return pl.pallas_call(
        kernel,
        grid=(n // t,),
        in_specs=[
            pl.BlockSpec((3, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h), x.dtype),
        interpret=interpret,
    )(
        positions.astype(jnp.float32).T,
        node_seg.astype(jnp.int32).reshape(1, -1),
        x,
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def knn_aggregate_pallas(
    x,
    positions,
    node_seg,
    k: int,
    num_graphs: int,
    aggr: str = "add",
    tile: int = 512,
    interpret: bool = False,
):
    """Fused kNN + aggregation in one pallas_call; see module docstring."""
    return _knn_aggregate_pallas_impl(
        x, positions, node_seg, k, num_graphs, aggr, tile, interpret
    )


def _fwd(x, positions, node_seg, k, num_graphs, aggr, tile, interpret):
    out = _knn_aggregate_pallas_impl(
        x, positions, node_seg, k, num_graphs, aggr, tile, interpret
    )
    return out, (x, positions, node_seg)


def _bwd(k, num_graphs, aggr, tile, interpret, residuals, g):
    x, positions, node_seg = residuals
    from point_cloud_classifier_tpu.ops.knn import knn_aggregate

    _, vjp = jax.vjp(
        lambda xx: knn_aggregate(xx, positions, node_seg, k, num_graphs, aggr), x
    )
    (dx,) = vjp(g)
    zero = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0) if jnp.issubdtype(
        a.dtype, jnp.integer
    ) else jnp.zeros_like(a)
    return dx, zero(positions), zero(node_seg)


knn_aggregate_pallas.defvjp(_fwd, _bwd)
