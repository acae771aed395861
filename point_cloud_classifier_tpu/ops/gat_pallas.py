"""Fused flash-style GAT attention over the dense in-row wire.

GATv1 attention on a batched padded graph (`models/graph_net.GATConv`
semantics, torch_geometric parity: self-loops added, per-destination
softmax, concat heads) with the `[B, M, M]` logit/probability matrices
NEVER materialised in HBM.  The pre-kernel dense path paid ~4-6 f32
passes over `[B, M, M]` per head per conv although the lineage wire
bounds real in-degree at D ≤ 8 — ~99.8% of that softmax work was on
absent edges and all of it round-tripped HBM.

TWO kernel forms (PCC_GAT_KERNEL = auto | slot | dense):

**slot** (default when the whole graph fits one row tile): the softmax
runs over the ≤ D+1 in-row SLOTS instead of all M columns —
per-slot validity in ``[1, T]`` lane rows, gathers and scatters as
one-hot MXU contractions (``_slot_prep``), per-head ``[D+1, T]``
softmax, and aggregation as (D+1) full-width ``[T, C]`` FMAs with the
per-head alphas broadcast over their dh lanes by a block-matrix MXU
dot.  O(M·D) VPU work instead of O(M²).  Measured whole-step:
32,079 vs 26,455 graphs/sec dense (+21%, same-window resident A/B,
2026-08-18).  Dot precision is wire-dtype-conditional — see the
comment in ``_slot_prep`` (HIGHEST everywhere cost 2.3x).

**dense** (fallback for multi-row-tile shapes and past the VMEM cap),
grid `(B, M/T)`, everything in VMEM per step:

1. adjacency mask tile ``A [T, M]`` from the in-row lists: D static
   compare passes (the `ops/inrow_graph` trick) + the self-loop diagonal
2. per head (static unroll): ``e = LeakyReLU(s_dst_tile + s_srcᵀ)``
   masked by ``A``, row softmax in f32 (default: the FACTORED form — see
   ``_alpha_tile`` — whose O(M²) work is one compare+select over rank-1
   outer products instead of an exp pass + row-max reduction, with the
   normalisation folded into the aggregation output), then ``P @ xw_h``
   on the MXU
3. backward (same tiling) recomputes ``P`` flash-style and emits
   ``dP = g_h @ xw_hᵀ``, the softmax/LeakyReLU backward, row/column
   reductions for ``ds_dst``/``ds_src``, and ``Pᵀ @ g_h`` accumulated
   into ``dxw`` across row tiles — no gather, no scatter anywhere.

Layout notes: ``s_src`` rides TRANSPOSED (``[B, H, M]``) so each head's
scores slice as a ``[1, M]`` row without a sublane↔lane transpose, and
``ds_src`` accumulates in the same transposed layout (un-transposed by
the wrapper).  Head slicing happens on loaded values with static python
offsets — full-block ref reads only, plus the proven per-``d`` ``[T, 1]``
column reads for the in-row lists.

The in-row lists only GATE existence (``w != 0``) — GATv1 takes no edge
weights (torch_geometric's GATConv asserts on them; the flat path ignores
them) — so ``in_src``/``in_w`` carry no cotangent.

Oracle / fallback: :func:`gat_attention_xla` (the masked `[B, M, M]`
matrix formulation, autodiff'd) — used on CPU and for shapes the kernel
doesn't tile; also the parity target for the kernel tests.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from point_cloud_classifier_tpu.ops.inrow_graph import inrow_adjacency_xla

_SLOPE = 0.2  # torch_geometric GATConv default negative_slope


def _lane_chunks(t: int):
    """``[0, t)`` in 128-lane pieces (the last may be a remainder tile)."""
    return [(c0, min(c0 + 128, t)) for c0 in range(0, t, 128)]


def _score_chunk() -> bool:
    """Trace-time gate for 128-lane-chunked score gathers.

    MEASURED NEGATIVE RESULT (kept as an A/B knob + parity test).  The
    rung-lane probe (`scripts/probe_rung_lanes.py`, 2026-08-20) measured
    the monolithic ``ssT [H, M] @ oh [M, T]`` score gather at
    0.025-0.027 us/dot vs 0.0032-0.0133 us issued as exact-128-lane
    column chunks — but the whole-step A/B is NEUTRAL (same window,
    resident: M=288 67,135 off vs 66,911 on; M=256 99,196 off vs 98,812
    on graphs/sec): the score dots are already overlapped in Mosaic's
    schedule, so their isolated cost is not on the critical path.  The
    FEATURE gathers — the dots that actually dominate the M=288 cliff —
    cannot benefit at all (probe chunkT 0.1463 vs monolithic 0.1482
    us/dot: their cost is K-rows x lane-tile count, pure tile
    arithmetic).  Default off; PCC_GAT_SCORE_CHUNK = on | off.
    """
    mode = os.environ.get("PCC_GAT_SCORE_CHUNK", "off")
    if mode not in ("on", "off"):
        # an unrecognized value silently measuring the default arm is how
        # the gb-knob A/B went void (docs/kernels.md) — fail loudly
        raise ValueError(
            f"PCC_GAT_SCORE_CHUNK must be 'on' or 'off', got {mode!r}"
        )
    return mode == "on"


def _dal_transposed() -> bool:
    """Trace-time gate for TRANSPOSED dalpha dots in the slot backward.

    The current form computes dalpha per slot as ``(g⊙feat) @ blkᵀ
    [T,C]@[C,H] → [T,H]`` — a thin-LANE dot whose H ∈ {4,8} output lanes
    pad to 128 (full row-dot price, the exact shape class the fifth
    pass's probe measured at 0.049 vs 0.028 µs) — then transposes the
    concatenated ``[T,(D+1)H]`` result into the ``[(D+1)H,T]`` row
    layout the softmax backward consumes.  The transposed form computes
    each slot directly as ``blk [H,C] · (g⊙feat) [T,C]`` contracting C →
    ``[H,T]``: a thin-SUBLANE dot, and the result transpose disappears.
    Probe (scripts/probe_gat_bwd.py, 2026-08-21): 0.0059 vs 0.0275 µs at
    H=4 (0.0005 vs 0.0243 at H=8) plus the deleted 0.0434 µs transpose.
    Whole-step A/B same-window (scripts/audit_policies.py): **105,931 vs
    98,987 graphs/sec (+7.0%)** at the flagship GAT shapes, 52,873 vs
    50,649 (+4.4%) at heads 8 / h256.  Default t; PCC_GAT_DAL = t | row
    keeps the A/B arms (docs/kernels.md seventh pass).
    """
    mode = os.environ.get("PCC_GAT_DAL", "t")
    if mode not in ("t", "row"):
        raise ValueError(f"PCC_GAT_DAL must be 't' or 'row', got {mode!r}")
    return mode == "t"


def _adj_mask_xla(in_src, in_w, m):
    """[B, M, M] bool adjacency-or-self-loop mask from the in-row lists."""
    adj = inrow_adjacency_xla(in_src, (in_w != 0).astype(jnp.float32), m, jnp.float32)
    return (adj > 0) | jnp.eye(m, dtype=bool)[None]


def gat_attention_masked(s_dst, s_src, mask, xw, slope: float = _SLOPE):
    """GATv1 attention over an explicit ``[B, M, M]`` bool mask (self-loops
    already included): the ONE masked-softmax formulation — shared by the
    in-row oracle below and `models/graph_net.GATConv`'s adj_mask branch,
    so a numerics change (denominator floor, stop_gradient placement)
    cannot silently diverge between the kernel-parity oracle and the
    model path."""
    b, m, h = s_dst.shape
    c = xw.shape[-1]
    dh = c // h
    xwr = xw.reshape(b, m, h, dh)
    outs = []
    for head in range(h):  # head loop bounds the [B, M, M] transients
        e = jax.nn.leaky_relu(
            s_dst[:, :, None, head].astype(jnp.float32)
            + s_src[:, None, :, head].astype(jnp.float32),
            negative_slope=slope,
        )
        e = jnp.where(mask, e, -jnp.inf)
        e = e - jax.lax.stop_gradient(jnp.max(e, axis=2, keepdims=True))
        p = jnp.exp(e) * mask
        alpha = p / jnp.maximum(jnp.sum(p, axis=2, keepdims=True), 1e-16)
        outs.append(
            jnp.einsum(
                "bij,bjd->bid",
                alpha.astype(xw.dtype),
                xwr[:, :, head],
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.stack(outs, axis=2).reshape(b, m, c).astype(xw.dtype)


def gat_attention_xla(s_dst, s_src, in_src, in_w, xw, slope: float = _SLOPE):
    """Oracle: masked-matrix GATv1 attention (matches the flat segment
    softmax on simple graphs — pinned by tests/test_dense_graph.py)."""
    mask = _adj_mask_xla(in_src, in_w, s_dst.shape[1])
    return gat_attention_masked(s_dst, s_src, mask, xw, slope)


def _mask_tile(src_ref, w_ref, t, m, d, row0, gi=0):
    """[T, M] bool adjacency+self-loop mask for this row tile.

    Two VPU passes per in-row slot instead of four: the existence gate
    (``w != 0``) is folded into the [T, 1] source-id column BEFORE the
    [T, M] broadcast compare (an absent slot becomes id -1, which never
    matches a column), and the per-slot combine is a predicate OR rather
    than a select + f32 max.  The mask stays a PREDICATE so consumers
    select on it directly — the old f32 mask cost one extra ``> 0``
    compare pass per head in ``_alpha_tile``.  The mask build was ~45%
    of the forward kernel's VPU ops at D=8 (docs/kernels.md)."""
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (t, m), 1)
    row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (t, m), 0)
    mask = row_ids == col_ids  # self-loops
    for dd in range(d):
        src_col = src_ref[gi, :, pl.ds(dd, 1)]  # [T, 1] i32
        w_col = w_ref[gi, :, pl.ds(dd, 1)]  # [T, 1] f32
        src_eff = jnp.where(w_col != 0.0, src_col, -1)  # [T, 1] — O(T) gate
        mask = mask | (src_eff == col_ids)
    return mask


def _alpha_tile(sd, ssT, mask, head, slope):
    """[T, M] f32 attention probabilities for one head on this tile.

    Two forms.  Default ("max"): masked LeakyReLU logits, per-row max
    shift, exp — the numerically-safest form, and the measured-faster one
    (see the knob comment below).  Opt-in ("factored"): GATv1's logit is
    LeakyReLU(s_i + t_j), a piecewise-LINEAR function of a rank-1 matrix —
    so its exp factorises per piece into per-NODE exponentials:

        exp(e_ij - c_i) = cond_ij · u_i·b_j  +  (1-cond_ij) · v_i·b̂_j
        u = exp(s + T - c),  v = exp(σ(s+T) - c),   (σ = slope)
        b = exp(t - T),      b̂ = exp(σ(t - T)),     T = max_j t_j

    with the per-row shift c_i = LeakyReLU(s_i + T) ≥ max_j e_ij (LeakyReLU
    is monotone), so every factor above is ≤ 1 — overflow-free by
    construction.  The O(M²) work drops from a transcendental exp pass plus
    a row-max reduction to one compare + select over broadcast outer
    products: the VPU cost that dominated the kernel (docs/kernels.md —
    ~75% of the GAT step was these softmax passes).  Mathematically exact
    (any per-row shift cancels); only float rounding differs from the
    row-max form.  Measured slightly SLOWER than row-max whole-step
    (23,660 vs 24,380 graphs/sec) — kept as the opt-in form.

    Underflow caveat: T is the max over ALL M columns (the mask is not
    applied — a masked per-row max is exactly the O(M²) reduction this
    form removes), so a row whose own neighbours' t all sit ≳88 below T
    (f32 exp range) flushes to alpha=0 where the row-max form would still
    resolve ratios.  Bounds that keep this theoretical: padding columns
    score EXACTLY 0 (zero-filled features through a bias-free Dense —
    they never inflate T), and real scores are |s|,|t| ≲ O(10) for
    BN-bounded inputs (conv1 sees loader-normalised features).  The
    default row-max form has no such caveat.

    Returns ``(p, rinv)`` — the UNNORMALISED probabilities and the
    per-row reciprocal sum — so the forward can fold the normalisation
    into the [T, dh] aggregation output (a ~M/dh-times smaller pass than
    dividing the [T, M] block); ``alpha = p * rinv``."""
    s = sd[:, head : head + 1]  # [T, 1]
    t_row = ssT[head : head + 1, :]  # [1, M]
    # read at TRACE time like every other PCC_* knob (an import-time read
    # made post-import setenv silently inert — code-review finding)
    #
    # DEFAULT = "max" (measured 2026-08-18, same-window resident A/B:
    # row-max 24,380 vs factored 23,660 graphs/sec).  The factored form's
    # compare+select over outer products did NOT beat exp + row-max — the
    # v5e VPU does transcendentals cheaply (same lesson as the
    # polynomial-GELU negative result, docs/kernels.md) — and row-max is
    # also free of the underflow caveat below.  Factored stays available
    # as PCC_GAT_SOFTMAX=factored; both forms are parity-tested.
    softmax_form = os.environ.get("PCC_GAT_SOFTMAX", "max")
    if softmax_form not in ("max", "factored"):
        # loud, like the other PCC_GAT_* knobs: a typo must not silently
        # measure the default arm in an A/B session
        raise ValueError(
            f"PCC_GAT_SOFTMAX must be max|factored, got {softmax_form!r}"
        )
    if softmax_form != "factored":
        z = s + t_row  # [T, M]
        e = jnp.where(z >= 0.0, z, slope * z)  # LeakyReLU
        e = jnp.where(mask, e, -jnp.inf)  # mask is a predicate tile
        # every row has its self-loop, so the row max is finite and
        # exp(-inf - max) = 0 exactly — no post-exp mask multiply needed
        p = jnp.exp(e - jnp.max(e, axis=1, keepdims=True))
    else:
        t_max = jnp.max(t_row)
        s_t = s + t_max  # [T, 1]
        c = jnp.where(s_t >= 0.0, s_t, slope * s_t)  # LeakyReLU(s_i + T)
        u = jnp.exp(s_t - c)
        v = jnp.exp(slope * s_t - c)
        b = jnp.exp(t_row - t_max)
        bh = jnp.exp(slope * (t_row - t_max))
        # z >= 0 as s >= -t: the [1, M] negation is O(M), so the branch
        # condition costs ONE [T, M] pass instead of add + compare
        cond = s >= -t_row
        p = jnp.where(mask, jnp.where(cond, u * b, v * bh), 0.0)
    return p, 1.0 / jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-16)


def _make_fwd_kernel(
    t: int, m: int, d: int, h: int, dh: int, slope: float, g_batch: int
):
    def kernel(sd_ref, ssT_ref, src_ref, w_ref, xw_ref, out_ref):
        row0 = pl.program_id(1) * t
        # G graphs per grid step (static unroll): a per-graph grid paid a
        # fixed ~10 us of step overhead x B x convs x directions, which
        # DOMINATED the step at B=256/M=256 (docs/kernels.md)
        for gi in range(g_batch):
            mask = _mask_tile(src_ref, w_ref, t, m, d, row0, gi)
            sd = sd_ref[gi]  # [T, H] f32
            ssT = ssT_ref[gi]  # [H, M] f32
            xw = xw_ref[gi]  # [M, C]
            outs = []
            for head in range(h):
                p, rinv = _alpha_tile(sd, ssT, mask, head, slope)
                # normalisation folded into the [T, dh] dot output — the
                # [T, M] divide was a full softmax-sized VPU pass per head
                outs.append(
                    jax.lax.dot_general(
                        p.astype(xw.dtype),
                        xw[:, head * dh : (head + 1) * dh],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * rinv
                )
            out_ref[gi] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)

    return kernel


def _make_bwd_kernel(
    t: int, m: int, d: int, h: int, dh: int, slope: float, g_batch: int
):
    def kernel(
        sd_ref, ssT_ref, src_ref, w_ref, xw_ref, g_ref,
        dsd_ref, dssT_ref, dxw_ref,
    ):
        it = pl.program_id(1)
        row0 = it * t

        @pl.when(it == 0)
        def _():
            dssT_ref[:] = jnp.zeros_like(dssT_ref)
            dxw_ref[:] = jnp.zeros_like(dxw_ref)

        for gi in range(g_batch):
            mask = _mask_tile(src_ref, w_ref, t, m, d, row0, gi)
            sd = sd_ref[gi]
            ssT = ssT_ref[gi]
            xw = xw_ref[gi]
            g = g_ref[gi]  # [T, C]
            dsd_cols, dss_rows, dxw_cols = [], [], []
            for head in range(h):
                p, rinv = _alpha_tile(sd, ssT, mask, head, slope)
                alpha = p * rinv  # the backward uses alpha elementwise
                # dots run at the wire dtype (bf16 feeds the MXU at full
                # rate; f32 inputs — the tests' oracle dtype — stay f32)
                # with f32 accumulation
                xw_h = xw[:, head * dh : (head + 1) * dh]
                g_h = g[:, head * dh : (head + 1) * dh]
                # dP[i, j] = <g_i, xw_j>
                dp = jax.lax.dot_general(
                    g_h, xw_h,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [T, M]
                # softmax backward: dE = P * (dP - Σ_j P·dP); masked
                # positions have alpha = 0, so the LeakyReLU backward
                # below sees 0 there
                de = alpha * (dp - jnp.sum(alpha * dp, axis=1, keepdims=True))
                # LeakyReLU'(z) needs only sign(z): s_i >= -t_j costs one
                # [T, M] compare (the [1, M] negation is O(M))
                cond = sd[:, head : head + 1] >= -ssT[head : head + 1, :]
                dz = de * jnp.where(cond, 1.0, slope)
                dsd_cols.append(jnp.sum(dz, axis=1, keepdims=True))  # [T, 1]
                dss_rows.append(jnp.sum(dz, axis=0, keepdims=True))  # [1, M]
                # dxw_h += Pᵀ @ g_h (alpha cast to the wire dtype, same as
                # the forward's aggregation dot)
                dxw_cols.append(
                    jax.lax.dot_general(
                        alpha.astype(g_h.dtype), g_h,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )  # [M, DH]
            dsd_ref[gi] = jnp.concatenate(dsd_cols, axis=1)
            dssT_ref[gi] = dssT_ref[gi] + jnp.concatenate(dss_rows, axis=0)
            dxw_ref[gi] = dxw_ref[gi] + jnp.concatenate(dxw_cols, axis=1)

    return kernel


def _make_slot_fwd_kernel(
    t: int, m: int, d: int, h: int, dh: int, slope: float, g_batch: int
):
    """Slot-softmax forward: see ``_slot_prep`` for the shared recompute."""

    def kernel(sdT_ref, ssT_ref, srcT_ref, wT_ref, xw_ref, out_ref):
        for gi in range(g_batch):
            prep = _slot_prep(
                sdT_ref, ssT_ref, srcT_ref, wT_ref, xw_ref,
                gi, t, m, d, h, dh, slope,
            )
            out_ref[gi] = _slot_aggregate(prep, d, h, dh).astype(out_ref.dtype)

    return kernel


def _slot_prep(sdT_ref, ssT_ref, srcT_ref, wT_ref, xw_ref,
               gi, t, m, d, h, dh, slope):
    """Shared slot-softmax state (forward, and flash-recomputed in the
    backward): per-slot validity/one-hots, MXU gathers, and the per-head
    ``[D+1, T]`` slot-softmax — the whole point of the form: the softmax
    (and its backward) runs over at most D+1 ≤ 9 sublane rows instead of
    M = 256-512 lanes, so the transcendental/select work that dominated
    the dense kernel's VPU time (docs/kernels.md) shrinks ~M/(D+1)-fold.
    Gathers and scatters ride the MXU as one-hot contractions — no
    dynamic indexing anywhere.

    Requires t == m (whole graph per row tile) so self-loop rows, the
    ``xw`` block, and scatter outputs are all row-aligned.
    """
    c = h * dh
    # Mosaic iota is integer-only; f32 ids (< 2^24, exact) keep the
    # compare/select chain and the transposed wire in one vreg layout
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1).astype(jnp.float32)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (m, t), 0).astype(jnp.float32)
    # float transposes: source ids are < 2^24 so f32 equality is exact,
    # and f32 keeps every [T, D] <-> [D, T] transpose in one vreg shuffle
    srcT = srcT_ref[gi]  # [D, T] f32 (transposed by the wrapper)
    wT = wT_ref[gi]  # [D, T] f32
    sdT = sdT_ref[gi]  # [H, M] f32
    ssT = ssT_ref[gi]  # [H, M] f32
    xwf = xw_ref[gi].astype(jnp.float32)  # [M, C]

    # per-slot validity in the [1, T] lane domain (a [T, 1] sublane op
    # costs a full vreg per 8 rows — 16x more than these row ops):
    # gate on w != 0, drop explicit self-edges (the implicit self-loop
    # row covers them once, matching the oracle's adj|eye collapse) and
    # duplicate sources in later slots (the bool mask counts them once)
    src_eff = []  # [1, T] f32 rows, -1 where the slot is absent
    neg_rows = [jnp.zeros((1, t), jnp.float32)]  # self row: always valid
    for dd in range(d):
        s_row = srcT[dd : dd + 1, :]
        v = (wT[dd : dd + 1, :] != 0.0) & (s_row != lane_ids)
        for prev in src_eff:
            v = v & (s_row != prev)
        src_eff.append(jnp.where(v, s_row, -1.0))
        neg_rows.append(jnp.where(v, 0.0, -jnp.inf))
    neg = jnp.concatenate(neg_rows, axis=0)  # [D+1, T] additive mask

    def oh(dd):
        # rebuilt at each use site so at most one [M, T] one-hot is ever
        # live (the backward's scatter dots would otherwise keep D of
        # them resident and blow VMEM at M=512/D=8).  Hoisting all D
        # into a shared list (one build, reused by prep + dss + dxw)
        # measured 97,432 vs 98,010 graphs/sec same-window (2026-08-19)
        # — a small NEGATIVE: Mosaic already CSEs the rebuilds, so the
        # hoist only added VMEM pressure.  Keep the rebuild form.
        return jnp.where(sub_ids == src_eff[dd], 1.0, 0.0)

    # Dot precision — wire-dtype-conditional on EVERY slot dot: on a
    # bf16 wire (production) the DEFAULT bf16x1 dot loses nothing on the
    # gathers (scores/features/cotangents off bf16 layers are
    # bf16-representable, the one-hot is 0/1) and rounds alphas/gradient
    # products exactly like the dense kernel's cast-to-wire-dtype dots.
    # On an f32 wire (the tests' oracle dtype, and f32 compute_dtype
    # configs) DEFAULT would silently round f32 features and
    # freshly-computed f32 alphas that the dense form keeps exact — so
    # f32 wires run HIGHEST throughout.  Measured: HIGHEST on a bf16-
    # class workload cost 2.3x whole-kernel (13.9k vs 32.1k graphs/sec;
    # multi-pass f32 emulation), which is why this is conditional rather
    # than always-HIGHEST.
    exact = jax.lax.Precision.HIGHEST
    if xw_ref.dtype != jnp.float32:
        exact = jax.lax.Precision.DEFAULT
    # two gather dots per slot.  Merging them into one dot over a
    # concatenated [M, C+H] operand measured 3.5% SLOWER whole-step
    # (31,051 vs 32,176 graphs/sec, 2026-08-18): the 132-lane operand
    # pads to 256 output lanes and the concat copies the [M, C] features
    # into a fresh buffer per tile — more than one saved dot overhead.
    # Score gathers run TRANSPOSED (ssT [H, M] @ oh [M, T] -> [H, T]):
    # thin-SUBLANE dots stream only their real rows (measured 0.029 vs
    # 0.086 us/dot for the row-form [T, M]@[M, H] whose H lanes pad to
    # 128 — differential Mosaic dot probe, 2026-08-19), the result lands
    # directly in the [D*H, T] row layout the softmax wants (no
    # [T, D*H] transpose), and the row-form s_src operand drops off the
    # wire entirely.  Whole-step: 98,010 vs 79,878 graphs/sec (+22.7%,
    # same-window resident A/B, fwd + bwd-recompute both benefit).
    chunk_scores = _score_chunk()
    sgT_rows, xwg = [], []
    for dd in range(d):
        o = oh(dd)
        if chunk_scores:
            # exact-128-lane column chunks of the one-hot: measured
            # 2-8x cheaper per dot than the T-wide monolithic form
            # (probe_rung_lanes 2026-08-20; lane slices at 128-aligned
            # offsets are tile views, and Mosaic CSEs the shared o)
            parts = [
                jax.lax.dot_general(
                    ssT, o[:, c0:c1],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=exact,
                )
                for c0, c1 in _lane_chunks(t)
            ]
            sgT_rows.append(jnp.concatenate(parts, axis=1))
        else:
            sgT_rows.append(
                jax.lax.dot_general(
                    ssT, o, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=exact,
                )
            )  # [H, T]
        xwg.append(
            jax.lax.dot_general(
                o, xwf, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=exact,
            )
        )  # [T, C]
    if d:
        sgT = jnp.concatenate(sgT_rows, axis=0)  # [D*H, T], d-major rows
    else:  # pragma: no cover - wire D >= 4 always
        sgT = jnp.zeros((0, t), jnp.float32)

    # per-head slot softmax, self row FIRST (row-aligned scores)
    zs, alphas = [], []
    for head in range(h):
        z_rows = [sdT[head : head + 1, :] + ssT[head : head + 1, :]]
        for dd in range(d):
            z_rows.append(
                sdT[head : head + 1, :] + sgT[dd * h + head : dd * h + head + 1, :]
            )
        z = jnp.concatenate(z_rows, axis=0)  # [D+1, T]
        e = jnp.where(z >= 0.0, z, slope * z) + neg
        # the self row is always valid, so the slot max is finite and
        # exp(-inf - mx) = 0 exactly on absent slots
        p = jnp.exp(e - jnp.max(e, axis=0, keepdims=True))
        alphas.append(p * (1.0 / jnp.sum(p, axis=0, keepdims=True)))
        zs.append(z)

    # alphas back to the row domain, slot-major columns: ONE transpose
    # instead of (D+1)*H sublane<->lane flips
    rows = []
    for slot in range(d + 1):
        for head in range(h):
            rows.append(alphas[head][slot : slot + 1, :])
    a_cols = jnp.swapaxes(jnp.concatenate(rows, axis=0), 0, 1)  # [T,(D+1)H]
    # head-block expander: alpha_rows [T, H] @ blk [H, C] broadcasts each
    # head's alpha over its dh lanes on the MXU, so the aggregation is
    # (D+1) full-width [T, C] FMAs instead of per-(slot, head) [T, dh]
    # strips that pad to full vregs anyway.  NOTE: batching all slots
    # into one [T,(D+1)H] @ [(D+1)H,(D+1)C] block-diagonal dot (and the
    # analogous dalpha batch) measured 4% SLOWER whole-step (30,932 vs
    # 32,176 graphs/sec, 2026-08-18) — the (D+1)x zero-block MACs and
    # the [T,(D+1)C] concat copies cost more than D saved dot overheads
    blk = (
        jax.lax.broadcasted_iota(jnp.int32, (h, c), 1) // dh
        == jax.lax.broadcasted_iota(jnp.int32, (h, c), 0)
    ).astype(jnp.float32)
    return dict(
        oh=oh, neg=neg, xwg=xwg, zs=zs, alphas=alphas,
        a_cols=a_cols, blk=blk, xwf=xwf, exact=exact,
    )


def _alpha_exp(prep, slot, h):
    """[T, C] per-lane alpha for one slot (head-blocks expanded)."""
    return jax.lax.dot_general(
        prep["a_cols"][:, slot * h : (slot + 1) * h],
        prep["blk"],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prep["exact"],
    )


def _slot_aggregate(prep, d, h, dh):
    """out = sum_slot alpha_slot * gathered features ([T, C] f32)."""
    acc = _alpha_exp(prep, 0, h) * prep["xwf"]  # self: xw IS row-aligned
    for dd in range(d):
        acc = acc + _alpha_exp(prep, dd + 1, h) * prep["xwg"][dd]
    return acc


def _make_slot_bwd_kernel(
    t: int, m: int, d: int, h: int, dh: int, slope: float, g_batch: int
):
    def kernel(
        sdT_ref, ssT_ref, srcT_ref, wT_ref, xw_ref, g_ref,
        dsdT_ref, dssT_ref, dxw_ref,
    ):
        for gi in range(g_batch):
            prep = _slot_prep(
                sdT_ref, ssT_ref, srcT_ref, wT_ref, xw_ref,
                gi, t, m, d, h, dh, slope,
            )
            gf = g_ref[gi].astype(jnp.float32)  # [T, C]

            # dalpha[slot, head, i] = <g_i, feat_slot_i[head block]>
            if _dal_transposed():
                # head-block row sums as thin-SUBLANE contractions landing
                # directly in the [(D+1)H, T] row layout (see
                # _dal_transposed; the row-form's H output lanes padded to
                # 128 and its result needed a [T,(D+1)H] transpose)
                dal_rows = [
                    jax.lax.dot_general(
                        prep["blk"], gf * prep["xwf"],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prep["exact"],
                    )
                ]
                for dd in range(d):
                    dal_rows.append(
                        jax.lax.dot_general(
                            prep["blk"], gf * prep["xwg"][dd],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prep["exact"],
                        )
                    )
                dalT = jnp.concatenate(dal_rows, axis=0)
                # [(D+1)*H, T], slot-major rows
            else:
                blkT = jnp.swapaxes(prep["blk"], 0, 1)  # [C, H]
                # row form: thin MXU contraction with blk^T, then one
                # result transpose into the slot-major row layout
                dal = [
                    jax.lax.dot_general(
                        gf * prep["xwf"], blkT,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prep["exact"],
                    )
                ]
                for dd in range(d):
                    dal.append(
                        jax.lax.dot_general(
                            gf * prep["xwg"][dd], blkT,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prep["exact"],
                        )
                    )
                dalT = jnp.swapaxes(jnp.concatenate(dal, axis=1), 0, 1)
                # [(D+1)*H, T], slot-major rows

            dsdT_rows = []
            dz_slot = [[] for _ in range(d + 1)]
            for head in range(h):
                a = prep["alphas"][head]  # [D+1, T]
                dp_rows = [
                    dalT[slot * h + head : slot * h + head + 1, :]
                    for slot in range(d + 1)
                ]
                dp = jnp.concatenate(dp_rows, axis=0)  # [D+1, T]
                tmp = a * dp
                dz = a * (dp - jnp.sum(tmp, axis=0, keepdims=True))
                z = prep["zs"][head]
                dzl = dz * jnp.where(z >= 0.0, 1.0, slope)
                dsdT_rows.append(jnp.sum(dzl, axis=0, keepdims=True))
                for slot in range(d + 1):
                    dz_slot[slot].append(dzl[slot : slot + 1, :])
            dsdT_ref[gi] = jnp.concatenate(dsdT_rows, axis=0)  # [H, M]

            # ds_src: the self slot lands on the diagonal (row-aligned at
            # t == m); edge slots scatter through the one-hots on the MXU
            dss = jnp.concatenate(dz_slot[0], axis=0)  # [H, T]
            for dd in range(d):
                dz_d = jnp.concatenate(dz_slot[dd + 1], axis=0)  # [H, T]
                dss = dss + jax.lax.dot_general(
                    dz_d, prep["oh"](dd),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prep["exact"],
                )  # [H, M]
            dssT_ref[gi] = dss

            # dxw[j] += sum_slot alpha_slot[i] g[i] at j = src (one-hot
            # scatter dots; the self slot is the row-aligned diagonal)
            dxw = _alpha_exp(prep, 0, h) * gf  # [M, C] (t == m)
            for dd in range(d):
                s_d = _alpha_exp(prep, dd + 1, h) * gf  # [T, C]
                dxw = dxw + jax.lax.dot_general(
                    prep["oh"](dd), s_d,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prep["exact"],
                )
            dxw_ref[gi] = dxw.astype(dxw_ref.dtype)

    return kernel


_SLOT_VMEM_CAP = 100 << 20  # leave VMEM for Mosaic's block double-buffering


def _slot_vmem(m: int, c: int, d: int, gb: int) -> int:
    """Scoped-VMEM estimate for the slot BACKWARD (the larger of the two).

    Mosaic's stack allocator keeps every unrolled gi iteration's
    temporaries live (measured: gb=4 at M=512/D=4 allocated 18.87 MB,
    matching gb x per-graph, not one graph), so the estimate scales with
    gb.  Per graph: xwf/dxw/gf/acc-class [M, C] f32 buffers (~6), the
    D gathered [T, C] features, and ~2 live [M, T] one-hots."""
    per_graph = 4 * m * (c * (6 + d) + 2 * m)
    blocks = gb * (4 * m * (3 * 8 + 2 * d) + 8 * m * c)  # refs, upper bound
    # 25% margin: measured allocations run a few % past the model (extra
    # Mosaic spill/alignment slop — 30.14M actual vs 29.5M modeled at
    # M=512/D=8/gb=4), and undershooting is a hard compile failure
    return (gb * per_graph + blocks) * 5 // 4 + (4 << 20)


def _slot_gb(b: int, m: int, c: int, d: int, t: int) -> int:
    """Graphs per grid step for the slot form, bounded by the VMEM cap.

    PCC_GAT_GB (trace-time read): explicit unroll-cap override for
    A/B'ing the per-grid-step fixed cost against trace size.  It
    overrides _graphs_per_step's 6 MB allowance (which is 12 at bench
    shapes, so a min(cap, allowance) form silently clamped gb=16/32
    requests back to the default 8 and the first "16/32 neutral" A/B
    compared three identical programs — code-review catch, 2026-08-19);
    the override stays safe because the _slot_vmem halving below still
    applies.  Slot form only — the dense form keeps the allowance (its
    per-tile working set has no second check)."""
    env = os.environ.get("PCC_GAT_GB")
    if env is not None and t == m:
        gb, cap = 1, max(int(env), 1)
        while gb * 2 <= cap and b % (gb * 2) == 0:
            gb *= 2
    else:
        gb = _graphs_per_step(b, m, c, t)
    while gb > 1 and _slot_vmem(m, c, d, gb) > _SLOT_VMEM_CAP:
        gb //= 2
    return gb


def _slot_params(m: int, c: int, d: int, gb: int):
    """Raise Mosaic's ~16 MB scoped-vmem default to fit the slot working
    set (v5e has 128 MB of VMEM); headroom keeps block prefetch alive."""
    need = _slot_vmem(m, c, d, gb)
    if need <= 15 << 20:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=min(need, _SLOT_VMEM_CAP))


def _kernel_form(t: int, m: int, c: int = 128, d: int = 4) -> str:
    """Trace-time kernel-form policy.  PCC_GAT_KERNEL: auto | slot | dense.

    The slot form needs the whole graph in one row tile (t == m) for its
    row-aligned self-loop / scatter writes; multi-tile shapes and working
    sets past the VMEM cap always use the dense form.
    """
    form = os.environ.get("PCC_GAT_KERNEL", "auto")
    if form not in ("auto", "slot", "dense"):
        # loud, like PCC_GAT_SCORE_CHUNK/PCC_GAT_DAL: an unrecognized
        # value silently measuring the default arm voids A/B sessions
        raise ValueError(
            f"PCC_GAT_KERNEL must be auto|slot|dense, got {form!r}"
        )
    if t != m or form == "dense":
        return "dense"
    if _slot_vmem(m, c, d, 1) > _SLOT_VMEM_CAP:
        return "dense"
    if form != "slot" and d > 16:
        # the pairwise dedupe chain is O(D^2) tiny ops and the per-slot
        # work grows linearly — by D=32 (the loader's wire cap) the slot
        # form's edge over the O(M^2) dense softmax has mostly eroded
        # while trace size has not; explicit PCC_GAT_KERNEL=slot overrides
        return "dense"
    return "slot"


def _slot_operands(s_dst, s_src, in_src, in_w, xw):
    """Wrapper-side layout for the slot kernels (all transposes in XLA,
    outside the kernel): scores head-major, in-row lists slot-major."""
    return (
        jnp.swapaxes(s_dst.astype(jnp.float32), 1, 2),  # [B, H, M]
        jnp.swapaxes(s_src.astype(jnp.float32), 1, 2),  # [B, H, M]
        # f32 ids: < 2^24 so equality stays exact, and the kernel's
        # compare/select chain stays in one vreg layout
        jnp.swapaxes(in_src.astype(jnp.float32), 1, 2),  # [B, D, M]
        jnp.swapaxes(in_w.astype(jnp.float32), 1, 2),  # [B, D, M]
        xw,
    )


def _slot_specs(m, d, h, c, gb):
    full = lambda shape: pl.BlockSpec(
        shape, lambda bb: (bb, 0, 0), memory_space=pltpu.VMEM
    )
    return [
        full((gb, h, m)),
        full((gb, h, m)),
        full((gb, d, m)),
        full((gb, d, m)),
        full((gb, m, c)),
    ]


def _tile_rows(m: int, c: int) -> int:
    """Row tile so the live [T, M] f32 blocks (~6 temporaries) plus the
    resident [M, C] blocks fit a ~10 MB VMEM budget; 0 → fall back.

    Prefer covering the whole graph in one tile (t == m): that is what
    enables the G-graphs-per-grid-step unroll, and the measured fixed
    per-grid-step cost (~3-6 us) dominates the kernel at production
    shapes (M=512: t capped at 256 forced a 512-step grid per conv —
    raising the cap to 512 cut the grid 8x, see docs/kernels.md).

    M need not be a power of two — the loader's rung ladder (k·2^j,
    k in 8..15) produces shapes like 288/320/384; the tile is the largest
    8-aligned divisor of m within the cap/budget (halving alone can strand
    a shape: 288 → 144 → 72 → 36 fails 8-alignment although 48/24/16/8
    all divide 288)."""
    resident = m * c * 4 * 4  # xw, g, dxw (+slack), f32 upper bound
    remaining = (10 << 20) - resident
    budget = remaining // (24 * m) if remaining > 0 else 0
    cap = min(m, 512, budget)
    best = 0
    t = 8
    while t <= cap:
        if m % t == 0:
            best = t
        t += 8
    return best


def _shapes_ok(s_dst, xw, interpret: bool) -> int:
    b, m, h = s_dst.shape
    c = xw.shape[-1]
    # any 8-aligned M tiles (the loader's rung ladder is k*2^j, k=8..15);
    # Mosaic pads lane dims to 128-multiples internally
    if h < 1 or c % h != 0 or m % 8 != 0:
        return 0
    from point_cloud_classifier_tpu.ops.dispatch import use_tpu_kernels

    if not use_tpu_kernels() and not interpret:
        return 0
    t = _tile_rows(m, c)
    if t == 0 or m % t != 0:
        return 0
    return t


def _graphs_per_step(b: int, m: int, c: int, t: int) -> int:
    """Graphs handled per grid step (static in-kernel unroll).

    A per-graph grid pays a fixed per-step cost ~10 us; at B=256 that is
    ~1280 grid steps per train step across convs and directions, which
    dominated the measured GAT step (~13.6 ms of the 15.6 ms total —
    docs/kernels.md).  Batch G graphs per step, bounded by a ~6 MB VMEM
    allowance for the G-resident blocks (xw/g/dxw at ~m*c*16 bytes per
    graph) and capped at 8 to bound trace size; G must divide B.
    """
    if t != m:
        return 1  # multi-row-tile shapes keep the simple per-graph grid
    allowance = (6 << 20) // max(m * c * 16, 1)
    g = 1
    while g * 2 <= min(8, allowance) and b % (g * 2) == 0:
        g *= 2
    return g


def _specs(t, m, d, h, c, gb):
    return [
        pl.BlockSpec((gb, t, h), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, h, m), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, t, d), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, t, d), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, m, c), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
    ]


def _fwd_impl(s_dst, s_src, in_src, in_w, xw, slope: float, interpret: bool):
    b, m, h = s_dst.shape
    c = xw.shape[-1]
    d = in_src.shape[-1]
    t = _shapes_ok(s_dst, xw, interpret)
    assert t, "caller must route un-tileable shapes to gat_attention_xla"
    if _kernel_form(t, m, c, d) == "slot":
        gb = _slot_gb(b, m, c, d, t)
        kernel = _make_slot_fwd_kernel(t, m, d, h, c // h, slope, gb)
        return pl.pallas_call(
            kernel,
            grid=(b // gb,),
            in_specs=_slot_specs(m, d, h, c, gb),
            out_specs=pl.BlockSpec(
                (gb, m, c), lambda bb: (bb, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b, m, c), xw.dtype),
            compiler_params=_slot_params(m, c, d, gb),
            interpret=interpret,
        )(*_slot_operands(s_dst, s_src, in_src, in_w, xw))
    gb = _graphs_per_step(b, m, c, t)
    kernel = _make_fwd_kernel(t, m, d, h, c // h, slope, gb)
    return pl.pallas_call(
        kernel,
        grid=(b // gb, m // t),
        in_specs=_specs(t, m, d, h, c, gb),
        out_specs=pl.BlockSpec(
            (gb, t, c), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, c), xw.dtype),
        interpret=interpret,
    )(
        s_dst.astype(jnp.float32),
        jnp.swapaxes(s_src.astype(jnp.float32), 1, 2),
        in_src.astype(jnp.int32),
        # f32: the fp16 wire dtype is not a mosaic type; only != 0 matters
        in_w.astype(jnp.float32),
        xw,
    )


def _bwd_impl(s_dst, s_src, in_src, in_w, xw, g, slope: float, interpret: bool):
    b, m, h = s_dst.shape
    c = xw.shape[-1]
    d = in_src.shape[-1]
    t = _shapes_ok(s_dst, xw, interpret)
    assert t
    if _kernel_form(t, m, c, d) == "slot":
        gb = _slot_gb(b, m, c, d, t)
        kernel = _make_slot_bwd_kernel(t, m, d, h, c // h, slope, gb)
        dsdT, dssT, dxw = pl.pallas_call(
            kernel,
            grid=(b // gb,),
            in_specs=_slot_specs(m, d, h, c, gb)
            + [
                pl.BlockSpec(
                    (gb, m, c), lambda bb: (bb, 0, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=[
                pl.BlockSpec(
                    (gb, h, m), lambda bb: (bb, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (gb, h, m), lambda bb: (bb, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (gb, m, c), lambda bb: (bb, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, m), jnp.float32),
                jax.ShapeDtypeStruct((b, h, m), jnp.float32),
                # dxw leaves the kernel in the WIRE dtype: t == m means a
                # single write (no cross-tile accumulation to protect),
                # and the f32->bf16 cast previously ran as an extra XLA
                # pass over a 2x-sized HBM buffer.  Score grads stay f32
                # (small, and sums of many slot terms).
                jax.ShapeDtypeStruct((b, m, c), xw.dtype),
            ],
            compiler_params=_slot_params(m, c, d, gb),
            interpret=interpret,
        )(*_slot_operands(s_dst, s_src, in_src, in_w, xw), g.astype(xw.dtype))
        return (
            jnp.swapaxes(dsdT, 1, 2),
            jnp.swapaxes(dssT, 1, 2),
            dxw.astype(xw.dtype),
        )
    gb = _graphs_per_step(b, m, c, t)
    kernel = _make_bwd_kernel(t, m, d, h, c // h, slope, gb)
    dsd, dssT, dxw = pl.pallas_call(
        kernel,
        grid=(b // gb, m // t),
        in_specs=_specs(t, m, d, h, c, gb)
        + [pl.BlockSpec((gb, t, c), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((gb, t, h), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, h, m), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, m, c), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, h), jnp.float32),
            jax.ShapeDtypeStruct((b, h, m), jnp.float32),
            jax.ShapeDtypeStruct((b, m, c), jnp.float32),
        ],
        interpret=interpret,
    )(
        s_dst.astype(jnp.float32),
        jnp.swapaxes(s_src.astype(jnp.float32), 1, 2),
        in_src.astype(jnp.int32),
        in_w.astype(jnp.float32),
        xw,
        g.astype(xw.dtype),
    )
    return dsd, jnp.swapaxes(dssT, 1, 2), dxw.astype(xw.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gat_attention_fused(s_dst, s_src, in_src, in_w, xw, slope: float = _SLOPE,
                        interpret: bool = False):
    """Flash-GAT attention: `[B, M, C]` head-concat attention output.

    Pallas on TPU (interpret elsewhere); differentiable wrt the score
    vectors and `xw` (the wire arrays only gate edge existence).
    """
    return _fwd_impl(s_dst, s_src, in_src, in_w, xw, slope, interpret)


def _vjp_fwd(s_dst, s_src, in_src, in_w, xw, slope, interpret):
    out = _fwd_impl(s_dst, s_src, in_src, in_w, xw, slope, interpret)
    return out, (s_dst, s_src, in_src, in_w, xw)


def _vjp_bwd(slope, interpret, residuals, g):
    s_dst, s_src, in_src, in_w, xw = residuals
    dsd, dss, dxw = _bwd_impl(s_dst, s_src, in_src, in_w, xw, g, slope, interpret)
    zero_i = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (
        dsd.astype(s_dst.dtype),
        dss.astype(s_src.dtype),
        zero_i(in_src),
        jnp.zeros_like(in_w),
        dxw,
    )


gat_attention_fused.defvjp(_vjp_fwd, _vjp_bwd)


def gat_attention(s_dst, s_src, in_src, in_w, xw, slope: float = _SLOPE,
                  interpret: bool = False):
    """Dispatch: fused flash kernel when tileable on this backend, else the
    XLA matrix oracle (autodiff)."""
    if _shapes_ok(s_dst, xw, interpret):
        return gat_attention_fused(s_dst, s_src, in_src, in_w, xw, slope, interpret)
    return gat_attention_xla(s_dst, s_src, in_src, in_w, xw, slope)
