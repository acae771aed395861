"""Fused φ-MLP + segment-sum pooling — the flagship Pallas TPU kernel.

The reference's DeepSets hot path is a per-point MLP followed by a Python
loop of per-event pools (`models/deep_sets.py:89-104`).  SURVEY §3.3 names
"shared per-point MLP + symmetric pooling in one kernel" the #1 fusion
target.  This module provides:

- :func:`phi_forward_xla` / :func:`phi_pool_xla` — the XLA reference
  implementation (also the VJP rule and the CPU fallback)
- :func:`phi_pool_pallas` — one ``pallas_call`` computing the whole
  φ chain and the pooled segment sums without writing any per-point
  activation to HBM:

  * grid over point tiles ``[T, F]``; all layer weights resident in VMEM
  * each tile runs the matmul chain on the MXU (bf16 in, f32 accumulate)
  * pooling is a tile-local one-hot matmul ``one_hotᵀ @ h`` accumulated
    into a ``[S_pad, H]`` f32 output block — an MXU contraction instead of
    the VPU scatter-add XLA emits for ``segment_sum``
- :func:`phi_pool_bwd_pallas` — the fused BACKWARD: one ``pallas_call``
  that re-runs the φ chain tile-by-tile in VMEM (``jax.vjp`` over the
  tile function, so the math matches the forward bit-for-bit), gathers the
  pooled cotangent through the same one-hot contraction, accumulates
  ``d_params`` in f32 VMEM across tiles and streams ``d_points`` tiles
  out.  With it, neither forward nor backward ever writes a per-point
  ``[P, H]`` activation to HBM — the train step's φ portion becomes
  MXU-bound instead of HBM-bound (the XLA chain moves ~600 MB/step of
  activations at the flagship shape; the fused pair moves ~3 MB).
  Measured status (whole-train-step A/B, v5e, P=65536, fuse 16): the
  fused pair currently TIES the XLA path at width 256 (1.04 vs 1.01
  ms/step) and at 512 (2.39 vs 2.31) — the backward's in-tile recompute
  costs 4/3 the FLOPs, which eats the saved HBM traffic at these widths;
  kernels run ~67 TFLOPS effective vs the 4x headroom to bf16 peak, so
  tuning continues (docs/kernels.md)
- :func:`phi_pool` — custom-VJP wrapper: Pallas forward; backward via
  :func:`phi_pool_bwd_pallas` when the shapes tile (else an XLA replay
  under ``jax.vjp`` — rematerialized, so no per-point residuals are saved
  either way)

φ layer spec: a tuple of ``("plain" | "residual", has_ln)`` entries plus a
final un-activated linear, matching the reference φ structure
(`models/deep_sets.py:44-55`).  The Pallas path supports specs without
layer-norm (the shipped configs; LN specs fall back to XLA).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Spec = Tuple[Tuple[str, bool], ...]


def _env_int(name: str, default: int) -> int:
    """Tuning overrides (PCC_PHI_TILE / _TILE_BWD / _SPLIT / _SPLIT_BWD /
    _VMEM_MB) for same-window whole-step A/B experiments; defaults are the
    shipped, measured policy.  A SET-but-malformed value raises, like the
    PCC_GAT_* knobs: a typo'd override silently measuring the default arm
    voids the A/B — and a malformed PCC_PHI_TILE_BWD would additionally
    disable the static-VMEM feasibility gate (which keys on the var being
    set) while NOT applying any override, the worst of both."""
    raw = os.environ.get(name)
    if raw is None or raw == "":
        return default
    try:
        return int(raw)
    except ValueError:
        raise ValueError(f"{name} must be an integer, got {raw!r}") from None


def _compiler_params():
    """Opt-in Mosaic scoped-VMEM raise (PCC_PHI_VMEM_MB, whole MB).

    The backward kernel's tile size is capped by the default ~16 MB
    scoped-vmem stack (its vjp residual live set — see the tile-budget
    comments in :func:`phi_pool_bwd_pallas`); v5e has 128 MB of VMEM, so
    raising the cap admits 2-4x larger row tiles (fewer grid steps,
    longer MXU bursts).  Unset → compiler default, the shipped behavior.
    A/B rows live in scripts/phi_ab.sh."""
    mb = _env_int("PCC_PHI_VMEM_MB", 0)
    if mb <= 0:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=mb * 1024 * 1024)


def _act(name: str):
    # "gelu" resolves to quick_gelu unless PCC_GELU=exact|poly
    # (ops/activations.py) — the exact-gelu tanh chain alone cost a third
    # of the flagship train step (see the activations module docstring).
    # mosaic=True: the PALLAS KERNELS need the explicit-exp sigmoid forms
    # — lax.logistic is broken at bf16 under Mosaic.  Kernel builders
    # ONLY; the XLA fns below use _act_xla
    from point_cloud_classifier_tpu.ops.activations import resolve_activation

    return resolve_activation(name, mosaic=True)


def _act_xla(name: str):
    # XLA consumers (phi_hidden_xla / phi_forward_xla and everything built
    # on them — including the flagship's production "xla" mode) get the
    # native lowerings: lax.logistic measured ~3% whole-step faster than
    # the explicit-exp form on the post-pool step (commit 906ccce's
    # stated policy).  That commit flipped _act to mosaic=True for the
    # kernels but inadvertently dragged these XLA fns with it, so the
    # headline path ran explicit-exp from 2026-08-18 until the round-5
    # review caught it — and the PCC_SIGMOID_FORM=exp A/B arm was
    # near-vacuous (both arms explicit).  The two forms are the same
    # function (1/(1+exp(-x)) IS logistic), differing only in lowering,
    # so kernels-vs-XLA parity is unaffected (tests pin it).
    from point_cloud_classifier_tpu.ops.activations import resolve_activation

    return resolve_activation(name, mosaic=False)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# -- XLA reference implementation -------------------------------------------


def _apply_layer(h, kind, has_ln, w, b, ln_scale, ln_bias, act):
    out = jnp.dot(h, w.astype(h.dtype), preferred_element_type=jnp.float32).astype(
        h.dtype
    ) + b.astype(h.dtype)
    if has_ln:
        f32 = out.astype(jnp.float32)
        mean = jnp.mean(f32, axis=-1, keepdims=True)
        var = jnp.mean((f32 - mean) ** 2, axis=-1, keepdims=True)
        out = ((f32 - mean) * jax.lax.rsqrt(var + 1e-5) * ln_scale + ln_bias).astype(
            h.dtype
        )
    if kind == "residual":
        return h + act(out)
    return act(out)


def phi_forward_xla(points, spec: Spec, params: Sequence, activation: str):
    """Per-point features ``[P, H]`` through the φ chain (XLA).

    Like the kernel's ``_chain_values``, the final un-activated linear is
    applied only when its weights are present (``len(params) ==
    len(spec) + 1``); the hidden-only form backs the post-pool placement's
    XLA fallback."""
    h = phi_hidden_xla(points, spec, params[: len(spec)], activation)
    if len(params) == len(spec):
        return h
    wf, bf = params[-1][0], params[-1][1]
    return jnp.dot(
        h, wf.astype(h.dtype), preferred_element_type=jnp.float32
    ).astype(h.dtype) + bf.astype(h.dtype)


def phi_hidden_xla(points, spec: Spec, params: Sequence, activation: str):
    """The φ chain WITHOUT the final un-activated linear (``len(params) ==
    len(spec)``) — the XLA half of the tail-fused split (`phi_pool` with an
    empty spec fuses the final linear + pooling)."""
    act = _act_xla(activation)
    h = points
    for (kind, has_ln), layer in zip(spec, params):
        w, b, ln_scale, ln_bias = layer
        h = _apply_layer(h, kind, has_ln, w, b, ln_scale, ln_bias, act)
    return h


def phi_pool_xla(points, seg, spec: Spec, params: Sequence, activation: str, num_segments: int):
    """φ then f32 segment-sum pooling — the semantics contract."""
    h = phi_forward_xla(points, spec, params, activation)
    return jax.ops.segment_sum(
        h.astype(jnp.float32), seg, num_segments=num_segments
    )


# -- Pallas kernel -----------------------------------------------------------


def _chain_values(spec: Spec, act, h, flat_w):
    """The in-kernel φ chain over LOADED values — the ONE definition both
    the forward kernel and the backward's ``jax.vjp`` differentiate, so the
    backward math is the forward's by construction (same casts, same
    ``preferred_element_type``; a drifted duplicate would silently train on
    a slightly-wrong gradient — code-review finding).

    The final un-activated linear is applied only when its weights are
    present (``len(flat_w) == 2·len(spec) + 2``).  The hidden-only form
    (``2·len(spec)`` operands) serves the post-pool placement: the bare
    final Linear commutes with mean and sum/√N pooling (reference
    `models/deep_sets.py:55`), so DeepSets runs it per-EVENT after the
    pooled sums leave this kernel — one less [T, H]×[H, H] matmul per
    tile forward, and one less layer of vjp recompute backward."""
    r = 0
    for kind, _ in spec:
        w, b = flat_w[r], flat_w[r + 1]
        r += 2
        out = (
            jnp.dot(h, w, preferred_element_type=jnp.float32).astype(h.dtype)
            + b
        )
        h = h + act(out) if kind == "residual" else act(out)
    if r == len(flat_w):
        return h  # hidden-only chain: final linear runs post-pool
    wf, bf = flat_w[r], flat_w[r + 1]
    return jnp.dot(h, wf, preferred_element_type=jnp.float32).astype(
        h.dtype
    ) + bf


def _pick_tile(tile: int, p: int):
    """Largest pow-2 row tile ≤ ``tile`` dividing ``p`` (≥128, or a tiny
    pow-2 whole buffer); None → caller falls back to XLA.  Mosaic wants
    power-of-two row tiles here (mult-of-8-but-not-128 tiles compile but
    miscompute on the accumulation path)."""
    cand = min(tile, p)
    while cand >= 128:
        if p % cand == 0 and (cand & (cand - 1)) == 0:
            return cand
        cand //= 2
    if p < 128 and (p & (p - 1)) == 0:
        return p
    return None


def _flatten_params(params: Sequence, dtype):
    """Flat (w, b) operand list, cast to the activation dtype."""
    flat = []
    for layer in params:
        flat.append(layer[0].astype(dtype))
        flat.append(layer[1].astype(dtype).reshape(1, -1))
    return flat


def _make_kernel(
    spec: Spec, activation: str, s_pad: int, n_weight_refs: int, split: int = 1
):
    act = _act(activation)

    def kernel(seg_ref, x_ref, *rest):
        out_ref = rest[n_weight_refs]
        w_refs = rest[:n_weight_refs]

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # `split` independent row sub-chains (static unroll): the chain's
        # matmul→act→matmul dependency serializes MXU and VPU; interleaved
        # sub-chains give the Mosaic scheduler concurrent MXU work for one
        # chunk while another is in its activation
        x = x_ref[:]
        flat_w = tuple(r[:] for r in w_refs)
        seg_tile = seg_ref[:]  # [T, 1] int32
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
        t = x.shape[0]
        ts = t // split
        acc = None
        for s in range(split):
            h = _chain_values(spec, act, x[s * ts : (s + 1) * ts], flat_w)
            one_hot = (seg_tile[s * ts : (s + 1) * ts] == slot_ids).astype(
                h.dtype
            )
            # tile-local one-hot [TS, S_pad] — pooling as an MXU contraction
            contrib = jax.lax.dot_general(
                one_hot,
                h,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = contrib if acc is None else acc + contrib
        out_ref[:] += acc

    return kernel


def phi_pool_pallas(
    points,
    seg,
    spec: Spec,
    params: Sequence,
    activation: str,
    num_segments: int,
    tile: int | None = None,
    interpret: bool = False,
):
    """One fused pallas_call; returns f32 pooled sums ``[num_segments, H]``."""
    assert all(not has_ln for _, has_ln in spec), "LN specs use the XLA path"
    p, f = points.shape
    h_dim = params[-1][0].shape[-1]
    if tile is None:
        # VMEM-budgeted row tile: the kernel's live set scales ~ tile×width,
        # and tile×width beyond 2^20 rows×cols blows the 16 MB scoped-vmem
        # stack (measured: 4096×256 / 2048×512 / 1024×1024 fit, 2× each
        # does not).  Cap at 4096 — wider tiles stopped helping.
        widest = max([h_dim] + [w[0].shape[-1] for w in params[:-1]])
        budget = (1 << 20) // max(widest, 1)
        tile = 128
        while tile * 2 <= min(budget, 4096):
            tile *= 2
        tile = _env_int("PCC_PHI_TILE", tile)
    # non-pow2 bucket ladders fall back to the XLA implementation
    t = _pick_tile(tile, p)
    if t is None:
        return phi_pool_xla(points, seg, spec, params, activation, num_segments)
    s_pad = _round_up(num_segments, 8)

    flat = _flatten_params(params, points.dtype)

    split = _env_int("PCC_PHI_SPLIT", 1)
    if split < 1 or t % split or (t // split) % 8:
        split = 1
    kernel = _make_kernel(spec, activation, s_pad, len(flat), split)
    grid = (p // t,)
    weight_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in flat
    ]
    pooled = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((s_pad, h_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_pad, h_dim), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(seg.astype(jnp.int32).reshape(-1, 1), points, *flat)
    return pooled[:num_segments]


# -- Pallas backward kernel ---------------------------------------------------


def _make_bwd_kernel(
    spec: Spec, activation: str, s_pad: int, n_weight_refs: int, split: int = 1
):
    act = _act(activation)

    def kernel(seg_ref, x_ref, g_ref, *rest):
        w_refs = rest[:n_weight_refs]
        d_x_ref = rest[n_weight_refs]
        d_w_refs = rest[n_weight_refs + 1 :]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in d_w_refs:
                r[:] = jnp.zeros_like(r)

        x = x_ref[:]
        seg_tile = seg_ref[:]  # [T, 1] int32
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)

        def tile_fn(x, *flat_w):
            # the SHARED forward chain (one definition — _chain_values),
            # so vjp differentiates the real forward semantics
            return _chain_values(spec, act, x, flat_w)

        # `split` independent row sub-chunks (static unroll) — same ILP
        # rationale as the forward, and each chunk's vjp residual live set
        # shrinks by `split`, which is what lets the backward run tiles
        # past the single-vjp scoped-vmem limit
        flat_w = tuple(r[:] for r in w_refs)
        g_bf = g_ref[:].astype(x.dtype)
        t = x.shape[0]
        ts = t // split
        dw_acc = None
        for s in range(split):
            sl = slice(s * ts, (s + 1) * ts)
            one_hot = (seg_tile[sl] == slot_ids).astype(x.dtype)
            # gather the pooled cotangent per point OUTSIDE the vjp, as a
            # bf16 one-hot contraction: d_h[p] = g[seg[p]].  Differentiating
            # through the pooling dot instead makes its transpose a mixed
            # bf16xf32 MXU dot (the f32 passes cost ~4x); the explicit bf16
            # gather matches the XLA replay's g[seg].astype(bf16) semantics
            # up to one rounding
            d_h = jnp.dot(
                one_hot, g_bf, preferred_element_type=jnp.float32
            ).astype(x.dtype)
            if not spec:
                # tail-fused case (final linear + pool only): the layer is
                # affine, so its grads are closed-form — NO forward
                # recompute (jax.vjp would re-run the matmul just to reach
                # the same three products)
                wf = flat_w[0]
                xs = x[sl]
                d_xs = jax.lax.dot_general(
                    d_h,
                    wf,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
                d_wf = jax.lax.dot_general(
                    xs,
                    d_h,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                d_bf = jnp.sum(
                    d_h.astype(jnp.float32), axis=0, keepdims=True
                )
                d_x_ref[sl] = d_xs
                dws = (d_wf, d_bf)
            else:
                _, vjp = jax.vjp(tile_fn, x[sl], *flat_w)
                grads = vjp(d_h)
                d_x_ref[sl] = grads[0]
                dws = tuple(dw.astype(jnp.float32) for dw in grads[1:])
            dw_acc = (
                dws
                if dw_acc is None
                else tuple(a + d for a, d in zip(dw_acc, dws))
            )
        for ref, dw in zip(d_w_refs, dw_acc):
            ref[:] += dw

    return kernel


def _bwd_auto_tile(
    spec, params, h_dim, num_segments, split_req, itemsize, interpret=False
):
    """Auto row-tile for the fused backward, or ``None`` when no tile can
    fit the scoped-VMEM stack (caller falls back to the XLA replay).

    Two budgets compose:

    1. Row-linear (rounds 2-3): the backward's live set is ~4x the
       forward's (vjp residuals for every chain layer stay in VMEM), so
       budget two notches tighter (measured: tile 2048 x width 256 hits
       the 16 MB scoped-vmem stack limit at 17.6 MB; 1024 x 256 fits).
       Chain specs default to the 2x-tile + split-2 pairing: splitting
       the vjp into row sub-chains halves the residual live set, so tile
       2048/split 2 keeps the same VMEM footprint as 1024/1 while
       halving the grid — measured +3.0% whole-step over the unsplit
       default (303.7k vs 294.8k clouds/sec, 2026-08-18 phi_ab; t4096/s4
       tied at 304.8k).  The tail-fused empty spec has NO vjp residuals
       (closed-form affine grads) — forward budget, no split needed.

    2. STATIC-footprint correction (round-5 TPU calibration): budget 1
       ignores the kernel's whole-run VMEM residents — wire-dtype
       weights, f32 d_param accumulators, the pooled cotangent — which
       grow with width² and at width 1024 crowd the residual live set
       out of the stack (w1024×2 at budget 1's tile 512 is a hard Mosaic
       compile failure; tile 256 fits).  Model: static +
       live_rows·widest·4·12 ≤ 15 MB (c=12 f32 row-buffers, 1 MB
       margin) — reproduces every measured anchor with the tuned
       defaults intact (w256 t2048 / w512 t1024 stand; w1024×2 → t256;
       w1024×4's 17 MB of d_param accumulators alone can NEVER fit →
       ``None``, XLA replay; all five TPU-verified 2026-08-21,
       tests/test_fused_phi.py pins the table).  A raised
       PCC_PHI_VMEM_MB grows the pool in step; an explicit
       PCC_PHI_TILE_BWD override skips the gate entirely (expert A/B
       arms pair it with the vmem knob — a wrong pairing should fail
       loudly, not silently measure XLA: the vacuous-arm trap).
    """
    widest = max([h_dim] + [w[0].shape[-1] for w in params[:-1]])
    shift, cap = (20, 4096) if not spec else (19, 2048)
    if spec and split_req < 2:
        shift, cap = 18, 1024  # unsplit residual live set: 1x tile
    budget = (1 << shift) // max(widest, 1)
    tile = 128
    while tile * 2 <= min(budget, cap):
        tile *= 2
    if not interpret and not os.environ.get("PCC_PHI_TILE_BWD"):
        # empty string counts as unset (matching _env_int), so the
        # feasibility gate still runs
        vmem_mb = _env_int("PCC_PHI_VMEM_MB", 0)
        pool = (vmem_mb - 1 if vmem_mb else 15) * 1024 * 1024
        # params entries are (w, b) or (w, b, None, None) — index, don't
        # unpack (the model API ships 4-tuples with empty LN slots)
        n_param = sum(pr[0].size + pr[1].size for pr in params)
        static = (
            n_param * (itemsize + 4) + _round_up(num_segments, 8) * h_dim * 4
        )
        eff_split = 2 if (spec and split_req >= 2) else 1
        while tile > 128 and (
            static + (tile // eff_split) * widest * 4 * 12 > pool
        ):
            tile //= 2
        if static + (tile // eff_split) * widest * 4 * 12 > pool:
            return None  # statically infeasible at any tile
    return tile


def phi_pool_bwd_pallas(
    points,
    seg,
    g,
    spec: Spec,
    params: Sequence,
    activation: str,
    num_segments: int,
    tile: int | None = None,
    interpret: bool = False,
):
    """Fused backward: (d_points, flat d_params) with no [P, H] HBM traffic.

    Returns ``None`` when the shapes don't tile (caller falls back to the
    XLA replay).  ``g`` is the f32 cotangent of the pooled ``[S, H]`` sums.
    """
    assert all(not has_ln for _, has_ln in spec), "LN specs use the XLA path"
    p, f = points.shape
    h_dim = params[-1][0].shape[-1]
    # resolve the intended split BEFORE the tile budget: the 2x tile is
    # only VMEM-safe because split >= 2 halves the vjp residual live set —
    # a forced PCC_PHI_SPLIT_BWD=1 (the old default, a documented A/B arm)
    # with the 2x tile compiles a 17.6 MB stack and Mosaic hard-fails at
    # the 16 MB cap (code-review finding); divisibility against the final
    # tile is re-checked where ``split`` resolves below
    split_req = _env_int("PCC_PHI_SPLIT_BWD", 2 if spec else 1)
    if tile is None:
        tile = _bwd_auto_tile(
            spec, params, h_dim, num_segments, split_req,
            jnp.dtype(points.dtype).itemsize, interpret,
        )
        if tile is None:
            return None  # statically VMEM-infeasible: XLA replay
        tile = _env_int("PCC_PHI_TILE_BWD", tile)
    t = _pick_tile(tile, p)
    if t is None:
        return None
    s_pad = _round_up(num_segments, 8)
    if g.shape[0] != s_pad:
        g = jnp.pad(g, ((0, s_pad - g.shape[0]), (0, 0)))

    dtype = points.dtype
    flat = _flatten_params(params, dtype)

    split = split_req
    if split < 1 or t % split or (t // split) % 8:
        split = 1
    kernel = _make_bwd_kernel(spec, activation, s_pad, len(flat), split)
    grid = (p // t,)
    weight_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in flat
    ]
    out_shapes = [jax.ShapeDtypeStruct((p, f), dtype)] + [
        jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat
    ]
    out_specs = [pl.BlockSpec((t, f), lambda i: (i, 0), memory_space=pltpu.VMEM)] + [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in flat
    ]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, h_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(seg.astype(jnp.int32).reshape(-1, 1), points, g.astype(jnp.float32), *flat)
    return outs[0], outs[1:]


def _reassemble_param_grads(params: Sequence, flat_grads):
    """Flat (d_w, d_b) pairs -> the params pytree structure (None for LN)."""
    out, i = [], 0
    for layer in params:
        d_w = flat_grads[i].astype(layer[0].dtype)
        d_b = flat_grads[i + 1].reshape(-1).astype(layer[1].dtype)
        i += 2
        if len(layer) == 4:
            out.append((d_w, d_b, None, None))
        else:
            out.append((d_w, d_b))
    return tuple(out)


# -- custom-VJP wrapper -------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2, 4, 5, 6))
def phi_pool(points, seg, spec: Spec, params, activation: str, num_segments: int, interpret: bool = False):
    return phi_pool_pallas(
        points, seg, spec, params, activation, num_segments, interpret=interpret
    )


def _phi_pool_fwd(points, seg, spec, params, activation, num_segments, interpret):
    out = phi_pool_pallas(
        points, seg, spec, params, activation, num_segments, interpret=interpret
    )
    return out, (points, seg, params)


def _phi_pool_bwd(spec, activation, num_segments, interpret, residuals, g):
    points, seg, params = residuals
    d_seg = np.zeros(seg.shape, dtype=jax.dtypes.float0)

    fused = phi_pool_bwd_pallas(
        points, seg, g, spec, params, activation, num_segments, interpret=interpret
    )
    if fused is not None:
        d_points, flat_grads = fused
        return d_points, d_seg, _reassemble_param_grads(params, flat_grads)

    def f(pts, prm):
        return phi_pool_xla(pts, seg, spec, prm, activation, num_segments)

    _, vjp = jax.vjp(f, points, params)
    d_points, d_params = vjp(g)
    return d_points, d_seg, d_params


phi_pool.defvjp(_phi_pool_fwd, _phi_pool_bwd)
