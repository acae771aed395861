"""Differential probe of the slot-GAT BACKWARD's per-stage costs.

VERDICT r4 item 3: the GAT backward (flash recompute + dalpha dots +
softmax-backward chain + scatter dots, `ops/gat_pallas._make_slot_bwd_kernel`)
is ~45% of the GAT step and never had the per-stage accounting the
forward got over five probe-driven passes.  This probe prices each
backward stage with the same reps-difference method as
``probe_mosaic_costs.py`` (time at reps=16 and 64 with a forced D2H
read; the difference isolates 48·G ops and cancels tunnel round-trip,
block copies, and the early-returning ``block_until_ready``), minus ONE
SHARED scaffold baseline (the ``swap20`` variant's [M,T] rr-add +
consume).  Caveat (round-5 review): the shared scaffold over-subtracts
for variants whose real per-rep overhead is smaller than an [M,T] add
(the small-output dal/dss stages — several clamp to the 0-floor), so
tiny ``net`` values UNDER-state those stages' true cost; treat the
table as a RANKING of candidate rewrites, not absolute prices, and
ratify any default flip with a whole-step A/B (the dal=t default was:
+7.0% whole-step, docs/kernels.md seventh pass).  The fifth-pass probe
(`probe_mosaic_costs.py`) sized scaffolds per-variant; here the shared
baseline was accepted because every candidate's decision margin (4-10×)
dwarfs the scaffold error (≤0.03 µs).

Stage map (per graph, per GATConv layer, D=4, C=128, T=M=256):

  prep (recomputed)  D × (oh select + sgT thin-sublane dot + xwg gather)
  dal                (D+1) × (VPU fma + dot [T,C]@[C,H]) + [T,(D+1)H] swap
  softmax-bwd chain  H × few [D+1,T] VPU row ops
  dss                D × [H,T]·oh dots (thin-sublane)
  dxw                (D+1) × (alpha_exp K-thin dot + VPU mul) + D × oh@s full dots

The candidate rewrite this probe prices BEFORE implementation (the
fifth-pass discipline): computing dalpha TRANSPOSED —
``dot_general(blk [H,C], X [T,C], contract C) → [H,T]`` — a
thin-SUBLANE dot replacing the current thin-LANE ``[T,C]@[C,H]`` (whose
H ∈ {4,8} output lanes pad to 128) AND deleting the [T,(D+1)H] →
[(D+1)H,T] result transpose.  Probed at H=4 and H=8 because the
reference sweep draws heads=8 at p=0.5.

Run: ``python scripts/probe_gat_bwd.py`` (TPU, ~2 min).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

M, T, C = 256, 256, 128
G = 4096

# name -> builder(a, b, rr) returning the op result; a, b are [M, T] f32
# blocks, rr the rep-dependent scalar that defeats hoisting.


def _variants():
    blk4 = (
        jax.lax.broadcasted_iota(jnp.int32, (4, C), 1) // (C // 4)
        == jax.lax.broadcasted_iota(jnp.int32, (4, C), 0)
    ).astype(jnp.float32)
    blk8 = (
        jax.lax.broadcasted_iota(jnp.int32, (8, C), 1) // (C // 8)
        == jax.lax.broadcasted_iota(jnp.int32, (8, C), 0)
    ).astype(jnp.float32)

    def dal_row(a, b, rr, h, blk):
        # current form: X = gf*xw (VPU), then X @ blk^T -> [T, H]
        x = (a[:, :C] + rr) * b[:, :C]
        return jax.lax.dot_general(
            x, jnp.swapaxes(blk, 0, 1), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dal_T(a, b, rr, h, blk):
        # candidate: blk [H, C] · X [T, C] contracting C -> [H, T]
        x = (a[:, :C] + rr) * b[:, :C]
        return jax.lax.dot_general(
            blk, x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def swap20(a, b, rr, h=None, blk=None):
        # the [T, (D+1)H] -> [(D+1)H, T] result transpose dal_T deletes
        return jnp.swapaxes(a[:, :20] + rr, 0, 1)

    def chain_vpu(a, b, rr, h=None, blk=None):
        # one head's softmax-backward on [D+1, T] rows:
        # tmp = a*dp; dz = a*(dp - sum tmp); dzl = dz*where(z>=0,1,slope)
        al = a[:5, :] + rr
        dp = b[:5, :]
        tmp = al * dp
        dz = al * (dp - jnp.sum(tmp, axis=0, keepdims=True))
        return dz * jnp.where(b[5:10, :] >= 0.0, 1.0, 0.2)

    def dss_dot(a, b, rr, h, blk=None):
        # [H, T] · oh [M, T] contracting T -> [H, M] (thin-sublane)
        return jax.lax.dot_general(
            a[:h, :] + rr, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dxw_dot(a, b, rr, h=None, blk=None):
        # oh [M, T] @ s [T, C] (the big scatter dot; feature-gather class)
        return jax.lax.dot_general(
            a, b[:, :C] + rr, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def alpha_exp(a, b, rr, h, blk):
        # [T, H] @ blk [H, C] K-thin expander dot
        return jax.lax.dot_general(
            a[:, :h] + rr, blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return {
        "dal_row_h4": (dal_row, 4, blk4),
        "dal_T_h4": (dal_T, 4, blk4),
        "dal_row_h8": (dal_row, 8, blk8),
        "dal_T_h8": (dal_T, 8, blk8),
        "swap20": (swap20, 0, None),
        "chain_vpu": (chain_vpu, 0, None),
        "dss_dot_h4": (dss_dot, 4, None),
        "dss_dot_h8": (dss_dot, 8, None),
        "dxw_dot": (dxw_dot, 0, None),
        "alpha_exp_h4": (alpha_exp, 4, blk4),
        "alpha_exp_h8": (alpha_exp, 8, blk8),
    }


def _build(name: str, reps: int, scaffold_only: bool = False):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        acc = jnp.zeros((8, 8), jnp.float32)
        fn, h, blk = _variants()[name]
        for r in range(reps):
            rr = jnp.float32(r) * 1e-7
            if scaffold_only:
                d = a + rr
            else:
                d = fn(a, b, rr, h, blk)
            acc = acc + jnp.sum(d)
        o_ref[...] = acc

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((M, T), lambda i: (0, 0)),
                      pl.BlockSpec((M, T), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((8, 8), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
        )(a, b)

    return run


def _best_time(run, a, b, n: int = 5) -> float:
    np.array(run(a, b))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        np.array(run(a, b))  # D2H read forces real completion
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    rng = np.random.default_rng(0)
    a = jnp.array(rng.standard_normal((M, T)), jnp.float32)
    b = jnp.array(rng.standard_normal((M, T)), jnp.float32)
    s_lo = _best_time(_build("swap20", 16, scaffold_only=True), a, b)
    s_hi = _best_time(_build("swap20", 64, scaffold_only=True), a, b)
    scaffold = max((s_hi - s_lo) / (48 * G), 0.0)
    print(f"{'stage':16s} {'net us':>8s} {'raw us':>8s}   (scaffold "
          f"{scaffold * 1e6:.4f})")
    for name in _variants():
        lo = _best_time(_build(name, 16), a, b)
        hi = _best_time(_build(name, 64), a, b)
        raw = (hi - lo) / (48 * G)
        net = max(raw - scaffold, 0.0)
        print(f"{name:16s} {net * 1e6:8.4f} {raw * 1e6:8.4f}")


if __name__ == "__main__":
    main()
