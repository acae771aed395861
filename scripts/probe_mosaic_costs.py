"""Differential Mosaic op-cost probe — the kernel-tuning cost model.

Measures the marginal device cost of individual MXU dots and VPU passes
INSIDE a Pallas TPU kernel, tunnel-proof: each shape is timed at
reps=16 and reps=64 with a forced D2H read, and the difference isolates
the cost of 48*G ops, cancelling (a) the tunnel round-trip, (b) per-
grid-step block-copy overhead, and (c) the fact that
``block_until_ready`` through the axon tunnel returns BEFORE device
completion (absolute micro-timings are garbage even on-device — a
[256,256]@[256,128] dot "takes" 5 ns without the D2H read).

This probe drove the 2026-08-19 GAT slot-kernel win (+22.7%: transposed
thin-sublane score gathers) and killed two plausible-but-losing rewrites
BEFORE implementation (weighted-adjacency aggregation, G-batch raising).
Reference numbers on v5e (f32 operands, DEFAULT precision, M=K=256),
scaffold-corrected (each variant's rr-add + consume-sum overhead is
measured separately and subtracted — the overhead is variant-sized, so
raw numbers systematically over-charge large-output variants;
code-review catch 2026-08-19):

    op             net us   raw us   note
    full_256x128    0.058    0.083   row-form gather dot (the workhorse)
    full_256x256    0.151    0.176
    thin8_x256      ~0.028   0.028   thin-SUBLANE dots stream real rows
    thin32_x256     ~0.028   0.028   (scaffold sub-noise: read raw)
    row_x8          0.049    0.074   thin-LANE dots pad to 128
    full_128x256    0.063    0.080
    kthin_dot       0.018    0.043   [T,8]@[8,C] (K-thin)
    fma/select      0.010    0.034   one [256,256] VPU pass
    exp             0.040    0.065
    transpose       0.034    0.058   [256,128] -> [128,256]
    sublane_sum     (op ~= scaffold; read raw 0.026)

The decisions the raw table drove survive the correction: thin-sublane
gathers stay ~2x cheaper than row-form, and the weighted-adjacency
rewrite stays a wash (cheaper VPU selects, but the dots it saves got
cheaper too).

Run: ``python scripts/probe_mosaic_costs.py`` (needs the TPU; ~3 min).
Each variant must consume its FULL result (jnp.sum) — slicing lets
Mosaic narrow the dot — and must depend on the rep index, or loop-
invariant code motion hoists the op out of the REPS loop entirely.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

M, T, C = 256, 256, 128
G = 4096

DOT_VARIANTS = {
    # name: (lhs_rows, rhs_cols) for [rows, M] @ [M, cols]
    "full_256x128": (256, 128),
    "full_256x256": (256, 256),
    "thin8_x256": (8, 256),
    "thin32_x256": (32, 256),
    "row_x8": (256, 8),
    "full_128x256": (128, 256),
}
VPU_VARIANTS = ("fma_pass", "select_pass", "exp_pass", "kthin_dot",
                "transpose", "sublane_sum")


def _build(name: str, reps: int, scaffold_only: bool = False):
    """scaffold_only=True builds the same kernel with the op under test
    removed (d = the rep-dependent operand itself): the rr-add that
    defeats loop-invariant hoisting and the jnp.sum consume are
    variant-SIZED, so their cost must be measured per variant and
    subtracted — without that, large-output variants carry more
    scaffolding in their reported 'op cost' (code-review catch,
    2026-08-19).  The consume-sum shape still differs slightly between
    scaffold ([rows, M]) and op output ([rows, cols]); treat corrected
    values as ±~0.005 us."""

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        row = a[0:1, :]
        acc = jnp.zeros((8, 8), jnp.float32)
        sub = jax.lax.broadcasted_iota(jnp.int32, (M, T), 0).astype(jnp.float32)
        for r in range(reps):
            rr = jnp.float32(r) * 1e-7
            if scaffold_only:
                rows = DOT_VARIANTS.get(name, (256,))[0]
                d = a[:rows] + rr
            elif name in DOT_VARIANTS:
                rows, cols = DOT_VARIANTS[name]
                x = a[:rows] + rr
                d = jax.lax.dot_general(
                    x, b[:, :cols], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            elif name == "fma_pass":
                d = a * (row + rr) + b
            elif name == "select_pass":
                d = jnp.where(sub == (row + rr), row + rr, b)
            elif name == "exp_pass":
                d = jnp.exp((a + rr) * 1e-3)
            elif name == "kthin_dot":
                x = a[:, :8] + rr
                d = jax.lax.dot_general(
                    x, b[:8, :C], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            elif name == "transpose":
                d = jnp.swapaxes(a[:, :C] + rr, 0, 1)
            elif name == "sublane_sum":
                d = jnp.sum(a + rr, axis=0, keepdims=True)
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
    np.array(run(a, b))  # compile + warm
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        np.array(run(a, b))  # the D2H read forces real completion
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    rng = np.random.default_rng(0)
    a = jnp.array(rng.standard_normal((M, T)), jnp.float32)
    b = jnp.array(rng.standard_normal((M, T)), jnp.float32)
    print(f"{'op':16s} {'us/op':>8s} {'raw':>8s} {'scaffold':>9s}")
    scaffolds: dict = {}
    for name in list(DOT_VARIANTS) + list(VPU_VARIANTS):
        lo = _best_time(_build(name, 16), a, b)
        hi = _best_time(_build(name, 64), a, b)
        raw = (hi - lo) / (48 * G)
        rows = DOT_VARIANTS.get(name, (256,))[0]
        if rows not in scaffolds:
            s_lo = _best_time(_build(name, 16, scaffold_only=True), a, b)
            s_hi = _best_time(_build(name, 64, scaffold_only=True), a, b)
            # clamp: a sub-noise scaffold (thin rows) can measure negative
            scaffolds[rows] = max((s_hi - s_lo) / (48 * G), 0.0)
        net = max(raw - scaffolds[rows], 0.0)
        # caveats: for reduction variants the op nearly IS the scaffold
        # (sublane_sum net ~0 is an artifact); for thin-row variants the
        # scaffold is sub-noise — compare RAW values at equal shapes there
        print(f"{name:16s} {net * 1e6:8.4f} {raw * 1e6:8.4f} "
              f"{scaffolds[rows] * 1e6:9.4f}")


if __name__ == "__main__":
    main()
