"""Differential Mosaic probe: the GAT kernel's lane-padding cliff at
non-128-multiple rung M (BASELINE.md M-ladder: 288 measures 57.4k vs
79.8k at 256 — −28% for +12.5% nodes).

Hypothesis under test: a dot whose lane dims are 288 costs the same as
one at 384 (lane tiles are 128-quantized), so the cliff is tile
arithmetic, not scheduling — and the VERDICT-suggested rewrites
(contraction chunking at 128, keeping gather operands at the next
128-multiple) cannot win because every chunking still rounds to the
same tile count.  If any chunked variant beats the monolithic 288 dot
by >15%, the kernel rework is worth doing; otherwise the cliff gets a
measured negative-result entry in docs/kernels.md.

Method: same differential scheme as probe_mosaic_costs.py (reps 16 vs
64, D2H-forced completion, per-variant scaffold subtraction is skipped
— all variants here share the one scaffold shape, so raw differences
compare apples to apples).

Variants (all f32, DEFAULT precision, shapes from the slot kernel at
M=T=288, H=8 score rows, C=128 features):

  score-gather family  ssT [H, M] @ oh [M, T]:
    score_256   [8,256]@[256,256]   the rung-below baseline
    score_288   [8,288]@[288,288]   the cliff victim
    score_384   [8,384]@[384,384]   the next 128-multiple
    score_288_chunkK    dot([8,256],[256,288]) + dot([8,32],[32,288])
    score_288_chunkT    dot([8,288],[288,128])*2 + dot([8,288],[288,32])
  feature-gather family  oh [M, T] @ xw [M, C] (sublane contraction):
    feat_256 / feat_288 / feat_384
  VPU family (the [D+1, T] softmax passes):
    vpu_exp_256 / vpu_exp_288 / vpu_exp_384   exp over [8, T]

Run: ``python scripts/probe_rung_lanes.py`` (needs the TPU; ~3 min).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# PCC_PROBE_INTERPRET=1: CPU shape/trace validation (no timings)
INTERPRET = os.environ.get("PCC_PROBE_INTERPRET") == "1"
MMAX = 384
G = 4 if INTERPRET else 4096
H, C = 8, 128

VARIANTS = [
    "score_256", "score_288", "score_384",
    "score_288_chunkK", "score_288_chunkT",
    "scoresub_256", "scoresub_288", "scoresub_384",
    "feat_256", "feat_288", "feat_384",
    "feat_256_chunkT", "feat_288_chunkT",
    "score_256_chunkT",
    "vpu_exp_256", "vpu_exp_288", "vpu_exp_384",
]

# the production kernel's chunk helper — probe and kernel provably tile
# the same way
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from point_cloud_classifier_tpu.ops.gat_pallas import _lane_chunks  # noqa: E402


def _build(name: str, reps: int):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]  # [MMAX, MMAX]
        b = b_ref[...]
        acc = jnp.zeros((8, 8), jnp.float32)
        for r in range(reps):
            rr = jnp.float32(r) * 1e-7
            if name.startswith("score_"):
                m = int(name.split("_")[1])
                lhs = a[:H, :m] + rr  # [H, m] "ssT"
                rhs = b[:m, :]  # [m, T<=MMAX] "one-hot"
                if name.endswith("chunkK"):
                    d = jax.lax.dot_general(
                        lhs[:, :256], rhs[:256, :288], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        lhs[:, 256:288], rhs[256:288, :288],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                elif name.endswith("chunkT"):
                    parts = [
                        jax.lax.dot_general(
                            lhs, rhs[:, c0:c1], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        for c0, c1 in _lane_chunks(m)
                    ]
                    d = jnp.concatenate(parts, axis=1)
                else:
                    d = jax.lax.dot_general(
                        lhs, rhs[:, :m], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            elif name.startswith("scoresub_"):
                # sublane-contraction form: ss [M, H] (scores shipped
                # UNtransposed) @ oh [M, T] over dim 0 — K rides sublanes
                # (8-granular) instead of lanes (128-granular), so only
                # the T output lanes pay the 128-quantization at M=288
                m = int(name.split("_")[1])
                lhs = a[:m, :H] + rr  # [m, H]
                d = jax.lax.dot_general(
                    lhs, b[:m, :m], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [H, T]
            elif name.startswith("feat_"):
                m = int(name.split("_")[1])
                oh = a[:m, :m] + rr  # [M, T] one-hot stand-in
                xw = b[:m, :C]
                if name.endswith("chunkT"):
                    # chunk the one-hot's T LANES to exact 128-tiles: each
                    # part streams [M, 128] with no lane padding; outputs
                    # concat on the [T, C] sublane axis
                    parts = [
                        jax.lax.dot_general(
                            oh[:, c0:c1], xw, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        for c0, c1 in _lane_chunks(m)
                    ]
                    d = jnp.concatenate(parts, axis=0)
                else:
                    d = jax.lax.dot_general(
                        oh, xw, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [T, C]
            else:  # vpu_exp_*
                m = int(name.split("_")[2])
                d = jnp.exp((a[:H, :m] + rr) * 1e-3)
            acc = acc + jnp.sum(d)
        o_ref[...] = acc

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((MMAX, MMAX), lambda i: (0, 0)),
                      pl.BlockSpec((MMAX, MMAX), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((8, 8), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
            interpret=INTERPRET,
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
    a = jnp.array(rng.standard_normal((MMAX, MMAX)), jnp.float32)
    b = jnp.array(rng.standard_normal((MMAX, MMAX)), jnp.float32)
    # PCC_PROBE_ONLY=name1,name2: subset (degraded-window compiles are
    # slow; the full 17-variant list can exceed a 15-min budget)
    only = os.environ.get("PCC_PROBE_ONLY")
    if only:
        variants = [v.strip() for v in only.split(",") if v.strip()]
        unknown = [v for v in variants if v not in VARIANTS]
        if unknown:
            raise SystemExit(
                f"PCC_PROBE_ONLY: unknown variant(s) {unknown}; "
                f"choose from {VARIANTS}"
            )
    else:
        variants = VARIANTS
    print(f"{'variant':20s} {'us/op':>8s}")
    for name in variants:
        lo = _best_time(_build(name, 16), a, b)
        hi = _best_time(_build(name, 64), a, b)
        print(f"{name:20s} {(hi - lo) / (48 * G) * 1e6:8.4f}")


if __name__ == "__main__":
    main()
