#!/bin/bash
# One-window A/B queue (round 2, post-code-review): runs every pending
# device measurement back-to-back so the ratios are same-window.  Each row
# is one bench.py invocation (ONE JSON line) tagged with its arm name.
# Usage: bash scripts/ab_session.sh [out_file]   (default /tmp/ab_results.txt)
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/ab_results.txt}"
echo "=== ab_session $(date -u +%FT%TZ) ===" >> "$OUT"

row() { # row <tag> [env=val ...] -- <bench args...>
  local tag="$1"; shift
  local envs=()
  while [[ "$1" != "--" ]]; do envs+=("$1"); shift; done
  shift
  echo "--- $tag" | tee -a "$OUT"
  timeout 420 env "${envs[@]}" python bench.py "$@" 2>/dev/null | tail -1 \
    | sed "s/^/$tag /" | tee -a "$OUT"
}

# 0) window health (stream smoke — tunnel-bound by design)
row smoke -- --smoke

# 1) flagship headline: native lax.logistic sigmoid (default since
#    2026-08-18 — post-pool flipped the form race: 498.5/499.4 logistic
#    vs 486.1/481.3 explicit, A/B/A/B) vs the explicit-exp form
row deep_sets_logistic --
row deep_sets_exp PCC_SIGMOID_FORM=exp --

# 2) GAT: row-max softmax (default since 2026-08-18 — measured 24,380 vs
#    23,660 graphs/sec for the factored form) vs factored
row gat_maxform -- --model graph_net --gat
row gat_factored PCC_GAT_SOFTMAX=factored -- --model graph_net --gat

# 3) graph_net default (tanh): native tanh vs explicit-exp form
row graphnet_tanh_native -- --model graph_net
row graphnet_tanh_exp PCC_TANH_FORM=exp -- --model graph_net

# 4) int8 serving path (ops/quant.py): same-window latency A/B vs the
#    float forward — the claim is the s8 MXU (394 TOPS) + halved act
#    traffic beat bf16 forward-only
row latency_bf16 -- --latency
row latency_int8 -- --latency --quant int8

# 5) XLA remat of the phi chain during training: trades saved [P,H]
#    residual traffic for recompute, XLA-scheduled.  Measured 2026-08-18:
#    WITH post-pool (2-layer per-point chain) remat WINS 441.3k vs 425.5k
#    same-window, so "auto" (the default) now remats when post-pool is on
#    — this row measures the OFF arm for the ratio
row deep_sets_remat_off PCC_PHI_REMAT=0 --

# 5b) post-pool final φ Linear (new default: the bare final Linear commutes
#     with mean/sum pooling, so it runs per-EVENT instead of per-point —
#     ~half the per-point MXU work and no h3 HBM round-trips).  The
#     default-arm row 1 above already measures it ON; this is the OFF arm
#     (the reference's per-point placement) for the ratio
row deep_sets_postpool_off PCC_PHI_POSTPOOL=0 --

# 6) eval-side step fusion (wrapper._eval_dispatch, round-2): fused vs
#    per-batch dispatch on the scoring stream
row eval_fused8 -- --eval-throughput --fuse 8
row eval_unfused -- --eval-throughput --fuse 1

# 6b) eval phi-path policy (device-truth: batches pinned in HBM) — the
#     post-pool default changed BOTH arms of the old >=512 crossover
#     (models/deep_sets._use_pallas), so re-derive it: XLA vs fused
#     Pallas forward at widths 256 and 512, plus the int8 serving arm
row evaldev_xla_256 -- --eval-device --fuse 8 --phi off
row evaldev_pallas_256 -- --eval-device --fuse 8 --phi on
row evaldev_xla_512 -- --eval-device --fuse 8 --phi off --phi-width 512
row evaldev_pallas_512 -- --eval-device --fuse 8 --phi on --phi-width 512
row evaldev_int8_256 -- --eval-device --fuse 8 --quant int8

# 7) per-step fixed-overhead fraction: 2x workload per step (B=512,
#    P=131072) — if clouds/sec rises, the step carries amortizable
#    per-kernel overhead; if flat, it is pure traffic/FLOP bound
row deep_sets_scale2 PCC_BENCH_SCALE=2 -- --fuse 64

# 8) profile captures for the next kernel-tuning pass (after the A/B rows
#    so a mid-queue stall cannot cost the ratios): per-op self-time
#    breakdowns land in /tmp/trace_* and the parsed tables in $OUT
for spec in "deep_sets " "graph_net --model graph_net" "gat --model graph_net --gat"; do
  tag="${spec%% *}"; args="${spec#* }"
  echo "--- profile_$tag" | tee -a "$OUT"
  # shellcheck disable=SC2086
  timeout 420 python scripts/profile_step.py $args --top 12 2>/dev/null \
    | tail -16 | sed "s/^/profile_$tag /" | tee -a "$OUT"
done

echo "done -> $OUT"
