#!/bin/bash
# Same-window whole-step A/B series for the fused phi+pool kernel pair
# (ops/fused_phi.py).  Device-truth method: resident pipeline + step
# fusion, so results hold in degraded tunnel windows (BASELINE.md
# methodology).  Usage: bash scripts/phi_ab.sh [iters]
set -u
IT=${1:-20}
run () {
  local label="$1"; shift
  local out
  out=$(timeout 590 "$@" python bench.py --phi on --iters "$IT" 2>/dev/null | tail -1)
  echo "$label: $out"
}
echo "== baseline (XLA phi) =="
# NOTE: since 2026-08-18 the XLA arm defaults to post-pool + auto-remat
# (the measured-best XLA form) — the fused rows must beat THAT
out=$(timeout 590 python bench.py --phi off --iters "$IT" 2>/dev/null | tail -1)
echo "xla: $out"
echo "== fused pair =="
# NOTE (round-2 session 7): the post-pool final-linear placement now
# applies to the fused path too — by default the kernel runs the HIDDEN
# chain only (2 matmuls/tile fwd instead of 3; one less vjp layer bwd)
# and the final linear runs per-event outside.  "fused-default" measures
# that; "fused-full-postpool-off" is the old fully-fused form.
run "fused-default" env
run "fused-full-postpool-off" env PCC_PHI_POSTPOOL=0
run "fused-split2" env PCC_PHI_SPLIT=2 PCC_PHI_SPLIT_BWD=2
run "fused-split4" env PCC_PHI_SPLIT=4 PCC_PHI_SPLIT_BWD=4
run "fused-bwd-t2048-s2" env PCC_PHI_TILE_BWD=2048 PCC_PHI_SPLIT_BWD=2
run "fused-bwd-t4096-s4" env PCC_PHI_TILE_BWD=4096 PCC_PHI_SPLIT_BWD=4
run "fused-fwd-t8192-s2" env PCC_PHI_TILE=8192 PCC_PHI_SPLIT=2
# scoped-VMEM raise (PCC_PHI_VMEM_MB) unlocking larger backward tiles:
# the bwd auto-budget caps at tile 1024 x width 256 under the default
# ~16 MB scoped-vmem stack; these rows pair a raised cap with the tile
run "fused-vmem32-bwd-t2048" env PCC_PHI_VMEM_MB=32 PCC_PHI_TILE_BWD=2048
run "fused-vmem64-bwd-t4096" env PCC_PHI_VMEM_MB=64 PCC_PHI_TILE_BWD=4096
run "fused-vmem64-t8192-bwd-t4096" env PCC_PHI_VMEM_MB=64 PCC_PHI_TILE=8192 PCC_PHI_TILE_BWD=4096
