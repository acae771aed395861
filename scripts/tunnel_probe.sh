#!/bin/bash
# Tunnel health probe: one stream-smoke measurement, printed as
# "<ISO time> smoke=<clouds/sec>".  Exit 0 iff the window is HEALTHY
# (smoke >= $PCC_HEALTHY_SMOKE, default 100000 clouds/sec — the
# threshold from BASELINE.md's measurement-methodology section).
#
# Discipline (see CLAUDE.md "Environment gotchas"): tunnel-bound rows
# (stream throughput, p50 latency, mesh variants, e2e wall-clock) are
# only meaningful in a healthy window; device-truth rows (resident +
# deep fuse) are valid in any window.  NEVER run this concurrently with
# another process touching the TPU — the single-chip tunnel serializes
# them and both can stall past their timeouts.
set -u
cd "$(dirname "$0")/.."
THRESH=${PCC_HEALTHY_SMOKE:-100000}
SMOKE=$(timeout "${PCC_PROBE_TIMEOUT:-420}" python bench.py --smoke 2>/dev/null \
        | tail -1 \
        | python -c 'import json,sys; print(json.load(sys.stdin)["value"])' \
        2>/dev/null || echo 0)
echo "$(date -u +%FT%TZ) smoke=$SMOKE"
python - "$SMOKE" "$THRESH" <<'EOF'
import sys
smoke = float(sys.argv[1] or 0)
sys.exit(0 if smoke >= float(sys.argv[2]) else 1)
EOF
