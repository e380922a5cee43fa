#!/usr/bin/env bash
# Two-cluster-size scaling study (BASELINE.json north_rule): run the
# identical deterministic index build at N and 4N cores, each in its own
# JVM (fresh heap — no cross-level GC contamination), and report
# throughput at both plus efficiency = (rate_4N / rate_N) / 4.
#
# Usage: tools/run_scaling_bench.sh [convs] [nLow] [nHigh]
set -euo pipefail
CONVS=${1:-20000}
NLOW=${2:-2}
NHIGH=${3:-8}
cd "$(dirname "$0")/.."

ROUNDS=${4:-2}

run() {
  # ActiveProcessorCount=N: a local[N] level must behave like an N-core
  # cluster — without it the JVM's GC/JIT/netty pools size to the HOST's
  # 32 cpus and the low level borrows idle cores (see build.sbt)
  SPARK_DRIVER_MEM=24g SPARK_GRAFT_PROC_COUNT="$1" \
    sbt -batch "runMain searchspark.bench.BuildBench $CONVS $1" 2>/dev/null \
    | grep -o '{"bench":"build-once".*}' | tail -1
}

# interleave rounds (sandbox wall-clock noise is large; per-level min
# over alternating rounds removes slow-host windows from either side)
LOWS=(); HIGHS=()
for r in $(seq 1 "$ROUNDS"); do
  echo "== round $r: local[$NLOW] =="
  L=$(run "$NLOW"); echo "$L"; LOWS+=("$L")
  echo "== round $r: local[$NHIGH] =="
  H=$(run "$NHIGH"); echo "$H"; HIGHS+=("$H")
done

python3 - "$NLOW" "$NHIGH" "$(printf '%s\n' "${LOWS[@]}")" "$(printf '%s\n' "${HIGHS[@]}")" <<'EOF'
import json, sys
nl, nh = int(sys.argv[1]), int(sys.argv[2])
lows = [json.loads(x) for x in sys.argv[3].splitlines()]
highs = [json.loads(x) for x in sys.argv[4].splitlines()]
low = min(lows, key=lambda x: x["sec"])
high = min(highs, key=lambda x: x["sec"])
assert low["turns"] == high["turns"], "corpus mismatch"
assert low["top_score"] == high["top_score"], "determinism violated across levels"
eff = (high["rate"] / low["rate"]) / (nh / nl)
print(json.dumps({
    "bench": "build-scaling", "turns": low["turns"],
    "cores_low": nl, "sec_low": low["sec"], "rate_low": low["rate"],
    "cores_high": nh, "sec_high": high["sec"], "rate_high": high["rate"],
    "speedup": round(high["rate"] / low["rate"], 2),
    "efficiency": round(eff, 3),
    "rounds": len(lows),
    "all_sec_low": [x["sec"] for x in lows],
    "all_sec_high": [x["sec"] for x in highs]}))
EOF
