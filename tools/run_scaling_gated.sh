#!/usr/bin/env bash
# Noise-gated two-cluster-size scaling study (BASELINE.json north_rule).
#
# Same protocol as run_scaling_bench.sh (fresh JVM per level,
# -XX:ActiveProcessorCount pinned, interleaved rounds, min per level)
# plus a HOST-NOISE GATE: this sandbox VM shows multi-minute windows
# where identical runs slow 3-10x (round-4 measurement: the same
# BuildBench 40k local[8] invocation measured 426 s, 127 s, and 48 s
# within half an hour; /proc/stat steal stays ~0 so loadavg/steal can't
# gate it). Before each timed run a ~2 s single-thread CPU probe
# calibrates the current window; runs started in a window >15% slower
# than the best seen are retried (up to 6 waits), and every raw round +
# its calibration is reported so nothing is silently dropped.
#
# Usage: tools/run_scaling_gated.sh [convs] [nLow] [nHigh] [rounds]
set -euo pipefail
CONVS=${1:-40000}
NLOW=${2:-2}
NHIGH=${3:-8}
ROUNDS=${4:-3}
cd "$(dirname "$0")/.."

OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

calib() { # single-thread fixed-work probe, seconds on stdout
  python3 - <<'EOF'
import time
t0 = time.perf_counter()
s = 0
for i in range(12_000_000):
    s += i * i
print(f"{time.perf_counter() - t0:.3f}")
EOF
}

BEST_CAL=""
gate() { # wait for a clean window; echoes the accepted calibration
  local c tries=0
  while true; do
    c=$(calib)
    if [[ -z "$BEST_CAL" ]] || python3 -c "import sys; sys.exit(0 if $c < $BEST_CAL else 1)"; then
      BEST_CAL=$c
    fi
    if python3 -c "import sys; sys.exit(0 if $c <= $BEST_CAL * 1.15 else 1)"; then
      echo "$c"; return
    fi
    tries=$((tries + 1))
    echo "  [gate] calib ${c}s > best ${BEST_CAL}s +15% — waiting (try $tries)" >&2
    if (( tries >= 6 )); then echo "$c"; return; fi  # give up gating, run anyway
    sleep 45
  done
}

run() { # $1 = cores
  java -Xmx24g -XX:ActiveProcessorCount="$1" $OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    searchspark.bench.BuildBench "$CONVS" "$1" 2>/dev/null \
    | grep -o '{"bench":"build-once".*}' | tail -1
}

LOWS=(); HIGHS=(); CALS=()
for r in $(seq 1 "$ROUNDS"); do
  c=$(gate); echo "== round $r: local[$NLOW] (calib ${c}s) =="
  L=$(run "$NLOW"); echo "$L"; LOWS+=("$L"); CALS+=("$c")
  c=$(gate); echo "== round $r: local[$NHIGH] (calib ${c}s) =="
  H=$(run "$NHIGH"); echo "$H"; HIGHS+=("$H"); CALS+=("$c")
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
