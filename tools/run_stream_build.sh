#!/usr/bin/env bash
# >RAM streaming-build demonstration (round-4 VERDICT missing #3).
#
# Runs the SAME persisted ~2M-turn parquet corpus through the full index
# build twice:
#   control: -Xmx24g (corpus fits comfortably)
#   capped:  -Xmx2g, spark.memory.fraction=0.3 — storage+execution
#            budget ~600 MB, an order of magnitude below what caching
#            the deserialized corpus would need; the build must STREAM
#            the input (IndexBuild's repeatable-scan cache skip) and
#            spill its working caches.
# Asserts the capped run completes, never cached the input (in-process
# require in StreamBuild), and produces a bit-identical top score and
# count to the control. Prints both JSON lines + the verdict.
#
# Usage: tools/run_stream_build.sh [convs] [cores]
set -euo pipefail
CONVS=${1:-80000}
CORES=${2:-8}
cd "$(dirname "$0")/.."

OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

run() { # $1 = -Xmx, rest = extra -D flags
  local xmx=$1; shift
  java "-Xmx$xmx" -XX:ActiveProcessorCount="$CORES" $OPENS "$@" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.local.dir=/dev/shm/spark-local \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    searchspark.bench.StreamBuild "$CONVS" "$CORES" 2>/dev/null \
    | grep -o '{"bench":"stream-build".*}' | tail -1
}

echo "== control: -Xmx24g =="
CTRL=$(run 24g)
echo "$CTRL"
echo "== capped: -Xmx2g, spark.memory.fraction=0.3 =="
CAP=$(run 2g -Dspark.memory.fraction=0.3)
echo "$CAP"

python3 - "$CTRL" "$CAP" <<'EOF'
import json, sys
ctrl, cap = json.loads(sys.argv[1]), json.loads(sys.argv[2])
assert ctrl["turns"] == cap["turns"], "corpus mismatch"
assert ctrl["top_score"] == cap["top_score"], \
    f'top score differs: {ctrl["top_score"]} vs {cap["top_score"]}'
assert ctrl["count"] == cap["count"], "probe count differs"
assert ctrl["postings_rows"] == cap["postings_rows"], "postings differ"
assert cap["heap_mb"] <= 2200, f'capped run heap {cap["heap_mb"]} MB not capped'
print(json.dumps({
    "bench": "stream-build-identity", "turns": ctrl["turns"],
    "control_heap_mb": ctrl["heap_mb"], "control_sec": ctrl["sec"],
    "capped_heap_mb": cap["heap_mb"], "capped_sec": cap["sec"],
    "capped_rate": cap["rate"], "identical": True}))
EOF
