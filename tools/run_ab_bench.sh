#!/usr/bin/env bash
# A/B the current tree vs the round-3 tree (same BuildBench, same
# parquet corpus, interleaved invocations) at one parallelism level.
# Usage: tools/run_ab_bench.sh [convs] [cores] [rounds] [r3classes]
set -euo pipefail
CONVS=${1:-40000}
CORES=${2:-8}
ROUNDS=${3:-3}
R3=${4:-/tmp/r3tree/target/scala-2.13/classes}
cd "$(dirname "$0")/.."

OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

run() { # $1 = classes dir
  java -Xmx24g -XX:ActiveProcessorCount="$CORES" $OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$1:/opt/spark/jars/*" \
    searchspark.bench.BuildBench "$CONVS" "$CORES" 2>/dev/null \
    | grep -o '{"bench":"build-once".*}' | tail -1
}

for r in $(seq 1 "$ROUNDS"); do
  echo "== round $r HEAD ==";  run "target/scala-2.13/classes"
  echo "== round $r R3 ==";    run "$R3"
done
