#!/usr/bin/env bash
# Skew torture for the north rule's long-conversation clause (VERDICT r3
# task #4): a 10^6-turn conversation landing in ONE input file inside an
# otherwise normal corpus (~45k turns across 256 files). Runs the identical
# extraction job unsalted and with --salt, records the straggler task-time
# ratio (max/median of the heaviest stage) for both, and asserts digest
# equality between the two runs.
#
# Usage: scripts/skew_soak.sh   (from the repo root; sbt compile first)
# Env:   SKEW_DIR (default /tmp/graft-skew), SKEW_MEGA (default 1000000),
#        SKEW_CONVS (default 4000), SKEW_SALT (default 32)
set -euo pipefail
cd "$(dirname "$0")/.."

WORK="${SKEW_DIR:-/tmp/graft-skew}"
MEGA="${SKEW_MEGA:-1000000}"
CONVS="${SKEW_CONVS:-4000}"
SALT="${SKEW_SALT:-32}"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JVM="java $ADD_OPENS -Xmx6g -XX:ParallelGCThreads=4 -Dspark.master=local[8] -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CP"

rm -rf "$WORK"; mkdir -p "$WORK"
echo "== generate skewed corpus ($CONVS convs + one ${MEGA}-turn conversation in one file) =="
$JVM graft.tools.GenTranscripts "$CONVS" "$WORK/input" "$MEGA" 2>"$WORK/gen.err" | grep gen-done

echo "== unsalted vs salted ($SALT) extraction =="
$JVM graft.tools.SkewSoak "$WORK/input" "$WORK/out" "$SALT" 2>"$WORK/soak.err" | tee "$WORK/soak.log" | grep -E 'skew-soak|job-done'
grep -q '"digest_equal":true' "$WORK/soak.log"
echo "SKEW SOAK PASSED (digest equality verified; ratios in $WORK/soak.log)"
