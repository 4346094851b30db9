#!/usr/bin/env bash
# Kill-and-resume soak for ExtractJob (VERDICT r3 task #3).
#
# Protocol:
#   1. generate the deterministic bench corpus (~405k turns, 40k convs);
#   2. BASELINE: uninterrupted ExtractJob --buckets 32 --passes 8;
#   3. INTERRUPTED: same job to a fresh dir as a separate driver JVM,
#      SIGKILL -9 the driver once >= 2 pass markers exist (mid-pass);
#   4. RESUME: re-run with --resume; assert every committed pass is skipped
#      (skip-pass events == markers present after the kill) and re-execution
#      covers only the rest;
#   5. compare the dataset digest (XOR of per-pass lineage digests) and row
#      counts between the baseline and the killed+resumed output — equal.
#
# Usage: scripts/soak_resume.sh   (from the repo root; sbt compile first)
# Env:   SOAK_CONVS (default 40000), SOAK_DIR (default /tmp/graft-soak)
set -euo pipefail
cd "$(dirname "$0")/.."

CONVS="${SOAK_CONVS:-40000}"
WORK="${SOAK_DIR:-/tmp/graft-soak}"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JVM="java $ADD_OPENS -Xmx6g -XX:ParallelGCThreads=4 -Dspark.master=local[16] -Dspark.ui.enabled=false -Dspark.sql.shuffle.partitions=32 -Dspark.sql.session.timeZone=UTC -cp $CP"

rm -rf "$WORK"; mkdir -p "$WORK"
IN="$WORK/input"
echo "== generate corpus ($CONVS convs) =="
$JVM graft.tools.GenTranscripts "$CONVS" "$IN" 2>"$WORK/gen.err" | grep gen-done

echo "== baseline: uninterrupted 8-pass job =="
$JVM graft.pipeline.ExtractJob --input "$IN" --output "$WORK/base" \
  --buckets 32 --passes 8 2>"$WORK/base.err" | tee "$WORK/base.log" | grep -E 'pass-done|job-done'

echo "== interrupted: kill -9 the driver after >= 2 committed passes =="
$JVM graft.pipeline.ExtractJob --input "$IN" --output "$WORK/soak" \
  --buckets 32 --passes 8 >"$WORK/soak1.log" 2>"$WORK/soak1.err" &
PID=$!
while kill -0 "$PID" 2>/dev/null; do
  if [ -f "$WORK/soak/_progress/pass-1.done" ]; then
    kill -9 "$PID" 2>/dev/null || true
    break
  fi
  sleep 0.1
done
wait "$PID" 2>/dev/null || true
MARKERS=$(ls "$WORK/soak/_progress/" 2>/dev/null | grep -c 'done$' || true)
echo "committed passes at kill: $MARKERS"
if [ "$MARKERS" -lt 2 ]; then echo "FAIL: kill landed before 2 committed passes"; exit 1; fi
if [ "$MARKERS" -ge 8 ]; then echo "FAIL: job finished before the kill (vacuous soak)"; exit 1; fi

echo "== resume =="
$JVM graft.pipeline.ExtractJob --input "$IN" --output "$WORK/soak" \
  --buckets 32 --passes 8 --resume 2>"$WORK/soak2.err" | tee "$WORK/soak2.log" | grep -E 'skip-pass|pass-done|job-done'
SKIPS=$(grep -c skip-pass "$WORK/soak2.log")
if [ "$SKIPS" -ne "$MARKERS" ]; then
  echo "FAIL: resume skipped $SKIPS passes, expected $MARKERS"; exit 1
fi

echo "== digest equality (baseline vs killed+resumed) =="
python3 - "$WORK" <<'EOF'
import sys, glob, functools
import duckdb
work = sys.argv[1]
def digest(root):
    con = duckdb.connect()
    files = glob.glob(f"{root}/_lineage/pass=*/*.parquet")
    assert files, f"no lineage under {root}"
    rows, dg = con.execute(
        "SELECT SUM(n_rows), bit_xor(digest) FROM read_parquet(?)", [files]).fetchone()
    return int(rows), int(dg)
b = digest(f"{work}/base"); s = digest(f"{work}/soak")
print(f"baseline rows={b[0]} digest={b[1]:#x}")
print(f"resumed  rows={s[0]} digest={s[1]:#x}")
assert b == s, "digest/row mismatch between uninterrupted and killed+resumed runs"
print("DIGESTS EQUAL")
EOF
echo "SOAK PASSED (killed after $MARKERS committed passes, resume skipped $SKIPS, digests equal)"
