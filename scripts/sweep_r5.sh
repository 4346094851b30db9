#!/usr/bin/env bash
# Round-5 multi-seed differential sweep (VERDICT r4 task #4): >=3 FRESH
# seeds x the full battery, plus two NEW generator shapes — `select`
# (select/optgroup/option + hr-in-select + select-in-table storm) and
# `entattr` (legacy no-semicolon refs + the attr-suppression rule at
# value/tag boundaries). Any nonzero mismatch count fails the sweep;
# distill every hit into a committed regression.
#
# Usage: scripts/sweep_r5.sh [logdir]   (repo root; sbt compile first;
#        runs sequentially — do NOT run another sbt while this is active)
set -uo pipefail
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/sweep_r5}"
mkdir -p "$LOG"
# fresh seeds, never used in rounds 1-4 (see memory list in BASELINE.md)
SEEDS="${SWEEP_SEEDS:-0xFEEDBEE5 0x0BADF00D 0x600DCAFE}"

python3 scripts/conformance/ts_strip.py >"$LOG/ts_strip.log" 2>&1 || { echo "ts_strip FAILED"; exit 1; }

fails=0
run() { # run <name> <cmd...>
  local name="$1"; shift
  local out="$LOG/$name.log"
  if "$@" >"$out" 2>&1; then
    echo "OK   $name: $(grep -Eo '[0-9]+ mismatches / [0-9]+ cases' "$out" | tail -1)"
  else
    echo "FAIL $name (see $out)"
    fails=$((fails+1))
  fi
}

for seed in $SEEDS; do
  run "tree-$seed"        env TREE_DIFF_SEED=$seed python3 scripts/conformance/tree_diff.py
  run "tree-wild-$seed"   env TREE_DIFF_SEED=$seed TREE_DIFF_PROFILE=wild python3 scripts/conformance/tree_diff.py
  run "token-$seed"       env TREE_DIFF_SEED=$seed PYTHONPATH=scripts/conformance python3 scripts/conformance/token_diff.py
  run "frag-$seed"        env FRAG_DIFF_SEED=$seed python3 scripts/conformance/fragment_diff.py
  run "bytes-$seed"       env BYTES_DIFF_SEED=$seed python3 scripts/conformance/bytes_diff.py
  run "extract-$seed"     env EXTRACT_DIFF_SEED=$seed python3 scripts/conformance/extract_diff.py
  run "extract-errors-$seed" env EXTRACT_DIFF_SEED=$seed EXTRACT_DIFF_PROFILE=errors python3 scripts/conformance/extract_diff.py
  # NEW round-5 shapes on every seed
  run "tree-select-$seed"  env TREE_DIFF_SEED=$seed TREE_DIFF_PROFILE=select python3 scripts/conformance/tree_diff.py
  run "tree-entattr-$seed" env TREE_DIFF_SEED=$seed TREE_DIFF_PROFILE=entattr python3 scripts/conformance/tree_diff.py
  run "tree-quirks-$seed"  env TREE_DIFF_SEED=$seed TREE_DIFF_PROFILE=quirks python3 scripts/conformance/tree_diff.py
  run "frag-select-$seed"  env FRAG_DIFF_SEED=$seed FRAG_DIFF_PROFILE=select python3 scripts/conformance/fragment_diff.py
done
# standing shape battery on one seed (r3 lesson: vary the SHAPE).
# SWEEP_BATTERY_SEED overrides; defaults to the FIRST sweep seed so a
# fresh SWEEP_SEEDS list freshens the battery too (a pinned seed here
# made sweeps B-D replay these 15 configs verbatim)
for seed in ${SWEEP_BATTERY_SEED:-${SEEDS%% *}}; do
  run "tree-foreign-$seed" env TREE_DIFF_SEED=$seed TREE_DIFF_PROFILE=foreign python3 scripts/conformance/tree_diff.py
  run "tree-decl-$seed"    env TREE_DIFF_SEED=$seed TREE_DIFF_PROFILE=decl python3 scripts/conformance/tree_diff.py
  run "tree-tables-$seed"  env TREE_DIFF_SEED=$seed TREE_DIFF_PROFILE=tables python3 scripts/conformance/tree_diff.py
  run "tree-afe-$seed"     env TREE_DIFF_SEED=$seed TREE_DIFF_PROFILE=afe python3 scripts/conformance/tree_diff.py
  run "tree-headframes-$seed" env TREE_DIFF_SEED=$seed TREE_DIFF_PROFILE=headframes python3 scripts/conformance/tree_diff.py
  run "frag-foreign-$seed" env FRAG_DIFF_SEED=$seed FRAG_DIFF_PROFILE=foreign python3 scripts/conformance/fragment_diff.py
  run "frag-tables-$seed"  env FRAG_DIFF_SEED=$seed FRAG_DIFF_PROFILE=tables python3 scripts/conformance/fragment_diff.py
  run "frag-afe-$seed"     env FRAG_DIFF_SEED=$seed FRAG_DIFF_PROFILE=afe python3 scripts/conformance/fragment_diff.py
  run "extract-unicode-$seed" env EXTRACT_DIFF_SEED=$seed EXTRACT_DIFF_PROFILE=unicode python3 scripts/conformance/extract_diff.py
  run "extract-hidden-$seed"  env EXTRACT_DIFF_SEED=$seed EXTRACT_DIFF_PROFILE=hidden python3 scripts/conformance/extract_diff.py
  run "extract-controls-$seed" env EXTRACT_DIFF_SEED=$seed EXTRACT_DIFF_PROFILE=controls python3 scripts/conformance/extract_diff.py
  run "extract-prewrap-$seed" env EXTRACT_DIFF_SEED=$seed EXTRACT_DIFF_PROFILE=prewrap python3 scripts/conformance/extract_diff.py
  # (select/entattr/quirks arms already run per-seed above — not repeated)
done

echo "sweep complete: $fails failing runs"
[ "$fails" -eq 0 ]
