#!/usr/bin/env bash
# Same-box bench A/B: round-start binary vs HEAD, interleaved reps.
#
# The cross-round bench table compares this round's box against last
# round's box; shared machines drift (round 5 adjudicated a ~1.15×
# mid-session slowdown by hand). This tool makes the adjudication
# mechanical: build BOTH the base commit (in a detached git worktree)
# and HEAD, run the full Bench main alternately base,head,base,head,…
# so every rep pair shares the same box minutes, then let graft.BenchAb
# compute per-query min ratios, the median ratio (the box factor), and
# the box-corrected norm ratios — anything >1.25× after correction is a
# code-attributable regression.
#
# Usage: tools/bench_ab.sh <base-commit> [reps=3] [sfdir=/root/testdata/sf0.1] [out=BENCH_AB.json]
set -euo pipefail

BASE_REV=${1:?usage: bench_ab.sh <base-commit> [reps] [sfdir] [out]}
REPS=${2:-3}
SFDIR=${3:-/root/testdata/sf0.1}
OUT=${4:-BENCH_AB.json}

REPO=$(git rev-parse --show-toplevel)
HEAD_REV=$(git -C "$REPO" rev-parse --short HEAD)
BASE_SHORT=$(git -C "$REPO" rev-parse --short "$BASE_REV")
WT=/tmp/graft_ab_base
SCRATCH=$(mktemp -d /tmp/graft_ab.XXXXXX)
CP_JARS="/opt/spark/jars/*"

echo "[ab] base=$BASE_SHORT head=$HEAD_REV reps=$REPS sf=$SFDIR" >&2

git -C "$REPO" worktree remove --force "$WT" 2>/dev/null || true
rm -rf "$WT"
git -C "$REPO" worktree add --detach "$WT" "$BASE_REV" >&2

echo "[ab] building base…" >&2
(cd "$WT" && sbt -batch compile >/dev/null)
echo "[ab] building head…" >&2
(cd "$REPO" && sbt -batch compile >/dev/null)

BASE_CP="$WT/target/scala-2.13/classes:$CP_JARS"
HEAD_CP="$REPO/target/scala-2.13/classes:$CP_JARS"

run_side() { # $1 classpath, $2 out jsonl
  SPARK_GRAFT_SF_DIR="$SFDIR" \
  SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_OUT="$SCRATCH/last.json" \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-4}" \
    java -Xmx16g -cp "$1" \
      --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
      --add-opens java.base/java.nio=ALL-UNNAMED \
      --add-opens java.base/java.util=ALL-UNNAMED \
      --add-opens java.base/java.lang=ALL-UNNAMED \
      --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
      graft.Bench 2>/dev/null | grep '"queries"' >> "$2"
}

for i in $(seq 1 "$REPS"); do
  echo "[ab] rep $i/$REPS base…" >&2
  run_side "$BASE_CP" "$SCRATCH/base.jsonl"
  echo "[ab] rep $i/$REPS head…" >&2
  run_side "$HEAD_CP" "$SCRATCH/head.jsonl"
done

java -cp "$HEAD_CP" graft.BenchAb \
  "$SCRATCH/base.jsonl" "$SCRATCH/head.jsonl" "$BASE_SHORT" "$HEAD_REV" \
  | tee "$OUT"

# Mechanized flag adjudication (VERDICT r12 item 3): every MATERIAL
# flag (norm > 1.25 with base >= 1 s — BenchAb already routes
# sub-second flags to below_resolution) gets an automatic focused
# 5-rep interleaved re-run; the artifact pair is fully adjudicated by
# construction. The focused result lands next to OUT as *_flagged.json.
FLAGS=$(python3 -c "
import json,sys
d=json.load(open('$OUT'))
print(','.join(d.get('code_regressions_norm_gt_1.25',[])))" 2>/dev/null || true)
if [ -n "$FLAGS" ]; then
  echo "[ab] material flags: $FLAGS — focused 5-rep re-run…" >&2
  : > "$SCRATCH/fbase.jsonl"; : > "$SCRATCH/fhead.jsonl"
  for i in 1 2 3 4 5; do
    echo "[ab] focused rep $i/5 base…" >&2
    SPARK_GRAFT_BENCH_QUERIES="$FLAGS" run_side "$BASE_CP" "$SCRATCH/fbase.jsonl"
    echo "[ab] focused rep $i/5 head…" >&2
    SPARK_GRAFT_BENCH_QUERIES="$FLAGS" run_side "$HEAD_CP" "$SCRATCH/fhead.jsonl"
  done
  FOUT="${OUT%.json}_flagged.json"
  java -cp "$HEAD_CP" graft.BenchAb \
    "$SCRATCH/fbase.jsonl" "$SCRATCH/fhead.jsonl" "$BASE_SHORT" "$HEAD_REV" \
    | tee "$FOUT"
  echo "[ab] wrote $FOUT" >&2
fi

git -C "$REPO" worktree remove --force "$WT" >&2 || true
rm -rf "$SCRATCH"
echo "[ab] wrote $OUT" >&2
