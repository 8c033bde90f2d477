#!/bin/bash
# Round-16 x1000 evidence for the LEARNED-CELL near-dup blocker (v13,
# SemDeDup shape): dump + plain-JVM digest + planted-twin recall rows on
# the same twin fixtures the v12/v3 recall table used — so the three
# blocking designs (fixed-band survey, n^rho-band LSH, learned cells)
# carry directly comparable full-scale numbers.
# Classes: target/r16cls5 (snapshot of HEAD at run time).
# Usage: r16_semdedup1000.sh <64|384>
set -u
cd /root/repo
DIM="${1:?usage: r16_semdedup1000.sh <64|384>}"
case "$DIM" in
  64)  FIX=target/sfdvt1000 ;     OUT=target/r16_sem1000 ;;
  384) FIX=target/sfdvt1000d384 ; OUT=target/r16_sem1000d384 ;;
  *) echo "dim must be 64 or 384"; exit 2 ;;
esac
export SPARK_GRAFT_CPUS=16 SPARK_GRAFT_SHUFFLE=200 SPARK_GRAFT_VERIFY_PARTS=16

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

T0=$(date +%s)
step() { echo "=== [$(( $(date +%s) - T0 ))s] $*"; }
run() {
  step "$*"
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx48g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Duser.timezone=UTC -Duser.language=en -Duser.country=US \
    -cp "/root/repo/target/r16cls5:/opt/spark/jars/*" "$@" \
    || { step "FAILED: $*"; exit 1; }
}

# synthesize the twin fixture (deterministic; skip if already present)
[ -d "$FIX/embeddings.parquet" ] || \
  run graft.ScaleProbe /root/testdata/sf0.1 "$FIX" x 1000 dvt "$DIM"

# dump -> independent digest -> recall vs planted truth
run graft.SixthDecade "$FIX" "$OUT" v13_auto
run graft.IndependentVerify "$FIX" "$OUT" v13_auto
run graft.RpRecallProbe "$FIX" dump "$OUT/v13_auto"
step "ALL DONE dim=$DIM"
