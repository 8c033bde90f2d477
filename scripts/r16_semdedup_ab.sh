#!/bin/bash
# Round-16 evidence matrix for the learned-cell (v13/SemDeDup) blocker:
#  - x100x64 twin fixture: FLAT vs HIER A/B — digest-exact dumps of both
#    arms + planted-twin recall rows. x100 is where the flat arm is still
#    runnable (at x1000 flat Lloyd was measured STUCK: killed 55 min into
#    pass 1 of 4 — the n·K = 3.5e10-expansion wall the two-level design
#    removes).
#  - x1000 (both dims): the AUTO operator (= hier past K=1024) — dump +
#    plain-JVM digest + recall.
# Classes: target/r16cls5 (refreshed snapshot of HEAD at run time).
# Usage: r16_semdedup_ab.sh <ab100|1000d64|1000d384>
set -u
cd /root/repo
MODE="${1:?usage: r16_semdedup_ab.sh <ab100|1000d64|1000d384>}"
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

case "$MODE" in
  ab100)
    FIX=target/sfdvt100
    [ -d "$FIX/embeddings.parquet" ] || \
      run graft.ScaleProbe /root/testdata/sf0.1 "$FIX" x 100 dvt 64
    run graft.SixthDecade "$FIX" target/r16_sem100 v13flat_auto
    run graft.IndependentVerify "$FIX" target/r16_sem100 v13flat_auto
    run graft.SixthDecade "$FIX" target/r16_sem100 v13hier_auto
    run graft.IndependentVerify "$FIX" target/r16_sem100 v13hier_auto
    run graft.RpRecallProbe "$FIX" dump target/r16_sem100/v13flat_auto
    run graft.RpRecallProbe "$FIX" dump target/r16_sem100/v13hier_auto
    ;;
  1000d64)
    FIX=target/sfdvt1000
    [ -d "$FIX/embeddings.parquet" ] || \
      run graft.ScaleProbe /root/testdata/sf0.1 "$FIX" x 1000 dvt 64
    run graft.SixthDecade "$FIX" target/r16_sem1000 v13_auto
    run graft.IndependentVerify "$FIX" target/r16_sem1000 v13_auto
    run graft.RpRecallProbe "$FIX" dump target/r16_sem1000/v13_auto
    ;;
  1000d384)
    FIX=target/sfdvt1000d384
    [ -d "$FIX/embeddings.parquet" ] || \
      run graft.ScaleProbe /root/testdata/sf0.1 "$FIX" x 1000 dvt 384
    run graft.SixthDecade "$FIX" target/r16_sem1000d384 v13_auto
    run graft.IndependentVerify "$FIX" target/r16_sem1000d384 v13_auto
    run graft.RpRecallProbe "$FIX" dump target/r16_sem1000d384/v13_auto
    ;;
  *) echo "unknown mode $MODE"; exit 2 ;;
esac
step "ALL DONE $MODE"
