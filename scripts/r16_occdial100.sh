#!/bin/bash
# Occupancy dial at SCALE: does "finer cells win at the production dim"
# (the x10 finding) survive a decade of corpus growth? x100x384 twin
# fixture, two-level arm, c=64 vs c=128 — recall vs planted truth plus
# the measured candidate bill. Classes: target/r16cls7 (HEAD snapshot).
set -u
cd /root/repo
export SPARK_GRAFT_CPUS=16 SPARK_GRAFT_SHUFFLE=200

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
    -cp "/root/repo/target/r16cls7:/opt/spark/jars/*" "$@" \
    || { step "FAILED: $*"; exit 1; }
}

[ -d target/sfdvt100d384/embeddings.parquet ] || \
  run graft.ScaleProbe /root/testdata/sf0.1 target/sfdvt100d384 x 100 dvt 384

run graft.RpRecallProbe target/sfdvt100d384 semhier:128
run graft.RpRecallProbe target/sfdvt100d384 semhier:64
step "ALL DONE"
