#!/bin/bash
# Continuation of scripts/r16_recall1000.sh after the IV rnd(-Inf) fix
# (checkSketchPairs rounded an abandoned pair's -Infinity at 384-dim —
# the x64 arm has no suffix checkpoints, so only the 384 arm could hit
# it): redo the x384 IV digest, then the four recall rows. Dumps already
# landed (target/r16_sdt1000*, digest-exact at x64).
# Classes: target/r16cls4 (snapshot of HEAD after the fix).
set -u
cd /root/repo
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
    -cp "/root/repo/target/r16cls4:/opt/spark/jars/*" "$@" \
    || { step "FAILED: $*"; exit 1; }
}
run graft.IndependentVerify target/sfdvt1000d384 target/r16_sdt1000d384 v12_auto
run graft.RpRecallProbe target/sfdvt1000 v3
run graft.RpRecallProbe target/sfdvt1000 dump target/r16_sdt1000/v12_auto
run graft.RpRecallProbe target/sfdvt1000d384 v3
run graft.RpRecallProbe target/sfdvt1000d384 dump target/r16_sdt1000d384/v12_auto
step "ALL DONE"
