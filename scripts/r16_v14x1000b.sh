#!/bin/bash
# v14_auto at the sixth decade, PRODUCTION DIM (384): retention over the
# policy front door dedup-band arm (sem blocker, hier) at x1000x384,
# dumped and digest-checked by the plain-JVM replay. Gate first.
# Classes: target/r16cls9 (HEAD snapshot).
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
    -cp "/root/repo/target/r16cls9:/opt/spark/jars/*" "$@" \
    || { step "FAILED: $*"; exit 1; }
}

run graft.OccupancyGate target/sfdvt1000d384 4 500
run graft.SixthDecade target/sfdvt1000d384 target/r16_v14x1000d384 v14_auto
run graft.IndependentVerify target/sfdvt1000d384 target/r16_v14x1000d384 v14_auto
step "ALL DONE"
