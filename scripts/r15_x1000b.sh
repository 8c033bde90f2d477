#!/bin/bash
# Continuation of scripts/r15_x1000.sh after the IV maxResultSize fix:
# the x1000x384 dumps already landed (target/r15_sd1000d384); redo IV,
# then the x1000x64 arm end to end.
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
    -cp "/root/repo/target/r15cls4:/opt/spark/jars/*" "$@" \
    || { step "FAILED: $*"; exit 1; }
}
run graft.IndependentVerify target/sfdv1000d384 target/r15_sd1000d384 v3_auto,v6_auto
run graft.SixthDecade target/sfdv1000 target/r15_sd1000 v3_auto,v6_auto,v8_auto,dd5_auto
run graft.IndependentVerify target/sfdv1000 target/r15_sd1000 v3_auto,v6_auto,v8_auto,dd5_auto
step "ALL DONE"
