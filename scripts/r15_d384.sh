#!/bin/bash
# Round-15: the x1000x384 digest — v3_auto/v6_auto at 2M vectors,
# dim 384, under the dim-aware operating point
# (OperatingPoint.rpPlanesPerBand, commit 7d24965). Fixtures were
# synthesized by the r14 run (ScaleProbe synthDv is deterministic);
# dump via SixthDecade, then plain-JVM digest recompute via
# IndependentVerify. Classes: target/r15cls (snapshot of HEAD).
set -u
cd /root/repo
export SPARK_GRAFT_CPUS=16 SPARK_GRAFT_SHUFFLE=200 SPARK_GRAFT_VERIFY_PARTS=16

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
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
    -cp "/root/repo/target/r15cls3:/opt/spark/jars/*" "$@" \
    || { step "FAILED: $*"; exit 1; }
}

run graft.SixthDecade target/sfdv1000d384 target/sd1000d384 v3_auto,v6_auto
run graft.IndependentVerify target/sfdv1000d384 target/sd1000d384 v3_auto,v6_auto
step "ALL DONE"
