#!/bin/bash
# Resume of scripts/r14_sixth_decade.sh after the dd6w_auto x1000
# recompute OOM (fixed: first-collision chunk dedup in primitive
# buffers). Skips the steps that already landed: x10 smokes (dim 64 +
# 384), x1000 synth, x1000 v4_auto/dd6w_auto dumps, x1000 v4_auto IV.
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
    -cp "/root/repo/target/r14cls:/opt/spark/jars/*" "$@" \
    || { step "FAILED: $*"; exit 1; }
}

run graft.IndependentVerify target/sfdv1000 target/sd1000 dd6w_auto
run graft.SixthDecade target/sfdv1000 target/sd1000 dd5_auto
run graft.IndependentVerify target/sfdv1000 target/sd1000 dd5_auto

run graft.ScaleProbe /root/testdata/sf0.1 target/sfdv1000d384 - 1000 dv 384
run graft.SixthDecade target/sfdv1000d384 target/sd1000d384 v3_auto,v6_auto
run graft.IndependentVerify target/sfdv1000d384 target/sd1000d384 v3_auto,v6_auto
step "ALL DONE"
