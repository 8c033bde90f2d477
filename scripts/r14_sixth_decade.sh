#!/bin/bash
# Round-14 sixth-decade evidence runs: the operating points SURVEY's
# round-14 rows claim, executed end to end on this machine so BASELINE §5
# records measured numbers, not projections.
#   x10 smoke  (dim 64):  all six autos (self-test, catches env drift)
#   x10 smoke  (dim 384): v3/v6 (validates the dim-aware path cheaply)
#   x1000 dim64:  v4_auto (TopKRows heap path), dd6w_auto (wide simhash),
#                 dd5_auto (bucket-centric recompute)
#   x1000 dim384: v3_auto, v6_auto (the dimensionality-law measurement)
# Runs on a FROZEN class snapshot (target/r14cls) via plain java so sbt
# stays free for parallel compile/test work.
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

run graft.ScaleProbe /root/testdata/sf0.1 target/sfdv_smoke - 10 dv 64
run graft.SixthDecade target/sfdv_smoke target/sd10 v3_auto,v6_auto,v8_auto,v4_auto,dd5_auto,dd6w_auto
run graft.IndependentVerify target/sfdv_smoke target/sd10 v3_auto,v6_auto,v8_auto,v4_auto,dd5_auto,dd6w_auto

run graft.ScaleProbe /root/testdata/sf0.1 target/sfdv_smoke384 - 10 dv 384
run graft.SixthDecade target/sfdv_smoke384 target/sd10d384 v3_auto,v6_auto
run graft.IndependentVerify target/sfdv_smoke384 target/sd10d384 v3_auto,v6_auto

run graft.ScaleProbe /root/testdata/sf0.1 target/sfdv1000 - 1000 dv 64
run graft.SixthDecade target/sfdv1000 target/sd1000 v4_auto,dd6w_auto
run graft.IndependentVerify target/sfdv1000 target/sd1000 v4_auto,dd6w_auto
run graft.SixthDecade target/sfdv1000 target/sd1000 dd5_auto
run graft.IndependentVerify target/sfdv1000 target/sd1000 dd5_auto

run graft.ScaleProbe /root/testdata/sf0.1 target/sfdv1000d384 - 1000 dv 384
run graft.SixthDecade target/sfdv1000d384 target/sd1000d384 v3_auto,v6_auto
run graft.IndependentVerify target/sfdv1000d384 target/sd1000d384 v3_auto,v6_auto
step "ALL DONE"
