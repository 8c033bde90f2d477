#!/bin/bash
# Round-16 item: A/B the banded self-join strategy at x1000 — sort-merge
# (the SkewProbe-pinned default) vs shuffle_hash (AQE skew-split covers
# SHJ too; the build side is the same banded exchange). One dump per arm
# on each dim fixture; digests are plan-independent so output equality is
# already covered by the r16 bucket-local A/B digests.
# Classes: target/r16cls3.
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
    -cp "/root/repo/target/r16cls3:/opt/spark/jars/*" "$@" \
    || { step "FAILED: $*"; exit 1; }
}
run graft.SixthDecade target/sfdv1000 target/r16_shj64 v3_auto
run -Dgraft.bandedJoinHint=shuffle_hash graft.SixthDecade target/sfdv1000 \
  target/r16_shj64b v3_auto
run graft.SixthDecade target/sfdv1000d384 target/r16_shj384 v3_auto
run -Dgraft.bandedJoinHint=shuffle_hash graft.SixthDecade target/sfdv1000d384 \
  target/r16_shj384b v3_auto
step "ALL DONE"
