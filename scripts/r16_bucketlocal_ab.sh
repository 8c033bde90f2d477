#!/bin/bash
# Round-16 A/B: bucket-local pair enumeration (BucketPairs generator) vs
# the legacy banded self-join, on the x1000 RP-LSH arms. The r15 close-out
# profile pinned the join arm's remaining cost as candidate-row
# materialization (5.6e8 rows x two ~3KB vectors ~ 3.5 TB of UnsafeRow
# writes at x1000x384); the bucket-local arm moves each vector exactly
# once into its (band, key) group and enumerates pairs inside the
# generator. Output sets are identical by construction — IndependentVerify
# recomputes the digests for the NEW plan on both fixtures, making this a
# full-scale invariance A/B like r15's round6 run.
# Classes: target/r16cls1 (snapshot of HEAD at run time).
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
    -cp "/root/repo/target/r16cls1:/opt/spark/jars/*" "$@" \
    || { step "FAILED: $*"; exit 1; }
}

# x1000x384: the profiled arm. Bucket-local (default) then legacy join.
run graft.SixthDecade target/sfdv1000d384 target/r16_sd1000d384 v3_auto,v6_auto
run -Dgraft.bucketLocal=false graft.SixthDecade target/sfdv1000d384 \
  target/r16_sd1000d384_join v3_auto
# digest the NEW plan's dumps (IV recompute is plan-independent)
run graft.IndependentVerify target/sfdv1000d384 target/r16_sd1000d384 v3_auto,v6_auto

# x1000x64: the high-candidate arm (62M pairs)
run graft.SixthDecade target/sfdv1000 target/r16_sd1000 v3_auto,v6_auto,v8_auto
run -Dgraft.bucketLocal=false graft.SixthDecade target/sfdv1000 \
  target/r16_sd1000_join v3_auto
run graft.IndependentVerify target/sfdv1000 target/r16_sd1000 v3_auto,v6_auto,v8_auto
step "ALL DONE"
