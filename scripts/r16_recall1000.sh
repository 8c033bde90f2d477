#!/bin/bash
# Round-16 x1000 recall + digest sweep on the TWIN fixtures (planted
# high-sim pairs — ScaleProbe dvt): the measured answer to "what is the
# AUTO RP blocking's recall at the >=0.8 dedup band at x1000", and the
# digest + recall evidence for the recall-targeted v12 operating point
# (nearDupPairsHighSim). The occupancy gate runs FIRST on each fixture —
# the sweep self-checks the blocking math before any long dump (verdict
# item #5; exit nonzero on blowout).
# Classes: target/r16cls3 (snapshot of HEAD at run time).
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

# synthesize the twin fixtures (deterministic; skip if already present)
[ -d target/sfdvt1000/embeddings.parquet ] || \
  run graft.ScaleProbe /root/testdata/sf0.1 target/sfdvt1000 x 1000 dvt 64
[ -d target/sfdvt1000d384/embeddings.parquet ] || \
  run graft.ScaleProbe /root/testdata/sf0.1 target/sfdvt1000d384 x 1000 dvt 384

# occupancy self-check BEFORE any dump (fails the sweep in minutes, not hours)
run graft.OccupancyGate target/sfdvt1000 4 500
run graft.OccupancyGate target/sfdvt1000d384 4 500

# v12 (high-sim) dumps + plain-JVM digests on both dims
run graft.SixthDecade target/sfdvt1000 target/r16_sdt1000 v12_auto
run graft.IndependentVerify target/sfdvt1000 target/r16_sdt1000 v12_auto
run graft.SixthDecade target/sfdvt1000d384 target/r16_sdt1000d384 v12_auto
run graft.IndependentVerify target/sfdvt1000d384 target/r16_sdt1000d384 v12_auto

# recall vs planted truth: the v3 survey point (recall decays by design —
# the number the verdict asked to see measured) and the v12 target point
run graft.RpRecallProbe target/sfdvt1000 v3
run graft.RpRecallProbe target/sfdvt1000 dump target/r16_sdt1000/v12_auto
run graft.RpRecallProbe target/sfdvt1000d384 v3
run graft.RpRecallProbe target/sfdvt1000d384 dump target/r16_sdt1000d384/v12_auto
step "ALL DONE"
