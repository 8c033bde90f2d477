#!/bin/bash
# Round-16 occupancy-dial measurement: the learned-cell blocker's
# recall-vs-candidates trade (semDedupPairsAuto targetOccupancy), measured
# against planted-twin truth on the x10 twin fixtures at both dims.
# BASELINE's "the knob is occupancy c" claim, as numbers: candidates
# ~ 2c*n (printed by the probe) vs >=0.8-band recall at c in
# {64, 128 (default), 192, 240 (the gate ceiling; 250 measured 504*n, over the 500*n gate)}.
# Classes: target/r16cls6 (snapshot of HEAD at run time).
set -u
cd /root/repo
export SPARK_GRAFT_CPUS=16 SPARK_GRAFT_SHUFFLE=64

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
  java $ADD_OPENS -Xmx24g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Duser.timezone=UTC -Duser.language=en -Duser.country=US \
    -cp "/root/repo/target/r16cls6:/opt/spark/jars/*" "$@" \
    || { step "FAILED: $*"; exit 1; }
}

for dir in target/sfdvt_smoke target/sfdvt_smoke384; do
  for c in 64 128 192 240; do
    run graft.RpRecallProbe "$dir" "semflat:$c"
  done
done
step "ALL DONE"
