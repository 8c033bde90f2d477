#!/bin/bash
# Round-14 sixth-decade evidence runs: the operating points SURVEY's
# round-14 rows claim, executed end to end on this machine so BASELINE §5
# records measured numbers, not projections.
#   x10 smoke  (dim 64):  all six autos (self-test, catches env drift)
#   x10 smoke  (dim 384): v3/v6 (validates the dim-aware path cheaply)
#   x1000 dim64:  v4_auto (TopKRows heap path), dd5_auto (bucket-centric
#                 recompute), dd6w_auto (wide-fingerprint simhash)
#   x1000 dim384: v3_auto, v6_auto (the dimensionality-law measurement)
set -u
cd /root/repo
export SPARK_GRAFT_CPUS=16 SPARK_GRAFT_SHUFFLE=200 SPARK_GRAFT_VERIFY_PARTS=16
export SPARK_DRIVER_MEM=48g
T0=$(date +%s)
step() { echo "=== [$(( $(date +%s) - T0 ))s] $*"; }
run() { step "$*"; sbt -batch "$*" < /dev/null || { step "FAILED: $*"; exit 1; }; }

run "runMain graft.ScaleProbe /root/testdata/sf0.1 target/sfdv_smoke - 10 dv 64"
run "runMain graft.SixthDecade target/sfdv_smoke target/sd10 v3_auto,v6_auto,v8_auto,v4_auto,dd5_auto,dd6w_auto"
run "runMain graft.IndependentVerify target/sfdv_smoke target/sd10 v3_auto,v6_auto,v8_auto,v4_auto,dd5_auto,dd6w_auto"

run "runMain graft.ScaleProbe /root/testdata/sf0.1 target/sfdv_smoke384 - 10 dv 384"
run "runMain graft.SixthDecade target/sfdv_smoke384 target/sd10d384 v3_auto,v6_auto"
run "runMain graft.IndependentVerify target/sfdv_smoke384 target/sd10d384 v3_auto,v6_auto"

run "runMain graft.ScaleProbe /root/testdata/sf0.1 target/sfdv1000 - 1000 dv 64"
run "runMain graft.SixthDecade target/sfdv1000 target/sd1000 v4_auto,dd6w_auto"
run "runMain graft.IndependentVerify target/sfdv1000 target/sd1000 v4_auto,dd6w_auto"
run "runMain graft.SixthDecade target/sfdv1000 target/sd1000 dd5_auto"
run "runMain graft.IndependentVerify target/sfdv1000 target/sd1000 dd5_auto"

run "runMain graft.ScaleProbe /root/testdata/sf0.1 target/sfdv1000d384 - 1000 dv 384"
run "runMain graft.SixthDecade target/sfdv1000d384 target/sd1000d384 v3_auto,v6_auto"
run "runMain graft.IndependentVerify target/sfdv1000d384 target/sd1000d384 v3_auto,v6_auto"
step "ALL DONE"
