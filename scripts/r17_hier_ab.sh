#!/bin/bash
# Round-17 A/B for the fused two-level (hier) kmeans membership:
#  - OLD = round-start classes (f0cdcbf worktree, composed broadcast-join
#    phases) vs NEW = HEAD classes (RDD-hosted B/C + HierTopCells phase D)
#    on the SAME ×N twin fixture, same box, back to back.
#  - digest gate: IndependentVerify's plain-JVM recompute on the NEW dump
#    (bit-exactness at scale), plus a direct old-vs-new dump diff.
# Usage: r17_hier_ab.sh <ab100|1000d384|1000d384new> [oldClassDir]
set -u
cd /root/repo
MODE="${1:?usage: r17_hier_ab.sh <ab100|1000d384|1000d384new>}"
OLDCLS="${2:-/tmp/r17base/target/scala-2.13/classes}"
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
  local CLS="$1"; shift
  step "($CLS) $*"
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx48g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Duser.timezone=UTC -Duser.language=en -Duser.country=US \
    -cp "$CLS:/opt/spark/jars/*" "$@" \
    || { step "FAILED: $*"; exit 1; }
}
NEWCLS=/root/repo/target/scala-2.13/classes

case "$MODE" in
  ab100)
    FIX=target/sfdvt100
    [ -d "$FIX/embeddings.parquet" ] || \
      run "$NEWCLS" graft.ScaleProbe /root/testdata/sf0.1 "$FIX" x 100 dvt 64
    run "$OLDCLS" graft.SixthDecade "$FIX" target/r17_sem100_old v13hier_auto
    run "$NEWCLS" graft.SixthDecade "$FIX" target/r17_sem100_new v13hier_auto
    run "$NEWCLS" graft.IndependentVerify "$FIX" target/r17_sem100_new v13hier_auto
    ;;
  1000d384)
    FIX=target/sfdvt1000d384
    [ -d "$FIX/embeddings.parquet" ] || \
      run "$NEWCLS" graft.ScaleProbe /root/testdata/sf0.1 "$FIX" x 1000 dvt 384
    run "$OLDCLS" graft.SixthDecade "$FIX" target/r17_sem1000d384_old v13_auto
    run "$NEWCLS" graft.SixthDecade "$FIX" target/r17_sem1000d384_new v13_auto
    run "$NEWCLS" graft.IndependentVerify "$FIX" target/r17_sem1000d384_new v13_auto
    ;;
  1000d384new)
    # NEW arm + digest only (the old arm's 1,592 s is on record in
    # BASELINE.md; rerun it with MODE=1000d384 when the wall-clock budget
    # allows a same-box before number)
    FIX=target/sfdvt1000d384
    [ -d "$FIX/embeddings.parquet" ] || \
      run "$NEWCLS" graft.ScaleProbe /root/testdata/sf0.1 "$FIX" x 1000 dvt 384
    run "$NEWCLS" graft.SixthDecade "$FIX" target/r17_sem1000d384_new v13_auto
    run "$NEWCLS" graft.IndependentVerify "$FIX" target/r17_sem1000d384_new v13_auto
    ;;
esac
step "done ($MODE)"
