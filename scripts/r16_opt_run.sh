#!/bin/bash
# Optimization-round helper: run any graft main class plain-java against
# the compiled classes (no sbt startup, raw stdout). Usage:
#   scripts/r16_opt_run.sh graft.QueryProbe v13_semdedup_pairs /root/testdata/sf0.1 7
# Env: SPARK_GRAFT_CPUS (default 32), JVM heap via SPARK_DRIVER_MEM.
set -u
cd /root/repo
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

# shellcheck disable=SC2086
exec java $ADD_OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Duser.timezone=UTC -Duser.language=en -Duser.country=US \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
