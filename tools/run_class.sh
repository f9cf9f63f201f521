#!/bin/bash
# Run a compiled graft main class directly (no sbt startup): same
# JVM flags as build.sbt's forked run. Usage:
#   tools/run_class.sh graft.Profile p189 p177
# Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_DRIVER_MEM honored.
set -euo pipefail
cd "$(dirname "$0")/.."
CLS=${1:?main class}; shift || true
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS ${EXTRA_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:$(ls -d /opt/spark/jars/* | tr '\n' ':')" \
  "$CLS" "$@"
