#!/usr/bin/env bash
# Run a graft main class with plain `java` against a SNAPSHOT of the
# compiled classes (so concurrent `sbt compile` of new code can't swap
# class files under a running JVM) — keeps the sbt build lock free
# while multi-minute rehearsal jobs (ScaleGen/Verify/Bench/StreamScale)
# run in the background. Mirrors build.sbt's forked-run JVM flags.
#
# Usage: CLS_SNAP=/tmp/graft_cls scripts/java_run.sh <mainClass> [args...]
set -euo pipefail
SNAP="${CLS_SNAP:-/tmp/graft_cls}"
if [ ! -d "$SNAP" ]; then
  mkdir -p "$SNAP"
  cp -r /root/repo/target/scala-2.13/classes/. "$SNAP/"
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$SNAP:/opt/spark/jars/*" "$@"
