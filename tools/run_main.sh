#!/bin/bash
# Direct-JVM runner for graft mains — same JVM posture as build.sbt's
# forked run (add-opens, UTC, Xmx from SPARK_DRIVER_MEM) but without sbt
# startup/locking, so bench iteration and a concurrent editor don't fight
# over the project lock. Usage: tools/run_main.sh graft.Bench [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -cp "$CP" "$@"
