#!/bin/bash
# Run a graft main class outside sbt with the Spark add-opens flags.
# Usage: tools/run_tool.sh <MainClass> [args...]
# The classpath is derived from this script's own location so the
# helper always runs the checkout it lives in, never a stale sibling.
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$ROOT/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
