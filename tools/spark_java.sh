#!/usr/bin/env bash
# Run a graft main class on the bare JVM (faster iteration than sbt runMain)
# with the SAME JDK-17 --add-opens set build.sbt gives forked runs. Without
# these, Spark 4.x fails on reflective access: kryo "Unable to create
# serializer ... HeapByteBuffer" (Dataset kryo encoders) and
# EXPRESSION_DECODING_FAILED on java.sql.Date decoding are the two
# symptoms we hit — both environmental, not query bugs.
#
# Usage: tools/spark_java.sh graft.Verify /root/testdata/sf0.01 /tmp/out
set -euo pipefail
cd "$(dirname "$0")/.."
JAR=target/scala-2.13/timescalecdcspark_2.13-0.1.0.jar
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -cp "$JAR:/opt/spark/jars/*" "$@"
