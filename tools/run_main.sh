#!/bin/bash
# Run a graft main directly against the compiled classes + /opt/spark/jars,
# with the JDK17 --add-opens set sbt's javaOptions would inject (without
# them Spark 4 falls back to slow non-Unsafe paths and numbers are NOT
# comparable to the driver's). Usage:
#   tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/out [names]
#   SPARK_GRAFT_SF_DIR=... tools/run_main.sh graft.Bench
# Unlike `sbt "runMain ..."`, this takes no project lock, so it can run
# while a long `sbt test` holds it. Compile first: sbt -batch compile.
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=""
for m in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent \
         java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
         java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $m=ALL-UNNAMED"
done
# Committed+pre-touched heap floor (capped 32g): match build.sbt's
# javaOptions — a lazily committed large heap page-fault/resize-thrashes
# under G1 (2-3x measured on step-heavy queries at 89g), while pre-touching
# the FULL 89g grant OOM-killed the sandbox; numbers without these flags
# are NOT comparable.
MEM="${SPARK_DRIVER_MEM:-8g}"
N="${MEM//[!0-9]/}"
case "$MEM" in
  *g|*G) MB=$((N * 1024));;
  *m|*M) MB=$N;;
  *) MB=$((N / 1048576));;
esac
XMS_MB=$(( MB < 32768 ? MB : 32768 ))
exec java -cp "target/scala-2.13/classes:/opt/spark/jars/*" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"$MEM" -Xms"${XMS_MB}m" -XX:+AlwaysPreTouch "$@"
