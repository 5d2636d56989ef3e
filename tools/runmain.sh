#!/bin/bash
# Plain-JVM runner for graft mains (bypasses sbt log interleaving).
# JVM flags mirror build.sbt's `javaOptions` so numbers are comparable
# with sbt-launched runs: 24g heap (SPARK_DRIVER_MEM), 1g code cache
# (whole-stage codegen floods the default 240m and silently disables
# the JIT), JDK17 add-opens for Spark 4 outside spark-submit.
# usage: runmain.sh <mainClass> [args...]
CP=$(cat /tmp/cp.txt)
exec java "-Xmx${SPARK_DRIVER_MEM:-24g}" \
  -XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "$CP" "$@"
