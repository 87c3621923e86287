#!/bin/bash
# Run a graft main class from a SNAPSHOT of the compiled classes,
# decoupled from sbt's target dir — long runs (Verify at sf0.1, Bench,
# ScaleProbe) would otherwise race concurrent `sbt compile`s, which
# rewrite class files mid-run and can NoSuchMethodError a lazily-loaded
# class. Usage: tools/run_main.sh <MainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g), SNAP (snapshot dir override).
set -e
MAIN=$1; shift
SNAP=${SNAP:-$(mktemp -d /tmp/graft_snap.XXXXXX)}
mkdir -p "$SNAP"
cp -r /root/repo/target/scala-2.13/classes/. "$SNAP"/
exec java \
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
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$SNAP:/opt/spark/jars/*" "graft.$MAIN" "$@"
