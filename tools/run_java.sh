#!/bin/bash
# Plain-java launcher for graft mains (dev sittings): same JDK17
# --add-opens set as build.sbt, classpath = compiled classes +
# /opt/spark/jars. Usage: run_java.sh <heap> <mainClass> [args...]
HEAP="$1"; shift
MAIN="$1"; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx"$HEAP" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
