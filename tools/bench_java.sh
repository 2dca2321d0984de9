#!/bin/bash
# Direct-java launcher for graft mains — the quiet-box bench capture path.
# sbt's own startup pushes the 1-min loadavg over 1.0, so BENCH_FULL.json
# (which refuses to overwrite itself at loadavg >= 1) must be captured by
# launching the JVM directly. The add-opens list is Spark 4.1's own
# JavaModuleOptions set — WITHOUT it, createexternalrow decoding fails
# silently on the recursive-CTE queries (EXPRESSION_DECODING_FAILED, r11).
#
# Usage: tools/bench_java.sh [mainClass] [args...]
#   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_OUT_DIR respected as usual.
# Build first: sbt compile (classes are read from target/scala-2.13/classes).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MAIN="${1:-graft.Bench}"
shift || true
exec java \
  -XX:+IgnoreUnrecognizedVMOptions \
  --add-modules=jdk.incubator.vector \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  --add-opens=java.security.jgss/sun.security.krb5=ALL-UNNAMED \
  -Djdk.reflect.useDirectMethodHandle=false \
  -Dio.netty.tryReflectionSetAccessible=true \
  -Dio.netty.allocator.type=pooled \
  --enable-native-access=ALL-UNNAMED \
  -Xmx100g \
  -Dderby.system.home=/tmp/derby \
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
