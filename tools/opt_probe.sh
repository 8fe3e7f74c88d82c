#!/bin/bash
# Run an optimization probe main with test classes on the classpath.
# Usage: opt_probe.sh <MainClass> [args...]
MAIN=$1; shift
export SPARK_HOME=${SPARK_HOME:-/opt/spark}
export SPARK_SCALA_VERSION=${SPARK_SCALA_VERSION:-2.13}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
exec java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dlog4j.configurationFile=/root/repo/src/test/resources/log4j2.properties \
  -cp "/opt/spark/jars/*:/root/repo/target/scala-2.13/classes:/root/repo/target/scala-2.13/test-classes:/root/repo/src/main/resources" "$MAIN" "$@"
