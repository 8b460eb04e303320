#!/bin/bash
# Run a graft main class directly against compiled classes + Spark jars,
# bypassing sbt (no project lock, ~10s faster startup). Usage:
#   tools/jrun.sh graft.Bench
#   SPARK_GRAFT_SF_DIR=... tools/jrun.sh graft.ProfileScratch query q19_ngram_jaccard
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Djdk.lang.Process.launchMechanism="${GRAFT_LAUNCH_MECH:-POSIX_SPAWN}" \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "/root/repo/target/scala-2.13/classes:/root/repo/src/main/resources:/opt/spark/jars/*" \
  "$@"
