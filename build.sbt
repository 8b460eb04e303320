ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pipeline_usnvcspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// JDK 17's default posix_spawn launch intermittently fails under the
// LOADED TEST JVM in this sandbox ("Failed to exec spawn helper",
// helper TERMed) — and with no native-hadoop lib, Hadoop Shell forks
// chmod/rm per local-FS commit op, so a flaky spawn path livelocks
// streaming state commits. Plain fork() needs no helper process, but
// each fork copies the full heap's page tables: measured ~8 s of pure
// fork overhead PER parquet-writing query in the run JVM. So: FORK
// only where the flakiness was observed (tests); the run/bench JVM
// keeps the fast posix_spawn default (overridable via GRAFT_LAUNCH_MECH).
Test / javaOptions += "-Djdk.lang.Process.launchMechanism=FORK"
run / javaOptions +=
  s"-Djdk.lang.Process.launchMechanism=${sys.env.getOrElse("GRAFT_LAUNCH_MECH", "POSIX_SPAWN")}"
