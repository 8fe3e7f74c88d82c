ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "libmrspark"
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
// LocalClusterSpec (master=local-cluster[...]) forks standalone-Worker
// executor JVMs. The launcher resolves the executor command from
// SPARK_HOME, and its classpath builder needs SPARK_SCALA_VERSION when
// run outside spark-submit (load-spark-env.sh normally sets it). Export
// both so a clean `sbt test` shell is self-contained.
Test / envVars ++= Map(
  "SPARK_HOME" -> sys.env.getOrElse("SPARK_HOME", "/opt/spark"),
  "SPARK_SCALA_VERSION" -> sys.env.getOrElse("SPARK_SCALA_VERSION", "2.13"),
)
// Forked `run` output must reach stdout verbatim (no sbt `[info] `
// prefix): the bench/verify drivers parse the printed JSON line.
// Set at every plausible scope — the forked process's OutputStrategy is
// resolved from the `Compile / run` axis, so the bare and Compile-scoped
// settings are the ones that matter.
outputStrategy := Some(OutputStrategy.StdoutOutput)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// No trailing "[success] Total time: ..." line after the run: a
// last-line JSON parse must see the bench's printed JSON, not sbt's
// epilogue.
Global / showSuccess := false
Global / showTiming := false
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
