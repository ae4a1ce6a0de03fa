ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pipesspark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as the bench headline JSON. Two things have broken that every round so
// far: (a) the default LoggedOutput strategy prefixes every forked-run
// stdout line with "[info] ", and (b) sbt appends its own "[success]
// Total time: …" trailer as the true last line. StdoutOutput passes the
// forked JVM's stdout/stderr through raw, and showSuccess drops the
// trailer, so the bare headline IS the last stdout line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // local[32] hosts all 32 executor threads in ONE JVM: 8g gave each
  // thread ~256 MB, so multi-GB shuffles (k=100 scale probes, the heavy
  // bench queries) ran against constant memory-store eviction + GC churn
  // — measured as a 2.5x run-to-run swing on an identical edge-build
  // phase. 32g ≈ 1 GB/thread, in line with a real per-executor sizing.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
