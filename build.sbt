ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "exawsfirehosespark"
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
// The bench/verify drivers parse the LAST stdout line as JSON; sbt's
// trailing "[success] Total time: ..." would otherwise follow the
// metric line. Suppressing it makes `sbt "runMain graft.Bench"` end
// with the program's own final println (run with `sbt -error` to
// drop the leading [info] framing too).
Global / showSuccess := false
// showSuccess is read by the command engine, not other settings —
// exclude it from the unused-key lint
Global / excludeLintKeys += showSuccess
// With fork := true, sbt's logger prefixes every forked-stdout line
// with "[info] " at default verbosity, so the metric line the drivers
// parse would read "[info] {...}" and fail a strict JSON parse.
// StdoutOutput routes the forked process's stdout straight through,
// unprefixed under ANY sbt verbosity — the last stdout line of
// `sbt "runMain graft.Bench"` is then the raw JSON metric line.
run / outputStrategy := Some(StdoutOutput)
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
