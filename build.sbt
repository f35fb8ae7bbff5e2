ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "aicoeoscdemospark"
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
// The bench contract is "the compact JSON is the LAST stdout line";
// sbt's "[success] Total time: ..." epilogue printed after the forked
// program's output broke that for seven straight rounds (the driver's
// parse recorded null). Suppress the epilogue globally.
Global / showSuccess := false
Global / showTiming := false
// the two keys are read by sbt's command layer, not by settings —
// exclude them from the unused-key lint so startup stays quiet
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
// ...and sbt's logger would still prefix every forwarded child line
// with "[info] ": pass the forked program's stdio through verbatim so
// the bench JSON line is parseable exactly as printed.
run / connectInput := true
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Whole-stage codegen emits one or more generated classes per query
  // stage; a long session (bench suite = 88 query executions across
  // two scale factors) can fill the default 240 MB JIT code cache, at
  // which point HotSpot silently disables compilation and every
  // subsequent query runs interpreted (observed as uniform late-
  // session slowdowns even on tiny inputs). Size it so the suite
  // never hits the cliff.
  "-XX:ReservedCodeCacheSize=1g",
)
