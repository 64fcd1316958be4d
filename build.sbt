ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cubicerpclientetlspark"
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
// The bench/verify harness parses the LAST stdout line as JSON. Two sbt
// artifacts break that: the logger's "[info] " prefix on forked-run
// output, and the trailing "[success] Total time" line. Route the forked
// process's stdout straight through, and drop the success banner.
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
  // local[32] holds driver + all 32 executor task slots in ONE JVM, so
  // the heap plays the role a whole cluster's executor memory plays:
  // 8g gave ~250 MB/task-slot — far under the ~1-2 GB/core Spark
  // deployments size for — and the 297-query bench JVM spent its late
  // passes GC-bound (x242 read 45 s in-suite vs 30 s isolated in an
  // 8g fresh JVM; see OPTIMIZATION_r15.md). 24g ≈ 750 MB/slot on a
  // 128 GiB box. Still env-overridable for smaller machines.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
