ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hannigan_conjunctisviribus_ploscompbio_2017spark"
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
// Forked-run output passes through UNPREFIXED (no "[info] " in front
// of stdout lines): the Bench contract is ONE machine-parseable JSON
// line on stdout, and the sbt log prefix has broken the driver's
// parse of it in every round to date (BENCH_r0N.json "parsed":null).
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
  // local[32] holds every memoized table + GraphX MEMORY_ONLY RDDs in
  // ONE heap: at 8g the 129-query bench thrashed storage eviction
  // (GraphX recompute inflated q57/q75 ~2x and randomly re-billed
  // evicted memo tables; measured 243-272 s vs 165 s at 48g on an
  // otherwise idle 125 GB machine). Size the default to the workload,
  // keep the env knob for constrained hosts.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
