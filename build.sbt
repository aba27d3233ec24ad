ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cardanoanalyticsduckdbspark"
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
// The bench/verify harness captures a bounded stdout TAIL and parses the
// last line as JSON. Under the default LoggedOutput strategy sbt wraps
// forked output as "[info] {...}" and appends a "[success] Total time"
// footer — both of which break that parse (BENCH_r05/r06 "parsed": null).
// StdoutOutput passes the forked JVM's stdout through verbatim and
// showSuccess drops the footer, so the bench JSON line is genuinely the
// last stdout content.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
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
  // 8g covers tests + sf<=1 benches; export SPARK_DRIVER_MEM=96g for
  // sf>=10 runs — under 8g the suite's ShuffledHashJoin builds throw
  // SparkOutOfMemoryError at sf10 (and Bench's per-query catch makes
  // the failure silent in the artifact: a too-fast row is the tell).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Throughput GC: this is a batch engine — many short driver-side
  // pauses (G1's default) cost more across an 80-query suite than
  // ParallelGC's rarer, longer collections (measured ~4% suite-total
  // win at sf0.1; no latency SLO here to protect).
  "-XX:+UseParallelGC",
) ++
  // ad-hoc JVM flags for A/B experiments (GC choice, NUMA, JIT), e.g.
  // SPARK_JAVA_OPTS="-XX:+UseParallelGC"
  sys.env.get("SPARK_JAVA_OPTS").toSeq.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
