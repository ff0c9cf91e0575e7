ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sqltodbspcompilerspark"
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
// The bench/verify contract is a raw JSON line on stdout. sbt's default
// LoggedOutput prefixes every forked-process line with "[info] ", which
// breaks line-oriented JSON parsing downstream — pass stdout through.
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
// Commit AND pre-touch a heap floor at JVM start: a lazily-committed large
// heap (the bench driver sets SPARK_DRIVER_MEM ≈ 89 g) page-faults fresh
// pages continuously and commit/uncommit-thrashes as G1 resizes — measured
// 2-3× wall-time inflation on allocation-heavy queries at 89 g vs 8 g
// (q174 21-25 s → ~8 s warm with the floor; see OPTIMIZATION_r15.md). The
// floor is CAPPED at 32 g: pre-touching the full 89 g grant put RSS at
// ~97 GB and the sandbox OOM-killed the JVM once off-heap (netty, GC aux,
// page cache for shuffle files) spiked — 32 g committed removes the resize
// churn (sf0.1 state never outgrows it; -Xmx still honors the full grant)
// while leaving real headroom. Pre-touch cost is startup-only, outside any
// per-query timing.
def graftMemMb(s: String): Long = {
  val t = s.trim.toLowerCase
  val n = t.takeWhile(_.isDigit).toLong
  if (t.endsWith("g")) n * 1024 else if (t.endsWith("m")) n else n / (1 << 20)
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xms${math.min(graftMemMb(sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")), 32L * 1024)}m",
  "-XX:+AlwaysPreTouch",
)
