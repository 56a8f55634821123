ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlwlgmetlinkspark"
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
// 80+ queries × (warmup + timed reps) compile a lot of generated code
// and pin checkpoint blocks; the JDK's 240 MB code-cache and a small
// heap degrade the tail of the run (JIT fallback + GC thrash). But a
// fixed 24g default breaks `sbt test` on small dev machines, so the
// default is derived from physical RAM (¼ of it, clamped to [4g,24g]
// — 24g on the 128 GiB bench box, 4g on a 16 GiB laptop);
// SPARK_DRIVER_MEM still overrides explicitly.
val physMemGb: Int = java.lang.management.ManagementFactory
  .getOperatingSystemMXBean match {
    case b: com.sun.management.OperatingSystemMXBean =>
      (b.getTotalMemorySize >> 30).toInt
    case _ => 16
  }
val defaultHeap = s"${math.max(4, math.min(24, physMemGb / 4))}g"
val codeCache = if (physMemGb >= 64) "1g" else "384m"
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
  s"-XX:ReservedCodeCacheSize=${
    sys.env.getOrElse("SPARK_CODE_CACHE", codeCache)}",
  "-XX:+UseCodeCacheFlushing",
  // Spark's ContextCleaner frees dead checkpoint/broadcast/shuffle
  // blocks via weak references, and spark.cleaner.periodicGC.interval
  // (set in Tables.configure) calls System.gc() to bound the backlog;
  // make that trigger a CONCURRENT G1 cycle instead of a
  // stop-the-world full collection so the hygiene never pauses a
  // running query.
  "-XX:+ExplicitGCInvokesConcurrent",
)
