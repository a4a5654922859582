ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parquetgospark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"` as
// JSON. Two sbt decorations broke that for four rounds: the logger prefixes
// forked stdout with "[info] ", and a "[success] Total time: …" banner
// follows the envelope. StdoutOutput passes forked output through verbatim,
// and showSuccess drops the banner, so the bare JSON envelope is the final
// line. The bare project-level setting delegates to every run-family task
// (run, runMain, Test/run) — task-scoped copies would miss runMain.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys ++= Set(outputStrategy, showSuccess)
// tests run small workloads — skip the big pre-touched bench heap
Test / javaOptions := (Test / javaOptions).value
  .filterNot(o => o.startsWith("-Xms") || o == "-XX:+AlwaysPreTouch") ++ Seq("-Xms2g")
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
// Heap sizing: SPARK_DRIVER_MEM is CAPPED at 24g. The bench forks child
// JVMs with their own fixed pre-touched heaps, and shuffle scratch lives
// on tmpfs — parent heap + child heap + tmpfs must fit in physical RAM.
// An uncapped env value (e.g. 85g) pre-faults parent+child to 170 GiB
// and the kernel OOM-kills the run (this killed BENCH_r01).
val heapGiB: Int = {
  val raw = sys.env.getOrElse("SPARK_DRIVER_MEM", "24g").trim.toLowerCase
  val num = raw.takeWhile(_.isDigit).toLong
  val gib = if (raw.endsWith("m")) num / 1024 else num
  math.min(math.max(gib, 4L), 24L).toInt
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // shuffle/spill scratch on tmpfs: /tmp is disk-backed in this sandbox
  // and serializes the exchange; a real cluster would use local NVMe
  "-Dspark.local.dir=/dev/shm/graft-spark-local",
  // query scratch tables (snapshot/compact/index checkpoint dirs use
  // java.io.tmpdir) on tmpfs for the same reason: the snapshot queries
  // make many small FS commits and were measuring the sandbox's disk
  // (11->42 s swings run-to-run on identical code); a real deployment
  // would put table storage on HDFS/S3 with local NVMe staging
  "-Djava.io.tmpdir=/dev/shm",
  s"-Xmx${heapGiB}g",
  // fixed-size, pre-faulted heap: heap EXPANSION under 32-thread
  // allocation churn caused kernel-time storms (mmap+page-zero) that
  // showed up as uniform 100x task slowdowns (see BenchProbe history)
  s"-Xms${heapGiB}g",
  "-XX:+AlwaysPreTouch",
  "-XX:+UseParallelGC",
)
