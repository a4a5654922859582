package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-only instrumentation bench (guide §1.4/§7): times individual
  * declared queries under the SAME session config as the frozen
  * graft.Bench query loop (local[$SPARK_GRAFT_CPUS], shuffle.partitions =
  * cpus, AQE on, 16 MB splits) and reports, per run: wall seconds, Spark
  * job / stage / task counts and the summed task time. wall >> task-time
  * means scheduler / per-job fixed overhead dominates; wall ~ task-time /
  * cores means the operator itself is the cost. The frozen Bench is never
  * touched — this exists so optimization evidence can cite job/task
  * counts next to the seconds.
  *
  * Usage: runMain graft.BenchExtra <sfDir> <q1>[,<q2>...] [repeats]
  */
object BenchExtra {

  private final class Counters(verbose: Boolean) extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    private val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet()
      if (verbose) {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobStart.put(j.jobId, (System.nanoTime(), site))
      }
      ()
    }
    override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      if (verbose) {
        Option(jobStart.remove(e.jobId)).foreach { case (t0, site) =>
          println(f"  JOB ${e.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%6.2fs  $site")
        }
      }
      ()
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      ()
    }
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val repeats = if (args.length > 2) args(2).toInt else 1
    val verbose = sys.env.contains("GRAFT_QX_VERBOSE")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = new Counters(verbose)
    spark.sparkContext.addSparkListener(c)
    // same untimed warm-up as Bench
    try graft.spark.EncodePipeline.encode(
        graft.spark.TokenTableGen.generate(spark, 2000, 4), 4)
      .agg(org.apache.spark.sql.functions.sum("num_tokens")).collect()
    catch { case e: Exception => System.err.println(s"warm-up failed: $e") }
    for (n <- names; r <- 1 to repeats) {
      c.reset()
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"QX $n run$r wall=$wall%.2fs rows=$cnt jobs=${c.jobs.get} " +
        f"stages=${c.stages.get} tasks=${c.tasks.get} taskSum=${c.taskMs.get / 1e3}%.1fs")
    }
    spark.stop()
  }
}
