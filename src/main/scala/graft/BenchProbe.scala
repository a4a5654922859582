package graft

import graft.spark._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-cost probe: isolates generate / shuffle / encode. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 500000L
    val masters = Seq("local[8]", "local[32]")
    val numParts = 64
    for (m <- masters) {
      val spark = SparkSession.builder().master(m).appName("probe")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      def time[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"PROBE $m $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      // warmup
      EncodePipeline.encode(TokenTableGen.generate(spark, 5000, numParts), numParts).count()
      val src = TokenTableGen.generate(spark, rows, numParts)
      time("gen-count")(src.count())
      time("gen-sumtok")(src.agg(sum("n_tok")).collect())
      val bounds = time("bounds")(EncodePipeline.massBalancedBounds(src, numParts))
      val assigned = EncodePipeline.withPartId(src, bounds)
      time("gen-assign-count")(assigned.count())
      time("gen-serialize-only")(
        src.toDF().queryExecution.toRdd.mapPartitions(it => Iterator(it.size)).collect())
      time("gen-assign-noshuffle")(
        assigned.queryExecution.toRdd.mapPartitions(it => Iterator(it.size)).collect())
      time("gen-assign-shuffle-sort")(
        assigned.repartition(numParts, col("part_id"))
          .sortWithinPartitions(col("part_id"), col("doc_id"))
          .queryExecution.toRdd.mapPartitions(it => Iterator(it.size)).collect())
      time("gen-rbr-shuffle-sort")(
        src.toDF().repartitionByRange(numParts, col("doc_id"))
          .sortWithinPartitions(col("doc_id"))
          .queryExecution.toRdd.mapPartitions(it => Iterator(it.size)).collect())
      val taskTimes = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Long)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          taskTimes.add((te.stageId, te.taskInfo.duration,
            if (m != null) m.executorCpuTime / 1000000 else -1,
            if (m != null) m.jvmGCTime else -1))
        }
      })
      for (i <- 1 to 4) {
        taskTimes.clear()
        time(s"full-encode-$i")(
          EncodePipeline.encode(src, numParts, boundsOverride = Some(bounds))
            .agg(sum("num_tokens")).collect())
        import scala.jdk.CollectionConverters._
        val byStage = taskTimes.asScala.toSeq.groupBy(_._1)
        byStage.toSeq.sortBy(_._1).foreach { case (st, ts) =>
          val d = ts.map(_._2).sorted
          val cpu = ts.map(_._3).sum
          val gc = ts.map(_._4).sum
          println(s"PROBE   stage$st tasks=${d.length} med=${d(d.length / 2)}ms max=${d.last}ms " +
            s"wallSum=${d.sum}ms cpuSum=${cpu}ms gcSum=${gc}ms")
        }
      }
      spark.stop()
    }
  }
}
