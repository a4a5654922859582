package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time one streaming query at several state-partition counts
  * to separate per-task state-store overhead from real work.
  * Usage: runMain graft.StreamProbe <sfDir> <query> <parts>[,<parts>...] */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val q = if (args.length > 1) args(1) else "q_streaming_sliding"
    val partsList = (if (args.length > 2) args(2) else "32,8,2").split(",").map(_.toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    SparkEntry.queries(q)(spark, dir).count()
    val mode = sys.env.getOrElse("GRAFT_SPROBE_MODE", "session")
    for (p <- partsList; r <- 1 to 2) {
      if (mode == "state") spark.conf.set("spark.graft.streaming.statePartitions", p.toString)
      else spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(q)(spark, dir).count()
      println(f"SPROBE $q parts=$p run$r ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$cnt")
    }
    spark.stop()
  }
}
