package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time individual driver queries at a given sf dir — catches
  * per-query bench regressions without a full Bench run.
  * Usage: runMain graft.QueryProbe <sfDir> <query>[,<query>...] */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(",").toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, dir).count()
      println(f"QPROBE $n ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$cnt")
    }
    spark.stop()
  }
}
