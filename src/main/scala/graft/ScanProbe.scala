package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: isolate parquet scan cost of the token list column. */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val path = "/dev/shm/graft-bench-input"
    for (m <- Seq("local[8]", "local[32]")) {
      val spark = SparkSession.builder().master(m)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val df = spark.read.parquet(path)
      def time(name: String)(f: => Unit): Unit = {
        f // warm
        val t0 = System.nanoTime(); f
        println(f"SPROBE $m $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("scan-ntok-only")(df.agg(sum("n_tok")).collect())
      time("scan-tokens-sum")(
        df.select(aggregate(col("tokens"), lit(0L), (a, x) => a + x).as("s"))
          .agg(sum("s")).collect())
      time("scan-tokens-internalrow")(
        df.queryExecution.toRdd.mapPartitions { it =>
          var acc = 0L
          it.foreach { r => acc += r.getArray(1).toIntArray().length }
          Iterator(acc)
        }.collect())
      spark.stop()
    }
  }
}
