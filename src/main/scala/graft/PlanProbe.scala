package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump physical plans of representative queries. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q_filter", "q_join_broadcast", "q_range_prune", "q_stats_minmax")) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.treeString.take(3000))
    }
    spark.stop()
  }
}
