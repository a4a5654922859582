package graft

import graft.spark._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for decode thread-scaling: isolates the parquet binary
  * scan, the projected decode variants, and the full 4-column decode at
  * one parallelism level per invocation (fresh JVM per level, like the
  * bench). Usage: runMain graft.DecodeScaleProbe local[8] [rows]. */
object DecodeScaleProbe {
  def main(args: Array[String]): Unit = {
    val master = if (args.nonEmpty) args(0) else "local[8]"
    val rows = if (args.length > 1) args(1).toLong else 1000000L
    val cores = master.replaceAll("[^0-9]", "").toInt
    val spark = SparkSession.builder().master(master).appName("decode-probe")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val path = s"/dev/shm/graft-dsp-$rows"
    val pathU = s"/dev/shm/graft-dspu-$rows"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      val chunks = EncodePipeline.encode(TokenTableGen.generate(spark, rows, 32), 32)
      chunks.write.mode("overwrite")
        .option("parquet.block.size", (4 * 1024 * 1024).toString)
        .parquet(path)
      // same table, parquet-level compression OFF: the payloads are
      // already codec-compressed, snappy just burns CPU on both sides
      chunks.write.mode("overwrite")
        .option("parquet.block.size", (4 * 1024 * 1024).toString)
        .option("compression", "uncompressed")
        .parquet(pathU)
    }
    val tbl = spark.read.parquet(path).as[EncodedChunk]
    val tblU = spark.read.parquet(pathU).as[EncodedChunk]
    def t(name: String)(f: => Unit): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"DSP $master $name $best%.3f s")
    }
    // JIT warm of every path
    EncodePipeline.decodeDF(tbl)
      .agg(sum("n_tok"), sum(size(col("tokens"))), max("doc_id"), count("source")).collect()
    t("scan-binary")(
      tbl.toDF().agg(sum(length(col("tokens_bin"))), sum(length(col("docid_bin"))),
        sum(length(col("lens_bin"))), sum(length(col("source_bin")))).collect())
    t("scan-binary-uncompressed")(
      tblU.toDF().agg(sum(length(col("tokens_bin"))), sum(length(col("docid_bin"))),
        sum(length(col("lens_bin"))), sum(length(col("source_bin")))).collect())
    t("decode-full-uncompressed")(
      EncodePipeline.decodeDF(tblU)
        .agg(sum("n_tok"), sum(size(col("tokens"))), max("doc_id"), count("source")).collect())
    t("decode-count*")(
      EncodePipeline.decodeDF(tbl).agg(count(lit(1))).collect())
    t("decode-docid")(
      EncodePipeline.decodeDF(tbl).agg(max("doc_id")).collect())
    t("decode-tokens")(
      EncodePipeline.decodeDF(tbl).agg(sum(size(col("tokens")))).collect())
    t("decode-full")(
      EncodePipeline.decodeDF(tbl)
        .agg(sum("n_tok"), sum(size(col("tokens"))), max("doc_id"), count("source")).collect())
    spark.stop()
  }
}
