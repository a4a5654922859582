package graft.streaming

import graft.codec.BlockCompression
import graft.spark.{EncodePipeline, TokenRow}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming ingest: a stream of token rows is encoded
  * micro-batch-wise with the layout-aligned path (no exchange inside a
  * batch) and appended to the chunk table. Streaming's own checkpoint
  * (WAL + batch id) provides exactly-once appends — the streaming analog
  * of the batch job's per-partition resume. The reference has no
  * streaming runtime (SURVEY.md §2.6); this is engine-native capability.
  */
object StreamingEncode {

  /** Start the encode sink on a streaming Dataset of token rows.
    * Chunk part_ids are offset by batch id so chunk identity stays unique
    * across the stream's lifetime.
    */
  def start(spark: SparkSession, source: DataFrame, chunkDir: String,
            checkpointDir: String,
            tokensPerChunk: Int = EncodePipeline.DefaultTokensPerChunk,
            blockCodec: Int = BlockCompression.None): StreamingQuery = {
    import spark.implicits._
    source.as[TokenRow].writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[TokenRow], batchId: Long) =>
        EncodePipeline
          .encodeAligned(batch, tokensPerChunk, blockCodec, partIdOffset = (batchId * 100000L).toInt)
          .write.mode("append").parquet(chunkDir)
        ()
      }
      .start()
  }
}
