package graft.streaming

import graft.codec.BlockCompression
import graft.spark.{EncodePipeline, TokenRow}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming ingest: a stream of token rows is encoded
  * micro-batch-wise with the layout-aligned path (no exchange inside a
  * batch) and written to the chunk table under a batch_id partition.
  * foreachBatch alone is only at-least-once — a batch replayed after a
  * crash between the parquet write and the streaming-checkpoint commit
  * would duplicate chunks — so the sink is made idempotent per batchId:
  * each batch dynamically OVERWRITES its own batch_id partition, and a
  * replay rewrites identical bytes (the aligned encode is deterministic
  * in the batch content). Chunk identity for a streamed table is
  * (batch_id, chunk_id); batch_id is a Long column, never truncated.
  * The reference has no streaming runtime (SURVEY.md §2.6); this is
  * engine-native capability.
  */
object StreamingEncode {

  /** One micro-batch → its own batch_id partition, dynamically
    * OVERWRITTEN: replaying the same batchId (at-least-once foreachBatch
    * semantics) rewrites identical bytes instead of appending duplicates. */
  def writeBatch(batch: org.apache.spark.sql.Dataset[TokenRow], batchId: Long,
                 chunkDir: String, tokensPerChunk: Int, blockCodec: Int): Unit =
    EncodePipeline
      .encodeAligned(batch, tokensPerChunk, blockCodec)
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", EncodePipeline.ChunkTableCompression)
      .partitionBy("batch_id")
      .parquet(chunkDir)

  def start(spark: SparkSession, source: DataFrame, chunkDir: String,
            checkpointDir: String,
            tokensPerChunk: Int = EncodePipeline.DefaultTokensPerChunk,
            blockCodec: Int = BlockCompression.None): StreamingQuery = {
    import spark.implicits._
    source.as[TokenRow].writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[TokenRow], batchId: Long) =>
        writeBatch(batch, batchId, chunkDir, tokensPerChunk, blockCodec)
      }
      .start()
  }
}
