package graft

import graft.spark._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ChunkJoin.joinByDocId vs Spark's own join as the oracle: same rows,
  * same duplicate fan-out, probe keys missing from the table and table
  * keys missing from the probe both drop (inner semantics). */
class ChunkJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def synth(n: Int): org.apache.spark.sql.Dataset[TokenRow] =
    TokenTableGen.generate(spark, n, 6)

  test("chunk-aligned merge join matches Spark's join, incl. duplicates") {
    import spark.implicits._
    val rows = synth(4000)
    val bounds = EncodePipeline.massBalancedBounds(rows, 5)
    val chunks = EncodePipeline.encode(rows, numParts = 5,
      tokensPerChunk = 16 * 1024, boundsOverride = Some(bounds))
    // probe: every 3rd doc (weight = len), every 17th AGAIN (dup key,
    // distinct weight), plus keys that match nothing
    val base = rows.select(col("doc_id"), col("n_tok").cast("long").as("w"))
    val probe = base.filter(abs(hash(col("doc_id"))) % 3 === 0)
      .unionAll(base.filter(abs(hash(col("doc_id"))) % 17 === 0)
        .withColumn("w", col("w") + 100000L))
      .unionAll(Seq(("zzz-no-such-doc", 1L), ("", 2L)).toDF("doc_id", "w"))
      .as[(String, Long)]
    val got = ChunkJoin.joinByDocId(chunks, bounds, probe)
      .toDF().select("doc_id", "source", "n_tok", "weight")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    val want = rows.toDF().join(probe.toDF("doc_id", "weight"), "doc_id")
      .select("doc_id", "source", "n_tok", "weight")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    assert(got.length == want.length, s"got ${got.length}, want ${want.length}")
    assert(got.sameElements(want))
    assert(got.nonEmpty) // the %3 slice guarantees matches
  }

  test("empty probe joins to nothing without decoding") {
    import spark.implicits._
    val rows = synth(500)
    val bounds = EncodePipeline.massBalancedBounds(rows, 2)
    val chunks = EncodePipeline.encode(rows, numParts = 2,
      tokensPerChunk = 16 * 1024, boundsOverride = Some(bounds))
    val probe = spark.emptyDataset[(String, Long)]
    assert(ChunkJoin.joinByDocId(chunks, bounds, probe).count() == 0L)
  }

  test("duplicate keys in the CHUNK table fan out over equal probe runs") {
    import spark.implicits._
    // two table rows share a doc_id; two probe rows share it too → 4 pairs
    val rows = Seq(
      TokenRow("a", Array(1), 1, "s1"), TokenRow("b", Array(2), 1, "s2"),
      TokenRow("b", Array(3), 1, "s3"), TokenRow("c", Array(4), 1, "s4"))
      .toDS()
    val bounds = Array("b")
    val chunks = EncodePipeline.encode(rows, numParts = 2,
      tokensPerChunk = 1024, boundsOverride = Some(bounds))
    val probe = Seq(("b", 10L), ("b", 20L), ("c", 30L)).toDS()
    val got = ChunkJoin.joinByDocId(chunks, bounds, probe)
      .collect().map(r => (r.doc_id, r.weight)).sortBy(identity)
    assert(got.toSeq == Seq(("b", 10L), ("b", 10L), ("b", 20L), ("b", 20L), ("c", 30L)))
  }
}
