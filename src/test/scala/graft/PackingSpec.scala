package graft

import graft.queries.TextOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing + context-window chunking invariants that the
  * row-level DuckDB oracle cannot see: the packed offsets must tile the
  * concatenated token stream exactly (no gap, no overlap, any bucket
  * boundary), and the strided chunks must cover every token position.
  */
class PackingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("packed token offsets tile the stream: exclusive cumsum, no gaps across buckets") {
    val rows = TextOps.packSequences(spark, dir)
      .select("doc_id", "n_tokens", "token_offset", "first_seq", "last_seq")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // sorted by offset, each doc starts exactly where the previous ended
    val byOff = rows.sortBy(_._3)
    assert(byOff.head._3 == 0L, "stream must start at offset 0")
    byOff.sliding(2).foreach {
      case Array((_, n0, o0, _, _), (id1, _, o1, _, _)) =>
        assert(o0 + n0 == o1, s"gap/overlap before doc $id1: ${o0 + n0} != $o1")
      case _ =>
    }
    // seq assignment is the pure arithmetic of (offset, n_tokens)
    rows.foreach { case (id, n, off, fs, ls) =>
      assert(fs == off / 256, s"doc $id first_seq")
      assert(ls == (off + n - 1) / 256, s"doc $id last_seq")
      assert(n >= 1)
    }
    // total sequence count is ceil(total/256)
    val total = rows.map(_._2).sum
    assert(rows.map(_._5).max == (total - 1) / 256)
  }

  test("weighted mix: copy_idx dense per doc, copies bounded by ceil(weight)") {
    val rows = TextOps.mixSources(spark, dir)
      .select("doc_id", "source", "n_copies", "copy_idx")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val n = cs.head._3
      assert(cs.forall(_._3 == n))
      assert(cs.map(_._4).sorted.toSeq == (0L until n), s"doc $id copy_idx not dense")
      val srcN = cs.head._2.drop(3).toInt
      val ceilW = (if (srcN % 4 >= 2) 2 else 1) + (srcN % 2)
      assert(n >= 1 && n <= ceilW, s"doc $id copies $n > ceil(weight) $ceilW")
    }
    // every source doc appears at least once — mixing never drops data
    val docCount = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_._1).distinct.length.toLong == docCount)
  }

  test("dup windows agree with an in-JVM all-docs restatement") {
    val dups = TextOps.dupNgrams(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // independent restatement: distinct 8-token windows per doc, window
    // duplicated iff present in >=2 docs (plain Scala collections — no
    // Spark, no hashing shortcut)
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val perDoc: Map[Long, Set[String]] = texts.map { case (id, t) =>
      id -> t.split(" ", -1).sliding(8).filter(_.length == 8)
        .map(_.mkString(" ")).toSet
    }.toMap
    val docsPerWindow = perDoc.toSeq
      .flatMap { case (id, ws) => ws.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val expected = perDoc.flatMap { case (id, ws) =>
      val n = ws.count(w => docsPerWindow(w) >= 2)
      if (n > 0) Some(id -> n.toLong) else None
    }
    assert(expected.nonEmpty, "corpus should contain duplicated windows")
    assert(dups == expected)
  }

  test("strided chunks cover every token exactly; full windows except tails") {
    import org.apache.spark.sql.functions._
    val chunks = TextOps.docChunks(spark, dir)
      .select("doc_id", "chunk_idx", "n_chunk_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val nTok = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        (size(split(col("text"), " "))).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(chunks.keySet == nTok.keySet)
    chunks.foreach { case (id, cs) =>
      val n = nTok(id)
      val sorted = cs.sortBy(_._2)
      // chunk i starts at 8*i and holds min(16, n - 8*i) tokens
      sorted.foreach { case (_, idx, len) =>
        assert(len == math.min(16L, n - 8 * idx), s"doc $id chunk $idx")
      }
      // the last chunk's start is within the doc → every position covered
      assert(sorted.last._2 == (n - 1) / 8, s"doc $id chunk count")
    }
  }
}
