package graft

import graft.spark._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("token generator is deterministic and partition-independent") {
    import spark.implicits._
    val a = TokenTableGen.generate(spark, 2000, 4).collect().sortBy(_.doc_id)
    val b = TokenTableGen.generate(spark, 2000, 7).collect().sortBy(_.doc_id)
    assert(a.length == 2000)
    assert(a.map(_.doc_id).toSeq == b.map(_.doc_id).toSeq)
    assert(a.zip(b).forall { case (x, y) => x.tokens.sameElements(y.tokens) && x.source == y.source })
    assert(a.forall(r => r.n_tok == r.tokens.length && r.n_tok >= 1 && r.n_tok <= 8192))
    // mixture sanity: all four source categories appear
    assert(a.map(_.source).distinct.toSet == Set("web", "books", "code", "wiki"))
  }

  test("encode → decode round-trip is exact (per-row token-array equality)") {
    val src = TokenTableGen.generate(spark, 5000, 8)
    val chunks = EncodePipeline.encode(src, numParts = 6, tokensPerChunk = 64 * 1024)
    val decoded = EncodePipeline.decode(chunks)
    assert(EncodePipeline.verifyRoundTrip(src, decoded) == 0L)
  }

  test("encode compresses: enc_bytes < raw_bytes and codecs vary") {
    import spark.implicits._
    val src = TokenTableGen.generate(spark, 5000, 8)
    val chunks = EncodePipeline.encode(src, numParts = 4, tokensPerChunk = 256 * 1024).cache()
    val agg = chunks.selectExpr("sum(raw_bytes) raw", "sum(enc_bytes) enc").head()
    val raw = agg.getLong(0)
    val enc = agg.getLong(1)
    assert(enc < raw, s"enc=$enc raw=$raw")
    val codecs = chunks.select("tokens_codec").as[String].collect().toSet
    assert(codecs.nonEmpty)
    chunks.unpersist()
  }

  test("mass-balanced partitioning bounds token skew") {
    import spark.implicits._
    val src = TokenTableGen.generate(spark, 8000, 8)
    val chunks = EncodePipeline.encode(src, numParts = 8, tokensPerChunk = 1 << 20)
    val perPart = chunks.groupBy("part_id").sum("num_tokens")
      .collect().map(_.getLong(1))
    val mean = perPart.sum.toDouble / perPart.length
    assert(perPart.length >= 6, s"expected ~8 partitions, got ${perPart.length}")
    assert(perPart.max < mean * 2.5, s"max=${perPart.max} mean=$mean — skew not balanced")
  }

  test("adversarial skew: 1% giant docs, 99% tiny — token mass still balanced") {
    import spark.implicits._
    // 8000 rows: every 100th has 8192 tokens, the rest 4 → ~70% of all
    // token mass lives in 1% of rows. Row-balanced partitioning would
    // put ~equal ROWS per partition and leave mass skew ~intact.
    val rows = spark.range(0, 8000, 1, 8).as[Long].map { i =>
      val n = if (i % 100 == 0) 8192 else 4
      TokenRow(f"doc/$i%012d", Array.tabulate(n)(k => (i + k).toInt), n, "web")
    }
    val chunks = EncodePipeline.encode(rows, numParts = 8, tokensPerChunk = 1 << 20)
    val perPart = chunks.groupBy("part_id").sum("num_tokens").collect().map(_.getLong(1))
    val mean = perPart.sum.toDouble / perPart.length
    assert(perPart.max < mean * 1.8, s"mass skew survived: max=${perPart.max} mean=$mean parts=${perPart.mkString(",")}")
    // and the round-trip still holds under skew
    assert(EncodePipeline.verifyRoundTrip(rows, EncodePipeline.decode(chunks)) == 0L)
  }

  test("checkpoint metrics carry lineage: doc_id range, wall_ms, attempt") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lineage").toString
    val src = TokenTableGen.generate(spark, 2000, 4)
    val m = EncodePipeline.encodeCheckpointed(spark, src, 4, dir, tokensPerChunk = 64 * 1024)
    val row = m.orderBy("part_id").head()
    val cols = m.columns.toSet
    assert(Set("first_doc_id", "last_doc_id", "wall_ms", "attempt", "status").subsetOf(cols), cols)
    assert(m.filter(org.apache.spark.sql.functions.col("status") === "ok").count() == m.count())
    assert(row.getAs[String]("first_doc_id") <= row.getAs[String]("last_doc_id"))
  }

  test("streaming ingest: micro-batch encode appends decodable chunks") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ms = MemoryStream[TokenRow](spark)
    val rows1 = (0 until 500).map(i => TokenTableGen.genRow(i.toLong))
    val rows2 = (500 until 1000).map(i => TokenTableGen.genRow(i.toLong))
    val q = graft.streaming.StreamingEncode.start(
      spark, ms.toDF(), s"$dir/chunks", s"$dir/ckpt", tokensPerChunk = 32 * 1024)
    try {
      ms.addData(rows1)
      q.processAllAvailable()
      ms.addData(rows2)
      q.processAllAvailable()
    } finally q.stop()
    val chunks = spark.read.parquet(s"$dir/chunks").as[EncodedChunk]
    val decoded = EncodePipeline.decode(chunks).collect().sortBy(_.doc_id)
    val expected = (rows1 ++ rows2).sortBy(_.doc_id)
    assert(decoded.length == 1000)
    assert(decoded.zip(expected).forall { case (a, b) =>
      a.doc_id == b.doc_id && a.tokens.sameElements(b.tokens) && a.source == b.source
    })
  }

  test("streaming batch replay is idempotent (no duplicate chunks)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-replay").toString
    val rows = spark.createDataset((0 until 400).map(i => TokenTableGen.genRow(i.toLong)))
    // foreachBatch is at-least-once: simulate a crash-replay of batch 7
    graft.streaming.StreamingEncode.writeBatch(rows, 7L, s"$dir/chunks", 32 * 1024, 0)
    graft.streaming.StreamingEncode.writeBatch(rows, 7L, s"$dir/chunks", 32 * 1024, 0)
    val chunks = spark.read.parquet(s"$dir/chunks").as[EncodedChunk]
    val decoded = EncodePipeline.decode(chunks)
    assert(decoded.count() == 400, "replayed batch must overwrite, not append")
    assert(EncodePipeline.verifyRoundTrip(rows, decoded) == 0L)
  }

  test("aligned encode round-trips without an exchange") {
    import spark.implicits._
    val src = TokenTableGen.generate(spark, 3000, 5)
    val decoded = EncodePipeline.decode(
      EncodePipeline.encodeAligned(src, tokensPerChunk = 64 * 1024))
    assert(EncodePipeline.verifyRoundTrip(src, decoded) == 0L)
  }

  test("chunk-stats pruning: token search decodes only candidate chunks") {
    import spark.implicits._
    // two disjoint token ranges → chunks carry disjoint [min,max] stats
    val rows = spark.range(0, 4000, 1, 4).as[Long].map { i =>
      val base = if (i < 2000) 0 else 1000000
      TokenRow(f"doc/$i%012d", Array.tabulate(50)(k => base + (i % 100).toInt + k), 50, "web")
    }
    val chunks = EncodePipeline.encode(rows, 4, tokensPerChunk = 16 * 1024).cache()
    val total = chunks.count()
    val probe = 1000042 // lives only in the high-range chunks
    val candidates = chunks
      .filter(org.apache.spark.sql.functions.col("tokens_min") <= probe &&
        org.apache.spark.sql.functions.col("tokens_max") >= probe).count()
    assert(candidates < total, s"pruning had no effect: $candidates of $total")
    val hits = EncodePipeline.searchToken(chunks, probe).collect().toSet
    // brute-force oracle
    val expected = rows.collect().filter(_.tokens.contains(probe)).map(_.doc_id).toSet
    assert(hits == expected, s"${hits.size} vs ${expected.size}")
    assert(hits.nonEmpty)
    chunks.unpersist()
  }

  test("bloom pruning: mid-range token skips chunks min/max cannot") {
    import spark.implicits._
    // every row spans [0, 2_000_000] so min/max pruning is useless for a
    // mid-range probe; only rows 1000-1019 actually CONTAIN the probe
    val probe = 999999
    val rows = spark.range(0, 4000, 1, 4).as[Long].map { i =>
      val extra = if (i >= 1000 && i < 1020) probe else (i * 31 % 500000).toInt + 7
      TokenRow(f"doc/$i%012d", Array(0, extra, 2000000), 3, "web")
    }
    val chunks = EncodePipeline.encode(rows, 4, tokensPerChunk = 1024).cache()
    val statsCand = chunks
      .filter(org.apache.spark.sql.functions.col("tokens_min") <= probe &&
        org.apache.spark.sql.functions.col("tokens_max") >= probe).count()
    val bloomCand = chunks.collect()
      .count(c => c.tokens_min <= probe && c.tokens_max >= probe &&
        graft.codec.Bloom.mightContain(c.tokens_bloom, probe))
    assert(statsCand == chunks.count(), "stats pruning should be useless here by construction")
    assert(bloomCand.toLong <= statsCand / 4,
      s"bloom pruned too little: $bloomCand of $statsCand candidates")
    val hits = EncodePipeline.searchToken(chunks, probe).collect().toSet
    val expected = rows.collect().filter(_.tokens.contains(probe)).map(_.doc_id).toSet
    assert(hits == expected)
    assert(hits.nonEmpty)
    chunks.unpersist()
  }

  test("corrupted chunk payload fails CRC check loudly") {
    import spark.implicits._
    val src = TokenTableGen.generate(spark, 200, 2)
    val chunk = EncodePipeline.encode(src, 2, tokensPerChunk = 1 << 20).collect()(0)
    val corrupted = chunk.copy(tokens_bin = {
      val b = chunk.tokens_bin.clone()
      b(b.length / 2) = (b(b.length / 2) ^ 0x40).toByte
      b
    })
    val ex = intercept[Exception](EncodePipeline.decodeChunk(corrupted).toArray)
    assert(ex.getMessage.contains("CRC"), ex.getMessage)
  }

  test("compaction merges incremental chunk tables into one layout") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // two disjoint incremental runs
    val srcA = TokenTableGen.generate(spark, 1500, 3)
    val srcB = spark.range(1500, 3000, 1, 3).as[Long].map(TokenTableGen.genRow)
    EncodePipeline.encode(srcA, 3, tokensPerChunk = 64 * 1024)
      .write.parquet(s"$base/runA")
    EncodePipeline.encode(srcB, 3, tokensPerChunk = 64 * 1024)
      .write.parquet(s"$base/runB")
    EncodePipeline.compact(spark, Seq(s"$base/runA", s"$base/runB"), 4, s"$base/merged",
      tokensPerChunk = 64 * 1024)
    val merged = spark.read.parquet(s"$base/merged/chunks").as[EncodedChunk]
    val full = TokenTableGen.generate(spark, 3000, 4)
    assert(EncodePipeline.verifyRoundTrip(full, EncodePipeline.decode(merged)) == 0L)
    // merged layout is globally range-ordered: partition doc_id ranges
    // must not overlap
    val ranges = spark.read.parquet(s"$base/merged/metrics")
      .select("part_id", "first_doc_id", "last_doc_id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, _, aLast), (_, bFirst, _)) => assert(aLast <= bFirst, s"$aLast > $bFirst")
      case _ =>
    }
  }

  test("decodeDF (InternalRow path) matches typed decode exactly") {
    import spark.implicits._
    val rows = spark.range(0, 2000, 1, 4).as[Long].map { i =>
      val tokens = if (i % 7 == 0) null else Array.tabulate(12)(k => (i + k).toInt)
      val source = if (i % 5 == 0) null else s"src${i % 3}"
      TokenRow(f"doc/$i%012d", tokens, if (tokens == null) -1 else tokens.length, source)
    }
    val chunks = EncodePipeline.encode(rows, 4, tokensPerChunk = 4096).cache()
    val typed = EncodePipeline.decode(chunks)
    val df = EncodePipeline.decodeDF(chunks)
    import spark.implicits._
    assert(EncodePipeline.verifyRoundTrip(typed, df.as[TokenRow]) == 0L)
    assert(df.count() == 2000)
    chunks.unpersist()
  }

  test("nullable tokens and source round-trip via per-chunk null bitmaps") {
    import spark.implicits._
    val rows = spark.range(0, 3000, 1, 4).as[Long].map { i =>
      val tokens = if (i % 7 == 0) null else Array.tabulate(10)(k => (i + k).toInt)
      val source = if (i % 5 == 0) null else s"src${i % 3}"
      TokenRow(f"doc/$i%012d", tokens, if (tokens == null) -1 else tokens.length, source)
    }
    val chunks = EncodePipeline.encode(rows, numParts = 4, tokensPerChunk = 8 * 1024).cache()
    // null counts are chunk-level stats
    val agg = chunks.selectExpr("sum(tokens_nulls)", "sum(source_nulls)", "sum(num_rows)").head()
    assert(agg.getLong(0) == (0 until 3000).count(_ % 7 == 0))
    assert(agg.getLong(1) == (0 until 3000).count(_ % 5 == 0))
    assert(agg.getLong(2) == 3000L)
    assert(EncodePipeline.verifyRoundTrip(rows, EncodePipeline.decode(chunks)) == 0L)
    chunks.unpersist()
  }

  test("all-null tokens chunk still round-trips") {
    import spark.implicits._
    val rows = spark.range(0, 200, 1, 2).as[Long]
      .map(i => TokenRow(f"doc/$i%012d", null, -1, null))
    val decoded = EncodePipeline.decode(EncodePipeline.encode(rows, 2))
    assert(EncodePipeline.verifyRoundTrip(rows, decoded) == 0L)
  }

  test("checkpoint metadata goes through Hadoop FS: file: URI works end-to-end") {
    import spark.implicits._
    val dir = "file:" + java.nio.file.Files.createTempDirectory("graft-ckpt-uri").toString
    val src = TokenTableGen.generate(spark, 1500, 4)
    val m1 = EncodePipeline.encodeCheckpointed(spark, src, 4, dir, tokensPerChunk = 64 * 1024)
    assert(m1.selectExpr("sum(num_rows)").head().getLong(0) == 1500L)
    // resume over the same URI: nothing re-encodes, attempt stays 1
    val m2 = EncodePipeline.encodeCheckpointed(spark, src, 4, dir, tokensPerChunk = 64 * 1024)
    assert(m2.selectExpr("max(attempt)").head().getInt(0) == 1)
    val decoded = EncodePipeline.decode(spark.read.parquet(s"$dir/chunks").as[EncodedChunk])
    assert(EncodePipeline.verifyRoundTrip(src, decoded) == 0L)
  }

  test("metrics swap window: a crash leaving only .staging still resumes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-crash").toString
    val src = TokenTableGen.generate(spark, 1500, 4)
    EncodePipeline.encodeCheckpointed(spark, src, 4, dir, tokensPerChunk = 64 * 1024)
    // simulate dying between "metrics -> old" and "staging -> metrics":
    // only a complete .staging copy survives
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val m = new org.apache.hadoop.fs.Path(s"$dir/metrics")
    val s = new org.apache.hadoop.fs.Path(s"$dir/metrics.staging")
    assert(fs.rename(m, s))
    val m2 = EncodePipeline.encodeCheckpointed(spark, src, 4, dir, tokensPerChunk = 64 * 1024)
    // recovery promoted the staging copy; no partition was re-encoded
    assert(m2.selectExpr("max(attempt)").head().getInt(0) == 1)
    assert(m2.selectExpr("sum(num_rows)").head().getLong(0) == 1500L)
  }

  test("FORMAT_VERSION marker: mismatched or unversioned checkpoints fail explicitly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-ver").toString
    val src = TokenTableGen.generate(spark, 800, 2)
    EncodePipeline.encodeCheckpointed(spark, src, 2, dir, tokensPerChunk = 64 * 1024)
    val vf = java.nio.file.Paths.get(dir, "FORMAT_VERSION")
    assert(java.nio.file.Files.readString(vf).trim == EncodePipeline.FormatVersion.toString)
    // stamped dir resumes fine (covered above); now corrupt the version
    // (drop the local-FS checksum sidecar too — we bypass Hadoop on purpose)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, ".FORMAT_VERSION.crc"))
    java.nio.file.Files.writeString(vf, "2")
    val exMismatch = intercept[IllegalArgumentException] {
      EncodePipeline.encodeCheckpointed(spark, src, 2, dir, tokensPerChunk = 64 * 1024)
    }
    assert(exMismatch.getMessage.contains("format version 2"), exMismatch.getMessage)
    // unversioned dir whose chunk schema IS the current layout: probed,
    // stamped v3 in place, and accepted (the marker only exists since
    // round 4 — refusing compatible pre-marker checkpoints forced a
    // needless full re-encode)
    java.nio.file.Files.delete(vf)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, ".FORMAT_VERSION.crc"))
    val m3 = EncodePipeline.encodeCheckpointed(spark, src, 2, dir, tokensPerChunk = 64 * 1024)
    assert(java.nio.file.Files.readString(vf).trim == EncodePipeline.FormatVersion.toString)
    assert(m3.selectExpr("sum(num_rows)").head().getLong(0) == 800L)
    // unversioned dir whose chunk schema does NOT match → honest
    // "version unknown" error (not a claim about which round wrote it)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ckpt-ver2").toString
    spark.range(5).toDF("x").write.parquet(s"$dir2/chunks")
    val exOld = intercept[IllegalArgumentException] {
      EncodePipeline.encodeCheckpointed(spark, src, 2, dir2, tokensPerChunk = 64 * 1024)
    }
    assert(exOld.getMessage.contains("unknown"), exOld.getMessage)
  }

  test("streaming dedup: re-ingested content is dropped by keyed state, first-seen wins") {
    val docs = (0L until 40L).map(i => (i, s"content-$i"))
    val out = graft.streaming.StreamingDedup.runBatches(spark,
      Seq(
        docs,                                  // batch 1: everything
        docs.filter(_._1 % 4 == 0),            // batch 2: replayed ids
        Seq((999L, "content-7"), (1000L, "brand-new"))), // batch 3: same content, new id
      "graft_stream_dedup_spec")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // 40 originals + the one genuinely new doc; content-7 under id 999 was
    // dropped because its fingerprint was first seen as doc 7
    assert(out.length == 41, s"got ${out.length}")
    assert(out.map(_._1).toSeq == ((0L until 40L) :+ 1000L))
  }

  test("generic encode round-trips RANDOM schemas (fuzz)") {
    import org.apache.spark.sql.functions._
    val r = new java.util.Random(20260817L)
    for (iter <- 1 to 8) {
      val nCols = 1 + r.nextInt(6)
      val picks = Array.fill(nCols)(r.nextInt(14))
      val cols = picks.zipWithIndex.map { case (t, i) =>
        val base = t match {
          case 0 => (col("id") * 31 % 977).cast("int")
          case 1 => (col("id") * 7919L).cast("bigint")
          case 2 => (col("id") * 0.37).cast("double")
          case 3 => (col("id") * 0.5).cast("float")
          case 4 => (col("id") % 2 === 0).cast("boolean")
          case 5 => concat(lit("s-"), ((col("id") * 131) % 389).cast("string"))
          case 6 => (col("id").cast("decimal(12,3)") / lit(7).cast("decimal(4,0)"))
            .cast("decimal(12,3)")
          case 7 => date_add(lit(java.sql.Date.valueOf("2020-01-01")),
            (col("id") % 900).cast("int"))
          case 8 => (lit("2026-01-01 00:00:00").cast("timestamp")
            + expr(s"make_interval(0,0,0,0,0,0, CAST(id % 86400 AS INT))"))
          case 9 => array((col("id") % 97).cast("int"), ((col("id") * 3) % 89).cast("int"))
          // element-null-bearing arrays of every element type
          case 10 => array((col("id") * 7919L).cast("bigint"),
            when(col("id") % 5 === 0, lit(null)).otherwise(col("id") * 3L).cast("bigint"))
          case 11 => array(
            when(col("id") % 3 === 0, lit(null)).otherwise(col("id") * 0.11).cast("double"),
            (col("id") * 0.37).cast("double"))
          case 12 => array(
            when(col("id") % 4 === 0, lit(null))
              .otherwise(concat(lit("e-"), (col("id") % 53).cast("string"))).cast("string"),
            lit("z"))
          case _ => array(
            when(col("id") % 6 === 0, lit(null)).otherwise((col("id") % 71).cast("int"))
              .cast("int"),
            when(col("id") % 7 === 1, lit(null)).otherwise((col("id") % 13).cast("float"))
              .cast("float")).cast("array<float>")
        }
        // column-dependent null stripes (never on the unique key below)
        when(pmod(col("id") + lit(i), lit(7)) === 0, lit(null)).otherwise(base).as(s"c$i")
      }
      val df = spark.range(2500)
        .select(Seq(col("id")) ++ cols: _*)
        .coalesce(2)
      val back = GenericEncode.decode(spark,
        GenericEncode.encode(df, rowsPerChunk = 257))
      // unique id per row → two-sided except is an exact multiset compare
      assert(back.count() == 2500, s"schema #$iter (${picks.mkString(",")})")
      assert(df.exceptAll(back).count() == 0 && back.exceptAll(df).count() == 0,
        s"schema #$iter (${picks.mkString(",")}) mismatch")
    }
  }

  test("generic encode round-trips an arbitrary flat schema with nulls") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, when, lit, array, concat_ws}
    val df = spark.range(0, 5000, 1, 4).toDF("id")
      .select(
        col("id"),
        col("id").cast("int").as("i"),
        (col("id") * 1.5).as("d"),
        when(col("id") % 7 === 0, lit(null).cast("string"))
          .otherwise(concat_ws("-", lit("s"), col("id"))).as("s"),
        (col("id") % 2 === 0).as("b"),
        when(col("id") % 11 === 0, lit(null))
          .otherwise(array(col("id").cast("int"), lit(42))).as("arr"))
    val chunks = graft.spark.GenericEncode.encode(df, rowsPerChunk = 1024).cache()
    assert(chunks.count() > 1) // multiple chunks exercised
    val back = graft.spark.GenericEncode.decode(spark, chunks)
    assert(back.schema.fieldNames.toSeq == df.schema.fieldNames.toSeq)
    val a = df.orderBy("id").collect().map(_.toSeq.map {
      case x: Seq[_] => x.toList
      case x => x
    })
    val b = back.orderBy("id").collect().map(_.toSeq.map {
      case x: Seq[_] => x.toList
      case x => x
    })
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
    // null counts surfaced per column
    val nulls = chunks.collect().map(_.col_nulls.toVector).toVector.transpose.map(_.sum)
    assert(nulls(3) == (0 until 5000).count(_ % 7 == 0))
    assert(nulls(5) == (0 until 5000).count(_ % 11 == 0))
    chunks.unpersist()
  }

  test("generic encode flattens nested structs (incl. null structs) and array<string>") {
    import org.apache.spark.sql.functions.{col, lit, when, struct, array, concat_ws}
    val df = spark.range(0, 3000, 1, 3).toDF("id")
      .select(
        col("id"),
        when(col("id") % 4 === 0, lit(null)).otherwise(
          struct(
            (col("id") * 2).as("a"),
            struct(concat_ws("", lit("x"), col("id")).as("deep")).as("inner"))).as("meta"),
        array(lit("t1"), concat_ws("", lit("tag"), (col("id") % 5))).as("tags"),
        org.apache.spark.sql.functions.expr(
          "map(concat('k', CAST(id % 3 AS STRING)), CAST(id AS STRING))").as("props"),
        (col("id") * lit(0.01)).cast("decimal(12,4)").as("price"))
    val back = graft.spark.GenericEncode.decode(
      spark, graft.spark.GenericEncode.encode(df, rowsPerChunk = 512))
    assert(back.schema.fieldNames.toSeq == Seq("id", "meta", "tags", "props", "price"))
    assert(back.schema("meta").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(back.schema("props").dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
    val norm = (d: org.apache.spark.sql.DataFrame) =>
      d.selectExpr("id", "meta.a AS a", "meta.inner.deep AS deep",
        "meta IS NULL AS meta_null", "tags[1] AS tag",
        "props[concat('k', CAST(id % 3 AS STRING))] AS prop",
        "CAST(price AS STRING) AS price")
        .orderBy("id").collect().map(_.toSeq)
    val a = norm(df)
    val b = norm(back)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
  }

  test("generic encode covers float / date / timestamp / array<float>") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, when, array, to_date, to_timestamp, concat_ws}
    val df = spark.range(0, 2000, 1, 3).toDF("id")
      .select(
        col("id"),
        (col("id") * 0.25).cast("float").as("f"),
        to_timestamp(lit("2026-01-01 00:00:00")).as("base_ts"),
        to_date(lit("2026-03-01")).as("base_day"),
        when(col("id") % 9 === 0, lit(null))
          .otherwise(array((col("id") * 0.5).cast("float"), lit(1.5f))).as("fa"),
        when(col("id") % 6 === 0, lit(null))
          .otherwise(concat_ws("|", lit("payload"), col("id")).cast("binary")).as("blob"))
    val back = graft.spark.GenericEncode.decode(
      spark, graft.spark.GenericEncode.encode(df, rowsPerChunk = 512))
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("id").collect().map(_.toSeq.map {
        case x: Seq[_] => x.toList
        case x: Array[Byte] => x.toList
        case x => x
      })
    val a = norm(df)
    val b = norm(back)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
  }

  test("seekToRows: row-offset reads decode only covering pages") {
    import spark.implicits._
    val src = TokenTableGen.generate(spark, 4000, 4)
    val chunks = EncodePipeline.encode(src, 4, tokensPerChunk = 1 << 20).cache()
    // canonical order reference: full decode sorted by (part_id, chunk, row)
    val metas = chunks.collect().sortBy(c => (c.part_id, c.chunk_id))
    val fullOrdered = metas.flatMap(c => EncodePipeline.decodeChunk(c).toSeq)
    for (start <- Seq(0L, 17L, 1999L, 3990L)) {
      val got = EncodePipeline.seekToRows(chunks, start, 10).collect()
        .sortBy(_.doc_id)
      val want = fullOrdered.slice(start.toInt, start.toInt + 10).sortBy(_.doc_id)
      assert(got.map(_.doc_id).toSeq == want.map(_.doc_id).toSeq, s"start=$start")
      assert(got.zip(want).forall { case (a, b) => a.tokens.sameElements(b.tokens) })
    }
    // page skipping: a 10-row read of a ~2M-token chunk touches a small
    // fraction of its token pages
    val bigSrc = TokenTableGen.generate(spark, 10000, 2)
    val big = EncodePipeline.encodeAligned(bigSrc.repartition(1), tokensPerChunk = 1 << 22)
      .collect().maxBy(_.num_tokens)
    val lens = graft.codec.Chunks.decodeInts(
      graft.codec.BlockCompression.decompress(big.lens_bin))
    val (_, decoded, total) = graft.codec.StreamedTokens.decodeRows(
      graft.codec.BlockCompression.decompress(big.tokens_bin), lens,
      big.num_rows / 2, big.num_rows / 2 + 10)
    assert(total >= 8, s"chunk too small to evidence skipping: $total pages")
    assert(decoded * 2 <= total, s"decoded $decoded of $total pages")
    chunks.unpersist()
  }

  test("rowIndex: distributed prefix sums match the canonical order; persisted index works") {
    import spark.implicits._
    val src = TokenTableGen.generate(spark, 4000, 4)
    val chunks = EncodePipeline.encode(src, 4, tokensPerChunk = 64 * 1024).cache()
    val idx = EncodePipeline.rowIndex(chunks).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // reference prefix sums in (part_id, chunk_id) order
    val metas = chunks.select("part_id", "chunk_id", "num_rows").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
      .sortBy(m => (m._1, m._2))
    var pos = 0L
    val want = metas.map { case (_, id, n) => val s = pos; pos += n; (id, s, n) }
    assert(idx.sortBy(_._2).toSeq == want.toSeq)
    // a precomputed (persisted-style) index yields identical seeks
    val index = EncodePipeline.rowIndex(chunks)
    val a = EncodePipeline.seekToRows(chunks, 123, 7).collect().sortBy(_.doc_id)
    val b = EncodePipeline.seekToRows(chunks, 123, 7, Some(index)).collect().sortBy(_.doc_id)
    assert(a.map(_.doc_id).toSeq == b.map(_.doc_id).toSeq && a.length == 7)
    chunks.unpersist()
  }

  test("sorted-run compaction re-encodes only overlapping chunks") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, md5}
    val base = java.nio.file.Files.createTempDirectory("graft-compact-sorted").toString
    def doc(i: Long, suffix: String = "") = f"doc/$i%012d$suffix"
    def rows(range: Range, suffix: String = "") =
      spark.createDataset(range.map(i =>
        TokenRow(doc(i.toLong, suffix), Array.tabulate(40)(k => i + k), 40, "web")))
    // two disjoint sorted runs + a small run overlapping their boundary
    val a = rows(0 until 1000)
    val b = rows(1000 until 2000)
    val c = rows(995 until 1005, "-x") // doc/...995-x sorts inside a's tail / b's head
    EncodePipeline.encode(a, 4, tokensPerChunk = 8 * 1024).write.parquet(s"$base/runA")
    EncodePipeline.encode(b, 4, tokensPerChunk = 8 * 1024).write.parquet(s"$base/runB")
    EncodePipeline.encode(c, 1, tokensPerChunk = 8 * 1024).write.parquet(s"$base/runC")
    val out = EncodePipeline.compactSorted(
      spark, Seq(s"$base/runA", s"$base/runB", s"$base/runC"), s"$base/merged",
      tokensPerChunk = 8 * 1024)
    // content is exact
    val full = a.union(b).union(c)
    val decoded = EncodePipeline.decode(out.as[EncodedChunk])
    assert(EncodePipeline.verifyRoundTrip(full, decoded) == 0L)
    // non-overlapping chunks passed through byte-identical (>= 2x less
    // encode work: far more than half the chunks are untouched)
    val inHashes = Seq("runA", "runB", "runC")
      .flatMap(r => spark.read.parquet(s"$base/$r")
        .select(md5(col("tokens_bin"))).as[String].collect())
    val outHashes = out.select(md5(col("tokens_bin"))).as[String].collect()
    val passed = outHashes.count(inHashes.toSet)
    assert(passed.toDouble >= outHashes.length * 0.5,
      s"only $passed of ${outHashes.length} chunks passed through")
    assert(passed < outHashes.length, "expected SOME re-encoded chunks at the overlap")
    // compacted partition ranges are disjoint and ordered
    val ranges = out.select("part_id", "first_doc_id", "last_doc_id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .groupBy(_._1).map { case (p, cs) => (p, cs.map(_._2).min, cs.map(_._3).max) }
      .toSeq.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, _, aLast), (_, bFirst, _)) => assert(aLast <= bFirst, s"$aLast > $bFirst")
      case _ =>
    }
  }

  test("bin-pack compaction coalesces tiny disjoint runs; big chunks pass through") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, md5}
    val base = java.nio.file.Files.createTempDirectory("graft-binpack").toString
    def rows(range: Range) =
      spark.createDataset(range.map(i =>
        TokenRow(f"doc/$i%012d", Array.tabulate(8)(k => i + k), 8, "web")))
    // the common 100-TB layout: an already-compact HEAD followed by
    // tiny disjoint ingest debris at the TAIL (ids only grow). The head
    // must pass through byte-identical; only the debris repacks. (The
    // reverse order — debris before a compact chunk — may absorb the
    // boundary chunk into a waterline bin; that is one rewrite per
    // debris region, amortized nil, and correctness never depends on it.)
    val bigRange = 0 until 500
    EncodePipeline.encode(rows(bigRange), 1, tokensPerChunk = 4096)
      .write.parquet(s"$base/big")
    // 8 tiny runs: 25 docs × 8 tok each, 64-token chunk budget → 4 chunks per run
    val runs = (0 until 8).map { r =>
      EncodePipeline.encode(rows(600 + r * 25 until 600 + (r + 1) * 25), 1,
        tokensPerChunk = 64)
        .write.parquet(s"$base/run$r")
      s"$base/run$r"
    }
    val tinyCount = runs.map(spark.read.parquet(_).count()).sum
    val out = EncodePipeline.compactBinPack(
      spark, s"$base/big" +: runs, s"$base/packed", tokensPerChunk = 1024)
    // rows are exact
    val full = (0 until 8).map(r => rows(600 + r * 25 until 600 + (r + 1) * 25))
      .reduce(_ union _).union(rows(bigRange))
    val decoded = EncodePipeline.decode(out.as[EncodedChunk])
    assert(EncodePipeline.verifyRoundTrip(full, decoded) == 0L)
    // tiny chunks collapsed: packed tiny region ≈ 1600 tok / 1024 ≈ 2 bins
    val packedCount = out.count()
    assert(packedCount <= tinyCount / 4 + 2,
      s"packed $packedCount vs $tinyCount tiny chunks (+1 big)")
    // the already-compact run passed through byte-identical
    val bigHashes = spark.read.parquet(s"$base/big")
      .select(md5(col("tokens_bin"))).as[String].collect().toSet
    val outHashes = out.select(md5(col("tokens_bin"))).as[String].collect().toSet
    assert(bigHashes.subsetOf(outHashes), "big chunks were needlessly re-encoded")
    // packed ranges disjoint + ordered
    val ranges = out.select("first_doc_id", "last_doc_id")
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, aLast), (bFirst, _)) => assert(aLast < bFirst, s"$aLast >= $bFirst")
      case _ =>
    }
  }

  test("bin-pack dedupes and keeps overlap semantics when runs overlap") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-binpack-dd").toString
    def rows(range: Range) =
      spark.createDataset(range.map(i =>
        TokenRow(f"doc/$i%012d", Array.tabulate(8)(k => i + k), 8, "web")))
    EncodePipeline.encode(rows(0 until 100), 1, tokensPerChunk = 64)
      .write.parquet(s"$base/a")
    // full duplicate re-ingest of a middle slice
    EncodePipeline.encode(rows(40 until 60), 1, tokensPerChunk = 64)
      .write.parquet(s"$base/b")
    val out = EncodePipeline.compactBinPack(
      spark, Seq(s"$base/a", s"$base/b"), s"$base/packed",
      tokensPerChunk = 512, dropDuplicates = true)
    val decoded = EncodePipeline.decode(out.as[EncodedChunk])
    assert(EncodePipeline.verifyRoundTrip(rows(0 until 100), decoded) == 0L)
  }

  test("token filters push down to chunk ranges and blooms automatically") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_contains, col}
    // docs sorted by id; tokens(i) = [i/100] so per-chunk token ranges are
    // tight intervals aligned with the doc ranges
    val rows = spark.createDataset((0 until 2000).map(i =>
      TokenRow(f"doc/$i%06d", Array(i / 100), 1, "web")))
    val base = java.nio.file.Files.createTempDirectory("graft-tok-push").toString
    // corrupt every chunk whose doc range starts past doc/001000: reads
    // succeed only when pruning skips those chunks entirely
    EncodePipeline.encode(rows, 4, tokensPerChunk = 256)
      .map(c => if (c.first_doc_id > "doc/001000")
        c.copy(tokens_bin = Array[Byte](1, 2, 3)) else c)
      .write.parquet(s"$base/t")
    val tbl = spark.read.parquet(s"$base/t").as[EncodedChunk]
    // corruption is real: an unpruned read of the payload fails
    intercept[Exception] {
      EncodePipeline.decodeDF(tbl).selectExpr("size(tokens)").collect()
    }
    // doc_id range filter → [first_doc_id, last_doc_id] chunk pruning
    val byDoc = EncodePipeline.decodeDF(tbl)
      .filter(col("doc_id") < "doc/000500")
    assert(byDoc.selectExpr("sum(size(tokens))").collect()(0).getLong(0) == 500L)
    assert(byDoc.queryExecution.optimizedPlan.toString.contains("first_doc_id"))
    // array_contains → tokens_min/max + CRC-verified bloom probe
    val byTok = EncodePipeline.decodeDF(tbl)
      .filter(array_contains(col("tokens"), 3))
    assert(byTok.count() == 100)
    val p = byTok.queryExecution.optimizedPlan.toString
    assert(p.contains("tokens_min") && p.contains("bloom"), p.take(2000))
    // doc_id IN-list → interval over the list extremes
    val inDocs = EncodePipeline.decodeDF(tbl)
      .filter(col("doc_id").isin("doc/000010", "doc/000200"))
    assert(inDocs.count() == 2)
    assert(inDocs.queryExecution.optimizedPlan.toString.contains("first_doc_id"))
    // doc_id prefix scan → byte-wise [prefix, nextPrefix) window
    val pfx = EncodePipeline.decodeDF(tbl)
      .filter(col("doc_id").startsWith("doc/0003"))
    assert(pfx.count() == 100)
    assert(pfx.queryExecution.optimizedPlan.toString.contains("last_doc_id"))
    // and the same pruning behind plain SQL over a registered view
    graft.spark.GraftTables.registerTokenTable(spark, "graft_push_t", s"$base/t")
    val viaSql = spark.sql(
      "SELECT count(*) AS c FROM graft_push_t WHERE array_contains(tokens, 3)")
    assert(viaSql.collect()(0).getLong(0) == 100L)
    assert(viaSql.queryExecution.optimizedPlan.toString.contains("tokens_min"))
  }

  test("compaction dedupe drops duplicate doc_ids; pass-through chunks stay byte-identical") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, md5}
    val base = java.nio.file.Files.createTempDirectory("graft-compact-dd").toString
    def doc(i: Long) = f"doc/$i%012d"
    def rows(range: Range) =
      spark.createDataset(range.map(i =>
        TokenRow(doc(i.toLong), Array.tabulate(40)(k => i + k), 40, "web")))
    val a = rows(0 until 1000)
    val b = rows(1000 until 2000)
    val dup = rows(995 until 1005) // SAME doc_ids + payloads, straddling A/B
    EncodePipeline.encode(a, 4, tokensPerChunk = 8 * 1024).write.parquet(s"$base/runA")
    EncodePipeline.encode(b, 4, tokensPerChunk = 8 * 1024).write.parquet(s"$base/runB")
    EncodePipeline.encode(dup, 1, tokensPerChunk = 8 * 1024).write.parquet(s"$base/runC")
    val out = EncodePipeline.compactSorted(
      spark, Seq(s"$base/runA", s"$base/runB", s"$base/runC"), s"$base/merged",
      tokensPerChunk = 8 * 1024, dropDuplicates = true)
    // exactly the deduped union: 2000 rows, each doc_id once
    val decoded = EncodePipeline.decode(out.as[EncodedChunk])
    assert(EncodePipeline.verifyRoundTrip(a.union(b), decoded) == 0L)
    // chunks away from the overlap pass through byte-identical
    val inHashes = Seq("runA", "runB", "runC")
      .flatMap(r => spark.read.parquet(s"$base/$r")
        .select(md5(col("tokens_bin"))).as[String].collect()).toSet
    val outHashes = out.select(md5(col("tokens_bin"))).as[String].collect()
    val passed = outHashes.count(inHashes)
    assert(passed.toDouble >= outHashes.length * 0.5,
      s"only $passed of ${outHashes.length} chunks passed through")
    // and with no duplicates present, dropDuplicates=true changes nothing
    val out2 = EncodePipeline.compactSorted(
      spark, Seq(s"$base/runA", s"$base/runB"), s"$base/merged2",
      tokensPerChunk = 8 * 1024, dropDuplicates = true)
    assert(EncodePipeline.verifyRoundTrip(
      a.union(b), EncodePipeline.decode(out2.as[EncodedChunk])) == 0L)
  }

  test("checkpointed encode resumes idempotently") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val src = TokenTableGen.generate(spark, 3000, 4)
    val m1 = EncodePipeline.encodeCheckpointed(spark, src, 4, dir, tokensPerChunk = 64 * 1024)
    val rows1 = m1.selectExpr("sum(num_rows)").head().getLong(0)
    assert(rows1 == 3000L)
    // resume: everything done → no new work, metrics unchanged
    val m2 = EncodePipeline.encodeCheckpointed(spark, src, 4, dir, tokensPerChunk = 64 * 1024)
    val rows2 = m2.selectExpr("sum(num_rows)").head().getLong(0)
    assert(rows2 == 3000L)
    // decoded output matches source exactly
    val chunks = spark.read.parquet(s"$dir/chunks").as[EncodedChunk]
    val decoded = EncodePipeline.decode(chunks)
    assert(EncodePipeline.verifyRoundTrip(src, decoded) == 0L)
  }
}
