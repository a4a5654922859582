package graft

import graft.spark._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** SnapshotLog: commit/read/time-travel/expiry semantics over a chunk
  * table dir. The invariants under test are Iceberg's: a committed
  * snapshot's visible row set never changes (later appends invisible,
  * later compactions can't yank files), versions are monotone, and
  * expiry deletes exactly the files no retained snapshot can reach. */
class SnapshotSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-snap-$tag").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def writeSlice(dir: String, rows: org.apache.spark.sql.Dataset[TokenRow],
                         mode: String = "append"): Unit =
    EncodePipeline.encode(rows, numParts = 2, tokensPerChunk = 4096)
      .write.mode(mode)
      .option("compression", EncodePipeline.ChunkTableCompression)
      .parquet(s"$dir/chunks")

  private def docIdsAt(dir: String, v: Option[Int]): Set[String] = {
    import spark.implicits._
    EncodePipeline.decode(
        SnapshotLog.readChunks(spark, dir, v).as[EncodedChunk])
      .select("doc_id").as[String].collect().toSet
  }

  test("time travel: v1 sees only the first slice after a later append") {
    import spark.implicits._
    val dir = freshDir("travel")
    val all = TokenTableGen.generate(spark, 600, 5).cache()
    val a = all.filter(r => r.doc_id.hashCode % 2 == 0)
    val b = all.filter(r => r.doc_id.hashCode % 2 != 0)
    writeSlice(dir, a)
    val v1 = SnapshotLog.commit(spark, dir, "append")
    writeSlice(dir, b)
    val v2 = SnapshotLog.commit(spark, dir, "append")
    assert(v1 == 1 && v2 == 2)
    assert(SnapshotLog.versions(spark, dir) == Seq(1, 2))
    val wantA = a.map(_.doc_id).collect().toSet
    val wantAll = all.map(_.doc_id).collect().toSet
    assert(docIdsAt(dir, Some(v1)) == wantA)
    assert(docIdsAt(dir, Some(v2)) == wantAll)
    assert(docIdsAt(dir, None) == wantAll) // latest = v2
    assert(wantA != wantAll) // non-vacuous
  }

  test("snapshot isolation across a compaction-style rewrite") {
    import spark.implicits._
    val dir = freshDir("isolate")
    val rows = TokenTableGen.generate(spark, 400, 5).cache()
    writeSlice(dir, rows)
    val v1 = SnapshotLog.commit(spark, dir, "append")
    val want = rows.map(_.doc_id).collect().toSet
    // rewrite: same logical rows, different files (fewer partitions) —
    // overwrite replaces chunks/ contents, but v1's manifest still pins
    // the OLD files... which overwrite deletes. So a safe rewrite must
    // write NEW files alongside (as compaction staging does): emulate by
    // appending the rewrite then expiring the old snapshot.
    writeSlice(dir, rows)
    val v2 = SnapshotLog.commit(spark, dir, "compact")
    // v1 still reads exactly the original row set
    assert(docIdsAt(dir, Some(v1)) == want)
    // v2 sees both file generations (append-emulated rewrite = 2x rows)
    val v2Rows = EncodePipeline.decode(
      SnapshotLog.readChunks(spark, dir, Some(v2)).as[EncodedChunk]).count()
    assert(v2Rows == 2L * rows.count())
  }

  test("expiry deletes only files unreachable from retained snapshots") {
    import spark.implicits._
    val dir = freshDir("expire")
    val rows = TokenTableGen.generate(spark, 300, 5).cache()
    writeSlice(dir, rows)
    val v1 = SnapshotLog.commit(spark, dir, "append")
    val v1Files = SnapshotLog.snapshot(spark, dir, v1).files.toSet
    writeSlice(dir, rows.filter(r => r.doc_id.hashCode % 3 == 0))
    val v2 = SnapshotLog.commit(spark, dir, "append")
    val v2Files = SnapshotLog.snapshot(spark, dir, v2).files.toSet
    // v2 is a superset here (pure append): nothing is unreachable, so
    // expiring v1 deletes 0 data files but drops the manifest
    assert(v1Files.subsetOf(v2Files))
    val (dropped, deleted) = SnapshotLog.expireSnapshots(spark, dir, keepLast = 1)
    assert(dropped == 1 && deleted == 0)
    assert(SnapshotLog.versions(spark, dir) == Seq(v2))
    assert(docIdsAt(dir, None) == rows.map(_.doc_id).collect().toSet)
    intercept[IllegalArgumentException](SnapshotLog.snapshot(spark, dir, v1))
  }

  test("expiry physically deletes files only the dropped snapshot held") {
    import spark.implicits._
    val dir = freshDir("gc")
    val gen1 = TokenTableGen.generate(spark, 200, 5)
    writeSlice(dir, gen1)
    val v1 = SnapshotLog.commit(spark, dir, "append")
    val v1Files = SnapshotLog.snapshot(spark, dir, v1).files.toSet
    // generation 2: REPLACE the table contents (overwrite) — v2's
    // manifest shares no files with v1, so expiring v1 must delete
    // every v1-only file
    val gen2 = TokenTableGen.generate(spark, 150, 7)
    writeSlice(dir, gen2, mode = "overwrite")
    val v2 = SnapshotLog.commit(spark, dir, "overwrite")
    val v2Files = SnapshotLog.snapshot(spark, dir, v2).files.toSet
    val v1Only = v1Files -- v2Files
    // overwrite already removed the old files from disk; expiry must
    // count 0 deletions for already-gone files without erroring, OR
    // delete them if the FS kept them. Either way: after expiry no
    // manifest references a missing file.
    SnapshotLog.expireSnapshots(spark, dir, keepLast = 1)
    assert(SnapshotLog.versions(spark, dir) == Seq(v2))
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    SnapshotLog.snapshot(spark, dir, v2).files.foreach { f =>
      assert(hfs.exists(new org.apache.hadoop.fs.Path(s"$dir/$f")), f)
    }
    assert(docIdsAt(dir, None) ==
      gen2.map(_.doc_id).collect().toSet)
    assert(v1Only.nonEmpty) // the overwrite really turned over the files
  }

  test("equality delete: merge-on-read hides rows, time travel restores them") {
    import spark.implicits._
    val dir = freshDir("del")
    val rows = TokenTableGen.generate(spark, 500, 5).cache()
    writeSlice(dir, rows)
    val v1 = SnapshotLog.commit(spark, dir, "append")
    val victim = rows.map(_.source).collect().head
    val v2 = SnapshotLog.deleteWhere(spark, dir, col("source") === victim)
    assert(v2 == v1 + 1)
    val all = rows.map(_.doc_id).collect().toSet
    val kept = rows.filter(_.source != victim).map(_.doc_id).collect().toSet
    assert(kept != all) // non-vacuous
    // merge-on-read at v2, full set at v1, raw chunks untouched at v2
    assert(SnapshotLog.readRows(spark, dir, Some(v2))
      .map(_.doc_id).collect().toSet == kept)
    assert(SnapshotLog.readRows(spark, dir, Some(v1))
      .map(_.doc_id).collect().toSet == all)
    assert(SnapshotLog.snapshot(spark, dir, v2).files ==
      SnapshotLog.snapshot(spark, dir, v1).files) // no data file rewritten
    // a no-match delete commits nothing
    assert(SnapshotLog.deleteWhere(spark, dir,
      col("doc_id") === "no-such-id") == v2)
  }

  test("compaction applies deletes, dedupes, and commits a rewrite") {
    import spark.implicits._
    val dir = freshDir("ctab")
    val rows = TokenTableGen.generate(spark, 400, 5).cache()
    val a = rows.filter(r => r.doc_id.hashCode % 2 == 0)
    writeSlice(dir, a)
    SnapshotLog.commit(spark, dir, "append")
    writeSlice(dir, rows) // overlaps a: every a-doc now duplicated
    SnapshotLog.commit(spark, dir, "append")
    val victim = rows.map(_.source).collect().head
    val v3 = SnapshotLog.deleteWhere(spark, dir, col("source") === victim)
    val preFiles = SnapshotLog.snapshot(spark, dir, v3).files.toSet
    val v4 = SnapshotLog.compactTable(spark, dir, tokensPerChunk = 4096,
      dropDuplicates = true)
    val snap4 = SnapshotLog.snapshot(spark, dir, v4)
    // full turnover: new generation only, deletes folded away
    assert(snap4.files.toSet.intersect(preFiles).isEmpty)
    assert(snap4.deletes.isEmpty && snap4.removed.toSet == preFiles)
    val want = rows.filter(_.source != victim).map(_.doc_id).collect().toSet
    val got = SnapshotLog.readRows(spark, dir, Some(v4))
      .map(_.doc_id).collect()
    assert(got.toSet == want)
    assert(got.length == want.size) // dedupe: one row per doc_id
    // pre-compaction snapshot: deletes already in effect (merge-on-read)
    // but the physical duplicates are still there
    val v3Rows = SnapshotLog.readRows(spark, dir, Some(v3)).collect()
    assert(v3Rows.map(_.doc_id).toSet == want) // deletes already in effect
    assert(v3Rows.length > want.size) // but duplicates still present
    // an append after the rewrite must not re-adopt the tombstoned files
    writeSlice(dir, rows.filter(r => r.doc_id.hashCode % 7 == 0))
    val v5 = SnapshotLog.commit(spark, dir, "append")
    val snap5 = SnapshotLog.snapshot(spark, dir, v5)
    assert(snap5.files.toSet.intersect(preFiles).isEmpty)
    assert(snap5.files.toSet.size > snap4.files.toSet.size)
    // expiry GCs the replaced generation AND the applied delete files
    val (hfs0, _) = (new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration), ())
    val (dropped, deleted) = SnapshotLog.expireSnapshots(spark, dir, 2)
    assert(dropped == 3 && deleted > 0)
    preFiles.foreach { f =>
      assert(!hfs0.exists(new org.apache.hadoop.fs.Path(s"$dir/$f")), f)
    }
  }

  test("upsert: sequence-scoped delete spares its own rows; compaction folds") {
    import spark.implicits._
    val dir = freshDir("ups")
    val base = TokenTableGen.generate(spark, 300, 5).cache()
    writeSlice(dir, base)
    val v1 = SnapshotLog.commit(spark, dir, "append")
    val updated = base.filter(r => r.doc_id.hashCode % 3 == 0)
      .map(r => r.copy(source = "UPD"))
    val fresh = base.map(r => r.copy(doc_id = r.doc_id + "-new", source = "NEW"))
      .limit(15)
    val incoming = updated.unionAll(fresh).cache()
    assert(incoming.count() > 15) // non-vacuous update slice
    val v2 = SnapshotLog.upsert(spark, dir, incoming)
    val updKeys = updated.map(_.doc_id).collect().toSet
    val baseKeys = base.map(_.doc_id).collect().toSet
    val rows2 = SnapshotLog.readRows(spark, dir, Some(v2)).collect()
    // one row per key: every base key + 15 new, updated keys carry UPD
    assert(rows2.length == baseKeys.size + 15)
    assert(rows2.filter(r => updKeys(r.doc_id)).forall(_.source == "UPD"))
    assert(rows2.count(_.source == "NEW") == 15)
    // time travel: v1 still reads the pre-upsert sources
    assert(SnapshotLog.readRows(spark, dir, Some(v1))
      .collect().forall(r => r.source != "UPD" && r.source != "NEW"))
    // compaction folds the upsert: the scoped delete must NOT eat the
    // upserted rows even though their doc_ids are in the delete file
    val v3 = SnapshotLog.compactTable(spark, dir, tokensPerChunk = 4096)
    val rows3 = SnapshotLog.readRows(spark, dir, Some(v3)).collect()
    assert(rows3.map(r => (r.doc_id, r.source)).sorted.toSeq ==
      rows2.map(r => (r.doc_id, r.source)).sorted.toSeq)
    assert(SnapshotLog.snapshot(spark, dir, v3).deletes.isEmpty)
    // a delete AFTER the upsert applies to the upserted files too
    val v4 = SnapshotLog.deleteWhere(spark, dir, col("source") === "UPD")
    assert(SnapshotLog.readRows(spark, dir, Some(v4))
      .collect().forall(_.source != "UPD"))
  }

  test("incremental read returns exactly the appended slice") {
    import spark.implicits._
    val dir = freshDir("incr")
    val all = TokenTableGen.generate(spark, 450, 5).cache()
    val a = all.filter(r => math.abs(r.doc_id.hashCode % 3) == 0)
    val b = all.filter(r => math.abs(r.doc_id.hashCode % 3) == 1)
    val c = all.filter(r => math.abs(r.doc_id.hashCode % 3) == 2)
    writeSlice(dir, a); val v1 = SnapshotLog.commit(spark, dir, "append")
    writeSlice(dir, b); val v2 = SnapshotLog.commit(spark, dir, "append")
    writeSlice(dir, c); val v3 = SnapshotLog.commit(spark, dir, "append")
    def ids(from: Int, to: Int) = SnapshotLog
      .readIncremental(spark, dir, from, to).map(_.doc_id).collect().toSet
    val (ka, kb, kc) = (a.map(_.doc_id).collect().toSet,
      b.map(_.doc_id).collect().toSet, c.map(_.doc_id).collect().toSet)
    assert(ids(v1, v2) == kb)
    assert(ids(v2, v3) == kc)
    assert(ids(v1, v3) == kb ++ kc)
    assert(kb.nonEmpty && kc.nonEmpty && (kb ++ kc) != kb) // non-vacuous
    // a delete in the interval hides its rows from the feed
    val victim = all.map(_.source).collect().head
    val v4 = SnapshotLog.deleteWhere(spark, dir, col("source") === victim)
    assert(ids(v1, v4) ==
      (kb ++ kc) -- all.filter(_.source == victim).map(_.doc_id).collect())
    // a compaction in the interval is refused (it re-versions old rows)
    val v5 = SnapshotLog.compactTable(spark, dir, tokensPerChunk = 4096)
    intercept[IllegalArgumentException](
      SnapshotLog.readIncremental(spark, dir, v1, v5))
    // and consumption restarts cleanly from the compaction
    writeSlice(dir, a.map(r => r.copy(doc_id = r.doc_id + "-x")))
    val v6 = SnapshotLog.commit(spark, dir, "append")
    assert(ids(v5, v6) == ka.map(_ + "-x"))
  }

  test("rewrite commit validates removed files against the parent") {
    import spark.implicits._
    val dir = freshDir("rwv")
    writeSlice(dir, TokenTableGen.generate(spark, 100, 4))
    SnapshotLog.commit(spark, dir, "append")
    intercept[IllegalArgumentException](
      SnapshotLog.commitRewrite(spark, dir, "compact",
        removed = Set("chunks/not-a-file.parquet"), added = Nil))
    intercept[RuntimeException](
      SnapshotLog.commitRewrite(spark, freshDir("rwv2"), "compact",
        removed = Set.empty, added = Nil))
  }

  test("reading an uncommitted or unknown version fails loudly") {
    val dir = freshDir("err")
    import spark.implicits._
    writeSlice(dir, TokenTableGen.generate(spark, 50, 4))
    intercept[RuntimeException](SnapshotLog.readChunks(spark, dir, None))
    SnapshotLog.commit(spark, dir, "append")
    intercept[IllegalArgumentException](
      SnapshotLog.readChunks(spark, dir, Some(99)))
  }
}
