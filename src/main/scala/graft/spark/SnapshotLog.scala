package graft.spark

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-style snapshot log over a chunk-table checkpoint directory.
  *
  * The north rule frames the input as an Iceberg table; this gives the
  * OUTPUT side the matching guarantees: every commit is an immutable,
  * numbered snapshot whose manifest pins the exact set of data files,
  * so readers get snapshot isolation (a reader planned against v1 never
  * sees v2's files, and a compaction that rewrites files cannot yank
  * them out from under an in-flight read), appends are atomic, and any
  * historical version stays queryable until explicitly expired.
  *
  * Layout (all I/O through the Hadoop FS API, so `dir` may be file:,
  * hdfs:, or s3a:):
  * {{{
  *   <dir>/chunks/...                    data files (any writer)
  *   <dir>/_snapshots/v00001.json        manifest: parent, operation,
  *                                       data-file list, summary counts
  * }}}
  *
  * The manifest WRITE is the commit point: `create(path, overwrite =
  * false)` is atomic in HDFS/local semantics, so two racing committers
  * produce two distinct versions (the loser retries with the next
  * number) — optimistic concurrency exactly as Iceberg's version-file
  * swap, with no lock service. There is deliberately no LATEST pointer
  * file: the current version is the max manifest number, derived by one
  * directory listing, so a crash between "write manifest" and "update
  * pointer" cannot exist.
  *
  * Scale note: manifests here hold the full file list as JSON — right
  * up to ~10^5 files per table. Past that, Iceberg splits the list into
  * parquet/avro manifest FILES plus a manifest list; the commit protocol
  * (atomic create of the numbered version file) is unchanged, so that
  * growth path swaps the payload format only. At 10^12 sequences the
  * table is partitioned into O(10^4) part_id directories of large files,
  * which this format covers.
  *
  * No reference counterpart (parquet-go writes single files and leaves
  * table semantics to the catalog above it); the snapshot layer is what
  * makes `encodeCheckpointed`'s output a TABLE rather than a directory.
  */
object SnapshotLog {
  private final val SnapDirName = "_snapshots"

  final case class Snapshot(
      version: Int,
      parent: Int, // 0 = root (no parent)
      operation: String, // "append" | "compact" | ...
      files: Seq[String], // relative to <dir>, sorted
      numFiles: Int,
      bytes: Long)

  private def fs(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestPath(dir: Path, v: Int): Path =
    new Path(new Path(dir, SnapDirName), f"v$v%05d.json")

  private val VersionRe = "v(\\d{5})\\.json".r

  /** All committed versions, ascending. One listing, no pointer file. */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val (hfs, root) = fs(spark, dir)
    val snapDir = new Path(root, SnapDirName)
    if (!hfs.exists(snapDir)) return Seq.empty
    hfs.listStatus(snapDir).toSeq
      .map(_.getPath.getName)
      .collect { case VersionRe(n) => n.toInt }
      .sorted
  }

  def currentVersion(spark: SparkSession, dir: String): Option[Int] =
    versions(spark, dir).lastOption

  /** Current data files under <dir>/chunks, paths relative to <dir>,
    * sorted (deterministic manifests for identical states). */
  private def dataFiles(hfs: FileSystem, root: Path): (Seq[String], Long) = {
    // makeQualified: listFiles returns fully-qualified paths (file:/...,
    // hdfs://nn/...) — the prefix must be qualified the same way or the
    // strip silently no-ops and the manifest records absolute paths
    val chunks = hfs.makeQualified(new Path(root, "chunks"))
    if (!hfs.exists(chunks)) return (Seq.empty, 0L)
    val rootStr = chunks.toString.stripSuffix("/")
    val it = hfs.listFiles(chunks, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
        buf += "chunks/" + f.getPath.toString.stripPrefix(rootStr + "/")
        bytes += f.getLen
      }
    }
    (buf.sorted.toSeq, bytes)
  }

  private def render(s: Snapshot): String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    JsonMethods.compact(JsonMethods.render(
      ("version" -> s.version) ~ ("parent" -> s.parent) ~
        ("operation" -> s.operation) ~ ("num_files" -> s.numFiles) ~
        ("bytes" -> s.bytes) ~ ("files" -> s.files)))
  }

  private def parse(text: String): Snapshot = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(text)
    Snapshot(
      version = (j \ "version").extract[Int],
      parent = (j \ "parent").extract[Int],
      operation = (j \ "operation").extract[String],
      files = (j \ "files").extract[Seq[String]],
      numFiles = (j \ "num_files").extract[Int],
      bytes = (j \ "bytes").extract[Long])
  }

  /** Commit the CURRENT contents of <dir>/chunks as the next snapshot.
    * Atomic: the numbered manifest is created with overwrite = false; a
    * concurrent committer that wins the race just bumps this one to the
    * next number (bounded retries). Returns the committed version. */
  def commit(spark: SparkSession, dir: String, operation: String): Int = {
    val (hfs, root) = fs(spark, dir)
    val (files, bytes) = dataFiles(hfs, root)
    hfs.mkdirs(new Path(root, SnapDirName))
    var attempts = 0
    while (attempts < 64) {
      val v = currentVersion(spark, dir).getOrElse(0) + 1
      val snap = Snapshot(v, v - 1, operation, files, files.size, bytes)
      val p = manifestPath(root, v)
      try {
        val out = hfs.create(p, false) // overwrite=false IS the lock
        try out.write(render(snap).getBytes(UTF_8)) finally out.close()
        return v
      } catch {
        case _: java.io.IOException => attempts += 1 // lost the race; re-list
      }
    }
    sys.error(s"snapshot commit at $dir: lost the version race 64 times")
  }

  def snapshot(spark: SparkSession, dir: String, version: Int): Snapshot = {
    val (hfs, root) = fs(spark, dir)
    val p = manifestPath(root, version)
    require(hfs.exists(p), s"snapshot v$version does not exist at $dir " +
      s"(have: ${versions(spark, dir).mkString(", ")})")
    val in = hfs.open(p)
    try parse(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    finally in.close()
  }

  /** Read the chunk table AS OF a snapshot: exactly the manifest's files,
    * nothing newer (time travel), nothing removed since (isolation from
    * compaction). `version = None` reads the latest snapshot — which is
    * still pinned planning: files that land mid-query are invisible. */
  def readChunks(spark: SparkSession, dir: String,
                 version: Option[Int] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, dir)).getOrElse(
      sys.error(s"no snapshots committed at $dir"))
    val snap = snapshot(spark, dir, v)
    require(snap.files.nonEmpty, s"snapshot v$v at $dir is empty")
    val paths = snap.files.map(f => s"$dir/$f")
    // basePath keeps the part_id partition column derivable from the
    // directory layout even though we list leaf files explicitly
    spark.read.option("basePath", s"$dir/chunks").parquet(paths: _*)
  }

  /** Expire snapshots older than `keepLast` versions: drops their
    * manifests and deletes data files unreachable from any RETAINED
    * snapshot (the file GC a 100-TB table needs — compacted-away chunk
    * files are only physically deleted once no live snapshot can plan
    * them). Returns (#manifests dropped, #files deleted). */
  def expireSnapshots(spark: SparkSession, dir: String,
                      keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val (hfs, root) = fs(spark, dir)
    val all = versions(spark, dir)
    val (drop, keep) = all.splitAt(math.max(0, all.size - keepLast))
    if (drop.isEmpty) return (0, 0)
    val live: Set[String] =
      keep.flatMap(v => snapshot(spark, dir, v).files).toSet
    val dead = drop.flatMap(v => snapshot(spark, dir, v).files).toSet -- live
    var deleted = 0
    dead.foreach { rel =>
      if (hfs.delete(new Path(root, rel), false)) deleted += 1
    }
    drop.foreach(v => hfs.delete(manifestPath(root, v), false))
    (drop.size, deleted)
  }
}
