package graft

import graft.spark.{EncodePipeline, TokenTableGen}
import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets.UTF_8

/** Round bench: times every SparkEntry query on SPARK_GRAFT_SF_DIR, then
  * runs the headline encode job at two parallelism levels to evidence
  * the north rule's two-cluster-size scaling criterion (BASELINE.md:
  * efficiency = (T_4N/T_N)/4, target ≥ 0.8).
  *
  * Each level runs in a FRESH child JVM — the sandbox stand-in for two
  * separate cluster sizes. A shared JVM contaminates the second level
  * with the first's JIT/code-cache/heap state and produced ±30%
  * run-to-run swings; fresh JVMs with their own full-size warm-up and
  * best-of-3 timing are reproducible. Prints ONE JSON line.
  */
object Bench {

  private def newSession(master: String, shufflePartitions: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(s"graft-bench-$master")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Split sizing for the toy-scale bench tables: the ~760 MB chunk
      // table / ~1.6 GB input at the DEFAULT 128 MB maxPartitionBytes
      // yield only ~6/~12 splits — the exchange-free paths (decode scan,
      // aligned encode) were then split-bound at BOTH core counts and
      // measured the file count, not the engine (decode clocked the same
      // 1.9 s at local[8] and local[32] in rounds 3-4a). At 100 TB a
      // chunk table has millions of files; 16 MB here restores the
      // many-splits regime the criterion describes.
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val NumParts = sys.env.getOrElse("GRAFT_BENCH_PARTS", "32").toInt

  /** Child-JVM mode: measure one parallelism level, print one line.
    * Input is the pre-materialized parquet table (the north rule's
    * Iceberg-style source), scanned by Spark's vectorized reader.
    * Modes: "full" (2 warm + 3 timed encode, aligned, decode),
    * "encdec" (1 warm + 2 timed encode, decode — the second weather
    * sample for both signals), "enc" (encode only — the local[2]
    * context level, where every extra pass costs 4x the wall time). */
  private def runLevel(cores: Int, inputPath: String, boundsPath: String,
                       mode: String): Unit = {
    val encodeOnly = mode != "full"
    val doDecode = mode != "enc"
    val spark = newSession(s"local[$cores]", cores)
    import spark.implicits._
    val bounds = {
      val src = scala.io.Source.fromFile(boundsPath, "UTF-8")
      try src.getLines().toArray finally src.close()
    }
    val src = spark.read.parquet(inputPath).as[graft.spark.TokenRow]
    import org.apache.spark.sql.functions.sum
    // full-size untimed warm-ups (JIT + shuffle paths; one is not enough
    // for C2 to finish on the codec kernels). Encode-only forks are the
    // second weather sample — they run lighter (1 warm + 2 timed) to keep
    // total bench wall time bounded.
    val warmups = if (encodeOnly) 1 else 2
    val timed = if (encodeOnly) 2 else 3
    for (_ <- 1 to warmups)
      EncodePipeline.encode(src, NumParts, boundsOverride = Some(bounds))
        .agg(sum("num_tokens")).collect()
    var best = Double.MaxValue
    var toks = 0L
    var enc = 0L
    var raw = 0L
    for (_ <- 1 to timed) {
      val t0 = System.nanoTime()
      val row = EncodePipeline.encode(src, NumParts, boundsOverride = Some(bounds))
        .agg(sum("num_tokens"), sum("enc_bytes"), sum("raw_bytes")).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      if (sec < best) { best = sec; toks = row.getLong(0); enc = row.getLong(1); raw = row.getLong(2) }
    }
    var bestAligned = -1.0
    if (!encodeOnly) {
      // layout-aligned encode (no exchange — input already range-laid-out)
      bestAligned = Double.MaxValue
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        EncodePipeline.encodeAligned(src).agg(sum("num_tokens")).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < bestAligned) bestAligned = sec
      }
    }
    // decode runs in BOTH the full and encdec forks (two weather windows —
    // the encode levels always had a second sample via the light forks,
    // decode did not, and a single bad window produced bogus decode
    // "scaling")
    var bestDec = -1.0
    var bestDecPruned = -1.0
    if (doDecode) {
      val chunkPath = s"/dev/shm/graft-bench-chunks-$cores"
      // small parquet row groups (4 MB ≈ 2 chunk rows) so the 16 MB split
      // sizing above can actually subdivide the ~24 MB files — a 128 MB
      // row group makes every file one indivisible split
      EncodePipeline.encode(src, NumParts, boundsOverride = Some(bounds))
        .write.mode("overwrite")
        .option("parquet.block.size", (4 * 1024 * 1024).toString)
        .option("compression", EncodePipeline.ChunkTableCompression)
        .parquet(chunkPath)
      val chunkTbl = spark.read.parquet(chunkPath).as[graft.spark.EncodedChunk]
      bestDec = Double.MaxValue
      import org.apache.spark.sql.functions.{col, count, max, size}
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        // columnar decode scan; the aggregate references ALL four columns
        // so automatic projection pruning can't shrink what this measures
        EncodePipeline.decodeDF(chunkTbl)
          .agg(sum("n_tok"), sum(size(col("tokens"))), max("doc_id"), count("source"))
          .collect()
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < bestDec) bestDec = sec
      }
      // projected decode: doc_id only — Catalyst prunes the decode to the
      // docid stream (token/source payloads never decoded)
      bestDecPruned = Double.MaxValue
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        EncodePipeline.decodeDF(chunkTbl).agg(max("doc_id")).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < bestDecPruned) bestDecPruned = sec
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(chunkPath))
    }
    println(s"GRAFT_LEVEL $cores $toks $enc $raw $best $bestDec $bestAligned $bestDecPruned")
    spark.stop()
  }

  /** Chunk-sized encode on T private threads; returns aggregate tokens/s
    * at the two thread counts. */
  private def kernelScaling(tLo: Int, tHi: Int): (Double, Double) = {
    val rows = 5000
    val data = Array.tabulate(rows)(i => TokenTableGen.genRow(i.toLong))
    val lens = data.map(_.tokens.length)
    val total = lens.map(_.toLong).sum.toInt
    val flat = new Array[Int](total)
    var off = 0
    data.foreach { r => System.arraycopy(r.tokens, 0, flat, off, r.tokens.length); off += r.tokens.length }
    def run(threads: Int): Double = {
      graft.codec.StreamedTokens.encode(flat, lens, rows, total) // warm
      val iters = 20
      val bufs = Array.fill(threads)(flat.clone())
      val t0 = System.nanoTime()
      val ts = bufs.map { b =>
        val t = new Thread(() => {
          var i = 0
          while (i < iters) { graft.codec.StreamedTokens.encode(b, lens, rows, total); i += 1 }
        })
        t.start(); t
      }
      ts.foreach(_.join())
      threads.toLong * iters * total / ((System.nanoTime() - t0) / 1e9)
    }
    run(tLo) // warm all JIT paths under contention once
    run(tHi)
    // interleave the levels so host-weather swings hit both equally
    var bestLo = 0.0
    var bestHi = 0.0
    for (_ <- 1 to 3) {
      bestLo = math.max(bestLo, run(tLo))
      bestHi = math.max(bestHi, run(tHi))
    }
    (bestLo, bestHi)
  }

  /** Parallel memcpy envelope at T threads (aggregate GB/s): this box's
    * effective bandwidth curve. On a real cluster N→4N executors add
    * aggregate DRAM bandwidth; a single shared-memory box does not, so
    * encode scaling is bounded by THIS curve, not by 4x — reported so
    * the efficiency numbers can be read against the hardware ceiling. */
  private def memcpyEnvelope(threads: Int): Double = {
    val bytes = 64 << 20
    val iters = 8
    val srcs = Array.fill(threads)(new Array[Byte](bytes))
    val dsts = Array.fill(threads)(new Array[Byte](bytes))
    def run(): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => {
          var i = 0
          while (i < iters) { System.arraycopy(srcs(t), 0, dsts(t), 0, bytes); i += 1 }
        })
        th.start(); th
      }
      ts.foreach(_.join())
      threads.toDouble * iters * bytes / ((System.nanoTime() - t0) / 1e9) / 1e9
    }
    run() // warm (faults the pages)
    math.max(run(), run())
  }

  /** Fork a fresh JVM running `runLevel`. */
  private def forkLevel(cores: Int, inputPath: String, boundsPath: String,
                        mode: String = "full"): (Long, Long, Long, Double, Double, Double, Double) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    // Cap the child heap independently of SPARK_DRIVER_MEM: this parent
    // JVM already holds a fixed pre-touched heap, the bench input +
    // shuffle scratch live on tmpfs, and all of it shares 128 GiB of
    // physical RAM. An uncapped (e.g. 85g) pre-touched child heap on top
    // gets the whole process tree OOM-killed (root cause of BENCH_r01's
    // exit 137).
    val mem = {
      val raw = sys.env.getOrElse("SPARK_DRIVER_MEM", "24g").trim.toLowerCase
      val num = raw.takeWhile(_.isDigit).toLong
      val gib = if (raw.endsWith("m")) num / 1024 else num
      s"${math.min(math.max(gib, 4L), 24L)}g"
    }
    // UNIQUE scratch root per fork, deleted when the child exits: the
    // 10x-tier run died mid-shuffle with ENOENT on temp_shuffle files
    // when another JVM sharing /dev/shm/graft-spark-local cleaned up —
    // blockmgr subdirs are per-JVM but the shared root is not
    // crash-isolated. A real cluster gives each executor its own NVMe
    // scratch; emulate that.
    val scratch = s"/dev/shm/graft-spark-local/fork-$cores-${System.nanoTime}"
    val cmd: Seq[String] =
      Seq(javaBin) ++ opens ++ Seq(
        s"-Xmx$mem", s"-Xms$mem", "-XX:+AlwaysPreTouch", "-XX:+UseParallelGC",
        "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        s"-Dspark.local.dir=$scratch",
        // lz4 shuffle compression measured FASTER than raw even on tmpfs
        // (fewer kernel-side bytes copied beats the compress CPU)
        "-Dspark.shuffle.compress=" + sys.env.getOrElse("GRAFT_SHUFFLE_COMPRESS", "true"),
        "-cp", System.getProperty("java.class.path"),
        "graft.Bench", "encode-level", cores.toString, inputPath, boundsPath, mode)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), UTF_8)
    proc.waitFor()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
    // persist the child's full output — a dead child's tail alone proved
    // undiagnosable (the 10x fork-32 failure surfaced as a mid-stack
    // 2000-char fragment with the root cause cut off)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(s"/tmp/graft-bench-fork-$cores-$mode.log"),
      out.getBytes(UTF_8))
    catch { case _: Exception => }
    val line = out.linesIterator.find(_.startsWith("GRAFT_LEVEL")).getOrElse {
      System.err.println(out.takeRight(2000))
      sys.error(s"child JVM for local[$cores] produced no result")
    }
    val parts = line.split(' ')
    (parts(2).toLong, parts(3).toLong, parts(4).toLong, parts(5).toDouble, parts(6).toDouble,
      parts(7).toDouble, parts(8).toDouble)
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 4 && args(0) == "encode-level") {
      runLevel(args(1).toInt, args(2), args(3), if (args.length > 4) args(4) else "full")
      return
    }

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    // 1. query timings on the driver-provided tables. Failures are LOUD:
    //    stack trace to stderr + a query_errors entry in the JSON (a
    //    broken query must never masquerade as a fast one).
    val queryErrors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results =
      if (sys.env.contains("GRAFT_BENCH_SKIP_QUERIES")) Seq.empty[(String, Double)]
      else {
        val spark = newSession(s"local[$cpus]", cpus.toInt)
        // untimed session warm-up (JIT + codegen + shuffle paths): the
        // alphabetically-first query otherwise absorbs ~7-10 s of
        // compiler time that is not its own cost
        try EncodePipeline.encode(TokenTableGen.generate(spark, 2000, 4), 4)
          .agg(org.apache.spark.sql.functions.sum("num_tokens")).collect()
        catch { case e: Exception => System.err.println(s"warm-up failed: $e") }
        try SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            Some(name -> (System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable =>
              System.err.println(s"BENCH QUERY FAILED: $name")
              e.printStackTrace()
              queryErrors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
                .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
              None
          }
        } finally spark.stop()
      }

    // Checkpoint the query evidence to bench.json NOW (flagged partial):
    // if anything kills the scaling phase, the per-query timings survive
    // machine-readably; the final envelope overwrites this file.
    locally {
      def r3p(d: Double): String =
        BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
      val qs = results.map { case (k, v) => "\"" + k + "\":" + r3p(v) }.mkString("{", ",", "}")
      val errs = queryErrors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
        .mkString("{", ",", "}")
      try java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
        (s"""{"metric":"total","value":${r3p(results.map(_._2).sum)},"unit":"sec",""" +
          s""""queries":$qs,"query_errors":$errs,"sf":"$sfDir","partial":true}""" + "\n")
          .getBytes(UTF_8))
      catch { case e: Exception => System.err.println(s"bench.json write failed: $e") }
    }

    // 2. north-rule scaling: identical job (same input, same 64-partition
    //    layout, persisted bounds) at N and 4N executor threads
    val benchRows = sys.env.getOrElse("GRAFT_BENCH_ROWS", "2000000").toLong
    val inputPath = "/dev/shm/graft-bench-input"
    val boundsPath = {
      val s = newSession("local[32]", 32)
      try {
        // materialize the Iceberg-style input table once (untimed)
        val gen = TokenTableGen.generate(s, benchRows, NumParts)
        gen.write.mode("overwrite").parquet(inputPath)
        import s.implicits._
        val tbl = s.read.parquet(inputPath).as[graft.spark.TokenRow]
        val b = EncodePipeline.massBalancedBounds(tbl, NumParts)
        val f = java.io.File.createTempFile("graft-bounds", ".txt")
        java.nio.file.Files.write(f.toPath, b.mkString("\n").getBytes(UTF_8))
        f.getAbsolutePath
      } finally s.stop()
    }
    // Two N→4N pairs, transparently: 8→32 saturates this box's DRAM
    // bandwidth (measured memcpy envelope is only 1.25x from 8 to 32
    // procs — see BASELINE.md), so 2→8 is ALSO measured, where the
    // hardware can actually express compute scaling. On a real cluster
    // N→4N adds aggregate memory bandwidth with the executors; a single
    // shared-memory box does not.
    val pLo = sys.env.getOrElse("GRAFT_BENCH_N", "8").toInt
    val pHi = pLo * 4
    val pXlo = math.max(1, pLo / 4)
    // GRAFT_BENCH_SKIP_LO=1 drops the local[2] context fork: at the 10x
    // row tier its 3 near-serial passes dominate the whole bench's wall
    // time while the criterion pair is 8->32 (measured round 5: the
    // local[2] fork alone ran ~1h at 20M rows).
    val skipLo = sys.env.contains("GRAFT_BENCH_SKIP_LO")
    // Levels INTERLEAVED across two fork rounds: host weather comes in
    // multi-minute bursts that would otherwise poison one level's whole
    // best-of-3; the second (encode-only) fork gives each level a sample
    // from a different weather window.
    val (tokX, _, _, secXa, _, _, _) =
      if (skipLo) (1L, 0L, 0L, Double.NaN, 0.0, 0.0, 0.0)
      else forkLevel(pXlo, inputPath, boundsPath, mode = "enc")
    val (tok8, _, _, sec8a, dec8a, al8, decP8a) = forkLevel(pLo, inputPath, boundsPath)
    val (tok32, enc32, raw32, sec32a, dec32a, al32, decP32a) = forkLevel(pHi, inputPath, boundsPath)
    // GRAFT_BENCH_SINGLE_ROUND=1 skips the second (encode-only) fork round:
    // at the 10x row tier each full fork already runs ~1h, so the
    // two-weather-window redundancy costs more wall time than it buys.
    val singleRound = sys.env.contains("GRAFT_BENCH_SINGLE_ROUND")
    val noB = (0L, 0L, 0L, Double.MaxValue, Double.MaxValue, 0.0, Double.MaxValue)
    val (_, _, _, sec8b, dec8b, _, decP8b) =
      if (singleRound) noB else forkLevel(pLo, inputPath, boundsPath, mode = "encdec")
    val (_, _, _, sec32b, dec32b, _, decP32b) =
      if (singleRound) noB else forkLevel(pHi, inputPath, boundsPath, mode = "encdec")
    val secX = secXa
    val sec8 = math.min(sec8a, sec8b)
    val sec32 = math.min(sec32a, sec32b)
    val dec8 = math.min(dec8a, dec8b)
    val dec32 = math.min(dec32a, dec32b)
    val decP8 = math.min(decP8a, decP8b)
    val decP32 = math.min(decP32a, decP32b)
    val thrX = tokX / secX
    val thr8 = tok8 / sec8
    val thr32 = tok32 / sec32
    val eff = (thr32 / thr8) / 4.0
    val effLo = (thr8 / thrX) / (pLo.toDouble / pXlo)

    // 3. raw kernel thread-scaling (no Spark): per-chunk encode at N and
    //    4N threads — isolates the codec engine from exchange overheads
    val (kThrLo, kThrHi) = kernelScaling(pLo, pHi)

    // 4. hardware envelope: what N→4N can even show on one box.
    //    Interleaved best-of-2 per level so a host-weather burst hits all
    //    levels instead of poisoning one ratio.
    var memLo = 0.0
    var memN = 0.0
    var memN4 = 0.0
    for (_ <- 1 to 2) {
      memLo = math.max(memLo, memcpyEnvelope(pXlo))
      memN = math.max(memN, memcpyEnvelope(pLo))
      memN4 = math.max(memN4, memcpyEnvelope(pHi))
    }
    val effVsEnvelope = (thr32 / thr8) / (memN4 / memN)
    val effLoVsEnvelope = (thr8 / thrX) / (memN / memLo)

    // free the tmpfs bench artifacts (shared 128 GiB with heaps/shuffle)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(inputPath))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(boundsPath))

    // --- output. BENCH_r01/r02 both ended up with parsed:null because the
    // single ~3.5 KB JSON line was head-truncated by the driver's tail
    // window (the surviving tail began mid-line). Three defenses:
    //  1. full-precision per-query timings go on an EARLIER prefixed line
    //     (human/diagnostic evidence, never meant for the parser);
    //  2. the machine-readable envelope is ONE SHORT final line — every
    //     double rounded (3dp secs/efficiencies, integer tokens/s) so the
    //     whole thing stays well under the tail window;
    //  3. the same envelope is also written to bench.json in the CWD.
    def r3(d: Double): String =
      if (d.isNaN || d.isInfinite) "null"
      else BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def rI(d: Double): String =
      if (d.isNaN || d.isInfinite) "null" else math.round(d).toString
    println("GRAFT_QUERY_SECS " +
      results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}"))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val errs = queryErrors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // The per-query map (51 entries, ~1.8 KB) lives ONLY in bench.json and on
    // the GRAFT_QUERY_SECS diagnostic line above — including it in the printed
    // envelope pushed the line past the driver's ~2.2 KB tail window three
    // rounds running (r01–r03 all captured parsed:null). The printed line must
    // stay ~700 B: scalar fields only.
    def envelope(withQueries: Boolean): String = {
      val qpart =
        if (withQueries) s""""queries":$qs,"query_errors":$errs,""" else ""
      s"""{"metric":"total","value":${r3(total)},"unit":"sec",$qpart"sf":"$sfDir",""" +
      s""""n_queries":${results.size},"n_query_errors":${queryErrors.size},""" +
      s""""encode_bench":{"rows":$benchRows,"tokens":$tok32,""" +
      s""""n_executors":$pLo,"n4_executors":$pHi,""" +
      s""""n_sec":${r3(sec8)},"n4_sec":${r3(sec32)},""" +
      s""""n_tokens_per_sec":${rI(thr8)},"n4_tokens_per_sec":${rI(thr32)},""" +
      s""""scaling_efficiency":${r3(eff)},""" +
      s""""lo_executors":$pXlo,"lo_sec":${r3(secX)},"lo_tokens_per_sec":${rI(thrX)},""" +
      s""""scaling_efficiency_lo_pair":${r3(effLo)},""" +
      s""""memcpy_gbps":{"$pXlo":${r3(memLo)},"$pLo":${r3(memN)},"$pHi":${r3(memN4)}},""" +
      s""""scaling_efficiency_vs_envelope":${r3(effVsEnvelope)},""" +
      s""""scaling_efficiency_lo_vs_envelope":${r3(effLoVsEnvelope)},""" +
      s""""decode_n_sec":${r3(dec8)},"decode_n4_sec":${r3(dec32)},""" +
      s""""decode_pruned_n_sec":${r3(decP8)},"decode_pruned_n4_sec":${r3(decP32)},""" +
      s""""aligned_n_sec":${r3(al8)},"aligned_n4_sec":${r3(al32)},""" +
      s""""aligned_scaling_efficiency":${r3((al8 / al32) / 4.0)},""" +
      s""""decode_scaling_efficiency":${r3((dec8 / dec32) / 4.0)},""" +
      s""""decode_n4_tokens_per_sec":${rI(tok32 / dec32)},""" +
      s""""kernel_n_tokens_per_sec":${rI(kThrLo)},"kernel_n4_tokens_per_sec":${rI(kThrHi)},""" +
      s""""kernel_scaling_efficiency":${r3((kThrHi / kThrLo) / 4.0)},""" +
      s""""bytes_per_token":${r3(enc32.toDouble / tok32)},""" +
      s""""compression_ratio":${r3(raw32.toDouble / enc32)}}}"""
    }
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
      (envelope(withQueries = true) + "\n").getBytes(UTF_8))
    catch { case e: Exception => System.err.println(s"bench.json write failed: $e") }
    println(envelope(withQueries = false))
  }
}
