package graft

import graft.codec._
import graft.spark.TokenTableGen

/** Dev-only: single-thread throughput of the raw kernels, no Spark. */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val rows = 100000
    def time(name: String, tokens: Long)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"KPROBE $name ${s}%.3f s  ${tokens / s / 1e6}%.1f M tok/s")
    }
    // generation
    var data: Array[graft.spark.TokenRow] = null
    for (i <- 1 to 3)
      time(s"gen-$i", 20000000L) { data = Array.tabulate(rows)(i => TokenTableGen.genRow(i.toLong)) }
    val total = data.map(_.tokens.length.toLong).sum
    println(s"KPROBE total tokens: $total")
    val flat = new Array[Int](total.toInt)
    var off = 0
    data.foreach { r => System.arraycopy(r.tokens, 0, flat, off, r.tokens.length); off += r.tokens.length }

    for (i <- 1 to 3) {
      time(s"stats-$i", total)(Chunks.intStats(flat, 0, flat.length))
      time(s"encode-auto-$i", total) {
        val enc = Chunks.encodeInts(flat, 0, flat.length)
        if (i == 1) println(s"KPROBE   auto codec: ${Chunks.codecName(enc)} ${enc.length} bytes")
      }
      time(s"encode-delta-$i", total)(Chunks.encodeInts(flat, 0, flat.length, Codecs.DeltaInt))
      time(s"encode-dict-$i", total)(Chunks.encodeInts(flat, 0, flat.length, Codecs.DictInt))
      // dict per 64Ki page — the shape the pipeline actually runs (per-
      // page dictionaries stay cache-resident; whole-buffer dict above is
      // the worst case, not the production path)
      time(s"encode-dict-paged-$i", total) {
        val out = new ByteWriter(flat.length)
        var o = 0
        while (o < flat.length) {
          val pn = math.min(Chunks.DefaultPageValues, flat.length - o)
          Chunks.encodeIntsInto(flat, o, pn, Codecs.DictInt, out)
          o += pn
        }
      }
      time(s"encode-plain-$i", total)(Chunks.encodeInts(flat, 0, flat.length, Codecs.PlainInt))
      // dict on a vocab-range stream — what the family separation feeds
      // the selector (zipf ids < 50k => direct-map fast path)
      if (i == 1) {
        val zipf = data.filter(r => r.tokens.nonEmpty && r.tokens.forall(t => t >= 0 && t < 50000))
        val zTotal = zipf.map(_.tokens.length.toLong).sum
        val zFlat = new Array[Int](zTotal.toInt)
        var zo = 0
        zipf.foreach { r => System.arraycopy(r.tokens, 0, zFlat, zo, r.tokens.length); zo += r.tokens.length }
        for (k <- 1 to 3)
          time(s"encode-dict-vocab-$k", zTotal)(Chunks.encodeInts(zFlat, 0, zFlat.length, Codecs.DictInt))
      }
      val enc = Chunks.encodeInts(flat, 0, flat.length)
      time(s"decode-$i", total)(Chunks.decodeInts(enc))
    }
    // streamed (the real shape): row-family streams + per-page selection
    val lens = data.map(_.tokens.length)
    for (i <- 1 to 3)
      time(s"encode-streamed-$i", total) {
        val (enc, codecs) = StreamedTokens.encode(flat, lens, rows, flat.length)
        if (i == 1) println(s"KPROBE   streamed: $codecs ${enc.length} bytes (${enc.length.toDouble / total} B/tok)")
      }
    val streamed = StreamedTokens.encode(flat, lens, rows, flat.length)._1
    for (i <- 1 to 3)
      time(s"decode-streamed-$i", total)(StreamedTokens.decode(streamed, lens))

    // raw kernel thread-scaling (no Spark): T threads, each encoding a
    // private copy of the buffer; perfect scaling = constant wall time
    // chunk-sized work per call (1M tokens ≈ the pipeline's chunk budget)
    val chunkRows = rows / 20
    val chunkLens = java.util.Arrays.copyOf(lens, chunkRows)
    val chunkTok = chunkLens.sum
    for (threads <- Seq(1, 2, 4, 8, 16, 32)) {
      val bufs = Array.fill(threads)(java.util.Arrays.copyOf(flat, chunkTok))
      StreamedTokens.encode(bufs(0), chunkLens, chunkRows, chunkTok)
      val iters = 20
      val t0 = System.nanoTime()
      val ts = bufs.map { b =>
        val t = new Thread(() => {
          var i = 0
          while (i < iters) { StreamedTokens.encode(b, chunkLens, chunkRows, chunkTok); i += 1 }
        })
        t.start(); t
      }
      ts.foreach(_.join())
      val s = (System.nanoTime() - t0) / 1e9
      val tot = threads.toLong * iters * chunkTok
      println(f"KPROBE threads=$threads%2d wall=${s}%.2f s aggregate=${tot / s / 1e6}%.1f M tok/s per-thread=${tot / s / 1e6 / threads}%.1f")
    }
  }
}
