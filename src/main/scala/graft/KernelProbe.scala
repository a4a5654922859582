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
      time(s"encode-plain-$i", total)(Chunks.encodeInts(flat, 0, flat.length, Codecs.PlainInt))
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
  }
}
