package graft.codec

/** PFOR — patched frame-of-reference (int32).
  *
  * Plain FOR's bit width is dictated by the chunk's full range, so ONE
  * outlier (a rare huge token id, a corrupt sentinel) widens every value
  * in the chunk. PFOR packs all values at a width `b` chosen to minimize
  * total bytes and stores the values that don't fit ("exceptions") as
  * sparse patches: the packed slot keeps the low `b` bits, a patch list
  * carries (gap-coded position, high bits) pairs applied after the bulk
  * unpack. This is the classic scheme from the public literature —
  * Zukowski et al., "Super-Scalar RAM-CPU Cache Compression" (ICDE'06)
  * and Lemire & Boytsov, "Decoding billions of integers per second
  * through vectorization" (SPE 2015) — re-expressed scalar-JVM; no
  * reference counterpart (parquet-go has no patched encoding; this is a
  * north-rule lightweight-compression addition, like FSST).
  *
  * Frame (after the [codec][uvarint n] chunk header):
  * {{{
  *   zigzag  min
  *   byte    b                  packed width, 0..32
  *   uvarint numExceptions
  *   packed  n x b bits         (v - min) low bits, exceptions included
  *   then per exception, ascending position:
  *   uvarint positionGap        (first is the absolute position)
  *   uvarint highBits           (v - min) >>> b, always > 0
  * }}}
  *
  * Bulk decode is the same memcpy-shaped unpack-and-add as FOR; the
  * patch loop touches only the exceptions (by construction a few % of
  * n), so decode speed is FOR's, not PLAIN's.
  */
object Pfor {

  /** Exact cost of width `b` given the delta-width histogram: packed
    * lows + per-exception patch bytes (gap ≈ 2 B amortized + uvarint
    * high). Shared by the encoder (exact hist) and the selector
    * (sampled hist, scaled). */
  def costForWidth(hist: Array[Int], n: Long, b: Int): Double = {
    var exc = 0L
    var excBytes = 0.0
    var w = b + 1
    while (w <= 32) {
      val c = hist(w)
      exc += c
      excBytes += c * (2.0 + (w - b + 6) / 7) // gap + uvarint(high)
      w += 1
    }
    10.0 + n.toDouble * b / 8.0 + excBytes
  }

  /** Width minimizing [[costForWidth]]. */
  def bestWidth(hist: Array[Int], n: Long): Int = {
    var best = 32
    var bestSz = Double.MaxValue
    var b = 0
    while (b <= 32) {
      val sz = costForWidth(hist, n, b)
      if (sz < bestSz) { bestSz = sz; best = b }
      b += 1
    }
    best
  }

  def encode(src: Array[Int], off: Int, n: Int, out: ByteWriter): Unit = {
    var mn = if (n > 0) src(off).toLong else 0L
    var i = 1
    while (i < n) {
      val v = src(off + i).toLong
      if (v < mn) mn = v
      i += 1
    }
    val hist = new Array[Int](33)
    i = 0
    while (i < n) {
      hist(BitPack.widthOfUnsignedLong(src(off + i).toLong - mn)) += 1
      i += 1
    }
    val b = bestWidth(hist, n)
    var numExc = 0
    var w = b + 1
    while (w <= 32) { numExc += hist(w); w += 1 }
    out.writeZigZag(mn)
    out.writeByte(b)
    out.writeUvarint(numExc)
    if (b > 0) {
      val mask = if (b == 32) 0xFFFFFFFFL else (1L << b) - 1
      val lows = new Array[Int](n)
      i = 0
      while (i < n) {
        lows(i) = ((src(off + i).toLong - mn) & mask).toInt
        i += 1
      }
      BitPack.packInts(lows, 0, n, b, out)
    }
    if (numExc > 0) {
      var prev = 0
      i = 0
      while (i < n) {
        val d = src(off + i).toLong - mn
        val high = d >>> b
        if (high > 0) {
          out.writeUvarint(i - prev)
          out.writeUvarint(high)
          prev = i
        }
        i += 1
      }
    }
  }

  def decode(r: ByteReader, n: Int): Array[Int] = {
    val mn = r.readZigZag()
    val b = r.readByte()
    val numExc = r.readUvarint().toInt
    val dst = new Array[Int](n)
    if (b > 0) r.skip(BitPack.unpackInts(r.buf, r.pos, b, dst, 0, n))
    // phase 1 — patch: exception slots become full DELTA bits (still
    // un-rebased; a delta is ≤ 2^32-1 so it round-trips through the
    // int's raw bits)
    val mask = if (b == 0) 0L else if (b == 32) 0xFFFFFFFFL else (1L << b) - 1
    var pos = 0
    var e = 0
    while (e < numExc) {
      pos += r.readUvarint().toInt
      val high = r.readUvarint()
      dst(pos) = ((high << b) | (dst(pos).toLong & mask)).toInt
      e += 1
    }
    // phase 2 — rebase every slot as unsigned delta + min (the same
    // wrap-safe add FOR uses)
    var i = 0
    while (i < n) {
      dst(i) = ((dst(i).toLong & 0xFFFFFFFFL) + mn).toInt
      i += 1
    }
    dst
  }
}
