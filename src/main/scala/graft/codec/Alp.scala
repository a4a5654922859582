package graft.codec

/** ALP-style adaptive lossless decimal-double encoding (Afroozeh &
  * Boncz, "ALP: Adaptive Lossless floating-Point compression", VLDB'23
  * — re-derived from the paper's idea, no reference counterpart; the
  * reference's only float codec is BYTE_STREAM_SPLIT,
  * bytestreamsplit.go:23-51).
  *
  * Real-world double columns are overwhelmingly DECIMALS (prices,
  * rates, measurements) printed into binary floats. For those, the
  * integer `round(d * 10^e)` round-trips BIT-EXACTLY through
  * `long / 10^e`, so the chunk stores small integers (which then ride
  * the existing long codec stack: delta/FOR/plain) instead of opaque
  * 8-byte patterns. Values that fail the bit-exact probe (true
  * continuous doubles, NaN, ±Inf, -0.0) become PATCHED EXCEPTIONS,
  * PFOR-style: their positions + raw bits stored verbatim, their slot
  * in the integer stream filled with the previous encodable integer so
  * the packed stream stays smooth.
  *
  * Exactness is BY CONSTRUCTION: the encoder keeps a value in the
  * integer stream only if replaying the exact decode expression
  * (`l.toDouble / 10^e`) reproduces the original raw bits.
  *
  * Payload layout (after the chunk frame's codec byte + count):
  * [e:u8][len:uvarint][longs block (Chunks.encodeLongs frame)]
  * [nExc:uvarint][if nExc>0: len:uvarint + positions (delta ints frame),
  *  raw doubles LE 8B each]
  */
object Alp {
  /** 10^0..10^15 — all exactly representable as doubles (≤ 2^53). */
  private val Pow10: Array[Double] = Array.tabulate(16)(i => math.pow(10.0, i))
  final val MaxExp = 15

  @inline private def encodable(d: Double, e: Int): Boolean = {
    val l = Math.round(d * Pow10(e))
    java.lang.Double.doubleToRawLongBits(l.toDouble / Pow10(e)) ==
      java.lang.Double.doubleToRawLongBits(d)
  }

  /** Smallest exponent maximizing sample hits; -1 when even the best
    * exponent encodes < minHitShare of the sample. */
  def chooseExponent(src: Array[Double], off: Int, n: Int,
                     minHitShare: Double = 0.7): Int = {
    val sample = math.min(n, 512)
    val stride = math.max(1, n / sample)
    val hits = new Array[Int](MaxExp + 1)
    var s = 0
    var i = 0
    while (i < n && s < sample) {
      val d = src(off + i)
      var e = 0
      while (e <= MaxExp) {
        if (encodable(d, e)) hits(e) += 1
        e += 1
      }
      s += 1
      i += stride
    }
    var best = 0
    var e = 0
    while (e <= MaxExp) { if (hits(e) > hits(best)) best = e; e += 1 }
    // prefer the SMALLEST exponent within one hit of the best: larger
    // exponents scale the integers (and their bit widths) up 10x each
    var chosen = best
    e = 0
    while (e < best) {
      if (hits(e) >= hits(best) - 1 && chosen == best) chosen = e
      e += 1
    }
    if (hits(chosen) < minHitShare * s) -1 else chosen
  }

  def encodeDoubles(src: Array[Double], off: Int, n: Int, e: Int,
                    out: ByteWriter): Unit = {
    val longs = new Array[Long](n)
    var excPos = new Array[Int](8)
    var excVal = new Array[Long](8)
    var nExc = 0
    var fill = 0L
    var i = 0
    while (i < n) {
      val d = src(off + i)
      if (encodable(d, e)) {
        fill = Math.round(d * Pow10(e))
        longs(i) = fill
      } else {
        if (nExc == excPos.length) {
          excPos = java.util.Arrays.copyOf(excPos, nExc * 2)
          excVal = java.util.Arrays.copyOf(excVal, nExc * 2)
        }
        excPos(nExc) = i
        excVal(nExc) = java.lang.Double.doubleToRawLongBits(d)
        nExc += 1
        longs(i) = fill // filler keeps the packed stream smooth
      }
      i += 1
    }
    out.writeByte(e)
    val longsBlock = Chunks.encodeLongs(longs, 0, n)
    out.writeUvarint(longsBlock.length)
    out.writeBytes(longsBlock, 0, longsBlock.length)
    out.writeUvarint(nExc)
    if (nExc > 0) {
      val posBlock = new ByteWriter(16 + nExc)
      DeltaBinaryPacked.encodeInts(excPos, 0, nExc, posBlock)
      out.writeUvarint(posBlock.length)
      out.writeBytes(posBlock.toArray, 0, posBlock.length)
      var k = 0
      while (k < nExc) { out.writeLE64(excVal(k)); k += 1 }
    }
  }

  def decodeDoubles(r: ByteReader, n: Int): Array[Double] = {
    val e = r.readByte()
    require(e >= 0 && e <= MaxExp, s"ALP exponent out of range: $e")
    val longsLen = r.readUvarint().toInt
    val longs = Chunks.decodeLongs(r.readBytes(longsLen))
    require(longs.length == n, s"ALP longs block has ${longs.length} of $n")
    val p10 = Pow10(e)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = longs(i).toDouble / p10; i += 1 }
    val nExc = r.readUvarint().toInt
    if (nExc > 0) {
      val posLen = r.readUvarint().toInt
      val pos = DeltaBinaryPacked.decodeInts(new ByteReader(r.readBytes(posLen)))
      require(pos.length == nExc, s"ALP exception count mismatch")
      var k = 0
      while (k < nExc) {
        out(pos(k)) = java.lang.Double.longBitsToDouble(r.readLE64())
        k += 1
      }
    }
    out
  }
}
