package graft.codec

/** Gorilla-style XOR double encoding (Pelkonen et al., "Gorilla: A
  * Fast, Scalable, In-Memory Time Series Database", VLDB'15 §4.1.2 —
  * re-derived from the paper; no reference counterpart: parquet-go's
  * only float codecs are PLAIN and BYTE_STREAM_SPLIT,
  * bytestreamsplit.go:23-51).
  *
  * The float family's third regime. ALP owns DECIMAL doubles (prices);
  * BSS owns uncorrelated mantissas (embeddings); XOR owns SMOOTH
  * series — consecutive values sharing sign/exponent/high-mantissa
  * bits (sensor feeds, cumulative counters, binary-fraction grids),
  * where `bits(v[i]) ^ bits(v[i-1])` is zero or confined to a short
  * window. Per value: '0' for identical bits; '10' + meaningful bits
  * when the XOR fits the previous (lz, tz) window; '11' + 5-bit
  * leading-zero count + 6-bit length + the bits otherwise. Exactness
  * is trivially by construction (raw bits round-trip through XOR);
  * NaN/±Inf/-0.0 need no special casing.
  *
  * Payload layout (after the chunk frame's codec byte + count):
  * [nBytes:uvarint][MSB-first bit stream]. The auto selector probes a
  * CONTIGUOUS prefix (XOR compression lives in adjacency — a strided
  * sample like ALP's would destroy the very correlation it measures)
  * and picks XOR only when the probe beats PLAIN decisively; the
  * caller's PLAIN floor guards the tail regardless.
  */
object Xor {

  /** MSB-first bit writer over a ByteWriter-compatible byte buffer. */
  private final class BitW(hint: Int) {
    var buf = new Array[Byte](math.max(hint, 64))
    var bitLen: Long = 0L
    @inline private def ensure(bits: Int): Unit = {
      val need = ((bitLen + bits + 7) >>> 3).toInt
      if (need > buf.length) {
        var cap = buf.length
        while (cap < need) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, cap)
      }
    }
    @inline def writeBit(b: Int): Unit = {
      ensure(1)
      if (b != 0) buf((bitLen >>> 3).toInt) =
        (buf((bitLen >>> 3).toInt) | (0x80 >>> (bitLen & 7L).toInt)).toByte
      bitLen += 1
    }
    /** low `w` bits of v, MSB first. */
    @inline def writeBits(v: Long, w: Int): Unit = {
      ensure(w)
      var i = w - 1
      while (i >= 0) {
        if (((v >>> i) & 1L) != 0L) buf((bitLen >>> 3).toInt) =
          (buf((bitLen >>> 3).toInt) | (0x80 >>> (bitLen & 7L).toInt)).toByte
        bitLen += 1
        i -= 1
      }
    }
    def byteLength: Int = ((bitLen + 7) >>> 3).toInt
  }

  private final class BitR(buf: Array[Byte], off: Int) {
    var bitPos: Long = off.toLong << 3
    @inline def readBit(): Int = {
      val b = (buf((bitPos >>> 3).toInt) >>> (7 - (bitPos & 7L).toInt)) & 1
      bitPos += 1
      b
    }
    @inline def readBits(w: Int): Long = {
      var v = 0L
      var i = 0
      while (i < w) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }

  def encodeDoubles(src: Array[Double], off: Int, n: Int, out: ByteWriter): Unit = {
    if (n == 0) return
    val bw = new BitW(8 + n) // smooth series average well under 1 B/val
    var prev = java.lang.Double.doubleToRawLongBits(src(off))
    bw.writeBits(prev, 64)
    var winLz = -1
    var winTz = -1
    var i = 1
    while (i < n) {
      val cur = java.lang.Double.doubleToRawLongBits(src(off + i))
      val x = prev ^ cur
      if (x == 0L) bw.writeBit(0)
      else {
        bw.writeBit(1)
        // lz capped at 31 so it fits 5 bits (paper's exact choice);
        // meaningful length 1..64 stored as len-1 in 6 bits
        val lz = math.min(java.lang.Long.numberOfLeadingZeros(x), 31)
        val tz = java.lang.Long.numberOfTrailingZeros(x)
        if (winLz >= 0 && lz >= winLz && tz >= winTz) {
          bw.writeBit(0)
          bw.writeBits(x >>> winTz, 64 - winLz - winTz)
        } else {
          bw.writeBit(1)
          val men = 64 - lz - tz
          bw.writeBits(lz.toLong, 5)
          bw.writeBits((men - 1).toLong, 6)
          bw.writeBits(x >>> tz, men)
          winLz = lz
          winTz = tz
        }
      }
      prev = cur
      i += 1
    }
    out.writeUvarint(bw.byteLength.toLong)
    out.writeBytes(bw.buf, 0, bw.byteLength)
  }

  def decodeDoubles(r: ByteReader, n: Int): Array[Double] = {
    val dst = new Array[Double](n)
    if (n == 0) return dst
    val nBytes = r.readUvarint().toInt
    val br = new BitR(r.buf, r.pos)
    r.pos += nBytes
    var prev = br.readBits(64)
    dst(0) = java.lang.Double.longBitsToDouble(prev)
    var winLz = 0
    var winTz = 0
    var i = 1
    while (i < n) {
      if (br.readBit() != 0) {
        if (br.readBit() != 0) {
          winLz = br.readBits(5).toInt
          val men = br.readBits(6).toInt + 1
          winTz = 64 - winLz - men
          prev ^= (br.readBits(men) << winTz)
        } else {
          prev ^= (br.readBits(64 - winLz - winTz) << winTz)
        }
      }
      dst(i) = java.lang.Double.longBitsToDouble(prev)
      i += 1
    }
    dst
  }

  /** Probe a CONTIGUOUS prefix and return the estimated encoded bytes
    * per value; the caller compares against PLAIN's 8. */
  def probeBytesPerValue(src: Array[Double], off: Int, n: Int): Double = {
    val m = math.min(n, 2048)
    if (m < 2) return 8.0
    val bw = new ByteWriter(16 + m)
    encodeDoubles(src, off, m, bw)
    bw.length.toDouble / m
  }
}
