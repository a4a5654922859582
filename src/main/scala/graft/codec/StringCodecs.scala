package graft.codec

/** DELTA_LENGTH_BYTE_ARRAY — all lengths as one DELTA_BINARY_PACKED int32
  * block, followed by the concatenated raw bytes.
  * (reference: encoding/delta/length_byte_array.go:20-63)
  */
object DeltaLengthByteArray {

  def encode(src: Array[Array[Byte]], off: Int, n: Int, out: ByteWriter): Unit = {
    val lengths = new Array[Int](n)
    var total = 0L
    var i = 0
    while (i < n) { lengths(i) = src(off + i).length; total += lengths(i); i += 1 }
    DeltaBinaryPacked.encodeInts(lengths, 0, n, out)
    i = 0
    while (i < n) { out.writeBytes(src(off + i)); i += 1 }
  }

  def decode(r: ByteReader): Array[Array[Byte]] = {
    val lengths = DeltaBinaryPacked.decodeInts(r)
    val n = lengths.length
    val dst = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { dst(i) = r.readBytes(lengths(i)); i += 1 }
    dst
  }
}

/** DELTA_BYTE_ARRAY — incremental (front) coding: per value, the length of
  * the prefix shared with the previous value, then the suffix; prefix
  * lengths and suffix lengths are DELTA_BINARY_PACKED, suffix bytes are
  * concatenated. Big win on sorted keys like `doc_id`.
  * (reference: encoding/delta/byte_array.go:27-78,200-215)
  */
object DeltaByteArray {

  private def commonPrefix(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a(i) == b(i)) i += 1
    i
  }

  def encode(src: Array[Array[Byte]], off: Int, n: Int, out: ByteWriter): Unit = {
    val prefixLen = new Array[Int](n)
    val suffixLen = new Array[Int](n)
    var i = 0
    while (i < n) {
      val p = if (i == 0) 0 else commonPrefix(src(off + i - 1), src(off + i))
      prefixLen(i) = p
      suffixLen(i) = src(off + i).length - p
      i += 1
    }
    DeltaBinaryPacked.encodeInts(prefixLen, 0, n, out)
    DeltaBinaryPacked.encodeInts(suffixLen, 0, n, out)
    i = 0
    while (i < n) { out.writeBytes(src(off + i), prefixLen(i), suffixLen(i)); i += 1 }
  }

  def decode(r: ByteReader): Array[Array[Byte]] = {
    val prefixLen = DeltaBinaryPacked.decodeInts(r)
    val suffixLen = DeltaBinaryPacked.decodeInts(r)
    val n = prefixLen.length
    val dst = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val out = new Array[Byte](prefixLen(i) + suffixLen(i))
      if (prefixLen(i) > 0) System.arraycopy(dst(i - 1), 0, out, 0, prefixLen(i))
      var j = 0
      while (j < suffixLen(i)) { out(prefixLen(i) + j) = r.buf(r.pos + j); j += 1 }
      r.skip(suffixLen(i))
      dst(i) = out
      i += 1
    }
    dst
  }

  /** Allocation-free variant: values reconstruct in one reused scratch
    * buffer — value i's prefix is already in place because scratch still
    * holds value i-1 (and growth copies it along). */
  def decodeInto(r: ByteReader, sink: BytesSink): Unit = {
    val prefixLen = DeltaBinaryPacked.decodeInts(r)
    val suffixLen = DeltaBinaryPacked.decodeInts(r)
    val n = prefixLen.length
    var scratch = new Array[Byte](64)
    var i = 0
    while (i < n) {
      val len = prefixLen(i) + suffixLen(i)
      if (len > scratch.length)
        scratch = java.util.Arrays.copyOf(scratch, math.max(len, scratch.length * 2))
      System.arraycopy(r.buf, r.pos, scratch, prefixLen(i), suffixLen(i))
      r.skip(suffixLen(i))
      sink.put(scratch, 0, len)
      i += 1
    }
  }
}
