package graft.codec

/** PLAIN encoding — little-endian fixed width values; byte arrays as
  * 4-byte-LE-length-prefixed blobs; booleans bit-packed LSB-first.
  * (reference: encoding/plain/plain.go:35-192)
  */
object Plain {

  def encodeInts(src: Array[Int], off: Int, n: Int, out: ByteWriter): Unit = {
    var i = 0
    while (i < n) { out.writeLE32(src(off + i)); i += 1 }
  }

  def decodeInts(r: ByteReader, n: Int): Array[Int] = {
    val dst = new Array[Int](n)
    var i = 0
    while (i < n) { dst(i) = r.readLE32(); i += 1 }
    dst
  }

  def encodeLongs(src: Array[Long], off: Int, n: Int, out: ByteWriter): Unit = {
    var i = 0
    while (i < n) { out.writeLE64(src(off + i)); i += 1 }
  }

  def decodeLongs(r: ByteReader, n: Int): Array[Long] = {
    val dst = new Array[Long](n)
    var i = 0
    while (i < n) { dst(i) = r.readLE64(); i += 1 }
    dst
  }

  def encodeDoubles(src: Array[Double], off: Int, n: Int, out: ByteWriter): Unit = {
    var i = 0
    while (i < n) { out.writeLE64(java.lang.Double.doubleToRawLongBits(src(off + i))); i += 1 }
  }

  def decodeDoubles(r: ByteReader, n: Int): Array[Double] = {
    val dst = new Array[Double](n)
    var i = 0
    while (i < n) { dst(i) = java.lang.Double.longBitsToDouble(r.readLE64()); i += 1 }
    dst
  }

  /** 4-byte-LE length-prefixed byte arrays (plain.go:59-72,120-138). */
  def encodeByteArrays(src: Array[Array[Byte]], off: Int, n: Int, out: ByteWriter): Unit = {
    var i = 0
    while (i < n) {
      val b = src(off + i)
      out.writeLE32(b.length)
      out.writeBytes(b)
      i += 1
    }
  }

  def decodeByteArrays(r: ByteReader, n: Int): Array[Array[Byte]] = {
    val dst = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val len = r.readLE32()
      dst(i) = r.readBytes(len)
      i += 1
    }
    dst
  }

  /** Booleans bit-packed LSB-first (plain.go:172-192). */
  def encodeBooleans(src: Array[Boolean], off: Int, n: Int, out: ByteWriter): Unit = {
    var acc = 0
    var bits = 0
    var i = 0
    while (i < n) {
      if (src(off + i)) acc |= 1 << bits
      bits += 1
      if (bits == 8) { out.writeByte(acc); acc = 0; bits = 0 }
      i += 1
    }
    if (bits > 0) out.writeByte(acc)
  }

  def decodeBooleans(r: ByteReader, n: Int): Array[Boolean] = {
    val dst = new Array[Boolean](n)
    var i = 0
    var acc = 0
    while (i < n) {
      if ((i & 7) == 0) acc = r.readByte()
      dst(i) = ((acc >>> (i & 7)) & 1) == 1
      i += 1
    }
    dst
  }
}

/** BYTE_STREAM_SPLIT — k-th byte of every value goes to the k-th stream;
  * improves block compressibility of float/double payloads.
  * (reference: encoding/bytestreamsplit/bytestreamsplit.go:23-51)
  */
object ByteStreamSplit {

  def encodeDoubles(src: Array[Double], off: Int, n: Int, out: ByteWriter): Unit = {
    val start = out.reserve(n * 8)
    val raw = out.raw
    var i = 0
    while (i < n) {
      val bits = java.lang.Double.doubleToRawLongBits(src(off + i))
      var k = 0
      while (k < 8) {
        raw(start + k * n + i) = ((bits >>> (8 * k)) & 0xFF).toByte
        k += 1
      }
      i += 1
    }
  }

  def decodeDoubles(r: ByteReader, n: Int): Array[Double] = {
    val dst = new Array[Double](n)
    val base = r.pos
    var i = 0
    while (i < n) {
      var bits = 0L
      var k = 0
      while (k < 8) {
        bits |= (r.buf(base + k * n + i).toLong & 0xFFL) << (8 * k)
        k += 1
      }
      dst(i) = java.lang.Double.longBitsToDouble(bits)
      i += 1
    }
    r.skip(n * 8)
    dst
  }

  def encodeFloats(src: Array[Float], off: Int, n: Int, out: ByteWriter): Unit = {
    val start = out.reserve(n * 4)
    val raw = out.raw
    var i = 0
    while (i < n) {
      val bits = java.lang.Float.floatToRawIntBits(src(off + i))
      var k = 0
      while (k < 4) {
        raw(start + k * n + i) = ((bits >>> (8 * k)) & 0xFF).toByte
        k += 1
      }
      i += 1
    }
  }

  def decodeFloats(r: ByteReader, n: Int): Array[Float] = {
    val dst = new Array[Float](n)
    val base = r.pos
    var i = 0
    while (i < n) {
      var bits = 0
      var k = 0
      while (k < 4) {
        bits |= (r.buf(base + k * n + i) & 0xFF) << (8 * k)
        k += 1
      }
      dst(i) = java.lang.Float.intBitsToFloat(bits)
      i += 1
    }
    r.skip(n * 4)
    dst
  }
}
