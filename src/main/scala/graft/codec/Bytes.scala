package graft.codec

/** Consumer for allocation-free string decode (Chunks.decodeStringsInto):
  * values arrive in row order as (buffer, offset, length) views valid
  * only until the next call. */
trait BytesSink {
  def put(buf: Array[Byte], off: Int, len: Int): Unit
}

/** Growable little-endian byte sink used by all codec kernels.
  *
  * Mirrors the append-style `dst []byte` convention of the reference's
  * `encoding.Encoding` interface (reference: encoding/encoding.go:33-71) —
  * every encoder appends to a caller-owned, reusable buffer so hot loops
  * allocate nothing per value (reference enforces 0 allocs/op in
  * encoding/encoding_test.go:852-856).
  */
final class ByteWriter(initialCapacity: Int = 256) {
  private var buf = new Array[Byte](math.max(initialCapacity, 16))
  private var len = 0

  def length: Int = len

  def reset(): Unit = len = 0

  private def ensure(extra: Int): Unit = {
    if (len + extra > buf.length) {
      var cap = buf.length
      while (cap < len + extra) cap = cap << 1
      buf = java.util.Arrays.copyOf(buf, cap)
    }
  }

  def writeByte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }

  def writeBytes(src: Array[Byte], off: Int, n: Int): Unit = {
    ensure(n); System.arraycopy(src, off, buf, len, n); len += n
  }
  def writeBytes(src: Array[Byte]): Unit = writeBytes(src, 0, src.length)

  def writeLE32(v: Int): Unit = {
    ensure(4)
    buf(len) = v.toByte
    buf(len + 1) = (v >>> 8).toByte
    buf(len + 2) = (v >>> 16).toByte
    buf(len + 3) = (v >>> 24).toByte
    len += 4
  }

  def writeLE64(v: Long): Unit = { writeLE32(v.toInt); writeLE32((v >>> 32).toInt) }

  /** Unsigned LEB128 varint (parquet uvarint; reference rle.go:419-423). */
  def writeUvarint(value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) { writeByte(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    writeByte(v.toInt)
  }

  /** ZigZag-coded varint (delta headers; reference delta/binary_packed.go:169-175). */
  def writeZigZag(v: Long): Unit = writeUvarint((v << 1) ^ (v >> 63))

  /** Set a previously written byte (for back-patched headers). */
  def setByte(pos: Int, b: Int): Unit = buf(pos) = b.toByte

  /** Reserve n bytes, returning their start offset (for back-patching). */
  def reserve(n: Int): Int = { ensure(n); val p = len; len += n; p }

  /** Roll back to a previous length (used by encode-then-compare paths). */
  def truncate(newLen: Int): Unit = { require(newLen <= len); len = newLen }

  /** Direct access for in-place bit packing; valid up to `length`. */
  def raw: Array[Byte] = buf

  def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
}

/** Cursor-based reader over an encoded chunk. */
final class ByteReader(val buf: Array[Byte], var pos: Int = 0) {
  def remaining: Int = buf.length - pos
  def readByte(): Int = { val b = buf(pos) & 0xFF; pos += 1; b }
  def readLE32(): Int = {
    val v = (buf(pos) & 0xFF) | ((buf(pos + 1) & 0xFF) << 8) |
      ((buf(pos + 2) & 0xFF) << 16) | ((buf(pos + 3) & 0xFF) << 24)
    pos += 4; v
  }
  def readLE64(): Long = (readLE32().toLong & 0xFFFFFFFFL) | (readLE32().toLong << 32)
  def readUvarint(): Long = {
    var shift = 0; var out = 0L; var b = 0
    do {
      b = buf(pos) & 0xFF; pos += 1
      out |= (b & 0x7FL) << shift; shift += 7
    } while ((b & 0x80) != 0)
    out
  }
  def readZigZag(): Long = { val u = readUvarint(); (u >>> 1) ^ -(u & 1L) }
  def readBytes(n: Int): Array[Byte] = {
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
  }
  def skip(n: Int): Unit = pos += n
}
