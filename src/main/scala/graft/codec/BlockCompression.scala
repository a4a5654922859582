package graft.codec

/** Block compression, orthogonal to the lightweight encodings — the
  * analog of the reference's `compress.Codec` layer (compress/
  * compress.go:19-37; uncompressed is the reference default,
  * writer.go:318-321). JVM codecs shipped with Spark are wrapped, not
  * reimplemented (SURVEY.md §2.3: "wrap, don't write").
  *
  * Wrapper frame: [0xC2][inner codec byte][uvarint rawLen][body].
  * `maybeCompress` keeps a COMPRESSED body only when it wins ≥ ~6%
  * (the selector's never-lose rule), but when a block codec is requested
  * the result is ALWAYS framed (codec None for the kept-raw case) — the
  * compressed-ness is recorded in the frame, never inferred by sniffing
  * payload bytes. Unframed inputs are passed through for the default
  * uncompressed path, which is unambiguous because every chunk-stream
  * first byte sits far below 0xC2 (codec ids and the streamed-token
  * magic 0xA7 — the no-collision invariant is asserted in
  * CodecPropertySpec, so this comment never goes stale with new ids).
  */
object BlockCompression {
  final val Magic = 0xC2
  final val None = 0
  final val Lz4 = 1
  final val Zstd = 2
  final val Snappy = 3
  final val Gzip = 4

  val names: Map[Int, String] = Map(
    None -> "UNCOMPRESSED", Lz4 -> "LZ4", Zstd -> "ZSTD",
    Snappy -> "SNAPPY", Gzip -> "GZIP")

  def compress(codec: Int, raw: Array[Byte]): Array[Byte] = codec match {
    case None => raw
    case Lz4 =>
      val c = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
      val out = new Array[Byte](c.maxCompressedLength(raw.length))
      val n = c.compress(raw, 0, raw.length, out, 0)
      frame(Lz4, raw.length, out, n)
    case Zstd =>
      val out = com.github.luben.zstd.Zstd.compress(raw, 3)
      frame(Zstd, raw.length, out, out.length)
    case Snappy =>
      // Spark-bundled snappy-java (reference codec parity:
      // compress/snappy/snappy.go:12-25) — wrapped, not reimplemented
      val out = org.xerial.snappy.Snappy.compress(raw)
      frame(Snappy, raw.length, out, out.length)
    case Gzip =>
      val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val gz = new java.util.zip.GZIPOutputStream(bos, 32 * 1024)
      gz.write(raw); gz.close()
      val out = bos.toByteArray
      frame(Gzip, raw.length, out, out.length)
    case other => throw new IllegalArgumentException(s"unknown compression $other")
  }

  private def frame(codec: Int, rawLen: Int, body: Array[Byte], bodyLen: Int): Array[Byte] = {
    val w = new ByteWriter(bodyLen + 8)
    w.writeByte(Magic)
    w.writeByte(codec)
    w.writeUvarint(rawLen)
    w.writeBytes(body, 0, bodyLen)
    w.toArray
  }

  def isFramed(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xFF) == Magic && (bytes(1) & 0xFF) <= Gzip

  /** Transparently unwrap if framed, else return as-is (the default
    * uncompressed path writes chunk streams unframed). */
  def decompress(bytes: Array[Byte]): Array[Byte] = {
    if (!isFramed(bytes)) return bytes
    val r = new ByteReader(bytes)
    r.readByte()
    val codec = r.readByte()
    val rawLen = r.readUvarint().toInt
    codec match {
      case None => r.readBytes(rawLen)
      case Lz4 =>
        val d = net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
        val out = new Array[Byte](rawLen)
        d.decompress(r.buf, r.pos, out, 0, rawLen)
        out
      case Zstd =>
        val out = new Array[Byte](rawLen)
        com.github.luben.zstd.Zstd.decompressByteArray(
          out, 0, rawLen, r.buf, r.pos, r.buf.length - r.pos)
        out
      case Snappy =>
        val out = new Array[Byte](rawLen)
        org.xerial.snappy.Snappy.uncompress(r.buf, r.pos, r.buf.length - r.pos, out, 0)
        out
      case Gzip =>
        val gz = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(r.buf, r.pos, r.buf.length - r.pos), 32 * 1024)
        val out = new Array[Byte](rawLen)
        var off = 0
        while (off < rawLen) {
          val k = gz.read(out, off, rawLen - off)
          require(k > 0, s"gzip stream truncated at $off of $rawLen")
          off += k
        }
        gz.close()
        out
      case other => throw new IllegalArgumentException(s"unknown compression $other")
    }
  }

  /** Compress only if it pays (≥6% smaller), like the selector's
    * PLAIN-floor rule; when a codec was requested the output is always
    * framed so compressed-ness is recorded, never sniffed. */
  def maybeCompress(codec: Int, raw: Array[Byte]): Array[Byte] = {
    if (codec == None) return raw
    val c = compress(codec, raw)
    if (c.length.toLong * 16 <= raw.length.toLong * 15) c
    else frame(None, raw.length, raw, raw.length)
  }
}
