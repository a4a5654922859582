package graft.codec

/** DELTA_BINARY_PACKED — frame-of-reference delta encoding for int32/int64.
  *
  * Layout (reference: encoding/delta/binary_packed.go:55-70,169-229):
  *   header:  uvarint blockSize(=128) | uvarint numMiniBlocks(=4) |
  *            uvarint totalValues | zigzag firstValue
  *   per 128-delta block: zigzag minDelta | 4 miniblock-width bytes |
  *            per miniblock of 32: (delta - minDelta) bit-packed at width
  * Miniblocks that contain no deltas get width byte 0 and no payload; the
  * final partial miniblock is zero-padded to 32 entries. All arithmetic is
  * wrapping (two's complement), so Int.MinValue/MaxValue round-trip exactly
  * (reference regression: encoding_test.go:141-151).
  */
object DeltaBinaryPacked {
  final val BlockSize = 128
  final val MiniBlocks = 4
  final val MiniBlockLen = 32 // BlockSize / MiniBlocks

  // ------------------------------------------------------------------ int32

  def encodeInts(src: Array[Int], off: Int, n: Int, out: ByteWriter): Unit = {
    out.writeUvarint(BlockSize)
    out.writeUvarint(MiniBlocks)
    out.writeUvarint(n)
    out.writeZigZag(if (n > 0) src(off).toLong else 0L)
    if (n <= 1) return
    val deltas = new Array[Int](BlockSize)
    val packed = new Array[Int](MiniBlockLen)
    var prev = src(off)
    var i = 1
    while (i < n) {
      val blockN = math.min(BlockSize, n - i)
      var minDelta = Int.MaxValue
      var k = 0
      while (k < blockN) {
        val v = src(off + i + k)
        val d = v - prev // wrapping
        deltas(k) = d
        if (d < minDelta) minDelta = d
        prev = v
        k += 1
      }
      java.util.Arrays.fill(deltas, blockN, BlockSize, minDelta) // pad → packs as 0
      out.writeZigZag(minDelta.toLong)
      val widths = out.reserve(MiniBlocks)
      var mb = 0
      while (mb < MiniBlocks) {
        val mbStart = mb * MiniBlockLen
        if (mbStart >= blockN) {
          out.setByte(widths + mb, 0)
        } else {
          // width(OR of all) == max width — one OR per value beats nlz per value
          var acc = 0
          var j = 0
          while (j < MiniBlockLen) {
            val u = deltas(mbStart + j) - minDelta // wrapping; >= 0 unless overflow → treat unsigned
            packed(j) = u
            acc |= u
            j += 1
          }
          val w = BitPack.widthOfUnsignedInt(acc)
          out.setByte(widths + mb, w)
          BitPack.packInts(packed, 0, MiniBlockLen, w, out)
        }
        mb += 1
      }
      i += blockN
    }
  }

  def decodeInts(r: ByteReader): Array[Int] = {
    val blockSize = r.readUvarint().toInt
    val miniBlocks = r.readUvarint().toInt
    val n = r.readUvarint().toInt
    val first = r.readZigZag().toInt
    val dst = new Array[Int](n)
    if (n == 0) return dst
    dst(0) = first
    if (n == 1) return dst
    require(blockSize > 0 && blockSize % 128 == 0, s"bad block size $blockSize")
    require(miniBlocks > 0 && blockSize % miniBlocks == 0, s"bad miniblock count $miniBlocks")
    val mbLen = blockSize / miniBlocks
    val scratch = new Array[Int](mbLen)
    var prev = first
    var i = 1
    while (i < n) {
      val minDelta = r.readZigZag().toInt
      val widthsPos = r.pos
      r.skip(miniBlocks)
      var mb = 0
      while (mb < miniBlocks && i < n) {
        val w = r.buf(widthsPos + mb) & 0xFF
        val have = math.min(mbLen, n - i)
        if (w == 0) {
          var j = 0
          while (j < have) { prev = prev + minDelta; dst(i + j) = prev; j += 1 }
        } else {
          r.skip(BitPack.unpackInts(r.buf, r.pos, w, scratch, 0, mbLen))
          var j = 0
          while (j < have) { prev = prev + minDelta + scratch(j); dst(i + j) = prev; j += 1 }
        }
        i += have
        mb += 1
      }
    }
    dst
  }

  // ------------------------------------------------------------------ int64

  def encodeLongs(src: Array[Long], off: Int, n: Int, out: ByteWriter): Unit = {
    out.writeUvarint(BlockSize)
    out.writeUvarint(MiniBlocks)
    out.writeUvarint(n)
    out.writeZigZag(if (n > 0) src(off) else 0L)
    if (n <= 1) return
    val deltas = new Array[Long](BlockSize)
    val packed = new Array[Long](MiniBlockLen)
    var prev = src(off)
    var i = 1
    while (i < n) {
      val blockN = math.min(BlockSize, n - i)
      var minDelta = Long.MaxValue
      var k = 0
      while (k < blockN) {
        val v = src(off + i + k)
        val d = v - prev
        deltas(k) = d
        if (d < minDelta) minDelta = d
        prev = v
        k += 1
      }
      java.util.Arrays.fill(deltas, blockN, BlockSize, minDelta)
      out.writeZigZag(minDelta)
      val widths = out.reserve(MiniBlocks)
      var mb = 0
      while (mb < MiniBlocks) {
        val mbStart = mb * MiniBlockLen
        if (mbStart >= blockN) {
          out.setByte(widths + mb, 0)
        } else {
          var acc = 0L
          var j = 0
          while (j < MiniBlockLen) {
            val u = deltas(mbStart + j) - minDelta
            packed(j) = u
            acc |= u
            j += 1
          }
          val w = BitPack.widthOfUnsignedLong(acc)
          out.setByte(widths + mb, w)
          BitPack.packLongs(packed, 0, MiniBlockLen, w, out)
        }
        mb += 1
      }
      i += blockN
    }
  }

  def decodeLongs(r: ByteReader): Array[Long] = {
    val blockSize = r.readUvarint().toInt
    val miniBlocks = r.readUvarint().toInt
    val n = r.readUvarint().toInt
    val first = r.readZigZag()
    val dst = new Array[Long](n)
    if (n == 0) return dst
    dst(0) = first
    if (n == 1) return dst
    val mbLen = blockSize / miniBlocks
    val scratch = new Array[Long](mbLen)
    var prev = first
    var i = 1
    while (i < n) {
      val minDelta = r.readZigZag()
      val widthsPos = r.pos
      r.skip(miniBlocks)
      var mb = 0
      while (mb < miniBlocks && i < n) {
        val w = r.buf(widthsPos + mb) & 0xFF
        val have = math.min(mbLen, n - i)
        if (w == 0) {
          var j = 0
          while (j < have) { prev = prev + minDelta; dst(i + j) = prev; j += 1 }
        } else {
          r.skip(BitPack.unpackLongs(r.buf, r.pos, w, scratch, 0, mbLen))
          var j = 0
          while (j < have) { prev = prev + minDelta + scratch(j); dst(i + j) = prev; j += 1 }
        }
        i += have
        mb += 1
      }
    }
    dst
  }
}
