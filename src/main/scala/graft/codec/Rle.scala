package graft.codec

/** Parquet RLE / bit-packed hybrid over non-negative ints at a known bit
  * width — the format used for levels and dictionary indexes.
  *
  * Byte format (reference: encoding/rle/rle.go:253,419-467):
  *   stream of blocks, each starting with uvarint header `h`:
  *     h & 1 == 0  → RLE run: count = h >> 1 repeats of one value stored in
  *                   ceil(bitWidth/8) little-endian bytes
  *     h & 1 == 1  → bit-packed run: (h >> 1) groups of 8 values packed
  *                   LSB-first at bitWidth
  *
  * Encoder strategy follows the classic hybrid segmentation (runs of >= 8
  * identical values become RLE runs; everything else accumulates into
  * bit-packed groups of 8, max 63 groups per header so the header stays a
  * 1-byte varint; the final partial group is zero-padded — legal because
  * the value count is carried out-of-band, as in parquet).
  */
object Rle {

  private final val MaxGroupsPerHeader = 63 // keeps bit-packed headers at 1 byte

  /** Encode n values from src(off..) at bitWidth, appending to out.
    * Values must fit in bitWidth bits (they are masked).
    */
  def encode(src: Array[Int], off: Int, n: Int, bitWidth: Int, out: ByteWriter): Unit = {
    if (n == 0) return
    if (bitWidth == 0) return // decoder synthesizes zeros from the count
    val valueBytes = (bitWidth + 7) / 8
    val scratch = new Array[Int](8)

    var i = off
    val end = off + n
    // pending bit-packed groups: we buffer up to 8 values; full groups are
    // written into a back-patched region.
    var headerPos = -1        // position of the 1-byte bit-packed header
    var groups = 0            // groups written under current header
    var nBuf = 0              // values buffered toward the next group

    def flushRun(value: Int, count: Long): Unit = {
      out.writeUvarint(count << 1)
      var v = value
      var k = 0
      while (k < valueBytes) { out.writeByte(v & 0xFF); v >>>= 8; k += 1 }
    }

    def startBitPackHeader(): Unit = { headerPos = out.reserve(1); groups = 0 }

    def endBitPackHeader(): Unit = {
      if (headerPos >= 0) {
        out.setByte(headerPos, ((groups << 1) | 1) & 0xFF)
        headerPos = -1
      }
    }

    def flushGroup(): Unit = {
      if (headerPos < 0) startBitPackHeader()
      BitPack.packInts(scratch, 0, 8, bitWidth, out)
      groups += 1
      if (groups == MaxGroupsPerHeader) endBitPackHeader()
      nBuf = 0
    }

    while (i < end) {
      // measure the run starting at i
      val v = src(i)
      var j = i + 1
      while (j < end && src(j) == v) j += 1
      val runLen = j - i
      if (runLen >= 8 && nBuf == 0) {
        endBitPackHeader()
        flushRun(v, runLen.toLong)
        i = j
      } else if (runLen >= 8) {
        // finish the current group with part of this run, then re-evaluate
        while (nBuf < 8) { scratch(nBuf) = v; nBuf += 1; i += 1 }
        flushGroup()
      } else {
        var k = 0
        while (k < runLen) {
          scratch(nBuf) = v; nBuf += 1
          if (nBuf == 8) flushGroup()
          k += 1
        }
        i = j
      }
    }
    if (nBuf > 0) {
      while (nBuf < 8) { scratch(nBuf) = 0; nBuf += 1 } // zero-pad final group
      flushGroup()
    }
    endBitPackHeader()
  }

  /** Decode exactly n values at bitWidth from r into dst(dstOff..). */
  def decode(r: ByteReader, bitWidth: Int, dst: Array[Int], dstOff: Int, n: Int): Unit = {
    if (bitWidth == 0) { java.util.Arrays.fill(dst, dstOff, dstOff + n, 0); return }
    val valueBytes = (bitWidth + 7) / 8
    var produced = 0
    val pad = new Array[Int](8)
    while (produced < n) {
      val h = r.readUvarint()
      if ((h & 1L) == 0L) {
        val count = (h >>> 1).toInt
        // never trust the wire header (reference caps runs, rle.go:21-29):
        // a corrupt/hostile count must fail loudly, not drive a giant fill
        require(count >= 0 && count <= n - produced,
          s"RLE run of $count values overruns chunk (${n - produced} left)")
        var v = 0
        var k = 0
        while (k < valueBytes) { v |= (r.readByte() << (8 * k)); k += 1 }
        java.util.Arrays.fill(dst, dstOff + produced, dstOff + produced + count, v)
        produced += count
      } else {
        val groups = (h >>> 1).toInt
        require(groups >= 0 && groups.toLong <= (n - produced + 7L) / 8L,
          s"RLE bit-pack run of $groups groups overruns chunk (${n - produced} left)")
        var g = 0
        while (g < groups) {
          val want = math.min(8, n - produced)
          if (want == 8) {
            r.skip(BitPack.unpackInts(r.buf, r.pos, bitWidth, dst, dstOff + produced, 8))
            produced += 8
          } else {
            // final zero-padded group: unpack all 8, keep `want`
            r.skip(BitPack.unpackInts(r.buf, r.pos, bitWidth, pad, 0, 8))
            System.arraycopy(pad, 0, dst, dstOff + produced, want)
            produced += want
          }
          g += 1
        }
      }
    }
  }
}
