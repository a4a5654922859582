package graft.codec

/** Row-family stream separation for token-array chunks.
  *
  * A chunk holds many rows' token arrays concatenated flat. Codec
  * homogeneity lives at ROW granularity (a row is one document: one
  * vocabulary/ordering regime), so fixed-position pages always see a
  * mixture and the selector converges on a compromise codec. Instead:
  * classify each row with a one-pass stat (runs / sortedness / value
  * range), scatter its tokens into one of four family streams, and
  * encode each stream with per-page auto-selection — pages are now
  * homogeneous and each family gets its ideal codec (RLE for run-heavy,
  * DELTA for monotone, FOR+bit-pack for small-range, PLAIN for
  * high-entropy). The 2-bit row→family map compresses to ~nothing via
  * the ordinary int chunk path.
  *
  * Decode needs the per-row lengths, which the chunk already stores as
  * its `lens` column — same shape as parquet's repetition levels
  * (reference: column_buffer.go:421-454 stores repeated columns as
  * values + levels).
  */
object StreamedTokens {

  final val NumFamilies = 4
  private final val Magic = 0xA7

  /** One cheap pass: runs, sortedness, range → family id. */
  def classifyRow(src: Array[Int], off: Int, len: Int): Int = {
    if (len == 0) return 0
    var mn = src(off)
    var mx = mn
    var runs = 1
    var sorted = true
    var i = 1
    while (i < len) {
      val v = src(off + i)
      val p = src(off + i - 1)
      if (v != p) runs += 1
      if (v < p) sorted = false
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    if (runs * 4 <= len) 0 // long runs → RLE stream
    else if (sorted) 1 // monotone → DELTA stream
    else if (mx.toLong - mn.toLong < (1L << 24)) 2 // small range → FOR stream
    else 3 // high entropy → PLAIN stream
  }

  /** Encode `numRows` rows (flat values + per-row lens) into the streamed
    * format. Returns (bytes, page-codec summary for metrics). */
  def encode(flat: Array[Int], lens: Array[Int], numRows: Int, nTokens: Int): (Array[Byte], String) = {
    val families = new Array[Int](numRows)
    val streamLen = new Array[Int](NumFamilies)
    var off = 0
    var r = 0
    while (r < numRows) {
      val f = classifyRow(flat, off, lens(r))
      families(r) = f
      streamLen(f) += lens(r)
      off += lens(r)
      r += 1
    }
    val streams = Array.tabulate(NumFamilies)(f => new Array[Int](streamLen(f)))
    val cursor = new Array[Int](NumFamilies)
    off = 0
    r = 0
    while (r < numRows) {
      val f = families(r)
      System.arraycopy(flat, off, streams(f), cursor(f), lens(r))
      cursor(f) += lens(r)
      off += lens(r)
      r += 1
    }
    val out = new ByteWriter(math.max(64, nTokens))
    out.writeByte(Magic)
    out.writeUvarint(numRows)
    out.writeUvarint(nTokens)
    Chunks.encodeIntsInto(families, 0, numRows, -1, out)
    val names = scala.collection.mutable.LinkedHashSet[String]()
    var f = 0
    while (f < NumFamilies) {
      val (bytes, summary) = Chunks.encodeIntsPagedWithStats(streams(f), 0, streamLen(f))
      out.writeUvarint(bytes.length)
      out.writeBytes(bytes)
      if (streamLen(f) > 0) names += summary
      f += 1
    }
    (out.toArray, names.mkString("+"))
  }

  /** Decode back to flat row order; `lens` is the chunk's lens column. */
  def decode(bytes: Array[Byte], lens: Array[Int]): Array[Int] = {
    val r0 = new ByteReader(bytes)
    val magic = r0.readByte()
    require(magic == Magic, s"not a streamed-token chunk: $magic")
    val numRows = r0.readUvarint().toInt
    val nTokens = r0.readUvarint().toInt
    require(numRows == lens.length, s"lens mismatch: $numRows vs ${lens.length}")
    val families = Chunks.decodeIntsFrom(r0)
    val streams = new Array[Array[Int]](NumFamilies)
    var f = 0
    while (f < NumFamilies) {
      val byteLen = r0.readUvarint().toInt
      val end = r0.pos + byteLen
      streams(f) = Chunks.decodeIntsFrom(r0)
      require(r0.pos == end, s"stream $f: frame length mismatch")
      f += 1
    }
    val flat = new Array[Int](nTokens)
    val cursor = new Array[Int](NumFamilies)
    var off = 0
    var r = 0
    while (r < numRows) {
      val fam = families(r)
      System.arraycopy(streams(fam), cursor(fam), flat, off, lens(r))
      cursor(fam) += lens(r)
      off += lens(r)
      r += 1
    }
    flat
  }

  /** Partial decode: only rows [fromRow, toRow). The tiny row-level maps
    * (families + lens) locate each family's needed value range, and each
    * family stream decodes ONLY its covering pages — pages before/after
    * are skipped by bytes via the paged offset index (the reference's
    * SeekToRow, file.go:684-709). Returns (flat tokens of the selected
    * rows, pagesDecoded, pagesTotal). */
  def decodeRows(bytes: Array[Byte], lens: Array[Int],
                 fromRow: Int, toRow: Int): (Array[Int], Int, Int) = {
    val r0 = new ByteReader(bytes)
    val magic = r0.readByte()
    require(magic == Magic, s"not a streamed-token chunk: $magic")
    val numRows = r0.readUvarint().toInt
    r0.readUvarint() // nTokens
    require(numRows == lens.length, s"lens mismatch: $numRows vs ${lens.length}")
    require(fromRow >= 0 && fromRow <= toRow && toRow <= numRows, s"rows [$fromRow,$toRow)")
    val families = Chunks.decodeIntsFrom(r0)
    val startOff = new Array[Int](NumFamilies)
    val count = new Array[Int](NumFamilies)
    var r = 0
    while (r < fromRow) { startOff(families(r)) += lens(r); r += 1 }
    var outLen = 0
    while (r < toRow) { count(families(r)) += lens(r); outLen += lens(r); r += 1 }
    val slices = new Array[Array[Int]](NumFamilies)
    var pagesDecoded = 0
    var pagesTotal = 0
    var f = 0
    while (f < NumFamilies) {
      val byteLen = r0.readUvarint().toInt
      val end = r0.pos + byteLen
      if (count(f) == 0) { slices(f) = new Array[Int](0); r0.pos = end } // skip stream by bytes
      else {
        val (vals, pd, pt) = Chunks.decodeIntsSliceFrom(r0, startOff(f), count(f))
        slices(f) = vals
        pagesDecoded += pd
        pagesTotal += pt
        require(r0.pos == end, s"stream $f: frame length mismatch")
      }
      f += 1
    }
    val flat = new Array[Int](outLen)
    val cursor = new Array[Int](NumFamilies)
    var off = 0
    r = fromRow
    while (r < toRow) {
      val fam = families(r)
      System.arraycopy(slices(fam), cursor(fam), flat, off, lens(r))
      cursor(fam) += lens(r)
      off += lens(r)
      r += 1
    }
    (flat, pagesDecoded, pagesTotal)
  }
}
