package graft.codec

/** Hash-indexed symbol tables: probe = lookup-or-insert, value = dense
  * insertion index (reference: hashprobe/hashprobe.go:1-26, dictionary.go).
  *
  * Flat open-addressing with linear probing over primitive arrays — the
  * JVM analog of the reference's cache-line-grouped probe tables
  * (hashprobe.go:148-177). Single-threaded per Spark partition, so no
  * concurrency control. Grows at load 0.7 (reference uses 0.85 with
  * 7-slot cache-line groups; plain linear probing wants more headroom).
  */
final class IntDict(initialCapacity: Int = 1024) {
  // one packed entry per slot: key in the high 32 bits, (dense idx + 1)
  // in the low 32 — a probe touches ONE cache line, mirroring the
  // reference's cache-line-grouped layout goal (hashprobe.go:148-177)
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) * 2 - 1)
  private var table = new Array[Long](cap)
  private var n = 0
  private var symbolsArr = new Array[Int](math.max(initialCapacity, 16))

  def size: Int = n
  def symbols: Array[Int] = java.util.Arrays.copyOf(symbolsArr, n)

  @inline private def hash(k: Int): Int = {
    // splitmix32 finalizer
    var h = k * 0x9E3779B9
    h ^= h >>> 16; h *= 0x85EBCA6B; h ^= h >>> 13; h *= 0xC2B2AE35; h ^= h >>> 16
    h & (cap - 1)
  }

  private def grow(): Unit = {
    val old = table
    cap <<= 1
    table = new Array[Long](cap)
    var i = 0
    while (i < old.length) {
      val e = old(i)
      if (e != 0L) {
        var slot = hash((e >>> 32).toInt)
        while (table(slot) != 0L) slot = (slot + 1) & (cap - 1)
        table(slot) = e
      }
      i += 1
    }
  }

  /** Lookup-or-insert; returns the dense index of `k`. */
  def probe(k: Int): Int = {
    var slot = hash(k)
    val kh = k.toLong << 32
    while (true) {
      val e = table(slot)
      if (e == 0L) {
        if (n >= symbolsArr.length) symbolsArr = java.util.Arrays.copyOf(symbolsArr, n * 2)
        symbolsArr(n) = k
        table(slot) = kh | ((n + 1).toLong & 0xFFFFFFFFL)
        n += 1
        if (n * 10 >= cap * 7) grow()
        return n - 1
      }
      if ((e & 0xFFFFFFFF00000000L) == kh) return (e & 0xFFFFFFFFL).toInt - 1
      slot = (slot + 1) & (cap - 1)
    }
    -1 // unreachable
  }

  /** Lookup only; -1 if absent. */
  def get(k: Int): Int = {
    var slot = hash(k)
    val kh = k.toLong << 32
    while (true) {
      val e = table(slot)
      if (e == 0L) return -1
      if ((e & 0xFFFFFFFF00000000L) == kh) return (e & 0xFFFFFFFFL).toInt - 1
      slot = (slot + 1) & (cap - 1)
    }
    -1
  }
}

/** Byte-array symbol table: open-addressing over the raw bytes — no
  * String materialization, no boxing, FNV-1a hash cached per symbol so
  * growth never re-reads key bytes (reference: dictionary.go:673-743
  * uses a Go map + arena; the round-1 JVM version allocated a String per
  * PROBE, which dominated the source/doc_id encode cost).
  */
final class BytesDict {
  private var cap = 1024
  private var table = new Array[Int](cap) // dense idx + 1; 0 = absent
  private val syms = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
  private var hashes = new Array[Int](1024)

  def size: Int = syms.length
  def symbols: Array[Array[Byte]] = syms.toArray

  @inline private def hash(b: Array[Byte]): Int = {
    var h = 0x811C9DC5
    var i = 0
    while (i < b.length) { h = (h ^ b(i)) * 0x01000193; i += 1 }
    // finalize: FNV alone clusters on short keys under power-of-two masks
    h ^= h >>> 16; h *= 0x85EBCA6B; h ^= h >>> 13
    h
  }

  private def grow(): Unit = {
    cap <<= 1
    table = new Array[Int](cap)
    var i = 0
    while (i < syms.length) {
      var slot = hashes(i) & (cap - 1)
      while (table(slot) != 0) slot = (slot + 1) & (cap - 1)
      table(slot) = i + 1
      i += 1
    }
  }

  def probe(b: Array[Byte]): Int = {
    val h = hash(b)
    var slot = h & (cap - 1)
    while (true) {
      val e = table(slot)
      if (e == 0) {
        val idx = syms.length
        if (idx >= hashes.length) hashes = java.util.Arrays.copyOf(hashes, idx * 2)
        hashes(idx) = h
        syms += b
        table(slot) = idx + 1
        if ((idx + 1) * 10 >= cap * 7) grow()
        return idx
      }
      val idx = e - 1
      if (hashes(idx) == h && java.util.Arrays.equals(syms(idx), b)) return idx
      slot = (slot + 1) & (cap - 1)
    }
    -1 // unreachable
  }
}

/** Dictionary-encoded int chunk: PLAIN dictionary page + RLE-hybrid index
  * stream prefixed by its 1-byte bit width (reference:
  * encoding/rle/dictionary.go:23-59, dictionary page PLAIN per
  * writer.go:611-619).
  */
object DictIntCodec {

  /** Direct-map fast-path bound: when the value RANGE fits here, symbol
    * assignment is one dense-array access (≤512 KiB lookup, L2-resident)
    * instead of a hash probe — the dominant case for vocab-id token
    * pages. The reference's analog lever is cache-sized insert chunking
    * (dictionary.go:256-270, its measured 1.6x); on the JVM the bigger
    * win is skipping hashing entirely. */
  private final val DirectMapRange = 1 << 17

  def encode(src: Array[Int], off: Int, n: Int, out: ByteWriter): Unit = {
    val indexes = new Array[Int](n)
    var symsArr: Array[Int] = new Array[Int](0)
    var symCount = 0
    if (n > 0) {
      var mn = src(off)
      var mx = mn
      var i = 1
      while (i < n) {
        val v = src(off + i)
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      if (mx.toLong - mn.toLong < DirectMapRange) {
        // dense lookup: value -> dense idx + 1 (0 = absent)
        val lookup = new Array[Int]((mx - mn) + 1)
        val syms = new Array[Int](math.min(n, lookup.length))
        i = 0
        while (i < n) {
          val v = src(off + i)
          var idx = lookup(v - mn) - 1
          if (idx < 0) {
            idx = symCount
            syms(symCount) = v
            symCount += 1
            lookup(v - mn) = idx + 1
          }
          indexes(i) = idx
          i += 1
        }
        symsArr = java.util.Arrays.copyOf(syms, symCount)
      } else {
        // hash path: run-skip (repeated values reuse the last index — RLE
        // pages are run-heavy by construction) + right-sized table
        val dict = new IntDict(math.min(math.max(16, n), 1 << 16))
        var prev = src(off) + 1 // differs from first value
        var prevIdx = -1
        i = 0
        while (i < n) {
          val v = src(off + i)
          if (v != prev || prevIdx < 0) {
            prevIdx = dict.probe(v)
            prev = v
          }
          indexes(i) = prevIdx
          i += 1
        }
        symsArr = dict.symbols
        symCount = symsArr.length
      }
    }
    out.writeUvarint(symCount)
    Plain.encodeInts(symsArr, 0, symCount, out)
    out.writeUvarint(n)
    val bw = if (symCount <= 1) 0 else BitPack.widthOfUnsignedInt(symCount - 1)
    out.writeByte(bw)
    Rle.encode(indexes, 0, n, bw, out)
  }

  def decode(r: ByteReader): Array[Int] = {
    val nSyms = r.readUvarint().toInt
    val syms = Plain.decodeInts(r, nSyms)
    val n = r.readUvarint().toInt
    val bw = r.readByte()
    val indexes = new Array[Int](n)
    Rle.decode(r, bw, indexes, 0, n)
    val dst = new Array[Int](n)
    var i = 0
    while (i < n) { dst(i) = syms(indexes(i)); i += 1 }
    dst
  }
}

/** Dictionary-encoded string chunk: DELTA_LENGTH_BYTE_ARRAY dictionary
  * page + RLE-hybrid indexes. */
object DictBytesCodec {

  def encode(src: Array[Array[Byte]], off: Int, n: Int, out: ByteWriter): Unit = {
    val dict = new BytesDict
    val indexes = new Array[Int](n)
    var i = 0
    while (i < n) { indexes(i) = dict.probe(src(off + i)); i += 1 }
    val syms = dict.symbols
    out.writeUvarint(syms.length)
    DeltaLengthByteArray.encode(syms, 0, syms.length, out)
    out.writeUvarint(n)
    val bw = if (syms.length <= 1) 0 else BitPack.widthOfUnsignedInt(syms.length - 1)
    out.writeByte(bw)
    Rle.encode(indexes, 0, n, bw, out)
  }

  def decode(r: ByteReader): Array[Array[Byte]] = {
    val nSyms = r.readUvarint().toInt
    val syms = DeltaLengthByteArray.decode(r)
    require(syms.length == nSyms)
    val n = r.readUvarint().toInt
    val bw = r.readByte()
    val indexes = new Array[Int](n)
    Rle.decode(r, bw, indexes, 0, n)
    val dst = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { dst(i) = syms(indexes(i)); i += 1 }
    dst
  }

  /** Allocation-free variant: one symbol table, values emitted as symbol
    * slices. */
  def decodeInto(r: ByteReader, sink: BytesSink): Unit = {
    val nSyms = r.readUvarint().toInt
    val syms = DeltaLengthByteArray.decode(r)
    require(syms.length == nSyms)
    val n = r.readUvarint().toInt
    val bw = r.readByte()
    val indexes = new Array[Int](n)
    Rle.decode(r, bw, indexes, 0, n)
    var i = 0
    while (i < n) {
      val s = syms(indexes(i))
      sink.put(s, 0, s.length)
      i += 1
    }
  }
}
