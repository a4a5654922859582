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

/** Byte-array symbol table (reference: dictionary.go:673-743 uses a Go map
  * + arena; here a String-keyed map with insertion-ordered symbol list).
  */
final class BytesDict {
  private val map = new java.util.HashMap[String, Integer]()
  private val syms = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()

  def size: Int = syms.length
  def symbols: Array[Array[Byte]] = syms.toArray

  def probe(b: Array[Byte]): Int = {
    val k = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    val existing = map.get(k)
    if (existing != null) existing.intValue()
    else {
      val idx = syms.length
      map.put(k, Integer.valueOf(idx))
      syms += b
      idx
    }
  }
}

/** Dictionary-encoded int chunk: PLAIN dictionary page + RLE-hybrid index
  * stream prefixed by its 1-byte bit width (reference:
  * encoding/rle/dictionary.go:23-59, dictionary page PLAIN per
  * writer.go:611-619).
  */
object DictIntCodec {

  def encode(src: Array[Int], off: Int, n: Int, out: ByteWriter): Unit = {
    val dict = new IntDict(1024)
    val indexes = new Array[Int](n)
    var i = 0
    while (i < n) { indexes(i) = dict.probe(src(off + i)); i += 1 }
    val syms = dict.symbols
    out.writeUvarint(syms.length)
    Plain.encodeInts(syms, 0, syms.length, out)
    out.writeUvarint(n)
    val bw = if (syms.length <= 1) 0 else BitPack.widthOfUnsignedInt(syms.length - 1)
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
}
