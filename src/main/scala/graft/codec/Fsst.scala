package graft.codec

/** FSST — Fast Static Symbol Table string compression (Boncz, Neumann,
  * Leis: "FSST: Fast Random Access String Compression", VLDB 2020).
  *
  * NOT present in the reference (see SURVEY.md §7.4); built from the
  * published algorithm: a static table of at most 255 symbols of 1..8
  * bytes, greedy longest-match encoding, code 255 = escape + literal byte.
  * The table is trained by a few bottom-up generations over a sample:
  * compress the sample with the current table, count symbol and adjacent
  * symbol-pair frequencies, keep the 255 candidates with the highest
  * gain = frequency × length.
  *
  * Self-contained blob format:
  *   uvarint nSymbols | nSymbols × (len byte + symbol bytes) |
  *   uvarint rawLen | uvarint codeLen | code bytes
  */
object Fsst {

  final val Escape = 255
  final val MaxSymbols = 255
  final val MaxSymbolLen = 8
  private final val Generations = 5
  private final val SampleTarget = 16 * 1024

  final class SymbolTable(val symbols: Array[Array[Byte]]) {
    // first byte -> codes sorted by symbol length desc (longest match wins)
    private val index: Array[Array[Int]] = {
      val byFirst = Array.fill(256)(List.empty[Int])
      var c = 0
      while (c < symbols.length) {
        val s = symbols(c)
        if (s.length > 0) {
          val f = s(0) & 0xFF
          byFirst(f) = c :: byFirst(f)
        }
        c += 1
      }
      byFirst.map(_.sortBy(c => -symbols(c).length).toArray)
    }

    /** Longest symbol matching data(pos..), or -1. */
    def findLongestMatch(data: Array[Byte], pos: Int, end: Int): Int = {
      val cands = index(data(pos) & 0xFF)
      var i = 0
      while (i < cands.length) {
        val c = cands(i)
        val s = symbols(c)
        if (pos + s.length <= end) {
          var j = 1 // first byte already matched via bucket
          while (j < s.length && s(j) == data(pos + j)) j += 1
          if (j == s.length) return c
        }
        i += 1
      }
      -1
    }

    def compress(data: Array[Byte], off: Int, n: Int, out: ByteWriter): Unit = {
      var i = off
      val end = off + n
      while (i < end) {
        val c = findLongestMatch(data, i, end)
        if (c >= 0) { out.writeByte(c); i += symbols(c).length }
        else { out.writeByte(Escape); out.writeByte(data(i) & 0xFF); i += 1 }
      }
    }
  }

  /** Train a symbol table on (a sample of) the data. */
  def train(data: Array[Byte], off: Int, n: Int): SymbolTable = {
    // stride-sample up to SampleTarget bytes in 512B runs for locality
    val sample: Array[Byte] =
      if (n <= SampleTarget) java.util.Arrays.copyOfRange(data, off, off + n)
      else {
        val runs = SampleTarget / 512
        val stride = n / runs
        val out = new Array[Byte](runs * 512)
        var r = 0
        while (r < runs) {
          System.arraycopy(data, off + r * stride, out, r * 512, 512)
          r += 1
        }
        out
      }

    var table = new SymbolTable(Array.empty)
    var gen = 0
    while (gen < Generations) {
      table = nextGeneration(table, sample)
      gen += 1
    }
    table
  }

  private def nextGeneration(table: SymbolTable, sample: Array[Byte]): SymbolTable = {
    // compress sample, tracking symbol (or escaped-byte) boundaries
    val gains = new java.util.HashMap[String, Long]() // key = ISO-8859-1 string of candidate bytes
    def bump(bytes: Array[Byte], gain: Long): Unit = {
      if (bytes.length <= MaxSymbolLen) {
        val k = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
        gains.merge(k, gain, (a, b) => a + b)
      }
    }
    var i = 0
    val end = sample.length
    var prevStart = -1
    var prevLen = 0
    while (i < end) {
      val c = if (table.symbols.nonEmpty) table.findLongestMatch(sample, i, end) else -1
      val len = if (c >= 0) table.symbols(c).length else 1
      val cur = java.util.Arrays.copyOfRange(sample, i, i + len)
      bump(cur, len.toLong) // gain of keeping this symbol
      if (prevStart >= 0 && prevLen + len <= MaxSymbolLen) {
        // candidate: concatenation of previous and current symbol
        bump(java.util.Arrays.copyOfRange(sample, prevStart, i + len), (prevLen + len).toLong)
      }
      prevStart = i
      prevLen = len
      i += len
    }
    // pick top-255 by accumulated gain
    val entries = new java.util.ArrayList(gains.entrySet())
    entries.sort((a, b) => java.lang.Long.compare(b.getValue, a.getValue))
    val keep = math.min(MaxSymbols, entries.size())
    val symbols = new Array[Array[Byte]](keep)
    var k = 0
    while (k < keep) {
      symbols(k) = entries.get(k).getKey.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      k += 1
    }
    new SymbolTable(symbols)
  }

  /** Encode a blob with a freshly trained table; fully self-contained. */
  def encode(data: Array[Byte], off: Int, n: Int, out: ByteWriter): Unit = {
    val table = train(data, off, n)
    out.writeUvarint(table.symbols.length)
    var c = 0
    while (c < table.symbols.length) {
      out.writeByte(table.symbols(c).length)
      out.writeBytes(table.symbols(c))
      c += 1
    }
    out.writeUvarint(n)
    val body = new ByteWriter(n / 2 + 16)
    table.compress(data, off, n, body)
    out.writeUvarint(body.length)
    out.writeBytes(body.raw, 0, body.length)
  }

  def decode(r: ByteReader): Array[Byte] = {
    val nSym = r.readUvarint().toInt
    val symbols = new Array[Array[Byte]](nSym)
    var c = 0
    while (c < nSym) {
      val len = r.readByte()
      symbols(c) = r.readBytes(len)
      c += 1
    }
    val rawLen = r.readUvarint().toInt
    val codeLen = r.readUvarint().toInt
    val dst = new Array[Byte](rawLen)
    var di = 0
    val end = r.pos + codeLen
    while (r.pos < end) {
      val code = r.readByte()
      if (code == Escape) { dst(di) = r.readByte().toByte; di += 1 }
      else {
        val s = symbols(code)
        System.arraycopy(s, 0, dst, di, s.length)
        di += s.length
      }
    }
    require(di == rawLen, s"FSST decode length mismatch: $di != $rawLen")
    dst
  }
}
