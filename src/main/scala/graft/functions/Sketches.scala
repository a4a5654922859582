package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

/** Misra–Gries heavy-hitters sketch as a Catalyst
  * `TypedImperativeAggregate` — the one-pass, fixed-memory, MERGEABLE
  * answer to "top frequent items over 100 TB": each task keeps at most
  * `k` counters, partials merge associatively (Agarwal et al., "Mergeable
  * Summaries", PODS'12: combine counts, subtract the (k+1)-th largest,
  * drop non-positive), and every reported count is exact-or-undercounted
  * by at most n/(k+1) — PROVABLY exact whenever fewer than k distinct
  * items exist, which is how the driver query gets a bit-exact GROUP BY
  * oracle while the property spec separately pins the error bound on
  * overflowing skewed streams.
  *
  * Contrast with the exact `groupBy(item).count().orderBy(...)` (the
  * q_top_tokens plan): that shuffles every distinct item; this ships k
  * counters per task through one ObjectHashAggregate — the right trade
  * when the item domain is huge and only the head matters.
  *
  * No reference counterpart (SURVEY.md §2.6 categories the engine must
  * still provide); the sketch layer is public-knowledge (MG'82).
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1 && k <= (1 << 20), s"heavy_hitters: k out of range: $k")

  override def prettyName: String = "heavy_hitters"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("cnt", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
    new java.util.HashMap[UTF8String, java.lang.Long](math.min(k * 2, 1 << 12))

  override def update(
      buf: java.util.HashMap[UTF8String, java.lang.Long],
      input: InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      val cur = buf.get(key)
      if (cur != null) buf.put(key, cur + 1L)
      else if (buf.size < k) buf.put(key.clone(), 1L) // clone: Spark reuses row buffers
      else {
        // classic MG decrement-all step; zeros drop out
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[UTF8String, java.lang.Long],
      other: java.util.HashMap[UTF8String, java.lang.Long]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (buf.size > k) {
      // mergeable-summaries compaction: subtract the (k+1)-th largest count
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1)
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[UTF8String, java.lang.Long]): Any = {
    val entries = new Array[(UTF8String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue.longValue); i += 1
    }
    // deterministic order: count desc, then item bytes asc
    java.util.Arrays.sort(entries, (a: (UTF8String, Long), b: (UTF8String, Long)) =>
      if (a._2 != b._2) java.lang.Long.compare(b._2, a._2) else a._1.compareTo(b._1))
    new GenericArrayData(entries.map(e => InternalRow(e._1, e._2): Any))
  }

  override def serialize(buf: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len); bb.get(kb)
      m.put(UTF8String.fromBytes(kb), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}

/** HyperLogLog++ distinct-count sketch buffer: SPARSE below `cap`
  * distinct hashes (an exact hash set — the estimate is EXACT in this
  * regime, which is how the driver query gets a bit-exact
  * count(DISTINCT) oracle), DENSE 2^p byte registers beyond it (the
  * classic fixed-memory estimator, ±1.04/sqrt(2^p) relative error).
  * Public-knowledge algorithm: Flajolet et al. (AofA'07) + the
  * sparse/dense staging of Heule et al. (EDBT'13). */
final class HllBuffer(val p: Int) {
  val m: Int = 1 << p
  val cap: Int = m / 4 // sparse→dense switch point
  var sparse: java.util.HashSet[java.lang.Long] = new java.util.HashSet()
  var dense: Array[Byte] = _

  @inline private def idx(h: Long): Int = (h >>> (64 - p)).toInt
  /** Rank of the first 1-bit in the non-index suffix, 1-based; the |1
    * guard bounds it at 64-p+1 for an all-zero suffix. */
  @inline private def rho(h: Long): Byte =
    (java.lang.Long.numberOfLeadingZeros((h << p) | (1L << (p - 1))) + 1).toByte

  def addHash(h: Long): Unit =
    if (dense != null) addDense(h)
    else {
      sparse.add(h)
      if (sparse.size > cap) toDense()
    }

  @inline private def addDense(h: Long): Unit = {
    val i = idx(h)
    val r = rho(h)
    if (r > dense(i)) dense(i) = r
  }

  def toDense(): Unit = {
    dense = new Array[Byte](m)
    val it = sparse.iterator()
    while (it.hasNext) addDense(it.next())
    sparse = null
  }

  def merge(other: HllBuffer): Unit = {
    require(other.p == p, s"hll_ndv: precision mismatch $p vs ${other.p}")
    if (other.dense == null) {
      val it = other.sparse.iterator()
      while (it.hasNext) addHash(it.next())
    } else {
      if (dense == null) toDense()
      var i = 0
      while (i < m) {
        if (other.dense(i) > dense(i)) dense(i) = other.dense(i)
        i += 1
      }
    }
  }

  def estimate(): Long =
    if (dense == null) sparse.size.toLong // exact regime
    else {
      val alpha = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _ => 0.7213 / (1 + 1.079 / m)
      }
      var sum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        sum += java.lang.Math.scalb(1.0, -dense(i))
        if (dense(i) == 0) zeros += 1
        i += 1
      }
      val e = alpha * m.toDouble * m / sum
      val corrected =
        if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else e
      math.round(corrected)
    }
}

/** `hll_ndv(col, p)`: approximate count-distinct as a Catalyst
  * `TypedImperativeAggregate` over [[HllBuffer]] — one pass, ≤ 2^p bytes
  * per group, mergeable partials through ObjectHashAggregate. EXACT
  * below 2^p/4 distinct values (sparse mode keeps the raw hash set;
  * modulo 64-bit hash collisions, negligible at that size), ±1% at
  * p=14 beyond. Contrast with count(DISTINCT x): that plans an extra
  * EXPAND + full shuffle of every distinct value; this ships one small
  * register array per group — the 100-TB cardinality answer.
  * Strings hash FNV-1a 64 over UTF-8 bytes + splitmix64 finisher;
  * integral types hash their long value the same way (both public
  * constructions). */
case class HllNdv(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 18, s"hll_ndv: precision out of range: $p")

  override def prettyName: String = "hll_ndv"
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  // lazy: child may be unresolved while the Column is being built
  private lazy val hashLong: Boolean = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case StringType => false
    case other =>
      throw new IllegalArgumentException(s"hll_ndv: unsupported type $other")
  }

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)

  @inline private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  @inline private def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  override def update(buf: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val h =
        if (hashLong) splitmix64(v.asInstanceOf[Number].longValue())
        else splitmix64(fnv1a64(v.asInstanceOf[UTF8String].getBytes))
      buf.addHash(h)
    }
    buf
  }

  override def merge(buf: HllBuffer, other: HllBuffer): HllBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: HllBuffer): Any = buf.estimate()

  override def serialize(buf: HllBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(buf.p)
    if (buf.dense == null) {
      out.writeByte(0)
      out.writeInt(buf.sparse.size)
      val it = buf.sparse.iterator()
      while (it.hasNext) out.writeLong(it.next())
    } else {
      out.writeByte(1)
      out.write(buf.dense)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new HllBuffer(bb.get().toInt)
    if (bb.get() == 0) {
      val n = bb.getInt
      var i = 0
      while (i < n) { buf.sparse.add(bb.getLong); i += 1 }
    } else {
      buf.dense = new Array[Byte](buf.m)
      bb.get(buf.dense)
      buf.sparse = null
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HllNdv =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllNdv =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): HllNdv =
    copy(child = newChild)
}

/** Count-Min frequency sketch (Cormode & Muthukrishnan, J.Alg'05) as a
  * Catalyst `TypedImperativeAggregate`: depth×width long counters per
  * group, every item increments one counter per row, a point query is
  * the min over rows — NEVER an undercount, overcounts by at most
  * εn = e·n/width with prob 1-δ (δ = e^-depth). Mergeable by counter
  * addition, so partials ship through ObjectHashAggregate instead of a
  * distinct-domain shuffle — frequency point-queries at 100 TB.
  *
  * Exactness regime (how the driver query earns a bit-exact GROUP BY
  * oracle): hashing is deterministic, so for a FIXED (stream, seeds,
  * width) the collision pattern is fixed; when no queried item collides
  * with another observed item in every row — certain in practice for a
  * small domain vs width, and verified against the exact counts by the
  * oracle itself — the min IS the exact count. The overflow regime
  * (width << domain) is pinned by SketchSpec: overestimate-only.
  */
case class CmsFreq(
    child: Expression,
    items: Seq[String],
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(width >= 8 && width <= (1 << 22), s"cms_freq: width out of range: $width")
  require(depth >= 1 && depth <= 16, s"cms_freq: depth out of range: $depth")
  require(items.nonEmpty, "cms_freq: no query items")

  override def prettyName: String = "cms_freq"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("est", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  @inline private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  @inline private def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  @inline private def slot(h: Long, row: Int): Int = {
    // one base hash, per-row seed mixed through the finisher — the
    // standard 2-universal-per-row construction
    val hr = splitmix64(h ^ (row.toLong * 0xA0761D6478BD642FL))
    row * width + (((hr % width) + width) % width).toInt
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = fnv1a64(v.asInstanceOf[UTF8String].getBytes)
      var r = 0
      while (r < depth) { buf(slot(h, r)) += 1L; r += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(items.sorted.map { item =>
      val h = fnv1a64(item.getBytes("UTF-8"))
      var est = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = buf(slot(h, r))
        if (c < est) est = c
        r += 1
      }
      InternalRow(UTF8String.fromString(item), est): Any
    }.toArray)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsFreq =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsFreq =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CmsFreq =
    copy(child = newChild)
}

/** Bounded per-group top-k (k smallest (key, payload) pairs) as a
  * Catalyst `TypedImperativeAggregate` — the distributed form of
  * DETERMINISTIC RESERVOIR SAMPLING: rank rows by a seeded content
  * hash and keep the k first per group. The textbook plan
  * (`row_number() OVER (PARTITION BY g ORDER BY key)`) shuffles EVERY
  * row of the corpus to rank them; this keeps a k-entry bounded heap
  * per task, merges partials by re-bounding (top-k is a mergeable
  * summary and, unlike sketches, EXACT at any data volume), and ships
  * at most k entries per group per task through one
  * ObjectHashAggregate — a fixed-size sample of a 100-TB corpus costs
  * a k-row shuffle, not a corpus sort. No reference counterpart
  * (SURVEY.md §2.6); the sampling-by-hash-order construction is the
  * same public idiom as the stratified sampler's.
  */
case class GroupTopK(
    left: Expression,  // sort key (string; e.g. seeded md5 of the id)
    right: Expression, // payload carried with the key (long id)
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(UTF8String, Long)]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k >= 1 && k <= 100000, s"group_top_k: k out of range: $k")

  override def prettyName: String = "group_top_k"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("skey", StringType), StructField("payload", LongType))),
    containsNull = false)

  // max-heap on (key, payload): peek/poll is the LARGEST retained pair,
  // so a full heap admits a new pair by evicting its maximum
  private def cmp(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
    val c = a._1.compareTo(b._1)
    if (c != 0) c else java.lang.Long.compare(a._2, b._2)
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[(UTF8String, Long)] =
    new java.util.PriorityQueue[(UTF8String, Long)](k + 1,
      (a: (UTF8String, Long), b: (UTF8String, Long)) => -cmp(a, b))

  @inline private def admit(heap: java.util.PriorityQueue[(UTF8String, Long)],
                            key: UTF8String, payload: Long,
                            owned: Boolean): Unit = {
    if (heap.size() < k) {
      heap.offer(((if (owned) key else key.clone()), payload))
    } else if (cmp((key, payload), heap.peek()) < 0) {
      heap.poll()
      heap.offer(((if (owned) key else key.clone()), payload))
    }
  }

  override def update(heap: java.util.PriorityQueue[(UTF8String, Long)],
                      input: InternalRow): java.util.PriorityQueue[(UTF8String, Long)] = {
    val kv = left.eval(input)
    val pv = right.eval(input)
    if (kv != null && pv != null)
      admit(heap, kv.asInstanceOf[UTF8String], pv.asInstanceOf[Long], owned = false)
    heap
  }

  override def merge(heap: java.util.PriorityQueue[(UTF8String, Long)],
                     other: java.util.PriorityQueue[(UTF8String, Long)])
      : java.util.PriorityQueue[(UTF8String, Long)] = {
    val it = other.iterator()
    while (it.hasNext) {
      val e = it.next()
      admit(heap, e._1, e._2, owned = true) // deserialized = already owned
    }
    heap
  }

  override def eval(heap: java.util.PriorityQueue[(UTF8String, Long)]): Any = {
    val arr = new Array[(UTF8String, Long)](heap.size())
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr, (a: (UTF8String, Long), b: (UTF8String, Long)) => cmp(a, b))
    new GenericArrayData(arr.map(e => InternalRow(e._1, e._2): Any))
  }

  override def serialize(heap: java.util.PriorityQueue[(UTF8String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size())
    val it = heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e._1.getBytes
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e._2)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(UTF8String, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val heap = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      heap.offer((UTF8String.fromBytes(kb), in.readLong()))
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(o: Int): GroupTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GroupTopK =
    copy(left = newLeft, right = newRight)
}

/** Deterministic mergeable quantile summary (Manku–Rajagopalan–Lindsay,
  * "Approximate Medians and other Quantiles in One Pass and with
  * Limited Memory", SIGMOD'98 — the deterministic collapse variant; no
  * KLL coin flips, so reruns are bit-stable). EXACT below `k` values
  * per group — the raw values are kept and the rank formula
  * `ceil(q·n)` is applied directly, which is how the driver query gets
  * a bit-exact window-rank oracle — and ε ≈ log₂(n/k)/k beyond, via
  * level buffers of k sorted values with weight 2^level, collapsed
  * binary-counter style: merge two sorted k-buffers, keep alternating
  * elements (the alternation phase toggles per level — the
  * deterministic error-cancelling trick from the paper).
  *
  * The 100-TB story: percentiles of a corpus column cost one
  * fixed-size partial per task (`k` + a few level buffers ≈ tens of
  * KB) through ObjectHashAggregate — never a global sort. Contrast
  * `percentile(col, q)`: exact but buffers every value per group
  * through the exchange. */
final class QuantileBuf(val k: Int) {
  var n: Long = 0L
  /** exact values until promotion; also the level-0 fill buffer after. */
  var fill: Array[Double] = new Array[Double](math.min(k, 1 << 12))
  var fillN: Int = 0
  /** levels(L): sorted buffer of EXACTLY k values, each standing for
    * 2^L originals; stored sparsely (level → buffer), binary-counter
    * carries. Level 0 holds raw (weight-1) promoted fill buffers. */
  var levels: java.util.TreeMap[Integer, Array[Double]] =
    new java.util.TreeMap[Integer, Array[Double]]()
  /** per-level alternation phase for deterministic collapse. */
  var phases: java.util.HashMap[Integer, Integer] =
    new java.util.HashMap[Integer, Integer]()

  def exactMode: Boolean = levels.isEmpty

  def add(v: Double): Unit = {
    if (fillN == fill.length) {
      if (fill.length < k) {
        fill = java.util.Arrays.copyOf(fill, math.min(k, fill.length * 2))
      } else {
        java.util.Arrays.sort(fill)
        carry(0, fill)
        fill = new Array[Double](k)
        fillN = 0
      }
    }
    fill(fillN) = v
    fillN += 1
    n += 1
  }

  /** binary-counter carry of a sorted k-buffer into `levels`. */
  private def carry(level0: Int, buf0: Array[Double]): Unit = {
    var level = level0
    var buf = buf0
    while (levels.containsKey(level)) {
      val other = levels.remove(level)
      buf = collapse(other, buf, nextPhase(level))
      level += 1
    }
    levels.put(level, buf)
  }

  private def nextPhase(level: Int): Int = {
    val p = phases.getOrDefault(level, 0)
    phases.put(level, p ^ 1)
    p
  }

  /** merge two sorted k-buffers, keep elements at alternating offset. */
  private def collapse(a: Array[Double], b: Array[Double], phase: Int): Array[Double] = {
    val out = new Array[Double](a.length)
    var ia = 0
    var ib = 0
    var pos = 0
    var kept = 0
    while (kept < out.length && (ia < a.length || ib < b.length)) {
      val v =
        if (ib >= b.length || (ia < a.length && a(ia) <= b(ib))) { val x = a(ia); ia += 1; x }
        else { val x = b(ib); ib += 1; x }
      if ((pos & 1) == phase) { out(kept) = v; kept += 1 }
      pos += 1
    }
    // phase=1 can leave one slot short at the tail; fill with the max
    while (kept < out.length) {
      out(kept) = out(math.max(kept - 1, 0))
      kept += 1
    }
    out
  }

  def merge(other: QuantileBuf): Unit = {
    require(other.k == k, s"quantile sketch k mismatch: $k vs ${other.k}")
    // exact+exact within capacity stays exact (partition-order independent)
    if (exactMode && other.exactMode && fillN + other.fillN <= k) {
      if (fill.length < fillN + other.fillN)
        fill = java.util.Arrays.copyOf(fill, k)
      System.arraycopy(other.fill, 0, fill, fillN, other.fillN)
      fillN += other.fillN
      n += other.n
      return
    }
    var i = 0
    // add() bumps n per fill value; the level buffers below carry the
    // rest of other.n, so correct to an exact `n += other.n` overall
    while (i < other.fillN) { add(other.fill(i)); n -= 1; i += 1 }
    n += other.n
    val it = other.levels.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      carry(e.getKey, e.getValue)
    }
  }

  /** value at rank max(1, ceil(q·n)) over the weighted summary;
    * identical to the window-rank formula when in exact mode. */
  def query(qs: Array[Double]): Array[Double] = {
    if (n == 0) return qs.map(_ => Double.NaN) // all-null group
    val entries = new java.util.ArrayList[(Double, Long)](fillN + levels.size * k)
    var i = 0
    while (i < fillN) { entries.add((fill(i), 1L)); i += 1 }
    val it = levels.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val w = 1L << e.getKey // level L values each stand for 2^L originals
      e.getValue.foreach(v => entries.add((v, w)))
    }
    val arr = entries.toArray(new Array[(Double, Long)](entries.size))
    java.util.Arrays.sort(arr, (a: (Double, Long), b: (Double, Long)) =>
      java.lang.Double.compare(a._1, b._1))
    val totalW = arr.map(_._2).sum
    qs.map { q =>
      // scale the rank to the summary's total weight (== n in exact mode)
      val target = math.max(1L, math.ceil(q * totalW).toLong)
      var cum = 0L
      var j = 0
      var res = arr(arr.length - 1)._1
      var found = false
      while (j < arr.length && !found) {
        cum += arr(j)._2
        if (cum >= target) { res = arr(j)._1; found = true }
        j += 1
      }
      res
    }
  }
}

/** `quantiles(col, qs, k)` — see [[QuantileBuf]]. Returns
  * array<double> aligned with `qs`. */
case class QuantileSummary(
    child: Expression,
    qs: Seq[Double],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileBuf] with UnaryLike[Expression] {

  require(k >= 16 && k <= (1 << 20), s"quantiles: k out of range: $k")
  require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
    s"quantiles: fractions must be in (0, 1]: $qs")

  override def prettyName: String = "quantiles"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): QuantileBuf = new QuantileBuf(k)

  override def update(buf: QuantileBuf, input: InternalRow): QuantileBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: QuantileBuf, other: QuantileBuf): QuantileBuf = {
    buf.merge(other)
    buf
  }

  override def eval(buf: QuantileBuf): Any =
    new GenericArrayData(buf.query(qs.toArray))

  override def serialize(buf: QuantileBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeLong(buf.n)
    out.writeInt(buf.fillN)
    var i = 0
    while (i < buf.fillN) { out.writeDouble(buf.fill(i)); i += 1 }
    out.writeInt(buf.levels.size)
    val it = buf.levels.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeInt(e.getKey)
      e.getValue.foreach(out.writeDouble)
    }
    out.writeInt(buf.phases.size)
    val pit = buf.phases.entrySet().iterator()
    while (pit.hasNext) {
      val e = pit.next()
      out.writeInt(e.getKey); out.writeInt(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QuantileBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new QuantileBuf(bb.getInt)
    buf.n = bb.getLong
    buf.fillN = bb.getInt
    if (buf.fill.length < buf.fillN)
      buf.fill = new Array[Double](math.max(buf.fillN, buf.fill.length))
    var i = 0
    while (i < buf.fillN) { buf.fill(i) = bb.getDouble; i += 1 }
    val nl = bb.getInt
    var li = 0
    while (li < nl) {
      val level = bb.getInt
      val arr = new Array[Double](buf.k)
      var j = 0
      while (j < buf.k) { arr(j) = bb.getDouble; j += 1 }
      buf.levels.put(level, arr)
      li += 1
    }
    val np = bb.getInt
    var pi = 0
    while (pi < np) {
      val lv = bb.getInt
      buf.phases.put(lv, bb.getInt)
      pi += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantileSummary =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSummary =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): QuantileSummary =
    copy(child = newChild)
}

object Sketches {
  /** `heavy_hitters(col, k)` as a Column aggregate. */
  def heavyHitters(col: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      HeavyHitters(org.apache.spark.sql.graftbridge.ColumnBridge.expr(col), k)
        .toAggregateExpression())

  /** `hll_ndv(col, p)` as a Column aggregate (2^p registers). */
  def hllNdv(col: org.apache.spark.sql.Column, p: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      HllNdv(org.apache.spark.sql.graftbridge.ColumnBridge.expr(col), p)
        .toAggregateExpression())

  /** `cms_freq(col, items, width, depth)` as a Column aggregate. */
  def cmsFreq(col: org.apache.spark.sql.Column, items: Seq[String],
              width: Int, depth: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      CmsFreq(org.apache.spark.sql.graftbridge.ColumnBridge.expr(col),
        items, width, depth).toAggregateExpression())

  /** `quantiles(col, qs, k)` as a Column aggregate (array<double>
    * aligned with `qs`; exact below k values per group). */
  def quantiles(col: org.apache.spark.sql.Column, qs: Seq[Double],
                k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      QuantileSummary(org.apache.spark.sql.graftbridge.ColumnBridge.expr(col),
        qs, k).toAggregateExpression())

  /** `group_top_k(keyCol, payloadCol, k)` as a Column aggregate. */
  def groupTopK(key: org.apache.spark.sql.Column,
                payload: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      GroupTopK(org.apache.spark.sql.graftbridge.ColumnBridge.expr(key),
        org.apache.spark.sql.graftbridge.ColumnBridge.expr(payload), k)
        .toAggregateExpression())
}
