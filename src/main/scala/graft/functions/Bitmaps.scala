package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Roaring-style compressed bitmap over 64-bit ids (Chambi, Lemire,
  * Kaser, Godin — "Better bitmap performance with Roaring bitmaps",
  * SP&E 2016; 64-bit extension per the public Roaring spec's high-bits
  * map). Ids are split into a 48-bit high key and a 16-bit low part;
  * each key owns either a SORTED ARRAY container (≤ 4096 entries,
  * 2 B/id) or a fixed 8 KiB BITMAP container (≥ 4097 entries,
  * ≤ 1 bit/possible id) — the classic density-adaptive trade that keeps
  * a container's footprint at most 8 KiB no matter how dense the id
  * range gets.
  *
  * This is the EXACT fixed-error-free counterpart of the HLL sketch
  * ([[HllBuffer]]): `count(DISTINCT id)` at 100 TB shuffles every
  * distinct id to its group's reducer; a bitmap partial ships at most
  * 8 KiB per populated 65536-id range regardless of row count, merges
  * associatively (bitwise OR), and still answers exactly. Dense integer
  * id domains (auto-increment user/doc ids — the common case in a
  * training corpus) compress ~32–64× vs shipping the ids. The partials
  * are also REUSABLE: per-segment bitmaps built once (e.g. per day) can
  * be re-merged under any coarser grouping later — the Druid/Kylin
  * materialized-segment pattern — which is what [[BitmapNdv]]'s
  * binary-input mode implements. No reference counterpart (SURVEY.md
  * §2.6 — the reference is an encode library; aggregation is Spark's
  * side of the graft).
  */
private[functions] final class ArrayContainer {
  var a = new Array[Char](8)
  var n = 0
  /** sorted-insert; returns false on duplicate. */
  def add(low: Char): Boolean = {
    var lo = 0
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = a(mid)
      if (v == low) return false
      else if (v < low) lo = mid + 1
      else hi = mid - 1
    }
    if (n == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
    System.arraycopy(a, lo, a, lo + 1, n - lo)
    a(lo) = low
    n += 1
    true
  }
}

private[functions] final class BitmapContainer {
  val bits = new Array[Long](1024)
  var n = 0
  def add(low: Char): Unit = {
    val w = low >>> 6
    val m = 1L << (low & 63)
    if ((bits(w) & m) == 0L) { bits(w) |= m; n += 1 }
  }
}

final class Roaring64 {
  import Roaring64.ArrayMax

  /** high-48-bit key → ArrayContainer | BitmapContainer */
  val containers = new java.util.HashMap[java.lang.Long, AnyRef]()

  def add(v: Long): Unit = {
    val key = java.lang.Long.valueOf(v >>> 16)
    val low = (v & 0xFFFF).toChar
    containers.get(key) match {
      case null =>
        val c = new ArrayContainer
        c.add(low)
        containers.put(key, c)
      case c: ArrayContainer =>
        if (c.n >= ArrayMax) {
          val b = promote(c)
          b.add(low)
          containers.put(key, b)
        } else c.add(low)
      case b: BitmapContainer => b.add(low)
    }
  }

  private def promote(c: ArrayContainer): BitmapContainer = {
    val b = new BitmapContainer
    var i = 0
    while (i < c.n) { b.add(c.a(i)); i += 1 }
    b
  }

  def cardinality: Long = {
    var total = 0L
    val it = containers.values().iterator()
    while (it.hasNext) {
      it.next() match {
        case c: ArrayContainer => total += c.n
        case b: BitmapContainer => total += b.n
      }
    }
    total
  }

  def merge(other: Roaring64): Unit = {
    val it = other.containers.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      containers.get(e.getKey) match {
        case null => containers.put(e.getKey, e.getValue) // adopt (serde-owned)
        case mine => containers.put(e.getKey, union(mine, e.getValue))
      }
    }
  }

  private def union(x: AnyRef, y: AnyRef): AnyRef = (x, y) match {
    case (a: ArrayContainer, b: ArrayContainer) =>
      // merge the smaller into the larger unless the result promotes
      if (a.n + b.n > ArrayMax) {
        val bm = promote(a)
        var i = 0
        while (i < b.n) { bm.add(b.a(i)); i += 1 }
        bm
      } else {
        val (big, small) = if (a.n >= b.n) (a, b) else (b, a)
        var i = 0
        while (i < small.n) { big.add(small.a(i)); i += 1 }
        big
      }
    case (a: ArrayContainer, b: BitmapContainer) => union(b, a)
    case (b: BitmapContainer, a: ArrayContainer) =>
      var i = 0
      while (i < a.n) { b.add(a.a(i)); i += 1 }
      b
    case (b: BitmapContainer, c: BitmapContainer) =>
      var w = 0
      var n = 0
      while (w < 1024) {
        b.bits(w) |= c.bits(w)
        n += java.lang.Long.bitCount(b.bits(w))
        w += 1
      }
      b.n = n
      b
  }

  def serializedSize: Int = {
    var sz = 4
    val it = containers.values().iterator()
    while (it.hasNext) {
      sz += 8 + 1 + 4
      it.next() match {
        case c: ArrayContainer => sz += 2 * c.n
        case _: BitmapContainer => sz += 8 * 1024
      }
    }
    sz
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(serializedSize)
    bb.putInt(containers.size)
    val it = containers.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      e.getValue match {
        case c: ArrayContainer =>
          bb.put(0.toByte)
          bb.putInt(c.n)
          var i = 0
          while (i < c.n) { bb.putChar(c.a(i)); i += 1 }
        case b: BitmapContainer =>
          bb.put(1.toByte)
          bb.putInt(b.n)
          var w = 0
          while (w < 1024) { bb.putLong(b.bits(w)); w += 1 }
      }
    }
    bb.array()
  }
}

object Roaring64 {
  /** array → bitmap promotion threshold: past this the bitmap is
    * smaller (4096 × 2 B = 8 KiB = the bitmap's fixed size). */
  private[functions] final val ArrayMax = 4096

  def deserialize(bytes: Array[Byte]): Roaring64 = {
    val bb = ByteBuffer.wrap(bytes)
    val r = new Roaring64
    val nc = bb.getInt
    var ci = 0
    while (ci < nc) {
      val key = java.lang.Long.valueOf(bb.getLong)
      val tpe = bb.get()
      val n = bb.getInt
      if (tpe == 0) {
        val c = new ArrayContainer
        c.a = new Array[Char](math.max(n, 1))
        c.n = n
        var i = 0
        while (i < n) { c.a(i) = bb.getChar; i += 1 }
        r.containers.put(key, c)
      } else {
        val b = new BitmapContainer
        b.n = n
        var w = 0
        while (w < 1024) { b.bits(w) = bb.getLong; w += 1 }
        r.containers.put(key, b)
      }
      ci += 1
    }
    r
  }
}

/** `bitmap_build(idCol)` — aggregate a group's long ids into a
  * serialized [[Roaring64]] (BinaryType). The materialized-segment
  * half of the bitmap pattern: build once per fine-grained segment,
  * re-merge under any coarser grouping with [[BitmapNdv]]. */
case class BitmapBuild(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64] with UnaryLike[Expression] {

  override def prettyName: String = "bitmap_build"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Roaring64 = new Roaring64

  override def update(buf: Roaring64, input: InternalRow): Roaring64 = {
    val v = child.eval(input)
    if (v != null) buf.add(Bitmaps.asLong(v))
    buf
  }

  override def merge(buf: Roaring64, other: Roaring64): Roaring64 = {
    buf.merge(other)
    buf
  }

  override def eval(buf: Roaring64): Any = buf.serialize()
  override def serialize(buf: Roaring64): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): Roaring64 = Roaring64.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapBuild =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapBuild =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BitmapBuild =
    copy(child = newChild)
}

/** `bitmap_ndv(col)` — EXACT distinct count with bitmap-bounded
  * partials. Long input: build-and-count directly. Binary input:
  * treat each value as a serialized [[Roaring64]] segment and count
  * the union's cardinality — the re-aggregation path that turns
  * per-segment bitmaps into any coarser rollup without touching rows
  * again. */
case class BitmapNdv(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64] with UnaryLike[Expression] {

  // lazy: child may be unresolved while the Column is being built
  private lazy val binaryInput: Boolean = child.dataType == BinaryType

  override def prettyName: String = "bitmap_ndv"
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Roaring64 = new Roaring64

  override def update(buf: Roaring64, input: InternalRow): Roaring64 = {
    val v = child.eval(input)
    if (v != null) {
      if (binaryInput) buf.merge(Roaring64.deserialize(v.asInstanceOf[Array[Byte]]))
      else buf.add(Bitmaps.asLong(v))
    }
    buf
  }

  override def merge(buf: Roaring64, other: Roaring64): Roaring64 = {
    buf.merge(other)
    buf
  }

  override def eval(buf: Roaring64): Any = buf.cardinality
  override def serialize(buf: Roaring64): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): Roaring64 = Roaring64.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapNdv =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapNdv =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BitmapNdv =
    copy(child = newChild)
}

object Bitmaps {
  private def bridge = org.apache.spark.sql.graftbridge.ColumnBridge

  private[functions] def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short => s.toLong
    case b: java.lang.Byte => b.toLong
    case other =>
      throw new IllegalArgumentException(s"bitmap aggregate: not an integral id: $other")
  }

  /** `bitmap_build(col)` as a Column aggregate (→ binary segment). */
  def bitmapBuild(col: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    bridge.column(BitmapBuild(bridge.expr(col)).toAggregateExpression())

  /** `bitmap_ndv(col)` as a Column aggregate (long ids or binary
    * segments → exact distinct count). */
  def bitmapNdv(col: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    bridge.column(BitmapNdv(bridge.expr(col)).toAggregateExpression())
}
