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

object Sketches {
  /** `heavy_hitters(col, k)` as a Column aggregate. */
  def heavyHitters(col: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      HeavyHitters(org.apache.spark.sql.graftbridge.ColumnBridge.expr(col), k)
        .toAggregateExpression())
}
