package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional chunk
  * pruning. Sorting a table by the bit-interleaved rank of two or three
  * columns makes EVERY interleaved column's per-chunk min/max interval
  * tight, so a box predicate over any subset of the dimensions prunes
  * chunks — where a linear sort gives tight stats on the leading column
  * only. This is the layout strategy Delta's OPTIMIZE ZORDER and
  * Iceberg's sort-order z-curves apply at 100 TB; here it composes with
  * the engine's existing chunk statistics and the automatic
  * filter→chunk-stats pushdown rules with no new read-side code at all.
  *
  * The z-value is built entirely from codegen'd Column bit arithmetic
  * (shift/and/or ladders — the classic Morton "bit spread" magic
  * numbers), so the clustering pass is one range exchange on a
  * whole-stage-codegen key: no UDF, no row object allocation. The rank
  * scaling per dimension is min/max-affine (one O(1)-row aggregate up
  * front), which preserves each dimension's order exactly — ties in
  * rank only coarsen the curve, never reorder it.
  *
  * No reference counterpart (the reference is a single-node file
  * writer); engine-side scale addition. Morton 1966; public magic-number
  * spreads as in the standard bit-twiddling literature.
  */
object ZOrder {

  private val Mask32 = 0xFFFFFFFFL
  private val Mask21 = 0x1FFFFFL

  /** Spread the low 32 bits of `x` to the even bit positions (two-way
    * interleave). Pure Column ops → whole-stage codegen. */
  private[graft] def spread2(x: Column): Column = {
    var v = x.bitwiseAND(lit(Mask32))
    val steps = Seq(
      16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
      4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
      1 -> 0x5555555555555555L)
    for ((s, m) <- steps) v = v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
    v
  }

  /** Spread the low 21 bits of `x` to every third bit position
    * (three-way interleave). */
  private[graft] def spread3(x: Column): Column = {
    var v = x.bitwiseAND(lit(Mask21))
    val steps = Seq(
      32 -> 0x001F00000000FFFFL, 16 -> 0x001F0000FF0000FFL,
      8 -> 0x100F00F00F00F00FL, 4 -> 0x10C30C30C30C30C3L,
      2 -> 0x1249249249249249L)
    for ((s, m) <- steps) v = v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
    v
  }

  /** Affine rank of `c` into [0, 2^bits): (v - min) scaled by the column
    * span. Doubles carry 53 mantissa bits, so a 32-bit target rank is
    * exact for spans up to 2^21 per rank step; ties from coarser spans
    * only merge adjacent curve cells. Monotone in `c` by construction. */
  private[graft] def rank(c: Column, mn: Long, mx: Long, bits: Int): Column = {
    val top = (1L << bits) - 1
    if (mx <= mn) lit(0L)
    else {
      val scale = top.toDouble / (mx - mn).toDouble
      least(lit(top), greatest(lit(0L),
        floor((c.cast("double") - lit(mn.toDouble)) * lit(scale)).cast("long")))
    }
  }

  /** The interleaved z-value of 2 or 3 integral columns given their
    * [min, max] spans (2 dims → 32 bits each, 3 dims → 21). */
  private[graft] def zvalue(cols: Seq[Column], spans: Seq[(Long, Long)]): Column = {
    require(cols.size == 2 || cols.size == 3, s"z-order supports 2 or 3 dims, got ${cols.size}")
    val bits = if (cols.size == 2) 32 else 21
    val spread: Column => Column = if (cols.size == 2) spread2 else spread3
    cols.zip(spans).zipWithIndex.map { case ((c, (mn, mx)), i) =>
      shiftleft(spread(rank(c, mn, mx, bits)), i)
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` on the z-curve of `dims` (2 or 3 integral columns):
    * one O(#dims)-row min/max aggregate, then a single range exchange +
    * in-partition sort on the codegen'd z-value. The output carries the
    * original schema; feed it straight to [[GenericEncode.encode]] so
    * chunk min/max stats become tight on every dimension at once. */
  def cluster(df: DataFrame, dims: Seq[String], numParts: Int): DataFrame = {
    val aggs = dims.flatMap(d => Seq(min(col(d)).cast("long"), max(col(d)).cast("long")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val spans = dims.indices.map(i => (row.getLong(2 * i), row.getLong(2 * i + 1)))
    val z = zvalue(dims.map(col), spans)
    df.withColumn("__graft_z", z)
      .repartitionByRange(numParts, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
  }
}
