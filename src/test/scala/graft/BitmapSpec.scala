package graft

import graft.functions.{Bitmaps, Roaring64}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Roaring64 bitmap + the BitmapBuild/BitmapNdv aggregates: exact
  * distinct counts in every density regime (array containers, bitmap
  * containers, promotion at 4096), serde round-trip, merge == set
  * union, and the two-level segment rollup equals the direct count. */
class BitmapSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("fuzz: cardinality/merge/serde agree with HashSet semantics") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 10) {
      val domain = rnd.nextInt(5) match {
        case 0 => 1000L // one range, array container
        case 1 => 100000L // spans two ranges
        case 2 => 50L // tiny
        case 3 => Long.MaxValue // scattered ranges, all arrays
        case _ => 70000L
      }
      val a = new Roaring64
      val b = new Roaring64
      val sa = new java.util.HashSet[Long]()
      val sb = new java.util.HashSet[Long]()
      val n = 1 + rnd.nextInt(20000)
      for (_ <- 0 until n) {
        val v = math.abs(rnd.nextLong()) % domain
        if (rnd.nextBoolean()) { a.add(v); sa.add(v) }
        else { b.add(v); sb.add(v) }
      }
      // negative ids too: high bits all-ones ranges
      a.add(-1L); sa.add(-1L)
      b.add(Long.MinValue); sb.add(Long.MinValue)
      assert(a.cardinality == sa.size, s"trial $trial side a")
      assert(b.cardinality == sb.size, s"trial $trial side b")
      val aRt = Roaring64.deserialize(a.serialize())
      assert(aRt.cardinality == sa.size, s"trial $trial serde")
      aRt.merge(Roaring64.deserialize(b.serialize()))
      sa.addAll(sb)
      assert(aRt.cardinality == sa.size, s"trial $trial merged")
    }
  }

  test("promotion at 4096: dense range flips to bitmap container, stays exact") {
    val r = new Roaring64
    // 60000 of 65536 slots in one range — must promote, must not lose ids
    var i = 0
    while (i < 60000) { r.add(1000000L + i); r.add(1000000L + i); i += 1 }
    assert(r.cardinality == 60000)
    val rt = Roaring64.deserialize(r.serialize())
    assert(rt.cardinality == 60000)
    // bitmap-bitmap union path
    val other = new Roaring64
    i = 30000
    while (i < 65536) { other.add(1000000L + i); i += 1 }
    rt.merge(other)
    assert(rt.cardinality == 65536)
  }

  test("bitmap_ndv equals countDistinct (long input, any partitioning)") {
    import spark.implicits._
    val df = spark.range(50000)
      .select((col("id") % 13).cast("string").as("g"),
        (col("id") * 2654435761L % 9000).as("v"))
      .repartition(11) // forces partial serialize/merge across tasks
    val got = df.groupBy("g").agg(Bitmaps.bitmapNdv(col("v")).as("ndv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.groupBy("g").agg(countDistinct("v").as("ndv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("two-level segment rollup (build -> ndv over binary) equals direct") {
    import spark.implicits._
    val df = spark.range(40000)
      .select((col("id") % 5).cast("string").as("g"),
        (col("id") % 17).as("seg_key"),
        (col("id") % 3000).as("v"))
      .repartition(9)
    val segments = df.groupBy("g", "seg_key")
      .agg(Bitmaps.bitmapBuild(col("v")).as("seg"))
    val got = segments.groupBy("g").agg(Bitmaps.bitmapNdv(col("seg")).as("ndv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.groupBy("g").agg(countDistinct("v").as("ndv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("nulls are ignored; empty group counts zero") {
    import spark.implicits._
    val df = Seq[(String, Option[Long])](("a", Some(1L)), ("a", None),
      ("a", Some(1L)), ("b", None)).toDF("g", "v")
    val got = df.groupBy("g").agg(Bitmaps.bitmapNdv(col("v")).as("ndv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 0L))
  }
}
