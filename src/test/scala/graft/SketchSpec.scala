package graft

import graft.functions.Sketches
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HeavyHitters (Misra–Gries) TypedImperativeAggregate: exact when the
  * domain fits in k counters, ε=n/(k+1)-bounded undercounts when it
  * overflows, and the true heavy hitters always survive. */
class SketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(Sketches.heavyHitters(col("item"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact when distinct items <= k (any partitioning)") {
    import spark.implicits._
    val df = spark.range(20000)
      .select(concat(lit("t"), (col("id") % 23).cast("string")).as("item"))
      .repartition(7)
    val got = sketch(df, 64)
    val want = df.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("overflow regime: undercount bounded by n/(k+1); hitters survive") {
    import spark.implicits._
    val n = 30000
    // heavy skew: two hot items over a 2000-item tail — the tail forces
    // constant eviction, the hot items must still surface with ε-bounded
    // undercounts
    val df = spark.range(n)
      .select(
        when(col("id") % 3 === 0, lit("hot1"))
          .when(col("id") % 3 === 1, lit("hot2"))
          .otherwise(concat(lit("z"), (col("id") % 2000).cast("string"))).as("item"))
      .repartition(5)
    val k = 32
    val got = sketch(df, k)
    val want = df.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size <= k)
    val eps = n.toDouble / (k + 1)
    got.foreach { case (item, c) =>
      val t = want(item) // never over the true count, never more than ε under
      assert(c <= t && c >= t - eps, s"$item: sketch $c true $t eps $eps")
    }
    // anything truly heavier than ε must be present
    want.filter(_._2 > eps).keys.foreach(h =>
      assert(got.contains(h), s"heavy item $h (count ${want(h)}) missing"))
  }

  test("null inputs are ignored; deterministic output order") {
    import spark.implicits._
    val df = Seq("a", "a", "b", null, "c", "b", "a").toDF("item")
    val rows = df.agg(Sketches.heavyHitters(col("item"), 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }
}
