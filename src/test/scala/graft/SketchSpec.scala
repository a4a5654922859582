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

  // ------------------------------------------------------------- hll_ndv

  private def ndv(df: org.apache.spark.sql.DataFrame, p: Int): Long =
    df.agg(Sketches.hllNdv(col("v"), p).as("ndv"))
      .collect().head.getLong(0)

  test("hll_ndv is EXACT below the sparse cap, any partitioning") {
    import spark.implicits._
    for (distinct <- Seq(1, 17, 1000, 4096)) { // cap at p=14 is 4096
      val df = spark.range(30000)
        .select((col("id") % distinct).as("v")).repartition(9)
      assert(ndv(df, 14) == distinct.toLong, s"distinct=$distinct")
    }
    // strings too
    val s = spark.range(20000)
      .select(concat(lit("u"), (col("id") % 321).cast("string")).as("v"))
      .repartition(5)
    assert(ndv(s, 14) == 321L)
  }

  test("hll_ndv dense regime: error within the published bound") {
    import spark.implicits._
    // 200k distinct longs >> cap: fully dense at p=12 (m=4096,
    // expected relative error 1.04/sqrt(m) ≈ 1.6%; assert 3x slack)
    val n = 200000L
    val df = spark.range(n).select(col("id").as("v")).repartition(8)
    val est = ndv(df, 12)
    assert(math.abs(est - n).toDouble / n < 0.05, s"est=$est")
    // merging dense partials must equal one-pass (register max is
    // associative): same estimate with adversarial partitioning
    assert(ndv(df.repartition(31), 12) == est)
  }

  test("hll_ndv sparse and dense partials merge across the boundary") {
    import spark.implicits._
    // small partitions stay sparse, big ones go dense; their union must
    // agree with the one-sided estimate (values 0..499 are a subset of
    // 0..99999, so truth is 100000)
    val sparseSide = spark.range(500).select(col("id").as("v")).repartition(4)
    val denseSide = spark.range(100000).select(col("id").as("v")).repartition(4)
    val est = ndv(sparseSide.unionAll(denseSide), 12)
    assert(math.abs(est - 100000L).toDouble / 100000 < 0.05, s"est=$est")
  }

  test("hll_ndv rejects unsupported types and bad precision") {
    import spark.implicits._
    val df = spark.range(10).select(col("id").cast("double").as("v"))
    intercept[Exception](ndv(df, 14))
    intercept[Exception] {
      val d2 = spark.range(10).select(col("id").as("v"))
      ndv(d2, 25)
    }
  }

  private def cms(df: org.apache.spark.sql.DataFrame, items: Seq[String],
                  width: Int, depth: Int): Map[String, Long] =
    df.agg(Sketches.cmsFreq(col("item"), items, width, depth).as("c"))
      .select(explode(col("c")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("cms_freq exact when the observed domain is small vs width") {
    import spark.implicits._
    val df = spark.range(30000)
      .select(concat(lit("k"), (col("id") % 17).cast("string")).as("item"))
      .repartition(9) // partials merge across partitions
    val items = (0 until 17).map(i => s"k$i")
    val got = cms(df, items, 1024, 4)
    val want = df.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("cms_freq overflow regime: overestimate-only, bounded in expectation") {
    import spark.implicits._
    val n = 40000L
    val df = spark.range(n) // 40k distinct items into width 64: heavy collisions
      .select(concat(lit("u"), col("id").cast("string")).as("item"))
      .repartition(5)
    val items = Seq("u0", "u123", "u9999", "u39999")
    val got = cms(df, items, 64, 4)
    items.foreach { it =>
      val est = got(it)
      assert(est >= 1L, s"$it undercounted: $est") // never undercounts
      // e*n/width Markov bound holds per row w.p. 1-1/e; with depth 4
      // allow 3x the single-row expectation as a deterministic ceiling
      assert(est <= 1L + 3 * n / 64, s"$it overcount too large: $est")
    }
  }

  test("cms_freq never reports below the true count (random streams)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val data = Seq.fill(5000)(s"i${rnd.nextInt(300)}")
    val df = data.toDF("item").repartition(3)
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val items = truth.keys.take(40).toSeq
    val got = cms(df, items, 128, 4)
    items.foreach(it => assert(got(it) >= truth(it), s"$it undercounted"))
  }

  private def quants(df: org.apache.spark.sql.DataFrame, qs: Seq[Double],
                     k: Int): Map[String, Seq[Double]] =
    df.groupBy("g").agg(Sketches.quantiles(col("v"), qs, k).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap

  test("quantiles exact regime equals the ceil(q*n) rank (any partitioning)") {
    import spark.implicits._
    val qs = Seq(0.5, 0.9, 0.99)
    val df = spark.range(3000).select(
      (col("id") % 7).cast("string").as("g"),
      (col("id") * 2654435761L % 10007).cast("double").as("v"))
      .repartition(13) // forces partial serialize/merge across tasks
    val got = quants(df, qs, 4096)
    val byG = df.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted.toSeq }
    val want = byG.map { case (g, vs) =>
      g -> qs.map(q => vs(math.max(1, math.ceil(q * vs.size).toLong).toInt - 1))
    }
    assert(got == want)
  }

  test("quantiles overflow regime: rank error within the deterministic bound") {
    import spark.implicits._
    val n = 200000
    val k = 256
    val df = spark.range(n).select(
      lit("g").as("g"),
      (col("id") * 2654435761L % 1000003).cast("double").as("v"))
      .repartition(17)
    val sorted = df.select("v").collect().map(_.getDouble(0)).sorted
    val got = quants(df, Seq(0.1, 0.5, 0.9), k)("g")
    for ((q, est) <- Seq(0.1, 0.5, 0.9).zip(got)) {
      // rank of the estimate in the true order vs the target rank
      val lo = sorted.count(_ < est)
      val hi = sorted.count(_ <= est)
      val target = math.ceil(q * n)
      val err = math.min(math.abs(lo - target), math.abs(hi - target)) / n.toDouble
      assert(err <= 0.05, s"q=$q: est=$est rank in [$lo,$hi] target=$target err=$err")
    }
  }

  test("quantiles: single value, constant column, and tiny groups") {
    import spark.implicits._
    val df = Seq(("a", 5.0), ("b", 1.0), ("b", 1.0), ("b", 1.0)).toDF("g", "v")
      .repartition(3)
    val got = quants(df, Seq(0.5, 1.0), 64)
    assert(got == Map("a" -> Seq(5.0, 5.0), "b" -> Seq(1.0, 1.0)))
  }

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int): Seq[(String, String, Long)] =
    df.groupBy("g")
      .agg(Sketches.groupTopK(col("k"), col("p"), k).as("s"))
      .select(col("g"), explode(col("s")).as("e"))
      .select(col("g"), col("e.skey"), col("e.payload"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq

  test("group_top_k equals the window-rank restatement (any partitioning)") {
    import spark.implicits._
    val df = spark.range(5000).select(
      (col("id") % 7).cast("string").as("g"),
      md5(col("id").cast("string")).as("k"),
      col("id").as("p")).repartition(9)
    val got = topk(df, 10).sorted
    val want = df.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy("k", "p")))
      .filter(col("rn") <= 10).select("g", "k", "p")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(got == want)
  }

  test("group_top_k: groups smaller than k return whole groups; ties break on payload") {
    import spark.implicits._
    val rows = Seq(("a", "same", 3L), ("a", "same", 1L), ("a", "same", 2L),
      ("b", "x", 9L)).toDF("g", "k", "p").repartition(4)
    assert(topk(rows, 2) == Seq(("a", "same", 1L), ("a", "same", 2L), ("b", "x", 9L)))
    assert(topk(rows, 10).size == 4)
  }

  test("group_top_k ignores null keys/payloads and survives serde merges") {
    import spark.implicits._
    val df = spark.range(2000).select(
      lit("g").as("g"),
      when(col("id") % 5 === 0, lit(null)).otherwise(md5(col("id").cast("string"))).as("k"),
      col("id").as("p"))
      .repartition(13) // forces partial serialize/merge across tasks
    val got = topk(df, 25)
    assert(got.size == 25 && got.forall(_._2 != null))
    val want = df.filter(col("k").isNotNull).orderBy("k", "p").limit(25)
      .collect().map(r => ("g", r.getString(1), r.getLong(2))).toSeq
    assert(got == want)
  }
}
