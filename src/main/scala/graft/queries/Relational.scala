package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage (SURVEY.md §2.5): each reference dataflow
  * operator re-expressed as the declarative Spark plan Catalyst optimizes
  * (filters/pushdowns stay in the parquet scan; small dims broadcast).
  * All output columns are BIGINT/DOUBLE/VARCHAR so Spark and DuckDB parquet
  * schemas line up for the driver's hash compare.
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** R1 FilterRowReader → predicate pushdown into the scan. */
  def filter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 49.0 && col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")

  /** R3 TransformRowReader → Project with scalar functions. */
  def transform(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri"),
        length(col("o_orderpriority")).cast("long").as("pri_len"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .orderBy("o_orderkey")

  /** R4 DedupeRowReader → DISTINCT (hash-based at scale). */
  def dedupe(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** R2 ScanRowReader / R8-R9 sort / R12 seek → global sort + limit. */
  def sortLimit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  /** R5 MergeRowGroups / R6 MultiRowGroup → UNION ALL + resort. */
  def unionMerge(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
      .select(col("c_custkey").as("key"), lit("customer").as("side"))
    val s = t(spark, dir, "supplier")
      .select(col("s_suppkey").as("key"), lit("supplier").as("side"))
    c.unionAll(s).orderBy("key", "side")
  }

  /** R7 Convert → casts / schema projection. */
  def convert(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(
        col("l_orderkey").cast("string").as("okey_str"),
        col("l_linenumber").cast("long").as("ln"),
        floor(col("l_quantity")).cast("long").as("qty_int"))
      // (okey_str, ln) is not unique in the synthetic lineitem — include
      // qty_int so the output order is total and engine-independent
      .orderBy("okey_str", "ln", "qty_int")

  /** R15 ColumnIndexer stats → grouped min/max/count aggregation. */
  def statsMinMax(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("cnt"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"),
        sum(col("l_linenumber").cast("long")).as("sum_ln"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"))
      .orderBy("l_returnflag", "l_linestatus")

  /** ROLLUP aggregation (SURVEY §2.6 aggregations): per-(source, lang)
    * corpus stats with subtotal and grand-total rows in ONE pass —
    * Catalyst expands the rollup into a single Expand + hash aggregate,
    * so at 100 TB the three grouping levels cost one shuffle, not three
    * scans. Rollup NULL markers are coalesced to a sentinel (the raw
    * columns are non-null) so Spark and DuckDB agree byte-for-byte. */
  def rollupStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .rollup("source", "lang")
      .agg(count(lit(1)).as("cnt"),
        sum(col("n_chars")).as("chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .select(
        coalesce(col("source"), lit("<all>")).as("source"),
        coalesce(col("lang"), lit("<all>")).as("lang"),
        col("cnt"), col("chars"), col("min_chars"), col("max_chars"))
      .orderBy("source", "lang")

  /** Misra–Gries heavy hitters through the custom TypedImperativeAggregate
    * (functions.HeavyHitters): one ObjectHashAggregate pass, k counters
    * per task, mergeable partials — never a shuffle of the full item
    * domain. k=64 exceeds the event_type cardinality, so the sketch is
    * provably exact here and the plain GROUP BY is a bit-exact oracle
    * (the ε=n/(k+1) overflow regime is pinned by SketchSpec). */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .agg(graft.functions.Sketches.heavyHitters(col("event_type"), 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.cnt").as("cnt"))
      .orderBy(desc("cnt"), col("item"))

  /** HLL++ distinct-count sketch per group, run in its EXACT regime:
    * `user_id % 1000` bounds the per-group domain at 1000 < 2^14/4, so
    * the sparse mode never overflows and the estimate IS
    * count(DISTINCT ...) — the bit-exact oracle; SketchSpec separately
    * pins the dense-mode error bound where the domain overflows. One
    * small register buffer per group crosses the exchange instead of
    * count(DISTINCT)'s Expand + full distinct-value shuffle. */
  def hllNdv(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy("event_type")
      .agg(graft.functions.Sketches
        .hllNdv(col("user_id") % 1000, 14).as("ndv_users"))
      .orderBy("event_type")

  /** Count-Min frequency point-queries through the custom CmsFreq
    * TypedImperativeAggregate: depth×width counters per task, merged by
    * addition — never a distinct-domain shuffle. The 5-value event_type
    * domain vs width 256 keeps every queried item collision-free at any
    * data volume (collisions depend only on the strings + seeds, not
    * rows), so the sketch answer IS the exact GROUP BY — the oracle;
    * SketchSpec pins the overflow regime (overestimate-only). */
  def cmsFreq(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .agg(graft.functions.Sketches.cmsFreq(col("event_type"),
        Seq("click", "view", "purchase", "signup", "error"), 256, 4).as("cms"))
      .select(explode(col("cms")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"))
      .orderBy("item")

  /** Semi-structured column projection: the events table carries a JSON
    * `props` string; `from_json` with an explicit schema projects the
    * needed field ONCE into a typed column (never re-parsing per
    * predicate), and the rest of the query is ordinary codegen'd
    * filter + partial aggregation. At 100 TB the discipline that
    * matters is the explicit schema — no schema inference scan, no
    * repeated JSON parsing, and unparseable rows surface as nulls that
    * the filter drops deterministically. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_type"), expr("from_json(props, 'k INT').k").as("k"))
      .filter(col("k") >= 50)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("k").cast("long")).as("sum_k"))
      .orderBy("event_type")

  /** Per-language doc-length percentiles through the deterministic
    * MRL quantile summary, run in its EXACT regime: ≤ k values per
    * group keeps the raw buffer, so the answer IS the rank formula
    * `v[ceil(q·n)]` — the window-restatement oracle. One fixed-size
    * partial per task crosses the exchange (never a per-group value
    * sort at the reducer); SketchSpec separately pins the ε-bound
    * where the buffer overflows. */
  def quantileStats(spark: SparkSession, dir: String): DataFrame = {
    val qs = graft.functions.Sketches
      .quantiles(col("n_chars").cast("double"), Seq(0.5, 0.9, 0.99), 4096)
    t(spark, dir, "documents")
      .groupBy("lang")
      .agg(qs.as("q"))
      .select(col("lang"), col("q")(0).as("p50"), col("q")(1).as("p90"),
        col("q")(2).as("p99"))
      .orderBy("lang")
  }

  /** EXACT distinct users per event_type through Roaring bitmap
    * segments — the materialized-segment rollup pattern (Druid/Kylin):
    * build one compressed bitmap per (event_type, day) segment, then
    * re-merge segments under the coarser event_type grouping. Neither
    * pass ships raw ids across the exchange: a segment partial is at
    * most 8 KiB per populated 65536-id range however many rows fed it,
    * and the second aggregation touches only #segments rows. Unlike
    * [[hllNdv]] the answer is exact in EVERY regime — the bitmap is a
    * lossless set, so the count(DISTINCT) oracle holds at any scale,
    * not just below a sparse-mode cap. n_segments doubles as a check
    * that the segment tier really materialized per day. */
  def bitmapNdv(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(graft.functions.Bitmaps.bitmapBuild(col("user_id")).as("seg"))
      .groupBy("event_type")
      .agg(graft.functions.Bitmaps.bitmapNdv(col("seg")).as("ndv_users"),
        count(lit(1)).as("n_segments"))
      .orderBy("event_type")

  /** Validation join shape (SURVEY §2.6) — dim side broadcast. */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("cnt"), min("c_acctbal").as("min_bal"))
      .orderBy("n_name")

  /** R13 BloomFilter probe analog → semi join (runtime filter). */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val rich = t(spark, dir, "customer").filter(col("c_acctbal") > 5000.0)
    t(spark, dir, "orders")
      .join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus")
  }

  /** R11 Find/Search page pruning analog → selective range predicate
    * (shows up as PushedFilters + min/max row-group skipping). */
  def rangePrune(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderkey").between(1000L, 2000L))
      .select("o_orderkey", "o_orderstatus")
      .orderBy("o_orderkey")

  /** Window functions (absent in reference, required of the engine). */
  def window(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Event-time tumbling-window aggregation (streaming analog, batch). */
  def eventWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("cnt"), min("value").as("min_v"), max("value").as("max_v"))
      .orderBy("event_type", "hr")

  /** Gap-based sessionization via `session_window` (batch mode): events
    * of one user merge into a session while consecutive gaps stay
    * within 4 hours; the session end is last-event + gap. Spark merges
    * two windows when the next start is <= the current end, so a gap of
    * EXACTLY 4h still extends the session — the oracle's break condition
    * is strict `>` to match (verified at the boundary by
    * RelationalEdgeSpec). One shuffle on the grouping keys;
    * min/max aggregates are order-independent so the restatement is
    * exact. */
  def sessionWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(session_window(col("ts"), "4 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min("value").as("min_v"), max("value").as("max_v"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("sess_end"),
        col("n_events"), col("min_v"), col("max_v"))
      .orderBy("user_id", "sess_start")

  /** Backward AS-OF join, the scalable way: purchases pick up the value
    * of the latest click at ts' <= ts by the same user. Instead of a
    * range join (quadratic blow-up per user at scale), the two sides
    * UNION into one stream sorted by (ts, side) within each user and a
    * single carry-forward `last(ignoreNulls)` window resolves every
    * purchase in one shuffle — clicks sort before purchases at equal ts,
    * matching the oracle's `>=` bound. DuckDB restates with its native
    * ASOF LEFT JOIN. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        lit(null).cast("long").as("event_id"),
        col("value").as("cv"), lit(0).as("is_p"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(null).cast("double").as("cv"), lit(1).as("is_p"))
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("is_p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click_v", last("cv", ignoreNulls = true).over(w))
      .filter(col("is_p") === 1)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        col("last_click_v"))
      .orderBy("event_id")
  }

  /** INTERSECT / EXCEPT set operators (absent in the reference, §2.6):
    * week-one clickers who did vs didn't also purchase that week. Both
    * compile to aggregate-based plans (no naive pairwise compare):
    * INTERSECT is a left-semi over distincts, EXCEPT a left-anti —
    * each one shuffle on the key. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .filter(col("ts") < lit("2024-01-08").cast("timestamp"))
    val clickers = ev.filter(col("event_type") === "click").select("user_id")
    val buyers = ev.filter(col("event_type") === "purchase").select("user_id")
    clickers.intersect(buyers).withColumn("tag", lit("both"))
      .unionByName(clickers.except(buyers).withColumn("tag", lit("click_only")))
      .select("tag", "user_id")
      .orderBy("tag", "user_id")
  }

  /** PIVOT: per-source document counts spread across the (closed) lang
    * domain. Pivot values are pinned explicitly — with them the plan is
    * ONE pass with conditional partial aggregation (no extra job to
    * discover the domain, which at 100 TB would be a full scan). Empty
    * cells fill 0 to match the oracle's coalesced conditional sums. */
  def pivotLang(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy("source")
      .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("source")

  /** CUBE aggregation: all 2^k grouping combinations in one pass — the
    * Expand-based plan shuffles each row once per grouping set with
    * partial aggregation underneath, so no pass over the base data
    * repeats (rollup's generalization; reference has neither, §2.6). */
  def cubeStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .cube("lang", "source")
      .agg(count(lit(1)).as("cnt"), sum("n_chars").as("chars"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)

  /** Skew-salted repartition join: a per-user profile dim joined back to
    * the event stream. At corpus scale the profile side is 10^9 rows
    * (no broadcast) and a handful of bot users carry 10^8 events each —
    * a vanilla shuffle join puts one such key in one task. Salting
    * spreads it: the fact side adds salt = event_id mod S (uniform by
    * construction), the dim side replicates each row across all S salts,
    * and the join key becomes (user_id, salt) — each hot key now fans
    * out over S tasks at the cost of an S-times-larger dim shuffle,
    * the standard trade. Result provably equals the unsalted join
    * (every fact row meets exactly one replica), which is the oracle. */
  def skewJoin(spark: SparkSession, dir: String): DataFrame = {
    val salts = 8
    val ev = t(spark, dir, "events")
    val dim = ev.groupBy("user_id").agg(count(lit(1)).as("u_events"))
      .withColumn("salt", explode(lit((0 until salts).toArray)))
    val fact = ev.withColumn("salt", pmod(col("event_id"), lit(salts)).cast("int"))
    fact.join(dim, Seq("user_id", "salt"))
      .filter(col("event_id") % 5 === 0)
      .select("event_id", "user_id", "u_events")
      .orderBy("event_id")
  }

  /** Range (interval-overlap) join, broadcast flavor: each event type's
    * opening 6-hour window counts intruding events of OTHER types. The
    * range side is tiny (one interval per type) so the right plan is a
    * broadcast nested-loop with the interval predicate evaluated
    * streamside — no shuffle of the fact table at all; at a million
    * intervals the same query would bucket both sides by coarse time
    * bins first (the q_asof_join union trick's sibling). */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val ranges = ev.groupBy(col("event_type").as("range_type"))
      .agg(min("ts").as("lo"))
      .withColumn("hi", col("lo") + expr("INTERVAL 6 HOURS"))
    ev.join(broadcast(ranges),
        col("ts") >= col("lo") && col("ts") <= col("hi") &&
          col("event_type") =!= col("range_type"))
      .groupBy("range_type")
      .agg(count(lit(1)).as("hits"), countDistinct("event_type").as("n_types"))
      .orderBy("range_type")
  }
}
