package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-shaped corpus operators: connected-components dedup clustering
  * (the step a 100-TB dedup pipeline runs AFTER pair generation — near-dup
  * pairs form chains/webs, and keeping one canonical doc per component
  * needs transitive closure, not pairs) and BM25 relevance scoring over
  * an exploded posting-list shape.
  *
  * The reference has no graph machinery (dedup there is adjacent-row
  * comparison on sorted input, dedupe.go:8-111); components are the
  * distributed generalization its single-node semantics imply.
  */
object GraphOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** One large-star round: every node connects its strictly-larger
    * neighbors to the minimum of its neighborhood (incl. itself).
    * Edges arrive as (s, t) in any orientation. The neighborhood min
    * rides a window over the SAME hash partitioning the rows already
    * need (guide §2.4: an aggregation and a join keyed the same way can
    * share one exchange) — round 5 ran a groupBy + a re-shuffled join
    * per star, i.e. three exchanges of the edge set per round where one
    * suffices. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("s"), col("t"))
      .union(e.select(col("t").as("s"), col("s").as("t")))
    val byS = org.apache.spark.sql.expressions.Window.partitionBy("s")
    sym.withColumn("mn", min("t").over(byS))
      .filter(col("t") > col("s"))
      .select(col("t").as("s"), least(col("s"), col("mn")).as("t"))
      .distinct()
  }

  /** One small-star round: every node connects its smaller-or-equal
    * neighbors (and itself) to the minimum among them. Same one-exchange
    * window shape as [[largeStar]]; the per-edge center rows it emits
    * (vs one per node before) are absorbed by the trailing distinct the
    * round already pays. */
  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(greatest("s", "t").as("u"), least("s", "t").as("v"))
      .filter(col("u") =!= col("v"))
    val byU = org.apache.spark.sql.expressions.Window.partitionBy("u")
    val withMn = oriented.withColumn("mn", min("v").over(byU))
    val children = withMn.select(col("v").as("s"), col("mn").as("t"))
    val centers = withMn.select(col("u").as("s"), col("mn").as("t"))
    children.union(centers)
      .filter(col("s") =!= col("t"))
      .distinct()
  }

  /** Distributed connected components by alternating large-star /
    * small-star rounds (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14) until the edge set is a fixpoint —
    * O(log n) rounds, never materializing a component on one machine,
    * which is what makes it the 100-TB shape (a component can exceed
    * executor memory; label-propagation-by-collect cannot).
    *
    * Returns (id, component) for every node in `nodes`; isolated nodes
    * map to themselves. Each round is two shuffles over the edge set;
    * `localCheckpoint` cuts the iterative lineage so plan size stays
    * constant across rounds.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame): DataFrame = {
    var e = edges.select(col("s"), col("t")).filter(col("s") =!= col("t"))
      .distinct().localCheckpoint()
    var prev: (Long, Long) = (-1L, -1L)
    var rounds = 0
    var converged = false
    while (!converged && rounds < 25) {
      e = smallStar(largeStar(e)).localCheckpoint()
      // set signature: count + XOR of row hashes — order-independent and
      // overflow-free (ANSI mode rejects a wrapping SUM of 64-bit hashes)
      val row = e.agg(
        count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("s"), col("t"))), lit(0L)).as("h")).head()
      val sig = (row.getLong(0), row.getLong(1))
      converged = sig == prev
      prev = sig
      rounds += 1
    }
    require(converged, s"connectedComponents did not converge in $rounds rounds")
    // Fixpoint edges are stars (child, component-min); centers map to
    // themselves, isolated nodes fall out of the left join as self-labels.
    val stars = e.select(col("s").as("id"), col("t").as("component"))
      .union(e.select(col("t").as("id"), col("t").as("component")))
      .groupBy("id").agg(min("component").as("component"))
    nodes.join(stars, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Dedup clustering end-to-end on a deterministic pair graph: chain
    * edges link doc_id→doc_id+1 when both share a language (near-dup
    * runs), bridge edges link doc_id→doc_id·2 (cross-run duplicates),
    * so components span many hops and the transitive closure is
    * non-trivial. Output: every doc labeled with its component's
    * canonical (minimum) doc_id — exactly the "keep one per cluster"
    * decision. Oracle: DuckDB recursive-CTE label propagation over the
    * same edges. */
  def dedupCluster(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select("doc_id", "lang")
    val a = d.as("a")
    val b = d.as("b")
    val chain = a.join(b,
        col("b.doc_id") === col("a.doc_id") + 1 && col("a.lang") === col("b.lang"))
      .select(col("a.doc_id").as("s"), col("b.doc_id").as("t"))
    val bridge = a.join(b,
        col("b.doc_id") === col("a.doc_id") * 2 && col("b.doc_id") > col("a.doc_id"))
      .select(col("a.doc_id").as("s"), col("b.doc_id").as("t"))
    val nodes = d.select(col("doc_id").as("id"))
    connectedComponents(nodes, chain.union(bridge))
      .select(col("id").as("doc_id"), col("component"))
      .orderBy("doc_id")
  }

  /** BM25 scoring of the corpus against a fixed query, computed in the
    * posting-list shape a distributed text index uses: explode words →
    * per-(doc, term) term frequencies → document frequencies from the
    * postings themselves → score join. No full-text shuffle after the
    * explode-aggregate (partial aggregation absorbs it map-side); df/N/
    * avgdl are O(#terms)/O(1) aggregates. k1 = 1.2, b = 0.75 (the
    * canonical Robertson parameters); idf = ln(1 + (N-df+0.5)/(df+0.5)).
    * Scores rounded to 6 decimals so both engines' double formatting
    * agrees bit-for-bit. */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    val query = Seq("hash", "merge", "spark")
    val d = docs(spark, dir)
      .select(col("doc_id"), col("text"), size(split(col("text"), " ")).as("dl"))
    val stats = d.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
    val postings = d
      .select(col("doc_id"), col("dl"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(query: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val df = postings.groupBy("term").agg(count(lit(1)).as("df"))
    postings.join(broadcast(df), "term").crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      // constants written as the same decimal literals the oracle uses
      // (k1=1.2, k1+1=2.2, 1-b=0.25, b=0.75) so both engines parse the
      // identical doubles — computing k1+1.0 at runtime can round to a
      // different ulp than the literal 2.2
      .withColumn("w",
        col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(round(sum("w"), 6).as("bm25"), count(lit(1)).as("n_terms"))
      .orderBy("doc_id")
  }
}
