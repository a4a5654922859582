package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (Array[Float], 64-dim):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH bucketed variant as the scale path (buckets shrink the
  * candidate set so the pairwise work is per-bucket, not all-pairs).
  */
object SimilarityOps {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Deterministic query vector: the embedding with the smallest vec_id
    * (broadcast to every task — no shuffle of the big side). */
  private def queryVec(spark: SparkSession, dir: String): Array[Float] =
    emb(spark, dir).orderBy("vec_id").limit(1)
      .collect()(0).getSeq[Float](1).toArray

  @inline private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Brute-force cosine top-k vs the query vector. Exact; the baseline
    * the LSH variant is judged against. Rounded to 6dp for stability. */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = spark.sparkContext.broadcast(queryVec(spark, dir))
    emb(spark, dir).select("vec_id", "embedding").as[(Long, Seq[Float])]
      .map { case (id, v) => (id, cosine(v.toArray, q.value)) }
      .toDF("vec_id", "cos")
      .withColumn("cos", round(col("cos"), 6))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20)
  }

  /** LSH-bucketed ANN: 16 random-hyperplane bits (seeded splitmix64
    * pseudo-planes) → same-bucket candidates vs the query → exact rerank
    * within the bucket. The scale path: at 10^9 vectors the bucket join
    * replaces the all-pairs scan. */
  def lshAnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dims = 64
    val bits = 4
    // deterministic pseudo-random hyperplanes
    val planes = Array.tabulate(bits, dims) { (b, d) =>
      val h = graft.spark.TokenTableGen.splitmix64(b.toLong * 131 + d)
      (h.toDouble / Long.MaxValue.toDouble)
    }
    def sig(v: Array[Float]): Int = {
      var s = 0
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var d = 0
        while (d < dims) { dot += planes(b)(d) * v(d); d += 1 }
        if (dot >= 0) s |= 1 << b
        b += 1
      }
      s
    }
    val q = queryVec(spark, dir)
    val qSig = sig(q)
    val bq = spark.sparkContext.broadcast(q)
    emb(spark, dir).select("vec_id", "embedding").as[(Long, Seq[Float])]
      .map { case (id, v) => (id, sig(v.toArray), v) }
      .toDF("vec_id", "sig", "embedding")
      .filter(col("sig") === qSig) // bucket probe
      .as[(Long, Int, Seq[Float])]
      .map { case (id, _, v) => (id, cosine(v.toArray, bq.value)) }
      .toDF("vec_id", "cos")
      .withColumn("cos", round(col("cos"), 6))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20)
  }

  /** IVF ANN: deterministic k-means coarse quantizer (seeded init, 3
    * Lloyd iterations computed with Spark aggregations), then search
    * probes the `nprobe` nearest centroid cells and reranks exactly.
    * The scale path for 10^9+ vectors: the pairwise work is per-cell.
    */
  def ivfAnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dims = 64
    val k = 16
    val nprobe = 4
    val vecs = emb(spark, dir).select("vec_id", "embedding").as[(Long, Seq[Float])].cache()

    // seeded deterministic init (splitmix pseudo-vectors)
    var centroids = Array.tabulate(k, dims) { (c, d) =>
      graft.spark.TokenTableGen.splitmix64(c.toLong * 8191 + d).toDouble / Long.MaxValue.toDouble
    }
    def nearest(v: Array[Float], cents: Array[Array[Double]]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        var dist = 0.0
        var d = 0
        while (d < dims) { val t = cents(c)(d) - v(d); dist += t * t; d += 1 }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      best
    }
    // Lloyd iterations: assign + mean, all as distributed aggregations
    for (_ <- 1 to 3) {
      val bc = spark.sparkContext.broadcast(centroids)
      val sums = vecs
        .map { case (_, v) =>
          val arr = v.toArray
          (nearest(arr, bc.value), (arr.map(_.toDouble), 1L))
        }
        .groupByKey(_._1)
        .mapValues(_._2)
        .reduceGroups((a, b) => (a._1.zip(b._1).map(t => t._1 + t._2), a._2 + b._2))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { case (c, (sum, n)) =>
        var d = 0
        while (d < dims) { next(c)(d) = sum(d) / n; d += 1 }
      }
      centroids = next
    }

    val bcC = spark.sparkContext.broadcast(centroids)
    val q = queryVec(spark, dir)
    val bq = spark.sparkContext.broadcast(q)
    // nprobe nearest cells to the query
    val cellDist = centroids.zipWithIndex.map { case (c, i) =>
      var dist = 0.0
      var d = 0
      while (d < dims) { val t = c(d) - q(d); dist += t * t; d += 1 }
      (i, dist)
    }.sortBy(_._2).take(nprobe).map(_._1).toSet
    val bcCells = spark.sparkContext.broadcast(cellDist)

    vecs
      .map { case (id, v) => (id, nearest(v.toArray, bcC.value), v) }
      .filter(t => bcCells.value.contains(t._2)) // inverted-list probe
      .map { case (id, _, v) => (id, cosine(v.toArray, bq.value)) }
      .toDF("vec_id", "cos")
      .withColumn("cos", round(col("cos"), 6))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, bucketed by
    * LSH signature so the pairwise join is per-bucket (near-dup dedup for
    * embedding space). */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dims = 64
    val bits = 6
    val planes = Array.tabulate(bits, dims) { (b, d) =>
      graft.spark.TokenTableGen.splitmix64(b.toLong * 977 + d).toDouble / Long.MaxValue.toDouble
    }
    val withSig = emb(spark, dir).select("vec_id", "embedding").as[(Long, Seq[Float])]
      .map { case (id, v) =>
        val arr = v.toArray
        var s = 0
        var b = 0
        while (b < bits) {
          var dot = 0.0
          var d = 0
          while (d < dims) { dot += planes(b)(d) * arr(d); d += 1 }
          if (dot >= 0) s |= 1 << b
          b += 1
        }
        (id, s, v)
      }
      .toDF("vec_id", "sig", "embedding")
    val a = withSig.as("a")
    val b = withSig.as("b")
    a.join(b, col("a.sig") === col("b.sig") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ida"), col("a.embedding").as("va"),
        col("b.vec_id").as("idb"), col("b.embedding").as("vb"))
      .as[(Long, Seq[Float], Long, Seq[Float])]
      .map { case (ida, va, idb, vb) => (ida, idb, cosine(va.toArray, vb.toArray)) }
      .toDF("vec_a", "vec_b", "cos")
      .withColumn("cos", round(col("cos"), 6))
      .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
      .limit(50) // top near-dup candidates; thresholding is caller policy
  }
}
