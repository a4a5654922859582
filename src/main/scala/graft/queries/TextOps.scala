package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Training-data text pipeline operators over the `documents` table:
  * exact dedup, token counting, quality scoring, language-ID heuristic,
  * fingerprinting, and the multimodal-column plumbing stub. Where the
  * same arithmetic is expressible in DuckDB SQL the query gets an
  * identity-checkable oracle; engine-internal ops are rows-only.
  */
object TextOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Exact deduplication: canonical id + copy count per distinct text.
    * Groups by the 128-bit MD5 of the text, not the text itself: at
    * corpus scale the exchange then carries 16-byte keys instead of
    * whole documents (~100× less shuffle-key volume), and a 128-bit
    * hash is collision-safe (p < 10⁻¹⁸ at 10¹² docs), so the result is
    * identical to grouping by the raw text — which is exactly what the
    * oracle does. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(col("text").cast("binary")).as("fp"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("copies"))
      .select("keep_id", "copies")
      .orderBy("keep_id")

  /** Token counting: whitespace tokens via length arithmetic (identical
    * semantics in DuckDB so the oracle is exact). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", "")))
          .cast("long").as("n_spaces"))
      .withColumn("n_tokens", col("n_spaces") + lit(1L))
      .orderBy("doc_id")

  /** BPE-style pre-tokenization counting: the GPT-2-family pre-tokenizer
    * splits text into letter runs, digit runs, and single non-alnum
    * marks before byte-pair merging — this operator counts those token
    * classes per doc with a regex both engines implement identically
    * (plain character classes: Java regex on the Spark side, RE2 in the
    * DuckDB oracle), giving the corpus-level token budget a training
    * pipeline sizes batches with. */
  def tokenCountBpe(spark: SparkSession, dir: String): DataFrame = {
    val txt = col("text")
    docs(spark, dir)
      .select(
        col("doc_id"),
        regexp_count(txt, lit("[A-Za-z]+")).cast("long").as("n_word"),
        regexp_count(txt, lit("[0-9]+")).cast("long").as("n_num"),
        regexp_count(txt, lit("[^A-Za-z0-9 ]")).cast("long").as("n_mark"),
        regexp_count(txt, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))
          .cast("long").as("n_bpe"))
      .orderBy("doc_id")
  }

  /** Quality scoring: punctuation / stopword / word-length signals. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val txt = col("text")
    def occurrences(s: String, len: Int) =
      ((length(txt) - length(regexp_replace(txt, java.util.regex.Pattern.quote(s), ""))) / len)
        .cast("long")
    docs(spark, dir)
      .select(
        col("doc_id"),
        length(txt).cast("long").as("n_chars"),
        occurrences(".", 1).as("n_dots"),
        occurrences("the", 3).as("n_the"),
        (length(txt) - length(regexp_replace(txt, " ", ""))).cast("long").as("n_spaces"))
      .withColumn("avg_word_len",
        (col("n_chars") - col("n_spaces")).cast("double") / (col("n_spaces") + lit(1L)).cast("double"))
      .orderBy("doc_id")
  }

  /** Language-ID n-gram heuristic: stopword hit counts → argmax CASE.
    * The oracle re-states the same arithmetic, so Spark and DuckDB must
    * agree exactly (this checks the heuristic's determinism, not accuracy
    * against the `lang` label). */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val txt = col("text")
    def hits(word: String) = {
      val pat = " " + word + " "
      ((length(txt) - length(regexp_replace(txt, java.util.regex.Pattern.quote(pat), ""))) /
        pat.length).cast("long")
    }
    docs(spark, dir)
      .select(col("doc_id"),
        hits("the").as("en_hits"), hits("der").as("de_hits"),
        hits("el").as("es_hits"), hits("le").as("fr_hits"))
      .withColumn("guess",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits") &&
          col("en_hits") >= col("fr_hits") && col("en_hits") > 0, "en")
          .when(col("de_hits") >= col("es_hits") && col("de_hits") >= col("fr_hits") &&
            col("de_hits") > 0, "de")
          .when(col("es_hits") >= col("fr_hits") && col("es_hits") > 0, "es")
          .when(col("fr_hits") > 0, "fr")
          .otherwise("other"))
      .orderBy("doc_id")
  }

  /** Document fingerprinting (content hash; MD5 matches DuckDB's). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .orderBy("doc_id")

  /** Multimodal plumbing: treat text bytes as an opaque binary payload,
    * run a batched per-partition "decode" stage (the real image/audio
    * decode is stubbed — not available in this container — but the
    * schema, batching and partition shape are real). Output is checkable:
    * payload byte length per doc. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // stand-in for a vectorized decoder (image resize / frame sample):
        // processes the partition as one batch, emits typed metadata
        batch.map { case (id, payload) => (id, payload.length.toLong) }
      }
      .toDF("doc_id", "n_bytes")
      .orderBy("doc_id")
  }

  /** Multimodal frame-sampling plumbing: treat the payload as a binary
    * stream of fixed 16-byte "frames" (the video-frame stand-in — real
    * codecs are absent in this container, so the decode step is a
    * deterministic slicer), sample every 4th complete frame inside a
    * batched mapPartitions stage, and emit typed metadata + an MD5 over
    * the sampled frames. The oracle reproduces the arithmetic over the
    * same bytes, so the batch shape, sampling stride, and digest are all
    * value-checked. */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val nFrames = payload.length / 16
          val md = java.security.MessageDigest.getInstance("MD5")
          var sampled = 0
          var i = 0
          while ((i + 1) * 16 <= payload.length) {
            if (i % 4 == 0) { md.update(payload, i * 16, 16); sampled += 1 }
            i += 1
          }
          (id, nFrames, sampled, md.digest().map("%02x".format(_)).mkString)
        }
      }
      .toDF("doc_id", "n_frames", "n_sampled", "fp")
      .orderBy("doc_id")
  }

  /** 64-bit SimHash of one document over its non-empty whitespace
    * tokens. The per-token hash is the low 8 digest bytes of
    * MD5(token-utf8) read little-endian — exactly the value DuckDB's
    * `md5_number_lower` returns — so an external oracle can recompute
    * the signature bit-for-bit (rounds 2–3 used engine-internal
    * splitmix seeds, which forced a weaker rows-only check). */
  private[queries] def simHash64(text: String): Long = {
    val counts = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    text.split(' ').foreach { tok =>
      if (tok.nonEmpty) {
        md.reset()
        val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L
        var i = 15
        while (i >= 8) { h = (h << 8) | (d(i) & 0xFFL); i -= 1 }
        var b = 0
        while (b < 64) { if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1; b += 1 }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  /** SimHash (64-bit) signature per document — exact-oracle checkable
    * (see [[simHash64]]). A doc with no non-empty tokens signs as 0. */
  def simHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir).select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) => (id, simHash64(text)) }
      .toDF("doc_id", "simhash")
      .orderBy("doc_id")
  }

  /** SimHash-banded near-duplicate detection at hamming distance ≤ 3.
    * The 64-bit signature splits into 4 bands of 16 bits; by pigeonhole
    * any pair at hamming ≤ 3 agrees exactly on ≥ 1 band, so the
    * band-bucket join has deterministic recall at the threshold — no
    * probabilistic miss, unlike MinHash banding. Planted rows: every
    * 10th doc gets a byte-identical copy at id+10⁶ (hamming 0) and a
    * one-token-appended copy at id+2·10⁶ (usually a few bits). The
    * exact hamming rerank makes the output equal the all-pairs
    * hamming ≤ 3 set, which the DuckDB oracle computes directly.
    *
    * Skew control is RECURSIVE banding, not row dropping: a bucket wider
    * than the cap (boilerplate 16-bit collisions) is not joined directly
    * — its members, which already agree on that band, are RE-banded on
    * the three remaining 16-bit bands. A pair at hamming ≤ 3 inside the
    * bucket has all its ≤ 3 differing bits in those 48 bits, so by the
    * same pigeonhole it agrees exactly on ≥ 1 sub-band — recall at the
    * threshold stays deterministic (a flat cap silently lost pairs whose
    * only agreeing band was the capped one). A sub-bucket still over the
    * cap means > cap documents share 32 identical signature bits — its
    * members are pairwise near-identical, so the EXACT OUTPUT is itself
    * quadratic in the bucket width; such buckets are joined anyway and
    * the width is surfaced on stderr as the honest cost driver. */
  def simHashNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = docs(spark, dir).select("doc_id", "text").as[(Long, String)]
    val tenth = base.filter(_._1 % 10 == 0)
    val copies = tenth.map { case (id, t) => (id + 1000000L, t) }
    val edits = tenth.map { case (id, t) => (id + 2000000L, t + " x") }
    val sigs = base.union(copies).union(edits)
      .map { case (id, t) => (id, simHash64(t)) }
      .toDF("doc_id", "simhash").persist()

    val banded = sigs.as[(Long, Long)].flatMap { case (id, sig) =>
      (0 until 4).iterator.map(b => (b, (sig >>> (16 * b)) & 0xFFFFL, id, sig))
    }.toDF("band", "band_bits", "doc_id", "simhash")
    val cap = 10000L
    // bucket width via a window over the (band, band_bits) partitioning
    // the pair joins below need anyway — one exchange instead of the
    // round-5 groupBy + re-shuffled join (guide §2.4)
    val withWidth = banded.withColumn("width",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("band", "band_bits"))).persist()
    val sized = withWidth.filter(col("width") <= cap)
    def pairsOf(df: DataFrame, keys: Seq[String]): DataFrame = {
      val a = df.as("a")
      val b = df.as("b")
      val joinCond = keys.map(k => col(s"a.$k") === col(s"b.$k"))
        .reduce(_ && _) && col("a.doc_id") < col("b.doc_id")
      a.join(b, joinCond)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.simhash").as("sig_a"), col("b.simhash").as("sig_b"))
    }
    val direct = pairsOf(sized, Seq("band", "band_bits"))
    // capped buckets: re-band the members on the three bands they do NOT
    // already share; ≤3 differing bits over 48 bits → ≥1 agreeing sub-band
    val capped = withWidth.filter(col("width") > cap)
    val cappedBuckets = capped.select("band", "band_bits").distinct().count()
    if (cappedBuckets > 0)
      System.err.println(s"simHashNearDup: $cappedBuckets band buckets over " +
        s"the $cap-row cap — re-banded on remaining 16-bit sub-bands")
    val sub = capped.select("band", "band_bits", "doc_id", "simhash")
      .as[(Int, Long, Long, Long)]
      .flatMap { case (band, bits, id, sig) =>
        (0 until 4).iterator.filter(_ != band).map(b2 =>
          (band, bits, b2, (sig >>> (16 * b2)) & 0xFFFFL, id, sig))
      }.toDF("band", "band_bits", "band2", "sub_bits", "doc_id", "simhash")
    val subPairs = pairsOf(sub, Seq("band", "band_bits", "band2", "sub_bits"))
    val out = direct.unionByName(subPairs)
      .distinct()
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)").cast("long"))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
      .cache()
    out.count() // materialize before unpersisting the upstream tables
    withWidth.unpersist()
    sigs.unpersist()
    out
  }

  /** MinHash + LSH near-duplicate detection at threshold 0.8. The query
    * plants mutated copies of every 10th doc (id + 10⁶, jaccard ~0.97 to
    * the original); 5-char shingles → 128 minhashes → 32 bands × 4 rows
    * (a pair at jaccard s collides in >=1 band with prob 1-(1-s⁴)³²:
    * >0.9999999 at s=0.8, so recall at the threshold is deterministic in
    * practice) → per-bucket candidate join with a width cap → exact
    * shingle-Jaccard rerank >= 0.8. The exact rerank makes the output
    * equal to the all-pairs jaccard>=0.8 set, which a DuckDB oracle
    * computes directly from 5-char substring sets. */
  def minHashLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = docs(spark, dir).select("doc_id", "text").as[(Long, String)]
    val planted = base.filter(_._1 % 10 == 0)
      .map { case (id, text) => (id + 1000000L, text + " mutated tail marker") }
    val corpus = base.union(planted)

    val numHashes = 128
    val bands = 32
    val rowsPerBand = numHashes / bands
    // 5-char shingles hashed ONCE per doc into a sorted array — both the
    // minhash pass and the exact rerank read this table (round 1 rebuilt
    // each doc's shingle set once per candidate PAIR, which dominated
    // wall time on wide candidate sets)
    val shingleSets = corpus.map { case (id, text) =>
      val shingles = new scala.collection.mutable.HashSet[Long]()
      var i = 0
      val n = text.length
      while (i + 5 <= n) {
        var h = 0xcbf29ce484222325L
        var j = i
        while (j < i + 5) { h = (h ^ text.charAt(j)) * 0x100000001b3L; j += 1 }
        shingles += h
        i += 1
      }
      val arr = shingles.toArray
      java.util.Arrays.sort(arr)
      (id, arr)
    }.toDF("doc_id", "sh").persist()

    val sigs = shingleSets.as[(Long, Array[Long])].flatMap { case (id, shingles) =>
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var s = 0
      while (s < shingles.length) {
        var k = 0
        while (k < numHashes) {
          val h = graft.spark.TokenTableGen.splitmix64(
            shingles(s) ^ (k.toLong * 0x9E3779B97F4A7C15L))
          if (h < mins(k)) mins(k) = h
          k += 1
        }
        s += 1
      }
      (0 until bands).iterator.map { b =>
        var bandHash = 0xcbf29ce484222325L
        var r = 0
        while (r < rowsPerBand) {
          bandHash = (bandHash ^ mins(b * rowsPerBand + r)) * 0x100000001b3L
          r += 1
        }
        (b, bandHash, id)
      }
    }.toDF("band", "band_hash", "doc_id")
      .persist() // feeds both join sides — the minhash pass runs once

    // Per-bucket width cap: one hot band bucket (boilerplate text) would
    // degenerate to quadratic pairwise work; a capped bucket's true pairs
    // are still caught by the other 31 independent bands.
    val cap = 10000L
    // bucket width via a window over the (band, band_hash) partitioning
    // the candidate self-join below needs anyway — one exchange instead
    // of the round-5 groupBy + re-shuffled join (guide §2.4)
    val sized = sigs.withColumn("width",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band", "band_hash")))
      .filter(col("width") <= cap)
    val a = sized.as("a")
    val b = sized.as("b")
    val candidates = a.join(b, col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // rerank: exact shingle-Jaccard on the candidate pairs only, via the
    // precomputed sorted shingle arrays (merge-intersection, O(|a|+|b|))
    val verified = candidates
      .join(shingleSets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shingleSets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      // joins move the key column first — select explicitly so the tuple
      // positions are (doc_a, doc_b, sh_a, sh_b), not join order
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (ida, idb, sa, sb) =>
        var i = 0
        var j = 0
        var inter = 0
        while (i < sa.length && j < sb.length) {
          if (sa(i) == sb(j)) { inter += 1; i += 1; j += 1 }
          else if (sa(i) < sb(j)) i += 1
          else j += 1
        }
        val union = sa.length + sb.length - inter
        (ida, idb, if (union == 0) 1.0 else inter.toDouble / union)
      }
      .toDF("doc_a", "doc_b", "jaccard")
    val result = verified.filter(col("jaccard") >= 0.8)
      .withColumn("jaccard", round(col("jaccard"), 6))
      .orderBy("doc_a", "doc_b")
      .cache()
    result.count() // materialize before unpersisting the shared tables
    sigs.unpersist()
    shingleSets.unpersist()
    result
  }

  /** N-gram Jaccard similarity for adjacent doc pairs (exact, not
    * sketched) — the verification counterpart of minHashLsh. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = docs(spark, dir).select("doc_id", "text").as[(Long, String)]
    def shingleSet(text: String): Set[Long] = {
      val out = new scala.collection.mutable.HashSet[Long]()
      var i = 0
      while (i + 5 <= text.length) {
        var h = 0xcbf29ce484222325L
        var j = i
        while (j < i + 5) { h = (h ^ text.charAt(j)) * 0x100000001b3L; j += 1 }
        out += h
        i += 1
      }
      out.toSet
    }
    val withNext = base.map { case (id, text) => (id / 2, id, shingleSet(text).toSeq) }
      .toDF("pair", "doc_id", "sh")
    val a = withNext.filter(col("doc_id") % 2 === 0).as("a")
    val b = withNext.filter(col("doc_id") % 2 === 1).as("b")
    a.join(b, col("a.pair") === col("b.pair"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))).cast("double"), 6).as("jaccard"))
      .orderBy("doc_a")
  }

  /** Word n-grams of the `text` column as an array column — the shared
    * kernel of decontamination/repetition. `n >= 2`; docs shorter than
    * n words contribute no grams (explode drops the empty array). Built
    * with codegen'd collection functions (transform/slice/array_join),
    * no UDF. */
  private def wordGrams(n: Int) = {
    val ws = split(col("text"), " ")
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Unicode NFC normalization before fingerprinting — text differing
    * only in combining-character composition must hash identically or
    * exact dedup silently misses duplicates. The corpus is synthetic
    * ASCII, so decomposed sequences (e + COMBINING ACUTE,
    * n + COMBINING TILDE) are PLANTED deterministically in-query (the
    * q_pii_redact precedent: both engines build the identical string).
    * The normalizer is a codegen'd Catalyst Expression
    * ([[graft.functions.NfcNormalize]]) with an ASCII fast path — a
    * Scala UDF would box rows and break whole-stage codegen. The
    * character counts prove composition actually happened (n_norm =
    * n_raw − 2). */
  def normalizeText(spark: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"), lit(" cafe\u0301 pin\u0303ata"))
    docs(spark, dir)
      .select(col("doc_id"), planted.as("raw"))
      .select(col("doc_id"),
        graft.functions.TextNormalize.nfc(lower(col("raw"))).as("norm"),
        length(col("raw")).cast("long").as("n_raw"))
      .select(col("doc_id"), col("norm"), md5(col("norm").cast("binary")).as("fp"),
        length(col("norm")).cast("long").as("n_norm"), col("n_raw"))
      .orderBy("doc_id")
  }

  /** Collocation mining: pointwise mutual information of adjacent word
    * bigrams over the corpus — PMI = ln(p(xy) / (p(x)·p(y))), the
    * classic phrase-detection statistic (Church & Hanks, CL 1990; the
    * word2vec phrase pass uses the same shape). Plan: one explode pass
    * each for unigram and bigram counts (both partial-aggregated —
    * shuffle volume is VOCABULARY-sized, never corpus-sized), then the
    * count table joins the two unigram legs by BROADCAST (a BPE-scale
    * vocab is ~10⁵ rows; an open-vocab corpus would flip these to
    * shuffle joins, same correctness). The two corpus scalars ride
    * 1-row broadcast cross joins — nothing collects to the driver.
    * round(6) absorbs cross-engine ln() ulps (the BM25 precedent);
    * the multiply/divide shape is written identically on both sides so
    * the doubles agree before rounding. */
  def pmiBigrams(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).withColumn("ws", split(col("text"), " "))
    val bi = d.select(explode(when(size(col("ws")) >= 2,
        expr("transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i+1] AS w2))"))
      .otherwise(expr("CAST(array() AS array<struct<w1:string,w2:string>>)"))).as("p"))
      .select(col("p.w1"), col("p.w2"))
    val uniW = d.select(explode(col("ws")).as("w"))
    val uni = uniW.groupBy("w").agg(count(lit(1)).as("c"))
    val nu = uniW.agg(count(lit(1)).as("nu"))
    val nb = bi.agg(count(lit(1)).as("nb"))
    bi.groupBy("w1", "w2").agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 5)
      .join(broadcast(uni.select(col("w").as("w1"), col("c").as("c1"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c2"))), "w2")
      .crossJoin(broadcast(nu))
      .crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("cnt"),
        round(log(col("cnt").cast("double") * col("nu") * col("nu") /
          (col("nb").cast("double") * col("c1") * col("c2"))), 6).as("pmi"))
      .orderBy("w1", "w2")
  }

  /** CCNet-style language-model quality filter: train an add-one-smoothed
    * bigram LM on the corpus itself, then score every document by its
    * per-bigram cross-entropy under that model — the classic "perplexity
    * filter" used to rank web text for LM training (CCNet, Wenzek et al.
    * 2020 §4.3; the KenLM scoring pass). p(w2|w1) = (c(w1,w2)+1) /
    * (ctx(w1)+V) with ctx = bigram-context counts and V = corpus distinct
    * unigrams; doc score = avg(-ln p) over its bigrams (boilerplate /
    * repetitive docs score LOW, gibberish scores HIGH).
    *
    * Plan shape: the MODEL is the aggregate (bigram + context counts —
    * both partial-aggregated, so shuffle volume is vocabulary-sized,
    * never corpus-sized) and joins back to the corpus bigram stream by
    * BROADCAST at BPE-vocab scale (~10⁵ rows; an open-vocab corpus flips
    * these to shuffle joins, same correctness). V rides a 1-row broadcast
    * cross join. The scoring pass is then map-side per bigram + one
    * per-doc aggregation — nothing collects to the driver, and the model
    * tables are reusable across epochs. The ln() argument is written as
    * ONE division of exact integers on both sides so the doubles agree
    * before avg; round(6) absorbs summation-order ulps (BM25 precedent). */
  def perplexityLm(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).withColumn("ws", split(col("text"), " "))
    val bi = d.select(col("doc_id"), explode(when(size(col("ws")) >= 2,
        expr("transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i+1] AS w2))"))
      .otherwise(expr("CAST(array() AS array<struct<w1:string,w2:string>>)"))).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
    val bc = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val cc = bi.groupBy("w1").agg(count(lit(1)).as("cw"))
    val v = d.select(explode(col("ws")).as("w")).agg(countDistinct(col("w")).as("v"))
    // NO broadcast hint on bc: it is keyed by bigram PAIRS, whose count
    // grows with the corpus, not the vocabulary — a forced broadcast
    // OOMs at open-vocab scale (round-5 ADVICE). AQE picks broadcast at
    // runtime while bc is actually small and falls back to a shuffle
    // join when it is not; cc (vocab-sized) and v (1 row) stay hinted.
    bi.join(bc, Seq("w1", "w2"))
      .join(broadcast(cc), Seq("w1"))
      .crossJoin(broadcast(v))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((col("cw") + col("v")).cast("double") / (col("cb") + lit(1)))), 6)
          .as("cross_entropy"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: flag every training document that shares
    * a word n-gram with the held-out eval set (here the deterministic
    * slice doc_id % 97 == 0 of the corpus stands in for the benchmark
    * suite). The eval side's distinct grams are tiny relative to the
    * corpus — real eval suites are a few thousand documents against
    * billions — so they BROADCAST and the check is a map-side join over
    * the exploded training grams: zero shuffle until the final per-doc
    * count. n = 3 because the synthetic vocabulary is ~20 words (dense
    * gram space); production text uses 8-13-gram windows, same plan. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val grams = docs(spark, dir)
      .select(col("doc_id"), explode(wordGrams(3)).as("g"))
    val evalGrams = grams.filter(col("doc_id") % 97 === 0)
      .select("g").distinct()
    grams.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalGrams), "g")
      .groupBy("doc_id")
      .agg(countDistinct(col("g")).as("n_hit_grams"))
      .orderBy("doc_id")
  }

  /** Deterministic stratified sampling for a training mix: per-language
    * keep rates applied via a seeded content hash, not rand() — the
    * sample is reproducible across runs, cluster sizes, and engines
    * (the oracle re-derives it exactly). The keep test compares the
    * first two hex chars of md5(seed:doc_id) against a per-stratum
    * threshold: lowercase hex sorts lexicographically as bytes in both
    * engines, so "< '40'" keeps 64/256 ≈ 25%. Pure map-side filter —
    * no shuffle at any corpus size beyond the output ordering. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val bucket = substring(md5(concat(lit("s42:"), col("doc_id").cast("string"))), 1, 2)
    val threshold = when(col("lang") === "en", "40")
      .when(col("lang") === "de", "80")
      .when(col("lang") === "es", "c0")
      .when(col("lang") === "fr", "20")
      .when(col("lang") === "zh", "60")
      .otherwise("zz") // unknown stratum: keep everything
    docs(spark, dir)
      .withColumn("bucket", bucket)
      .filter(col("bucket") < threshold)
      .select("doc_id", "lang", "bucket")
      .orderBy("doc_id")
  }

  /** Fixed-size deterministic per-stratum sample ("give me exactly k
    * docs per language, reproducibly") via the bounded GroupTopK
    * aggregate: rank by a seeded md5 of the id, keep the k smallest
    * per group. The window-function restatement (`row_number() OVER
    * (PARTITION BY lang ORDER BY skey)`) is the ORACLE, not the plan —
    * it shuffles and sorts the whole corpus to rank it; this plan
    * ships at most k (hash, id) pairs per group per task through one
    * ObjectHashAggregate, so sampling 100 TB costs a k-row shuffle.
    * Unlike the sketch aggregates the answer is EXACT at any volume
    * (top-k is a mergeable summary with no error term). */
  def sampleReservoir(spark: SparkSession, dir: String): DataFrame = {
    val skey = md5(concat(lit("rsv7:"), col("doc_id").cast("string")))
    docs(spark, dir)
      .withColumn("skey", skey)
      .groupBy(col("lang"))
      .agg(graft.functions.Sketches.groupTopK(col("skey"), col("doc_id"), 5).as("sample"))
      .select(col("lang"), explode(col("sample")).as("e"))
      .select(col("lang"), col("e.skey").as("skey"), col("e.payload").as("doc_id"))
      .orderBy("lang", "skey")
  }

  /** WEIGHTED sampling without replacement per stratum — sequential
    * Poisson sampling (Ohlsson, "Sequential Poisson Sampling", J. Off.
    * Stat. 1998): each doc draws a deterministic uniform u from a
    * seeded md5 and is ranked by ξ = u/w, where w is its quality-tier
    * weight; the k smallest ξ per stratum form an approximately
    * probability-proportional-to-size sample. Longer documents get
    * weight {8,4,2,1} by length tier, so a weight-8 doc is ~8× as
    * likely to be drawn — the "sample good documents harder" knob every
    * curriculum/mixing pipeline needs.
    *
    * EXACT cross-engine ordering with no float in sight: weights are
    * powers of two, so ranking by u/w equals ranking by the INTEGER
    * u·(8/w); u is the unsigned low-64 of md5 (`conv(hex,16,10)` here ==
    * `md5_number_lower` in the oracle, the [[simHash64]] convention)
    * and the product ≤ 2^67 rides exact decimal arithmetic on both
    * engines, compared as a zero-padded fixed-width string. Bounded
    * like [[sampleReservoir]]: GroupTopK ships k pairs per stratum per
    * task — no corpus-wide rank shuffle. */
  def sampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(lit("esw11:"), col("doc_id").cast("string")))
    // big-endian rewrite of digest bytes 15..8 == md5_number_lower
    val uHexBe = concat((31 to 17 by -2).map(i => substring(h, i, 2)): _*)
    val u = conv(uHexBe, 16, 10).cast(DecimalType(20, 0))
    val mult = when(col("n_chars") >= lit(800L), lit(1)) // w=8
      .when(col("n_chars") >= lit(400L), lit(2)) // w=4
      .when(col("n_chars") >= lit(200L), lit(4)) // w=2
      .otherwise(lit(8)) // w=1
    val skey = lpad((u * mult).cast(DecimalType(22, 0)).cast("string"), 22, "0")
    docs(spark, dir)
      .withColumn("skey", skey)
      .groupBy(col("lang"))
      .agg(graft.functions.Sketches.groupTopK(col("skey"), col("doc_id"), 4).as("sample"))
      .select(col("lang"), explode(col("sample")).as("e"))
      .select(col("lang"), col("e.skey").as("skey"), col("e.payload").as("doc_id"))
      .orderBy("lang", "skey")
  }

  /** Intra-document repetition score (Gopher-style quality rule): the
    * fraction of a document's word bigrams taken up by its single most
    * frequent bigram. High values mean boilerplate/looping text a
    * training pipeline drops. Two partial-aggregated groupBys keyed by
    * (doc_id[, bigram]) — both map-side combine, both shuffle one row
    * per (doc, distinct-bigram), never the text. */
  def repetitionScore(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), explode(wordGrams(2)).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"), max("c").as("top_bigram"))
      .withColumn("rep_ratio",
        round(col("top_bigram").cast("double") / col("n_bigrams").cast("double"), 6))
      .orderBy("doc_id")

  /** Deterministic global training-order shuffle: every epoch pipeline
    * needs the corpus in a reproducible pseudo-random order. Ordering by
    * a seeded md5 of the key is a single range exchange (Spark samples
    * the key space and range-partitions — no single-task sort, no
    * rand() nondeterminism under retries; change the seed to reshuffle). */
  def trainShuffle(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        md5(concat(lit("epoch7:"), col("doc_id").cast("string"))).as("shuffle_key"))
      .orderBy("shuffle_key")

  /** PII redaction: scrub email addresses and phone-shaped digit runs
    * from document text before it reaches a training mix. The synthetic
    * corpus contains no PII, so the query first plants a deterministic
    * email + phone per doc (both engines build the identical string),
    * then counts and redacts them with plain-character-class regexes
    * that Java regex and RE2 implement identically. Pure map-side —
    * no shuffle beyond the output ordering at any corpus size. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val emailPat = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
    val phonePat = "[0-9]{3}-[0-9]{4}"
    val planted = concat(
      col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or call 555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    docs(spark, dir)
      .select(col("doc_id"), planted.as("t"))
      .select(
        col("doc_id"),
        regexp_count(col("t"), lit(emailPat)).cast("long").as("n_emails"),
        regexp_count(col("t"), lit(phonePat)).cast("long").as("n_phones"),
        regexp_replace(regexp_replace(col("t"), emailPat, "<EMAIL>"),
          phonePat, "<PHONE>").as("redacted"))
      .orderBy("doc_id")
  }

  /** Source blocklist filter: drop every document whose source is on a
    * curated ban list (the scraped-domain blocklist of a web corpus).
    * The blocklist is tiny relative to the corpus — thousands of
    * domains vs billions of docs — so it BROADCASTS and the filter is
    * a map-side left-anti hash join: zero shuffle of the corpus. */
  def blocklistFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val banned = Seq("src4", "src7", "src13").toDF("source")
    docs(spark, dir)
      .join(broadcast(banned), Seq("source"), "left_anti")
      .select("doc_id", "source", "lang")
      .orderBy("doc_id")
  }

  /** Per-stratum corpus statistics a mixture designer reads before
    * weighting: doc count, total/mean chars, and the exact interpolated
    * median length per (lang, source) cell. Single partial-aggregated
    * groupBy; the shuffle carries one row per cell (≤ |langs|×|sources|,
    * corpus-size-independent). Median uses the exact continuous
    * definition on both sides (Spark `median` == DuckDB
    * `quantile_cont(0.5)`). */
  def docStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        round(avg("n_chars"), 6).as("avg_chars"),
        round(median(col("n_chars")), 6).as("med_chars"))
      .orderBy("lang", "source")

  /** Corpus vocabulary head: top-50 whitespace tokens by frequency with
    * a deterministic (count desc, token asc) tie-break. The groupBy
    * partial-aggregates map-side so the shuffle carries one row per
    * distinct token per partition — vocabulary-sized, not corpus-sized —
    * and the limit runs as TakeOrdered, never a global sort. */
  def topTokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(50)

  /** Vocabulary remap — the tokenizer-surgery op: every corpus word is
    * rewritten to its id in a frequency-ranked top-256 vocabulary
    * (count desc, token asc — a total order, so the cut at 256 is
    * deterministic), out-of-vocabulary words to -1 (UNK). The vocab is
    * built with a map-side-combined groupBy + TakeOrdered (never a
    * global window/sort), collected at VOCABULARY size (≤256 rows —
    * the one collect a remap fundamentally needs), and applied as a
    * codegen'd map literal: the corpus pass is embarrassingly parallel,
    * zero shuffle beyond the vocab build. At a real 10^12-token remap
    * the same shape holds with a 10^5-entry broadcast map. */
  def vocabRemap(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(256)
      .collect() // vocabulary-sized by construction
    val mapLit = map(vocab.zipWithIndex.flatMap { case (r, i) =>
      Seq(lit(r.getString(0)), lit(i.toLong))
    }.toIndexedSeq: _*)
    toks.select(col("doc_id"), col("tok"),
        coalesce(element_at(mapLit, col("tok")), lit(-1L)).as("tok_id"))
      .orderBy("doc_id", "tok_id", "tok")
  }

  /** GPT-style sequence packing: documents are concatenated in a
    * deterministic training order (seeded md5 shuffle, as
    * [[trainShuffle]]) and the token stream is cut every `SeqBudget`
    * tokens; each doc reports its global token offset and the first/last
    * training sequence it lands in. The global running sum NEVER uses an
    * un-partitioned window (a single-task sort at corpus scale):
    * documents are bucketed by the first byte of the order key — md5 is
    * uniform, so buckets are mass-balanced at ANY corpus size and their
    * key ranges are disjoint and ordered by construction (no sampled
    * range exchange whose cuts could drift between passes) — the
    * within-bucket cumsum is a window PARTITIONED by bucket, and the
    * 256 cross-bucket prefix offsets come from one tiny aggregate
    * broadcast back. Shuffle cost: one exchange of (doc_id, n_tokens,
    * key) triples — never text. */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val SeqBudget = 256L
    val nTokens =
      (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
        .cast("long")
    val key = md5(concat(lit("epoch7:"), col("doc_id").cast("string")))
    val sized = docs(spark, dir).select(
      col("doc_id"), nTokens.as("n_tokens"), key.as("key"),
      conv(substring(key, 1, 2), 16, 10).cast("int").as("bucket"))
    // 256-row dim of per-bucket prefix offsets (exclusive)
    val prefixes = sized.groupBy("bucket").agg(sum("n_tokens").as("bucket_toks"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("bucket").rowsBetween(Long.MinValue, -1)
    val offsets = prefixes
      .withColumn("bucket_off", coalesce(sum("bucket_toks").over(w), lit(0L)))
      .select("bucket", "bucket_off")
    val inBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("key", "doc_id")
      .rowsBetween(Long.MinValue, 0)
    sized
      .join(broadcast(offsets), "bucket")
      .withColumn("token_offset",
        col("bucket_off") + sum("n_tokens").over(inBucket) - col("n_tokens"))
      .select(
        col("doc_id"), col("n_tokens"), col("token_offset"),
        (col("token_offset") / SeqBudget).cast("long").as("first_seq"),
        ((col("token_offset") + col("n_tokens") - 1L) / SeqBudget)
          .cast("long").as("last_seq"))
      .orderBy("doc_id")
  }

  /** Weighted corpus mixing: the standard pretraining mixture step where
    * each source gets an epochs-per-source weight and documents are
    * replicated accordingly — integer part as guaranteed copies, the
    * fractional half-epoch as one extra copy decided by a seeded content
    * hash (md5, as [[sampleStratified]]), never `rand()`, so the mix is
    * reproducible across runs, cluster sizes, and engines. Weights here
    * are a deterministic function of the source id (1.0/1.5/2.0/2.5 by
    * `n mod 4`) standing in for a broadcast weight table. Pure map-side
    * explode — zero shuffle at any corpus size beyond output ordering;
    * output volume is Σ w_s·|s|, exactly the training-mix budget. */
  def mixSources(spark: SparkSession, dir: String): DataFrame = {
    val n = substring(col("source"), 4, 10).cast("int")
    val floorW = when(n % 4 >= 2, 2).otherwise(1)
    val bucket = substring(md5(concat(lit("mix13:"), col("doc_id").cast("string"))), 1, 2)
    val extra = when((n % 2 === 1) && (bucket < "80"), 1).otherwise(0)
    docs(spark, dir)
      .select(col("doc_id"), col("source"),
        (floorW + extra).cast("long").as("n_copies"))
      .select(col("doc_id"), col("source"), col("n_copies"),
        explode(sequence(lit(0L), col("n_copies") - 1L)).as("copy_idx"))
      .orderBy("doc_id", "copy_idx")
  }

  /** Duplicate token-window detection — substring-level dedup in the
    * spirit of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better"), distributed: every 8-token window is
    * hashed (16-byte md5 of the joined window — the shuffle key is the
    * hash, never text) and a window seen in ≥2 distinct documents marks
    * both as containing duplicated spans; the per-doc duplicated-window
    * count is the signal a pipeline thresholds on. Two hash-keyed
    * exchanges total: one distinct on (doc, h), then ONE shuffle by h
    * reused for both the ≥2-docs count and the doc rollup (a count
    * window over partitionBy(h) instead of groupBy+self-join, which
    * would shuffle the same rows by h twice). Volume: one 24-byte row
    * per token position — linear, partial-aggregated, no all-pairs. */
  def dupNgrams(spark: SparkSession, dir: String): DataFrame = {
    val Win = 8
    val w = docs(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= Win)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - Win)).as("s"))
      .select(col("doc_id"),
        md5(array_join(slice(col("toks"), col("s") + 1, lit(Win)), " ")).as("h"))
      .distinct()
    val perHash = org.apache.spark.sql.expressions.Window.partitionBy("h")
    w.withColumn("nd", count(lit(1)).over(perHash))
      .filter(col("nd") >= 2)
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_windows"))
      .orderBy("doc_id")
  }

  /** Context-window chunking: each document's whitespace tokens are cut
    * into windows of `Win` tokens every `Stride` tokens (50% overlap, the
    * standard long-document embedding/training prep). Pure map-side —
    * split + posexplode over a per-doc arithmetic sequence, no shuffle at
    * any corpus size beyond the output ordering. Tail windows shorten
    * rather than shift so the rule stays a pure function of (n, Stride)
    * in both engines. */
  def docChunks(spark: SparkSession, dir: String): DataFrame = {
    val Win = 16
    val Stride = 8
    val withArr = docs(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("starts",
        sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)), lit(Stride)))
    withArr
      .select(col("doc_id"), col("toks"), posexplode(col("starts")).as(Seq("chunk_idx", "s")))
      .select(
        col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(slice(col("toks"), col("s") + 1, lit(Win))).cast("long").as("n_chunk_tokens"),
        array_join(slice(col("toks"), col("s") + 1, lit(Win)), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }
}
