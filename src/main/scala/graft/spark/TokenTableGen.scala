package graft.spark

import org.apache.spark.sql.{Dataset, SparkSession}

/** A pre-tokenized training sequence — the engine's input row shape per
  * BASELINE.json input_hint: Iceberg-style table
  * (doc_id string, tokens array<int32>, n_tok int32, source string).
  */
final case class TokenRow(doc_id: String, tokens: Array[Int], n_tok: Int, source: String)

/** Deterministic in-process synthesis of the token table (FIXTURES.md §1).
  *
  * Every field derives from a splitmix64 stream seeded by the row index,
  * so generation is order- and partition-independent — re-running any
  * subset of rows (checkpoint resume) yields byte-identical output.
  * Mixture mirrors the reference's bench generator plus adversarial
  * families (reference: encoding/encoding_test.go:880-886 draws int32 from
  * [0,100); repeat/streak vectors from encoding_test.go:88-105).
  */
object TokenTableGen {

  final val Seed = 42L

  @inline def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Counter-based sub-stream: k-th draw for row i. */
  @inline private def draw(i: Long, k: Long): Long = splitmix64(splitmix64(Seed ^ i) + k)

  @inline private def uniform01(h: Long): Double = (h >>> 11) * (1.0 / (1L << 53).toDouble)

  def genRow(i: Long): TokenRow = {
    val h0 = draw(i, 0)
    val u0 = uniform01(h0)
    val source =
      if (u0 < 0.70) "web" else if (u0 < 0.85) "books" else if (u0 < 0.95) "code" else "wiki"
    val docId = f"$source/$i%012d"
    // lognormal-ish n_tok via Box-Muller, clipped to [1, 8192] — heavy tail
    // exercises the mass-balanced partitioning path
    val u1 = math.max(uniform01(draw(i, 1)), 1e-12)
    val u2 = uniform01(draw(i, 2))
    val gauss = math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    val nTok = math.min(8192, math.max(1, math.round(math.exp(4.7 + 1.1 * gauss)).toInt))
    val kind = uniform01(draw(i, 3))
    val tokens = new Array[Int](nTok)
    var state = draw(i, 4)
    if (kind < 0.60) {
      // zipf-ish vocab ids from a 50k vocab: many small ids
      var k = 0
      while (k < nTok) {
        state = splitmix64(state)
        val u = math.max(uniform01(state), 1e-12)
        tokens(k) = math.min(49999, (u * u * u * 50000.0).toInt)
        k += 1
      }
    } else if (kind < 0.80) {
      // monotone increasing, small deltas (FOR/delta best case)
      var acc = (draw(i, 5) & 0xFFFF).toInt
      var k = 0
      while (k < nTok) {
        state = splitmix64(state)
        acc += 1 + (state & 0x3F).toInt
        tokens(k) = acc
        k += 1
      }
    } else if (kind < 0.90) {
      // long constant runs (RLE best case)
      var k = 0
      var v = (draw(i, 6) & 0x7FFF).toInt
      var runLeft = 0
      while (k < nTok) {
        if (runLeft == 0) {
          state = splitmix64(state)
          v = (state & 0x7FFF).toInt
          runLeft = 16 + ((state >>> 32) & 0xFF).toInt
        }
        tokens(k) = v
        runLeft -= 1
        k += 1
      }
    } else {
      // high-entropy full-range int32 (PLAIN fallback; selector must not lose)
      var k = 0
      while (k < nTok) {
        state = splitmix64(state)
        tokens(k) = state.toInt
        k += 1
      }
    }
    TokenRow(docId, tokens, nTok, source)
  }

  /** Distributed deterministic generation: `numRows` rows in `parts`
    * input splits. Content depends only on the row index, never on the
    * split, so any re-partitioning reproduces identical rows.
    */
  def generate(spark: SparkSession, numRows: Long, parts: Int): Dataset[TokenRow] = {
    import spark.implicits._
    spark.range(0L, numRows, 1L, parts).as[Long].mapPartitions(_.map(genRow))
  }
}
