package graft

import graft.queries.GraphOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected components (large-star/small-star contraction) against a
  * local union-find oracle over random graphs — the structured driver
  * query can't reach every topology (odd cycles, forests of stars,
  * singleton clouds), so this property pass does. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min node of the component; find() roots at the
    // min because unions always hang the larger root under the smaller
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def check(n: Int, edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val e = edges.toDF("s", "t")
    val got = GraphOps.connectedComponents(nodes, e)
      .as[(Long, Long)].collect().toMap
    val want = unionFind(n, edges)
    assert(got == want, s"n=$n edges=${edges.take(30)}")
  }

  test("components: chains, cycles, stars, singletons") {
    check(1, Nil)
    check(6, Nil) // all isolated
    check(8, (0L until 7L).map(i => (i, i + 1))) // one long chain
    check(9, Seq((0L, 1L), (1L, 2L), (2L, 0L), (4L, 5L), (6L, 7L))) // cycle + pairs + isolated
    check(10, (1L until 10L).map(i => (9L, i))) // star centered at MAX node
    check(7, Seq((6L, 5L), (5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (1L, 0L)).reverse)
  }

  test("components: random graphs match union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 6) {
      val n = 20 + rnd.nextInt(60)
      val m = rnd.nextInt(2 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      check(n, edges)
    }
  }
}
