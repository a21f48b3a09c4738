package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the iterative graph algorithms (they have no
  * SQL oracle — this spec IS their correctness pin, SURVEY §5.2 item 5).
  */
class GraphAlgsSpec extends AnyFunSuite with graft.SparkTestSession {

  private def edgeDf(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  test("connectedComponents: two components get min-id labels") {
    // component {1,2,3} (chain) and {10,11}
    val g = GraphAlgs.buildGraph(edgeDf(1L -> 2L, 2L -> 3L, 10L -> 11L), "src", "dst")
    val got = GraphAlgs.connectedComponents(g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("articleRank: star center outranks leaves; deterministic across runs") {
    // undirected 5-node star centered at 0
    val star = edgeDf(0L -> 1L, 0L -> 2L, 0L -> 3L, 0L -> 4L)
    val g = GraphAlgs.buildGraph(star, "src", "dst", undirected = true)
    val r1 = GraphAlgs.articleRank(g, iters = 20).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val center = r1(0L)
    val leaves = (1L to 4L).map(r1)
    assert(leaves.forall(center > _), s"center $center vs leaves $leaves")
    assert(leaves.distinct.size == 1, "leaves must be symmetric")
    val r2 = GraphAlgs.articleRank(
      GraphAlgs.buildGraph(star, "src", "dst", undirected = true),
      iters = 20).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(r1 == r2, "must be bit-deterministic")
  }

  test("articleRank: one hand-computed iteration on a 2-node cycle") {
    // 1 <-> 2 (directed both ways). N=2, E=2, avgDeg=1, outDeg=1 each.
    // iter1: msg to each = 1.0/(1+1)=0.5 -> rank = 0.15 + 0.85*0.5 = 0.575
    val g = GraphAlgs.buildGraph(edgeDf(1L -> 2L, 2L -> 1L), "src", "dst")
    val got = GraphAlgs.articleRank(g, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 0.575) < 1e-12)
    assert(math.abs(got(2L) - 0.575) < 1e-12)
  }

  test("labelPropagation: two triangles joined by a bridge split into two communities") {
    val g = GraphAlgs.buildGraph(
      edgeDf(1L -> 2L, 2L -> 3L, 3L -> 1L, // triangle A
             10L -> 11L, 11L -> 12L, 12L -> 10L, // triangle B
             3L -> 10L), // bridge
      "src", "dst")
    val got = GraphAlgs.labelPropagation(g, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // triangle A vertices agree on a community; triangle B likewise
    assert(Set(got(1L), got(2L)).size == 1 || Set(got(1L), got(2L), got(3L)).size <= 2)
    assert(got(10L) == got(11L) && got(11L) == got(12L) ||
           Set(got(10L), got(11L), got(12L)).size <= 2)
    // deterministic across runs
    val again = GraphAlgs.labelPropagation(
      GraphAlgs.buildGraph(
        edgeDf(1L -> 2L, 2L -> 3L, 3L -> 1L, 10L -> 11L, 11L -> 12L,
               12L -> 10L, 3L -> 10L), "src", "dst"),
      iters = 10).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == again)
  }

  test("pageRank: star center outranks leaves") {
    val g = GraphAlgs.buildGraph(
      edgeDf(0L -> 1L, 0L -> 2L, 0L -> 3L, 0L -> 4L), "src", "dst",
      undirected = true)
    val r = GraphAlgs.pageRank(g, iters = 20).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert((1L to 4L).forall(l => r(0L) > r(l)))
  }
}
