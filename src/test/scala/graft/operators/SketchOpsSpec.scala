package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CMS guarantees on a known-count fixture: estimates never undercount
  * (the structural property of min-over-rows), the counter grid is
  * bounded by depth×width however many tokens stream through it, and on
  * a 50-token vocabulary the 4×256 grid recovers exact counts nearly
  * everywhere (collisions in one hash row are repaired by the min).
  */
class SketchOpsSpec extends AnyFunSuite with graft.SparkTestSession {
  import spark.implicits._

  test("CMS never undercounts; grid bounded; small-vocab estimates mostly exact") {
    // 50 distinct tokens with distinct true counts 1..50 (token wK occurs
    // K times) — 1275 token instances
    val words = (1 to 50).flatMap(k => Seq.fill(k)(s"w$k"))
    val truth = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val toks = words.toDF("tok")
    val grid = SketchOps.cmsCounters(toks)
    assert(grid.count() <= SketchOps.depth.toLong * SketchOps.width)
    // every hash row's counters account for every token instance
    val sums = grid.groupBy(col("j")).agg(sum(col("c")).as("s")).collect()
    assert(sums.length == SketchOps.depth &&
      sums.forall(_.getLong(1) == words.size.toLong), sums.mkString(","))
    val est = SketchOps.cmsEstimates(toks, toks.distinct()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == truth.keySet)
    truth.foreach { case (w, n) =>
      assert(est(w) >= n, s"$w underestimated: ${est(w)} < $n")
    }
    val exact = truth.count { case (w, n) => est(w) == n }
    assert(exact >= 45, s"only $exact/50 estimates exact")
  }

  test("keys absent from the corpus estimate as 0, never vanish") {
    // corpus of 3 tokens; probe with 40 unseen keys — with depth=4 rows
    // over 256 buckets an unseen key almost surely has >=1 empty cell, so
    // min-with-coalesced-zeros returns 0; an inner join would drop the
    // key (no cell) or report a collision-only overcount
    val toks = Seq("a", "b", "c").toDF("tok")
    val keys = ((1 to 40).map(i => s"unseen$i") ++ Seq("a")).toDF("tok")
    val est = SketchOps.cmsEstimates(toks, keys).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet.size == 41, "every probe key must appear in the output")
    assert(est("a") >= 1L)
    val unseen = est.view.filterKeys(_.startsWith("unseen")).values
    assert(unseen.forall(_ == 0L),
      s"unseen keys must estimate 0, got ${unseen.toSeq.distinct.sorted}")
  }
}
