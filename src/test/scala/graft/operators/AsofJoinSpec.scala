package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AsofJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val trades = Seq(
    // (key, trade_id, t)
    ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
    ("b", 4L, 5L), ("b", 5L, 100L),
    ("c", 6L, 50L)
  ).toDF("k", "trade_id", "t")

  private val quotes = Seq(
    // (key, q_t, q_px) — unique per (key, q_t)
    ("a", 10L, 1.0), // tie with trade 1 → inclusive match
    ("a", 25L, 2.0),
    ("b", 99L, 3.0),
    ("d", 1L, 9.0) // key with no trades
  ).toDF("k", "q_t", "q_px")

  test("asof: inclusive tie, latest-at-or-before, and null when no prior quote") {
    val out = AsofJoin.asof(trades, quotes, Seq("k"), "t", "q_t")
      .orderBy("trade_id")
      .collect()
      .map(r => (r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out === Seq(
      (1L, Some(10L), Some(1.0)), // tie at t=10 matches (>= semantics)
      (2L, Some(10L), Some(1.0)), // quote@25 is in the future
      (3L, Some(25L), Some(2.0)),
      (4L, None, None),           // no quote at or before t=5
      (5L, Some(99L), Some(3.0)),
      (6L, None, None)))          // key c has no quotes at all
  }

  test("asof: NULL inside a right payload column does not fall back to an older row") {
    val q = Seq(("a", 10L, Some(1.0)), ("a", 20L, None: Option[Double]))
      .toDF("k", "q_t", "q_px")
    val tr = Seq(("a", 7L, 30L)).toDF("k", "trade_id", "t")
    val r = AsofJoin.asof(tr, q, Seq("k"), "t", "q_t").collect().head
    assert(r.getLong(3) === 20L) // matched the t=20 quote...
    assert(r.isNullAt(4))        // ...and kept its NULL px (row semantics)
  }

  test("asof: plan is one keyed sort-window, never a joined product") {
    val plan = AsofJoin.asof(trades, quotes, Seq("k"), "t", "q_t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("NestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(plan.contains("Window"), plan.take(2000))
  }
}
