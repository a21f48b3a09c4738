package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The typed Aggregator's exactness contract: with pre-aggregated
  * (term, n) inputs, partial top-k merging equals the global top-k
  * regardless of partitioning, and ties break on the smaller term.
  */
class TopTermsSpec extends AnyFunSuite with graft.SparkTestSession {
  import spark.implicits._

  test("top-k equals window-sort result under any partitioning; ties deterministic") {
    val counts = Seq(
      ("en", "the", 50L), ("en", "a", 50L), ("en", "cat", 30L), ("en", "dog", 10L),
      ("de", "der", 9L), ("de", "die", 9L), ("de", "das", 9L), ("de", "und", 8L))
      .toDF("lang", "term", "n")
    val topk = TopTerms(2)
    for (parts <- Seq(1, 3, 8)) {
      val got = counts.repartition(parts)
        .groupBy(col("lang")).agg(topk(col("term"), col("n")).as("top"))
        .select(col("lang"), col("top"))
        .collect()
        .map(r => r.getString(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(t => (t.getString(0), t.getLong(1))))
        .toMap
      assert(got("en") == Seq(("a", 50L), ("the", 50L))) // tie -> smaller term first
      assert(got("de") == Seq(("das", 9L), ("der", 9L)))
    }
  }

  test("reduce early-reject: rows tying the kth element still displace on the term tie-break") {
    // exercises the O(1) full-buffer rejection path directly: "ant" ties
    // the current kth ("cat", 5) and must ENTER (smaller term wins the
    // tie), "zebra" ties and must be rejected, lower counts rejected
    val agg = new TopTerms(2)
    val full = agg.merge(agg.reduce(agg.reduce(agg.zero,
      TermCount("dog", 9L)), TermCount("cat", 5L)), agg.zero)
    assert(full.map(_.term) == Seq("dog", "cat"))
    val afterTieWin = agg.reduce(full, TermCount("ant", 5L))
    assert(afterTieWin.map(_.term) == Seq("dog", "ant"))
    val afterTieLose = agg.reduce(full, TermCount("zebra", 5L))
    assert(afterTieLose.map(_.term) == Seq("dog", "cat"))
    val afterLower = agg.reduce(full, TermCount("aaa", 4L))
    assert(afterLower.map(_.term) == Seq("dog", "cat"))
    val afterHigher = agg.reduce(full, TermCount("bee", 7L))
    assert(afterHigher.map(_.term) == Seq("dog", "bee"))
  }

  test("non-BMP ties rank by code point, matching the oracle's UTF-8 order") {
    // U+1F600 (surrogate pair, UTF-16 units start 0xD83D) vs U+E000:
    // Java String ordering ranks the emoji FIRST, but DuckDB's binary
    // UTF-8 ORDER BY and Spark's UTF8String sort rank U+E000 first —
    // the aggregator must side with the engines, not the JVM
    val agg = new TopTerms(1)
    val out = agg.reduce(agg.reduce(agg.zero,
      TermCount("\uD83D\uDE00", 5L)), TermCount("\uE000", 5L))
    assert(out.map(_.term) == Seq("\uE000"))
  }
}
