package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** BPE merge training pinned on the classic Sennrich corpus, plus
  * forced-path parity between the driver-local and distributed loops.
  */
class BpeTrainerSpec extends AnyFunSuite with graft.SparkTestSession {

  // low x5, lower x2, newest x6, widest x3 — the textbook example
  private def corpus = {
    import spark.implicits._
    Seq((1L,
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
  }

  // hand-derived with the (max count, lexicographic) tie-break:
  // (e,s)=9 beats (s,t)/(t,</w>) lexicographically; then (es,t)=9,
  // (est,</w>)=9, (l,o)=7 beats (o,w), (lo,w)=7
  private val expected = Seq(
    ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"))

  test("learned merge sequence matches the hand-computed classic example") {
    assert(BpeTrainer.train(corpus, nMerges = 5) == expected)
  }

  test("forced distributed path computes the identical merge sequence") {
    val viaDriver = BpeTrainer.train(corpus, nMerges = 5)
    val viaCluster = BpeTrainer.train(corpus, nMerges = 5, driverLimit = 0)
    assert(viaCluster == viaDriver)
  }

  test("encodeWords applies merges leftmost non-overlapping; unseen chars survive") {
    import spark.implicits._
    val out = BpeTrainer
      .encodeWords(Seq("lowest", "xy").toDF("w"), expected)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // l o w e s t </w> -> (e,s)->es -> (es,t)->est -> (est,</w>)->est</w>
    //   -> (l,o)->lo -> (lo,w)->low  => [low, est</w>]
    assert(out("lowest") == Seq("low", "est</w>"))
    assert(out("xy") == Seq("x", "y", "</w>"))
  }

  test("tokenize preserves word order and stops merging at word boundaries") {
    import spark.implicits._
    val docs = Seq((7L, "low lowest")).toDF("doc_id", "text")
    val toks = BpeTrainer.tokenize(docs, expected).collect()
    assert(toks.length == 1)
    assert(toks(0).getSeq[String](1) ==
      Seq("low", "</w>", "low", "est</w>"))
    // ("low" alone merges l+o then lo+w but its </w> stays separate:
    // no (low, </w>) rule was learned)
  }

  test("merge loop terminates when no pairs remain") {
    import spark.implicits._
    val docs = Seq((1L, "a a a")).toDF("doc_id", "text")
    // "a </w>" has one pair; after (a, </w>) there is nothing left
    val merges = BpeTrainer.train(docs, nMerges = 10)
    assert(merges == Seq(("a", "</w>")))
  }
}
