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

  test("non-BMP count ties break by CODE POINT on every path") {
    import spark.implicits._
    // U+E000 (private use, one UTF-16 unit 0xE000) vs U+1F600 (emoji,
    // surrogate pair starting 0xD83D): both words appear twice, so their
    // (sym, </w>) pairs tie at 2 and the tie-break decides. Code-point
    // order (the distributed orderBy's UTF8String binary order) puts
    // U+E000 < U+1F600; Java String.compareTo's UTF-16 order says the
    // opposite — the driver-local loops must agree with the cluster
    val docs = Seq((1L, "\uD83D\uDE00 \uE000 \uD83D\uDE00 \uE000"))
      .toDF("doc_id", "text")
    val local = BpeTrainer.train(docs, nMerges = 2)
    val cluster = BpeTrainer.train(docs, nMerges = 2, driverLimit = 0)
    assert(local == cluster, s"local $local vs cluster $cluster")
    assert(local.head == ("\uE000", "</w>"),
      s"tie must resolve to the smaller CODE POINT, got ${local.head}")
  }

  test("incremental loop == naive loop on randomized corpora (full drain)") {
    // the production driver path maintains pair counts incrementally with
    // an ordered winner index; pin its merge sequence against the naive
    // full-recount loop on randomized multi-word corpora, drained until no
    // pairs remain so every (count, tie-break) regime is crossed
    val rnd = new scala.util.Random(0xC0FFEE)
    for (trial <- 1 to 8) {
      val vocab = (1 to (5 + rnd.nextInt(20))).map { _ =>
        val w = (1 to (1 + rnd.nextInt(8)))
          .map(_ => ("abcd").charAt(rnd.nextInt(4)).toString).toArray :+ "</w>"
        (w, (1 + rnd.nextInt(9)).toLong)
      }.toArray
      val deep = 500 // far past drain for these sizes
      val naive = BpeTrainer.trainLocal(vocab.map { case (w, f) => (w.clone, f) }, deep)
      val incr = BpeTrainer.trainLocalIncremental(
        vocab.map { case (w, f) => (w.clone, f) }, deep)
      assert(incr == naive, s"trial $trial: $incr vs $naive")
    }
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

  test("bpe_encode expression matches the sequential regexp fold on trained tables") {
    import spark.implicits._
    // for tables produced by train(), canonical lowest-rank apply order
    // == sequential rank-order application — pin it differentially on
    // randomized words over the trained alphabet
    // words come from the pre-tokenizer, so they never contain whitespace
    val rnd = new scala.util.Random(0xBEEF)
    val words = (Seq("low", "lowest", "newest", "widest", "wider", "es") ++
      (1 to 40).map(_ => (1 to (1 + rnd.nextInt(9)))
        .map(_ => "lownestwidr".charAt(rnd.nextInt(11))).mkString)
      ).distinct
    val df = words.toDF("w")
    val fast = BpeTrainer.encodeWords(df, expected).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val fold = BpeTrainer.encodeWordsFold(df, expected).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(fast == fold)
  }

  test("non-BMP words train and encode on codepoints, not UTF-16 halves") {
    import spark.implicits._
    // U+1F600 is one codepoint, two UTF-16 code units. preTokRe admits it
    // as a single-codepoint word, so the only learnable merge is
    // (😀, </w>) — code-unit segmentation would instead learn the
    // surrogate-half pair (\ud83d, \ude00), which bpe_encode (a codepoint
    // walker) could never apply.
    val emoji = "😀"
    val docs = Seq((1L, s"$emoji $emoji $emoji")).toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, nMerges = 3)
    assert(merges == Seq((emoji, "</w>")))
    val distributed = BpeTrainer.train(docs, nMerges = 3, driverLimit = 0)
    assert(distributed == merges)
    // differential pin on a non-BMP word: expression == sequential fold
    val df = Seq(emoji, "low", emoji).distinct.toDF("w")
    val fast = BpeTrainer.encodeWords(df, merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val fold = BpeTrainer.encodeWordsFold(df, merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(fast == fold)
    assert(fast(emoji) == Seq(emoji + "</w>"))
  }

  test("bpe_encode with an empty table yields chars + EOW; stays in codegen") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    import spark.implicits._
    val out = BpeTrainer.encodeWords(Seq("ab").toDF("w"), Nil).collect()
    assert(out(0).getSeq[String](1) == Seq("a", "b", "</w>"))
    // non-foldable input (range, not a local relation) so the projection
    // can't constant-fold away — the expression must stay in codegen
    val df = spark.range(2)
      .select(graft.functions.GraftFunctions
        .bpeEncode(concat(lit("lowest"), col("id").cast("string")), expected)
        .as("toks"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      plan.take(1500))
  }
}
