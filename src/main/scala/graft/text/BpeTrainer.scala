package graft.text

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge training over a corpus — the tokenizer-building stage of a
  * training-data pipeline (t14 covers the pre-tokenizer counts; this
  * learns the merge table itself, Sennrich-style).
  *
  * Scale shape: the ONLY corpus-proportional work is the distinct-word
  * frequency extraction (one map-side-combinable groupBy — the same
  * hash-shuffle as exact dedup). Every merge iteration then runs over the
  * distinct-word VOCABULARY, which is bounded by language statistics
  * (~10⁷ rows at web scale), not corpus size. Following the repo's
  * limit-probed hybrid convention (GraphAlgs driver-local small-graph
  * path), a vocabulary at or below `driverLimit` rows is collected once
  * and the merge loop runs in memory — exact, and free of the 2·k job
  * dispatches the distributed loop pays; larger vocabularies take the
  * distributed loop (per-iteration pair-count aggregation + argmax
  * scalar + narrow merge map), which computes the identical merge
  * sequence (forced-path parity pinned in BpeTrainerSpec).
  *
  * Determinism: the winning pair each round is (max count, then
  * lexicographically smallest (a, b)) — a total order, so the merge
  * sequence is reproducible on any engine and any partitioning.
  */
object BpeTrainer {

  /** t14's pre-tokenizer classes: letter runs, digit runs, single marks. */
  val preTokRe = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** End-of-word marker symbol (never produced by [[preTokRe]] tokens). */
  val Eow = "</w>"

  /** Vocabulary-row bound for the driver-local merge loop. */
  val DefaultDriverVocabLimit: Int = 2000000

  /** Distinct-word frequency table `(syms, freq)`: each word as its
    * space-joined character symbols plus the end-of-word marker. The one
    * corpus-sized pass; everything downstream is vocabulary-sized.
    */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs
      .select(explode(regexp_extract_all(col("text"), lit(preTokRe), lit(0)))
        .as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(
        concat(array_join(codepointSyms(col("w")), " "), lit(" " + Eow))
          .as("syms"),
        col("freq"))

  /** Codepoint segmentation (the t18 convention, TextOps.scala t18 doc):
    * `split(w, "")` would cut at UTF-16 code units, producing surrogate-half
    * symbols for non-BMP words that [[graft.functions.BpeEncode]] (which
    * walks code points) could never re-merge. Java-regex `(?s).` matches a
    * full code point, keeping train and apply on the same alphabet.
    */
  private def codepointSyms(w: org.apache.spark.sql.Column) =
    regexp_extract_all(w, lit("(?s)."), lit(0))

  /** Learn `nMerges` merge rules from the corpus. */
  def train(docs: DataFrame, nMerges: Int,
            driverLimit: Int = DefaultDriverVocabLimit): Seq[(String, String)] = {
    val vocab = wordFreqs(docs)
    if (driverLimit > 0) {
      val probe = vocab.limit(driverLimit + 1).collect()
      if (probe.length <= driverLimit) {
        return trainLocal(
          probe.map(r => (r.getString(0).split(" "), r.getLong(1))), nMerges)
      }
    }
    trainDistributed(vocab, nMerges)
  }

  /** In-memory merge loop — the exact same (count, pair) total order as
    * the distributed loop.
    */
  private[text] def trainLocal(vocab0: Array[(Array[String], Long)],
                               nMerges: Int): Seq[(String, String)] = {
    var vocab = vocab0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, freq) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + freq)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (a, b) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }._1
        merges += ((a, b))
        vocab = vocab.map { case (syms, freq) =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2 // leftmost, non-overlapping
            } else { out += syms(i); i += 1 }
          }
          (out.result(), freq)
        }
      }
    }
    merges.toSeq
  }

  /** Distributed merge loop: per iteration one vocabulary-sized pair
    * aggregation, one 1-row argmax collect, one narrow merge map. The
    * evolving vocab is re-cached per iteration (the argmax would
    * otherwise replay the whole merge chain each round) and
    * localCheckpointed periodically to bound lineage.
    */
  private[text] def trainDistributed(vocab0: DataFrame,
                                     nMerges: Int): Seq[(String, String)] = {
    var vocab = vocab0.cache()
    vocab.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val top = vocab
        .select(col("freq"), split(col("syms"), " ").as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("freq"), explode(expr(
          "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1), " +
            "(x, y) -> named_struct('a', x, 'b', y))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val prev = vocab
        val next0 = vocab.withColumn("syms",
          regexp_replace(col("syms"), lit(mergePattern(a, b)),
            lit(Matcher.quoteReplacement(a + b))))
        val next = (if (merges.length % 16 == 0) next0.localCheckpoint(true)
                    else next0).cache()
        next.count()
        prev.unpersist(blocking = false)
        vocab = next
      }
    }
    vocab.unpersist(blocking = false)
    merges.toSeq
  }

  /** Leftmost-non-overlapping whole-symbol match for `a b` in a
    * space-joined symbol string (Java regexp semantics — the same
    * replace order as the array walk in [[trainLocal]]).
    */
  private[text] def mergePattern(a: String, b: String): String =
    "(?<=^|\\s)" + Pattern.quote(a) + " " + Pattern.quote(b) + "(?=\\s|$)"

  /** Apply a learned merge table to a column of words: `(w, toks)`.
    * Pure projection, no shuffle — ONE codegen'd [[graft.functions
    * .BpeEncode]] call per word (canonical lowest-rank apply order,
    * O(word · merges-applied) regardless of table size), so a real
    * ~30k-merge table costs the same plan as a 5-merge one. The chained
    * regexp form it replaced ([[encodeWordsFold]]) is kept for the
    * differential spec: on tables produced by [[train]] the two orders
    * are provably identical.
    */
  def encodeWords(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    words.withColumn("toks",
      graft.functions.GraftFunctions.bpeEncode(col("w"), merges))

  /** The sequential-application form: `merges.length` chained
    * regexp_replace literals — fine for small tables, pedagogically the
    * training order, and the differential pin for [[encodeWords]].
    */
  private[graft] def encodeWordsFold(words: DataFrame,
                                     merges: Seq[(String, String)]): DataFrame = {
    val base = concat(array_join(codepointSyms(col("w")), " "), lit(" " + Eow))
    val mergedSyms = merges.foldLeft(base) { case (c, (a, b)) =>
      regexp_replace(c, lit(mergePattern(a, b)),
        lit(Matcher.quoteReplacement(a + b)))
    }
    words.withColumn("toks", split(mergedSyms, " "))
  }

  /** Tokenize documents with a learned merge table: `(doc_id, toks)` in
    * original word order (posexplode + per-doc sorted reassembly — the
    * narrow encode runs before the single doc_id shuffle).
    */
  def tokenize(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col("doc_id"),
      posexplode(regexp_extract_all(col("text"), lit(preTokRe), lit(0)))
        .as(Seq("pos", "w")))
    encodeWords(words, merges)
      .groupBy(col("doc_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("toks")))),
        x => x.getField("toks"))).as("toks"))
  }
}
