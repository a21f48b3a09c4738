package graft.er

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.SimilarityJoin

/** ER + similarity-join specs: labeled match/distinct pairs must land in
  * the same/different clusters (SURVEY §5.2 item 4), permutation
  * invariance, and the J6 join against brute-force Jaccard.
  */
class ErSimSpec extends AnyFunSuite with graft.SparkTestSession {
  import spark.implicits._

  test("similarity join matches brute-force jaccard at t=0.5") {
    val left = Seq((1L, "google android"), (2L, "microsoft windows server"),
      (3L, "apache http server")).toDF("id", "text")
    val right = Seq((10L, "android"), (11L, "windows server 2019"),
      (12L, "http apache server"), (13L, "oracle database")).toDF("id", "text")
    val got = SimilarityJoin.join(left, "id", col("text"), right, "id", col("text"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: J(1,10)=1/2, J(2,11)=2/4=0.5, J(3,12)=3/3=1.0, rest < 0.5
    assert(got == Set((1L, 10L), (2L, 11L), (3L, 12L)))
  }

  test("joinGuarded: hot tokens leave candidate generation, never the verify") {
    // "the" appears in 4 left + 4 right rows -> df > 2 on both sides
    val left = Seq((1L, "alpha beta the"), (2L, "the zebra"),
      (3L, "the lonely"), (4L, "the quiet")).toDF("id", "text")
    val right = Seq((10L, "alpha beta the gamma"), (11L, "the yak"),
      (12L, "the solo"), (13L, "the still")).toDF("id", "text")
    def run(f: => org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      f.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val guarded = run(SimilarityJoin.joinGuarded(
      left, "id", col("text"), right, "id", col("text"), 0.3, dfCap = 2))
    // (1,10) is found via the rare tokens alpha/beta, and its jaccard
    // still COUNTS the hot token: |{alpha,beta,the}| ∩ ∪ -> 3/4, not 2/4
    assert(guarded == Set((1L, 10L, 0.75)), s"guarded=$guarded")
    // unguarded finds the only-hot-shared pairs too (J = 1/3 ≥ 0.3 each);
    // the guard's documented loss is exactly those
    val naive = run(SimilarityJoin.join(
      left, "id", col("text"), right, "id", col("text"), 0.3))
    assert(naive.map(t => (t._1, t._2)).contains((2L, 11L)) &&
      naive.contains((1L, 10L, 0.75)), s"naive=$naive")
    // above the cap nothing is hot: guarded ≡ join exactly
    val parity = run(SimilarityJoin.joinGuarded(
      left, "id", col("text"), right, "id", col("text"), 0.3, dfCap = 1000))
    assert(parity == naive, s"parity=$parity naive=$naive")
  }

  test("similarity join keeps boundary pairs at thresholds inexact in binary") {
    // t=0.2, k1=1, k2=5: the exact overlap bound is 0.2*6/1.2 = 1.0, but
    // the double arithmetic rounds to 1.0000000000000002 — without the
    // epsilon-relaxed prune this jaccard-exactly-0.2 pair was dropped
    // while the declarative twin (and the final exact filter) keep it
    val left = Seq((1L, "x")).toDF("id", "text")
    val right = Seq((10L, "a b c d x")).toDF("id", "text")
    val got = SimilarityJoin.join(left, "id", col("text"), right, "id", col("text"), 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 10L, 0.2)))
  }

  test("whitespaceTokens treats vertical tab as content, like RE2 \\s") {
    // Java \s includes U+000B but DuckDB RE2's \s does not; the shared
    // Tok.Ws class pins the RE2 behavior so both engines see one token
    val toks = Seq("foo\u000Bbar").toDF("t")
      .select(SimilarityJoin.whitespaceTokens(col("t"))).as[Seq[String]].collect()(0)
    assert(toks == Seq("foo\u000Bbar"))
  }

  test("qgrams and alphaTokens") {
    val g = Seq("abcd").toDF("t")
      .select(SimilarityJoin.qgrams(col("t"), 3)).as[Seq[String]].collect()(0)
    assert(g == Seq("abc", "bcd"))
    val a = Seq("ab12cd").toDF("t")
      .select(SimilarityJoin.alphaTokens(col("t"))).as[Seq[String]].collect()(0)
    assert(a == Seq("ab", "cd"))
  }

  test("ER: match pairs co-cluster, distinct pairs separate, invariant to row order") {
    val ner = Seq(
      // (alert_id, id, label, type) — Microsoft variants must merge
      ("A1", 1L, "microsoft corporation", "ORG"),
      ("A2", 2L, "microsoft corp", "ORG"),
      ("A3", 3L, "microsoft", "ORG"),
      ("A1", 4L, "oracle", "ORG"),
      // GPE: distinct countries must not merge
      ("A1", 10L, "russia", "GPE"),
      ("A2", 11L, "france", "GPE"))
      .toDF("alert_id", "id", "label", "type")
    val (clustered, best, weights) = EntityResolution.resolve(
      ner, thresholds = Map("ORG" -> 0.45, "GPE" -> 0.7))
    val c = clustered.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(c(1L) == c(2L) && c(2L) == c(3L), s"microsoft variants: $c")
    assert(c(4L) != c(1L))
    assert(c(10L) != c(11L))
    // best label for the microsoft cluster is the most frequent/smallest
    val bl = best.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bl(c(1L)).startsWith("microsoft"))
    // weights: A1 has microsoft-cluster weight 1 and oracle weight 1
    val w = weights.filter(col("alert_id") === "A1").collect()
      .map(r => (r.getString(1), r.getLong(3))).toMap
    assert(w.values.forall(_ == 1L) && w.size == 3) // microsoft, oracle, russia

    // permutation invariance: shuffled input, same clustering partition
    val shuffled = ner.orderBy(rand(seed = 7))
    val (c2df, _, _) = EntityResolution.resolve(
      shuffled, thresholds = Map("ORG" -> 0.45, "GPE" -> 0.7))
    val c2 = c2df.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    def partition(m: Map[Long, Long]) = m.groupBy(_._2).values.map(_.keySet).toSet
    assert(partition(c) == partition(c2))
  }

  test("cpeProductEdges: underscore to space then join") {
    val cpes = Seq("google_android", "apache_http_server").toDF("cpe")
    val prods = Seq("google android", "nginx").toDF("best_label")
    val got = EntityResolutionSpecHelper.cpeEdges(cpes, prods)
    assert(got == Set(("google_android", "google android")))
  }
}

object EntityResolutionSpecHelper {
  def cpeEdges(cpes: org.apache.spark.sql.DataFrame,
               prods: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    SimilarityJoin.cpeProductEdges(cpes, prods)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
}
