package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sim.SimilarityJoin

/** [[SimilarityJoinRewrite]]: the declarative
  * `crossJoin.filter(jaccard_sim >= t)` must get the inverted-index
  * equi-join plan (never a cartesian) and keep the cross-join result
  * bit-for-bit — including jaccard_sim's J(∅,∅)=1 corner.
  */
class SimilarityJoinRewriteSpec extends AnyFunSuite with SparkTestSession {

  private def docs(rows: Seq[(Long, String)], idCol: String, tokCol: String): DataFrame = {
    import spark.implicits._
    rows.toDF(idCol, "text")
      .select(col(idCol), SimilarityJoin.whitespaceTokens(col("text")).as(tokCol))
  }

  private val left = Seq(
    1L -> "apache spark sql engine",
    2L -> "spark sql",
    3L -> "flink streaming runtime",
    4L -> "  ", // whitespace-only -> effectively empty token set
    5L -> "duckdb")
  private val right = Seq(
    10L -> "apache spark sql engine",
    11L -> "spark sql engine",
    12L -> "storm runtime",
    13L -> "", // empty -> effectively empty token set
    14L -> "postgres")

  /** Expected pairs by replaying jaccard_sim's exact semantics in Scala
    * over the raw cross product (the plan the rewrite replaces).
    */
  private def expected(t: Double): Set[(Long, Long)] = {
    def tk(s: String) = s.trim.split("\\s+").filter(_.nonEmpty).toSet
    for {
      (li, ls) <- left.toSet[(Long, String)]
      (ri, rs) <- right.toSet[(Long, String)]
      (a, b) = (tk(ls), tk(rs))
      u = (a ++ b).size
      j = if (u == 0) 1.0 else (a & b).size.toDouble / u
      if j >= t
    } yield (li, ri)
  }

  private def declarative(t: Double): DataFrame = {
    GraftFunctions.register(spark)
    val l = docs(left, "l_id", "l_toks")
    val r = docs(right, "r_id", "r_toks")
    l.crossJoin(r)
      .filter(GraftFunctions.jaccardSim(col("l_toks"), col("r_toks")) >= lit(t))
      .select(col("l_id"), col("r_id"))
  }

  test("rewrites the cross join to a token equi-join (no cartesian in the plan)") {
    val df = declarative(0.5)
    df.collect() // AQE finalizes on execution
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(2000))
  }

  test("result matches the brute-force cross-join semantics, incl. J(empty,empty)=1") {
    val got = declarative(0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = expected(0.5)
    assert(got == want, s"got $got want $want")
    // the corner the naive rewrite drops: both token sets empty
    assert(got.contains((4L, 13L)))
    // and each exact-duplicate pair appears exactly ONCE despite 4 shared tokens
    assert(declarative(0.5).collect().length == want.size)
  }

  test("threshold sweep stays exact against brute force") {
    for (t <- Seq(0.2, 0.4, 0.75, 1.0)) {
      val got = declarative(t).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected(t), s"t=$t")
    }
  }

  test("agrees with the direct SimilarityJoin.join plan on non-empty docs") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // SimilarityJoin.join prunes on RAW token counts (reference
    // semantics); on these fixtures raw == distinct so the two forms
    // must agree exactly
    val l = left.filter(_._2.trim.nonEmpty).toDF("id", "text")
    val r = right.filter(_._2.trim.nonEmpty).toDF("id", "text")
    val direct = SimilarityJoin.join(l, "id", col("text"), r, "id", col("text"), 0.5)
      .select(col("l_id"), col("r_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val decl = docs(left.filter(_._2.trim.nonEmpty), "l_id", "l_toks")
      .crossJoin(docs(right.filter(_._2.trim.nonEmpty), "r_id", "r_toks"))
      .filter(GraftFunctions.jaccardSim(col("l_toks"), col("r_toks")) >= lit(0.5))
      .select(col("l_id"), col("r_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(decl == direct)
  }

  test("equivalence on seeded random token arrays incl. nulls, dups, strictness") {
    // exercises the fused SimJoinKeep verify on surfaces the fixtures
    // don't: null ELEMENTS inside arrays (jaccard ignores them), null
    // ARRAYS (comparison is null -> row dropped), duplicate tokens
    // (distinct semantics), and the strict `>` orientation
    GraftFunctions.register(spark)
    import spark.implicits._
    var state = 0x2545f4914f6cdd1dL
    def nextInt(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % bound + bound) % bound).toInt
    }
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    def randToks(): Seq[String] =
      if (nextInt(12) == 0) null
      else (0 until nextInt(6)).map { _ =>
        if (nextInt(10) == 0) null else vocab(nextInt(vocab.size))
      }
    val lRows = (1L to 30L).map(i => (i, randToks()))
    val rRows = (100L to 130L).map(i => (i, randToks()))
    def replay(t: Double, strict: Boolean): Set[(Long, Long)] = {
      def ds(x: Seq[String]) = Option(x).map(_.filter(_ != null).toSet)
      for {
        (li, ls) <- lRows.toSet[(Long, Seq[String])]
        (ri, rs) <- rRows.toSet[(Long, Seq[String])]
        a <- ds(ls); b <- ds(rs)
        u = (a ++ b).size
        j = if (u == 0) 1.0 else (a & b).size.toDouble / u
        if (strict && j > t) || (!strict && j >= t)
      } yield (li, ri)
    }
    val l = lRows.toDF("l_id", "l_toks")
    val r = rRows.toDF("r_id", "r_toks")
    for (t <- Seq(0.25, 0.5, 0.9); strict <- Seq(false, true)) {
      val cond =
        if (strict) GraftFunctions.jaccardSim(col("l_toks"), col("r_toks")) > lit(t)
        else GraftFunctions.jaccardSim(col("l_toks"), col("r_toks")) >= lit(t)
      val df = l.crossJoin(r).filter(cond).select(col("l_id"), col("r_id"))
      val got = df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == replay(t, strict), s"t=$t strict=$strict")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"t=$t strict=$strict: ${p.take(800)}")
    }
  }

  test("does not fire when an equi key already exists (plan still correct)") {
    GraftFunctions.register(spark)
    val l = docs(left, "l_id", "l_toks").withColumn("k", col("l_id") % 2)
    val r = docs(right, "r_id", "r_toks").withColumn("k", col("r_id") % 2)
    val df = l.join(r, l("k") === r("k") &&
        GraftFunctions.jaccardSim(col("l_toks"), col("r_toks")) >= lit(0.5))
      .select(col("l_id"), col("r_id"))
    val got = df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = expected(0.5).filter { case (a, b) => a % 2 == b % 2 }
    assert(got == want)
  }
}
