package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextCleanSpec extends AnyFunSuite with graft.SparkTestSession {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, s: String): String =
    Seq(s).toDF("t").select(c).as[String].collect()(0)

  test("cleanForNer: disclaimer tail, CVE/TTP ids, versions, non-printables") {
    val in = "Summary\nActors used CVE-2022-0001 via [T1486] on v1.2.3 é\n" +
      "DISCLAIMER this is boilerplate"
    val out = one(TextClean.cleanForNer(col("t")), in)
    assert(!out.contains("CVE-2022-0001"))
    assert(!out.contains("T1486"))
    assert(!out.contains("DISCLAIMER") && !out.contains("boilerplate"))
    assert(out.contains("v1") && !out.contains("v1.2.3")) // minor version collapsed
    assert(!out.contains("é")) // non-printable (non-ascii) stripped
  }

  test("normalizeText: emails, html, punctuation, case, whitespace") {
    // exact pin: email -> " ", both html tags -> " ", punctuation
    // stripped, whitespace collapsed, lowercased
    val out = one(TextClean.normalizeText(col("t")),
      "Contact ADMIN@example.com <b>NOW</b>!!  Multiple   spaces.")
    assert(out == "contact now multiple spaces", out)
  }

  test("stopword removal: fast path matches exact path; cascade pinned") {
    val words = Seq("the", "of", "a")
    // non-cascading input (no adjacent stopwords): both paths must agree
    val plain = "x the y of z"
    assert(one(TextClean.stopwordRemoveFast(col("t"), words), plain) ==
           one(TextClean.stopwordRemoveExact(col("t"), words), plain))
    // " the of a " cascades: removing 'the' merges spaces enabling 'of',
    // which enables 'a' — the exact per-word cascade drains all three
    val in = "x the of a y"
    val exact = one(TextClean.stopwordRemoveExact(col("t"), words), in)
    assert(exact == "x y", exact)
    // the fast path's two alternation passes also drain this depth
    val fast = one(TextClean.stopwordRemoveFast(col("t"), words), in)
    assert(fast == exact, s"fast '$fast' vs exact '$exact'")
  }

  test("stopwordRemoveExact is a native expression: null-safe, no UDF in the plan") {
    val words = Seq("the", "of")
    val df = Seq[(String, java.lang.Integer)](("x the of y", 1), (null, 2)).toDF("t", "i")
      .select(TextClean.stopwordRemoveExact(col("t"), words).as("out"))
    assert(!df.queryExecution.executedPlan.toString.contains("UDF"),
      df.queryExecution.executedPlan.toString)
    val got = df.as[String].collect()
    assert(got(0) == "x y" && got(1) == null, got.mkString("|"))
    // empty word list is the identity column (no function call at all)
    val id = one(TextClean.stopwordRemoveExact(col("t"), Nil), "a b")
    assert(id == "a b")
  }

  test("cleanNerLabel: company suffixes, parens, punctuation") {
    assert(one(TextClean.cleanNerLabel(col("t")), "Acme (NASDAQ ACME) corp") == "Acme")
    assert(one(TextClean.cleanNerLabel(col("t")), "Evil Group [unclosed") == "Evil Group")
    assert(one(TextClean.cleanNerLabel(col("t")), "Weird!!Name") == "WeirdName")
  }

  test("normalizeNerType: NORP -> GPE") {
    val got = Seq("NORP", "ORG").toDF("t")
      .select(TextClean.normalizeNerType(col("t"))).as[String].collect()
    assert(got.toSeq == Seq("GPE", "ORG"))
  }

  test("asciiFold: unidecode-lite") {
    val got = Seq("Café Ñoño").toDF("t")
      .select(TextClean.asciiFold(col("t"))).as[String].collect()(0)
    assert(got == "cafe nono")
  }
}
