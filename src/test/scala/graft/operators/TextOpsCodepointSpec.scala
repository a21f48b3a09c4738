package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** t18's segmentation contract on non-BMP text: the DuckDB oracle counts
  * CODEPOINTS (its substring/length are codepoint-based), so the Spark side
  * must too — a UTF-16 code-unit split would count every emoji twice and
  * silently break hash parity the first time a supplementary character
  * appears in `documents.text`. The gate fixture is BMP-only, so this spec
  * is the only thing pinning the non-BMP path.
  */
class TextOpsCodepointSpec extends AnyFunSuite with graft.SparkTestSession {
  import spark.implicits._

  test("char entropy counts codepoints, not UTF-16 code units") {
    // "😀😀a" = 2+1 codepoints (each emoji is a surrogate PAIR = 2 code
    // units); p(😀)=2/3, p(a)=1/3
    val df = Seq((1L, "😀😀a")).toDF("doc_id", "text")
    val r = TextOps.charEntropy(df).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 3L,
      s"expected 3 codepoints, got ${r.head.getLong(1)}")
    val expected = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(r.head.getDouble(2) - expected) < 1e-6)
  }

  test("BMP text unchanged by the codepoint-safe segmentation") {
    val df = Seq((1L, "abab"), (2L, "aaaa")).toDF("doc_id", "text")
    val m = TextOps.charEntropy(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m(1L) == ((4L, math.rint(math.log(2) * 1e6) / 1e6)))
    assert(m(2L) == ((4L, 0.0)))
  }
}
