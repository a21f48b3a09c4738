package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the pseudo-line family: the shared line model (docLines),
  * the Gopher duplicate-line fractions (t26), and cross-doc boilerplate
  * removal (d12) — each pinned on a hand-computed fixture.
  */
class LineOpsSpec extends AnyFunSuite with graft.SparkTestSession {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // doc_id % 4 boilerplate copies; 3-token chunks; doc 7 is unscoreable.
  private def fixture = {
    import spark.implicits._
    Seq(
      (0L, "a b c a b c"), // chunks: "a b c","a b c"; no boiler
      (1L, "x y z p q"),   // chunks: "x y z","p q"; 1 boiler
      (2L, "m n o"),       // chunk: "m n o"; 2 boiler
      (3L, "a b c"),       // chunk: "a b c"; 3 boiler
      (7L, "   ")          // whitespace-only: filtered
    ).toDF("doc_id", "text")
  }

  test("docLines: chunking, boilerplate injection, and positions") {
    val got = TextOps.docLines(fixture).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(x => (x._1, x._2))
    val b = "click here now"
    assert(got.toSeq == Seq(
      (0L, 0, "a b c"), (0L, 1, "a b c"),
      (1L, 0, "x y z"), (1L, 1, "p q"), (1L, 2, b),
      (2L, 0, "m n o"), (2L, 1, b), (2L, 2, b),
      (3L, 0, "a b c"), (3L, 1, b), (3L, 2, b), (3L, 3, b)))
  }

  test("t26: duplicate-line count and char-mass fractions, hand-computed") {
    val out = TextOps.dupLineStats(fixture).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L)) // blank doc filtered
    assert(out(0L) == ((2L, 1L, 0.5, 0.5)))   // "a b c" twice (5 of 10 chars dup)
    assert(out(1L) == ((3L, 0L, 0.0, 0.0)))   // all three lines distinct
    assert(out(2L) == ((3L, 1L, 1.0 / 3.0, 14.0 / 33.0))) // boiler x2
    assert(out(3L) == ((4L, 2L, 0.5, 28.0 / 47.0)))       // boiler x3
  }

  test("d12: >=minDocs-doc lines drop everywhere, text rebuilt in order") {
    // at minDocs=2: "a b c" (docs 0,3) and the boiler (docs 1,2,3) are
    // corpus boilerplate; "x y z"/"p q"/"m n o" are each single-doc.
    val out = DedupOps.dropCommonLines(fixture, minDocs = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(0L) == ((2L, 0L, 2L, md5hex(""))))
    assert(out(1L) == ((3L, 2L, 1L, md5hex("x y z p q"))))
    assert(out(2L) == ((3L, 1L, 2L, md5hex("m n o"))))
    assert(out(3L) == ((4L, 0L, 4L, md5hex(""))))
  }

  test("line family is invariant to input partitioning") {
    val base = TextOps.dupLineStats(fixture).collect().toSeq
    val rep = TextOps.dupLineStats(fixture.repartition(5)).collect().toSeq
    assert(rep == base)
    val base2 = DedupOps.dropCommonLines(fixture, minDocs = 2).collect().toSeq
    val rep2 = DedupOps.dropCommonLines(fixture.repartition(5), minDocs = 2)
      .collect().toSeq
    assert(rep2 == base2)
  }

  test("d12 paragraph twin: wider chunks change the unit, same semantics") {
    import spark.implicits._
    // at lineTok=6 docs 0 and 1 share their single 6-token "paragraph";
    // doc 2 differs. minDocs=2 drops the shared paragraph from both.
    val d = Seq(
      (0L, "a b c d e f"),
      (1L, "a b c d e f"),
      (2L, "g h i j k l")
    ).toDF("doc_id", "text")
    val got = DedupOps.dropCommonLines(d, minDocs = 2, lineTok = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap // doc -> n_kept
    // docLines injects doc_id%4 boiler copies (docs 1 and 2 both carry
    // "click here now", so it crosses minDocs=2 and drops too): doc 0 has
    // only the shared paragraph (kept 0), doc 1 paragraph+boiler both
    // drop (kept 0), doc 2 keeps only its unique paragraph
    assert(got(0L) == 0L, s"doc 0: $got")
    assert(got(1L) == 0L, s"doc 1: $got")
    assert(got(2L) == 1L, s"doc 2: $got")
  }

  test("t28: dup-5-gram coverage counts overlapping occurrences once") {
    import spark.implicits._
    // doc 0: "a b c d e a b c d e a" — 5-gram "a b c d e" at starts 0 and 5,
    //   plus "b c d e a"@{1,6}, "c d e a b"@{2}, "d e a b c"@{3},
    //   "e a b c d"@{4}. Duplicated: starts {0,5} ∪ {1,6} → covered
    //   positions 0..10 = ALL 11 tokens (overlap must not double count).
    // doc 1: "p q r s t u" — all 5-grams unique → coverage 0.
    // doc 2: "x y" — shorter than n → no grams, coverage 0.
    val d = Seq(
      (0L, "a b c d e a b c d e a"),
      (1L, "p q r s t u"),
      (2L, "x y")
    ).toDF("doc_id", "text")
    val got = TextOps.dupNgramCoverage(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    assert(got(0) == ((0L, 11L, 11L, 1.0, 1.0)))
    assert(got(1) == ((1L, 6L, 0L, 0.0, 0.0)))
    assert(got(2) == ((2L, 2L, 0L, 0.0, 0.0)))
    // partial coverage: the distinct tail "z1 z2 z3" breaks the wrapped
    // grams, so the only duplicated gram is "a b c d e"@{0,5}: covered
    // positions 0..9 of 13 tokens.
    val d2 = Seq((9L, "a b c d e a b c d e z1 z2 z3")).toDF("doc_id", "text")
    val g2 = TextOps.dupNgramCoverage(d2).collect().head
    assert((g2.getLong(1), g2.getLong(2)) == ((13L, 10L)))
    assert(math.abs(g2.getDouble(3) - 10.0 / 13.0) < 1e-15)
  }

  test("d15: non-canonical dup spans removed, canonical copy and unique text kept") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // winTok=3. Dup grams corpus-wide: "a b c" @ (1,0)(2,1)(3,0)(3,3) —
    // canonical (1,0); "b c d" @ (1,1)(2,2) — canonical (1,1). Doc 1 is
    // all-canonical (kept whole); doc 2 loses positions 1-4 (both
    // non-canonical windows), keeping "x y"; doc 3's two in-doc copies are
    // BOTH non-canonical (canonical lives in doc 1) — fully removed.
    val d = Seq(
      (1L, "a b c d e"),
      (2L, "x a b c d y"),
      (3L, "a b c a b c")
    ).toDF("doc_id", "text")
    val got = DedupOps.removeDupSpans(d, winTok = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((5L, 5L, 0L, md5hex("a b c d e"))))
    assert(got(2L) == ((6L, 2L, 4L, md5hex("x y"))))
    assert(got(3L) == ((6L, 0L, 6L, md5hex(""))))
    // short docs (no window) pass through whole; blanks are filtered
    val short = Seq((4L, "solo pair"), (5L, "   ")).toDF("doc_id", "text")
    val g2 = DedupOps.removeDupSpans(short, winTok = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(g2 == Map(4L -> 2L))
    // deterministic under repartition (canonical pick is a total order)
    val base = DedupOps.removeDupSpans(d, winTok = 3).collect().toSeq
    val rep = DedupOps.removeDupSpans(d.repartition(5), winTok = 3)
      .orderBy(col("doc_id")).collect().toSeq
    assert(rep == base)
  }

  test("d15: within-doc repetition dedups against the doc's own first copy") {
    import spark.implicits._
    // one doc, span repeated twice with a unique tail: windows of the
    // second copy are non-canonical vs the first — removed; the first
    // copy stays (its windows are canonical).
    val d = Seq((0L, "a b c d a b c d z")).toDF("doc_id", "text")
    // winTok=4: grams "a b c d"@{0,4} dup (canonical s=0); straddling
    // grams ("b c d a", "c d a b", "d a b c", "b c d z") are unique.
    val got = DedupOps.removeDupSpans(d, winTok = 4).collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) == ((9L, 5L, 4L)))
    assert(got.getString(4) == md5hex("a b c d z"))
  }

  /** The r10-verdict fixture: a 3-window duplicated passage whose first
    * window ALSO occurs alone in an earlier doc. Per-window canonicals
    * (d15) scatter across docs and fragment every copy — the passage
    * survives intact NOWHERE; span-level canonicals (d18) keep exactly
    * one contiguous copy.
    */
  private def spanFixture = {
    import spark.implicits._
    // winTok=3; passage P = "a b c d e" (windows "a b c","b c d","c d e")
    Seq(
      (0L, "a b c"),              // P's first window alone
      (1L, "u1 a b c d e u2"),    // P at positions 1..5
      (2L, "v1 v2 a b c d e")     // P at positions 2..6
    ).toDF("doc_id", "text")
  }

  test("d18: a multi-window duplicated passage keeps ONE contiguous canonical copy") {
    val got = DedupOps.removeDupSpansMaximal(spanFixture, winTok = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // doc 0's lone window is its own maximal span (distinct content group)
    assert(got(0L) == ((3L, 3L, 0L, md5hex("a b c"))))
    // doc 1 is the canonical occurrence of the full passage: kept WHOLE
    assert(got(1L) == ((7L, 7L, 0L, md5hex("u1 a b c d e u2"))))
    // doc 2's copy removed contiguously — nothing of P survives there
    assert(got(2L) == ((7L, 2L, 5L, md5hex("v1 v2"))))
  }

  test("d18 vs d15: the per-window rule demonstrably fragments the same fixture") {
    val d15 = DedupOps.removeDupSpans(spanFixture, winTok = 3).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    // d15: "a b c"'s canonical is doc 0, so doc 1 loses positions 1-3 but
    // keeps the tail of its OWN canonical windows — the kept text is the
    // fragment "u1 d e u2" and the full passage survives intact in NO doc
    assert(d15(1L) == md5hex("u1 d e u2"))
    assert(d15(0L) == md5hex("a b c")) // the only intact text is 1 window
  }

  test("d18: removal is span-contiguous and never destroys the last copy") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // three identical 2-window passages: one canonical survives whole
    val d = Seq(
      (0L, "p q a b c d r"),
      (1L, "a b c d s t"),
      (2L, "w a b c d")
    ).toDF("doc_id", "text")
    // winTok=3: dup windows "a b c","b c d" chain to the span "a b c d"
    // in every doc; canonical = (0, 2) — smallest (doc_id, s0)
    val got = DedupOps.removeDupSpansMaximal(d, winTok = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getString(4)))).toMap
    assert(got(0L) == ((7L, md5hex("p q a b c d r"))))
    assert(got(1L) == ((2L, md5hex("s t"))))
    assert(got(2L) == ((1L, md5hex("w"))))
    // deterministic under repartition (span election is a total order)
    val base = DedupOps.removeDupSpansMaximal(d, winTok = 3).collect().toSeq
    val rep = DedupOps.removeDupSpansMaximal(d.repartition(5), winTok = 3)
      .orderBy(col("doc_id")).collect().toSeq
    assert(rep == base)
  }

  test("d18: within-doc repeats chain and dedup against the doc's first copy") {
    import spark.implicits._
    // winTok=3, gap > winTok between the two copies so they form two runs
    val d = Seq((0L, "a b c d x1 x2 x3 x4 a b c d")).toDF("doc_id", "text")
    // dup windows "a b c"@{0,8}, "b c d"@{1,9}: runs [0,3] and [8,11],
    // identical content -> canonical (0,0); the second copy is removed
    val got = DedupOps.removeDupSpansMaximal(d, winTok = 3).collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) == ((12L, 8L, 4L)))
    assert(got.getString(4) == md5hex("a b c d x1 x2 x3 x4"))
  }
}
