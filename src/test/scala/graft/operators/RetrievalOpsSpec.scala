package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** BM25 semantics (a08) pinned against an independent naive driver-side
  * implementation on a hand fixture.
  */
class RetrievalOpsSpec extends AnyFunSuite with graft.SparkTestSession {

  private val fixture = Seq(
    (0L, "x x y"),
    (1L, "x z"),
    (2L, "z z z"),
    (3L, "x z"),   // identical to doc 1: equal score, doc_id tie-break
    (4L, "   ")    // blank: excluded everywhere
  )

  /** Naive reference: plain Scala maps, no Spark. */
  private def naiveBm25(docs: Seq[(Long, String)], q: String,
      k1: Double = 1.2, b: Double = 0.75): Seq[(Long, Double)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
      .filter(_._2.exists(_.nonEmpty))
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size).sum.toDouble / toks.size
    val df = toks.count(_._2.contains(q)).toDouble
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    toks.flatMap { case (id, ts) =>
      val tf = ts.count(_ == q).toDouble
      if (tf == 0) None
      else Some(id -> BigDecimal(idf * tf * (k1 + 1.0)
        / (tf + k1 * ((1.0 - b) + b * ts.size / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, s) => (-s, id) }
  }

  test("a08: scores, ranking, and tie-break match the naive reference") {
    import spark.implicits._
    val docsDf = fixture.toDF("doc_id", "text")
    val queries = Seq("x", "z").toDF("q")
    val got = RetrievalOps.bm25TopK(docsDf, queries).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
      .groupBy(_._1)
    for (q <- Seq("x", "z")) {
      val expect = naiveBm25(fixture, q)
      val rows = got(q).sortBy(_._2)
      assert(rows.map(_._3).toSeq == expect.map(_._1),
        s"$q ranking: ${rows.toSeq} vs $expect")
      rows.zip(expect).foreach { case ((_, _, id, s), (eid, es)) =>
        assert(id == eid && math.abs(s - es) < 1e-9, s"$q doc $id: $s vs $es")
      }
      assert(rows.map(_._2).toSeq == (1L to rows.length).toSeq)
    }
    // docs 1 and 3 are identical: same score, doc 1 must rank first
    val xs = got("x").sortBy(_._2).map(x => (x._3, x._4))
    val i1 = xs.indexWhere(_._1 == 1L); val i3 = xs.indexWhere(_._1 == 3L)
    assert(xs(i1)._2 == xs(i3)._2 && i1 < i3)
    // z never matches docs 0; blank doc 4 appears nowhere
    assert(!got("z").exists(_._3 == 0L))
    assert(got.values.flatten.forall(_._3 != 4L))
  }

  test("a09: doc-query BM25 sums per-term contributions over the query's vocab") {
    import spark.implicits._
    // query doc 0 = "x y"; candidates 5 ("x"), 6 ("x y"), 7 ("z").
    // score(0,6) > score(0,5) (6 matches both terms), 7 never matches.
    val docsDf = Seq(
      (0L, "x y"), (5L, "x"), (6L, "x y"), (7L, "z")
    ).toDF("doc_id", "text")
    val got = RetrievalOps.bm25DocQuery(docsDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got.map(x => (x._1, x._2)).toSet == Set((0L, 6L), (0L, 5L)))
    assert(got.find(_._2 == 6L).get._3 == 1L, s"doc 6 must rank first: $got")
  }

  test("a09: RRF fusion equals 1/(60+rd) + 1/(60+rs) recomputed from the inputs") {
    val dir = "/root/testdata/sf0.001"
    val dense = AnnOps.a01.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sparse = RetrievalOps.bm25DocQuery(
      graft.Tables.load(spark, dir, "documents")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expect = (dense.keySet ++ sparse.keySet).toSeq.map { k =>
      val rrf = dense.get(k).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
        sparse.get(k).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      k -> BigDecimal(rrf).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.groupBy(_._1._1).flatMap { case (_, xs) =>
      xs.sortBy { case ((_, d), s) => (-s, d) }.take(10)
    }.toMap
    val got = RetrievalOps.rrfHybrid(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == expect, s"fusion drift: ${got.toSet diff expect.toSet}")
    // both-list docs must beat single-list docs at comparable ranks:
    // every fused top-1 appears in at least one input list by construction
    assert(got.keySet.subsetOf(dense.keySet ++ sparse.keySet))
  }

  test("a09: k propagates to BOTH input list depths; k > depth is rejected") {
    val dir = "/root/testdata/sf0.001"
    // depth-20 inputs: the fused tail past rank 10 must draw on dense and
    // sparse ranks 11-20 (with fixed depth-10 inputs those docs are
    // invisible and the tail fuses truncated lists)
    val deep = RetrievalOps.rrfHybrid(spark, dir, k = 20, depth = 20)
    val ranks = deep.collect().map(r =>
      r.getLong(0) -> r.getAs[Long]("rank"))
    assert(ranks.exists(_._2 > 10), "depth-20 run must fill ranks past 10")
    val denseDeep = AnnOps.denseTopK(spark, dir, 20).collect()
    assert(denseDeep.exists(_.getLong(2) > 10), "dense input must be depth-20")
    // and the guard: a fused k above the per-modality depth is a bug trap
    intercept[IllegalArgumentException] {
      RetrievalOps.rrfHybrid(spark, dir, k = 20, depth = 10)
    }
  }

  test("a08: duplicated caller query terms do not duplicate docs in the top-k") {
    import spark.implicits._
    val docsDf = fixture.toDF("doc_id", "text")
    val dup = RetrievalOps.bm25TopK(docsDf, Seq("x", "x", "z").toDF("q"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(dup.length == dup.distinct.length, s"duplicated rows: ${dup.toList}")
    val clean = RetrievalOps.bm25TopK(docsDf, Seq("x", "z").toDF("q"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(dup.sorted.toList == clean.sorted.toList)
  }

  test("scale twins degrade to empty output on an all-blank corpus (no NPE)") {
    import spark.implicits._
    val blank = Seq((0L, "   ", "en", "src0", 0L), (1L, "", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(TextOps.dsirResampleScalable(blank, "src0").count() == 0L)
    val emb = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "emb")
    assert(TextOps.curateLearnedScalable(blank, emb).count() == 0L)
    // the BM25 index builder hits the same SUM-null/0-docs corner
    assert(RetrievalOps.bm25TopKHotTerms(blank.select("doc_id", "text"))
      .count() == 0L)
    assert(RetrievalOps.bm25TopK(blank.select("doc_id", "text"),
      Seq("x").toDF("q")).count() == 0L)
  }

  test("r18: forced doclen Bloom prune is value-identical on both query paths") {
    import spark.implicits._
    val docsDf = fixture.toDF("doc_id", "text")
    val queries = Seq("x", "z").toDF("q")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val plainTop = rows(RetrievalOps.bm25TopK(docsDf, queries))
    val plainDoc = rows(RetrievalOps.bm25DocQuery(docsDf, nQuery = 2))
    // force the prune branch (threshold 0: every dl estimate exceeds it)
    sys.props("spark.graft.bm25.dlBloomBytes") = "0"
    try {
      assert(rows(RetrievalOps.bm25TopK(docsDf, queries)) == plainTop,
        "bloom-pruned hot-terms path diverged")
      assert(rows(RetrievalOps.bm25DocQuery(docsDf, nQuery = 2)) == plainDoc,
        "bloom-pruned doc-query path diverged")
    } finally sys.props.remove("spark.graft.bm25.dlBloomBytes")
  }

  test("a08: top-k truncation keeps the k best per query") {
    import spark.implicits._
    val many = (0L until 30L).map(i => (i, ("x " * ((i % 7).toInt + 1)).trim))
    val docsDf = many.toDF("doc_id", "text")
    val out = RetrievalOps.bm25TopK(docsDf, Seq("x").toDF("q"), k = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(out.length == 5)
    val naive = naiveBm25(many, "x").take(5).map(_._1)
    assert(out.sortBy(_._1).map(_._2).toSeq == naive)
  }
}
