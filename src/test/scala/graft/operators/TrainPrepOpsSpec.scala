package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-9 training-prep additions: bigram-LM scoring
  * (t19), the deterministic corpus shuffle (t20), and SemDeDup-style
  * semantic dedup (d11) — each pinned on a hand-computed fixture.
  */
class TrainPrepOpsSpec extends AnyFunSuite with graft.SparkTestSession {

  test("t19: add-one bigram LM matches hand-computed smoothed log-probs") {
    import spark.implicits._
    // vocab {a,b,c} (V=3; "c" contributes to V from a bigram-less doc),
    // cb(a,b)=3 cb(b,a)=1, cctx(a)=3 cctx(b)=1:
    //   p(b|a) = (3+1)/(3+3) = 2/3,  p(a|b) = (1+1)/(1+3) = 1/2
    val docsDf = Seq(
      (1L, "a b a b"),
      (2L, "a b"),
      (3L, "c"),
      (4L, "   ")
    ).toDF("doc_id", "text")
    val out = TextOps.bigramLmScores(docsDf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(1L, 2L)) // no-bigram docs are not scored
    assert(out(1L)._1 == 3L && out(2L)._1 == 1L)
    val p_ab = math.log(2.0 / 3.0)
    val p_ba = math.log(0.5)
    assert(math.abs(out(1L)._2 - BigDecimal((2 * p_ab + p_ba) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    assert(math.abs(out(2L)._2 - BigDecimal(p_ab)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("t20: dense deterministic permutation, invariant to input partitioning") {
    import spark.implicits._
    val ids = (0L until 37L)
    val docsDf = ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = ids.sortBy(i => (md5hex(s"$i:graft42"), i)).zipWithIndex
      .map { case (id, pos) => (id, pos.toLong) }
    val got = TextOps.corpusShuffle(docsDf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    assert(got.toSeq == expected)
    // dense 0..N-1 and stable under a different physical layout
    assert(got.map(_._2).toSeq == (0L until 37L))
    val rep = TextOps.corpusShuffle(docsDf.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    assert(rep.toSeq == expected)
  }

  test("d11: cluster-bounded cosine drops keep the smallest vec_id") {
    import spark.implicits._
    // seeds (kSeeds=2): v0=(1,0) v1=(0,1); v2 joins cluster 0 at cos
    // ~0.99995, v3 joins cluster 1 at cos ~0.995
    val emb = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.0, 1.0)),
      (2L, Seq(1.0, 0.01)),
      (3L, Seq(0.1, 1.0))
    ).toDF("vec_id", "emb")
    val out = DedupOps.semanticDedup(emb, kSeeds = 2, tau = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set(
      (0L, 0L, false), (1L, 1L, false), (2L, 0L, true), (3L, 1L, true)))
    // raising tau above both pair similarities keeps everything
    val strict = DedupOps.semanticDedup(emb, kSeeds = 2, tau = 0.99999)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    assert(strict == Set((0L, false), (1L, false), (2L, false), (3L, false)))
    // cross-cluster near-dups are NOT dropped (the SemDeDup approximation):
    // v1 vs v3 land in one cluster here, but v0 vs a hypothetical cluster-1
    // member would never pair — asserted structurally: every dropped vec
    // shares its cluster with a smaller kept vec
    val rows = DedupOps.semanticDedup(emb, kSeeds = 2, tau = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    rows.filter(_._3).foreach { case (v, c, _) =>
      assert(rows.exists { case (v2, c2, d2) => c2 == c && v2 < v && !d2 })
    }
  }

  test("t21 approx twin: totals exact, sketch quartiles honest at gate-sized groups") {
    import org.apache.spark.sql.functions.{col, length => slen}
    import spark.implicits._
    // 2 sources x 2 langs, odd group sizes so the median rank is unambiguous
    val docsDf = (0 until 84).map { i =>
      (i.toLong, s"s${i % 2}", s"l${i % 2}${i % 4 / 2}",
        ("tok " * (1 + i % 21)).trim)
    }.toDF("doc_id", "source", "lang", "text")
    val approx = TextOps.corpusProfileApprox(docsDf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // window-form equivalent on the in-memory fixture (same expressions
    // as the t21 gate, which reads from parquet)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("lang"))
    import org.apache.spark.sql.functions._
    val exactRows = docsDf.filter(slen(trim(col("text"))) > 0)
      .select(col("source"), col("lang"), col("doc_id"),
        slen(col("text")).cast("bigint").as("nc"),
        size(split(trim(col("text")), "\\s+")).cast("bigint").as("nw"),
        md5(col("text").cast("binary")).as("h"))
      .withColumn("rk", row_number().over(w.orderBy(col("nc"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(w))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nw")).cast("bigint").as("n_tokens"),
        sum(col("nc")).cast("bigint").as("n_chars"),
        countDistinct(col("h")).as("n_unique_texts"),
        max(when(col("rk") === expr("(n * 50 + 99) DIV 100"), col("nc"))).as("len_p50"),
        min(col("nc")).as("lo"), max(col("nc")).as("hi"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(approx.keySet == exactRows.keySet)
    exactRows.foreach { case (k, e) =>
      val a = approx(k)
      assert(a.getLong(2) == e.getLong(2) && a.getLong(3) == e.getLong(3) &&
        a.getLong(4) == e.getLong(4), s"$k totals differ") // docs/tokens/chars exact
      // HLL within the e07 5% bar
      assert(math.abs(a.getLong(5) - e.getLong(5)).toDouble <=
        0.05 * e.getLong(5) + 1, s"$k n_unique")
      // sketch quartiles: inside the group's range, monotone, median
      // within one 'tok ' step of the exact nearest-rank median
      val (p25, p50, p75) = (a.getLong(6), a.getLong(7), a.getLong(8))
      assert(p25 >= e.getLong(7) && p75 <= e.getLong(8) && p25 <= p50 && p50 <= p75, s"$k order")
      assert(math.abs(p50 - e.getLong(6)) <= 4, s"$k median $p50 vs ${e.getLong(6)}")
    }
  }

  test("t23 scale twin: approx-percentile cutoff matches the rank form; k auto-sizes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 40 docs with distinctive bigram mixes -> distinct 6-dp lm scores
    // (asserted below as the precondition for value==rank parity)
    val docsDf = (0 until 40).map { i =>
      val toks = (0 until (3 + i % 5)).map(j => s"t${(i * 7 + j * j) % 23}")
      (i.toLong, "s0", "en", (toks ++ toks.take(2)).mkString(" "))
    }.toDF("doc_id", "source", "lang", "text")
    val lm = TextOps.bigramLmScores(docsDf)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(lm.map(_._2).distinct.length == lm.length, "fixture: scores must be distinct")
    // gate's rank form: drop rk <= ceil(n/10) on (lm_score, doc_id)
    val n = lm.length
    val rankSurvivors = lm.sortBy { case (id, s) => (s, id) }
      .drop((n * 10 + 99) / 100).map(_._1).toSet
    // unit embeddings at distinct angles; tau > 1 => dedup drops nothing,
    // so the twin's output doc_ids ARE its survivor set
    // pairs (i, i+20) share an angle -> exact near-dups for the tau=0.9999
    // run; distinct angles are 0.3 rad apart (cos ~0.955, below tau)
    val embDf = (0 until 40).map { i =>
      val a = (i % 20) * 0.3
      (i.toLong, Seq(math.cos(a), math.sin(a)))
    }.toDF("vec_id", "emb")
    val twin = TextOps.curateLearnedScalable(docsDf, embDf, tau = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(twin.map(_._1).toSet == rankSurvivors,
      s"value-cutoff survivors ${twin.map(_._1).sorted.toSeq} vs rank ${rankSurvivors.toSeq.sorted}")
    // lm_score passthrough intact
    val lmMap = lm.toMap
    twin.foreach { case (id, _, s) => assert(s == lmMap(id)) }
    // k auto-sizing: centroid ids are survivor vec_ids < kAuto (seeded
    // Lloyd init), kAuto = max(16, ceil(sqrt(nSurv)))
    val kAuto = math.max(16, math.ceil(math.sqrt(rankSurvivors.size.toDouble)).toInt)
    assert(twin.map(_._2).forall(c => c < kAuto))
    // structural dedup contract at a real tau: output is a subset of the
    // survivors and every surviving cluster keeps its smallest member
    val deduped = TextOps.curateLearnedScalable(docsDf, embDf, tau = 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(deduped.map(_._1).toSet.subsetOf(rankSurvivors))
    assert(deduped.length < twin.length, "near-identical angles must dedup")
  }

  test("t23 scale twin survives offset id spaces (seeds are smallest PRESENT ids)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // r10 review finding: kmeansCentroids used to seed via `vec_id < k`,
    // which finds ZERO seeds when the id space starts above kAuto (sharded
    // corpora, key-shifted rehearsal copies) — the whole curated corpus
    // silently vanished. Seeds are now the k smallest ids present.
    val off = 1000000L
    val docsDf = (0 until 40).map { i =>
      val toks = (0 until (3 + i % 5)).map(j => s"t${(i * 7 + j * j) % 23}")
      (off + i, "s0", "en", (toks ++ toks.take(2)).mkString(" "))
    }.toDF("doc_id", "source", "lang", "text")
    val embDf = (0 until 40).map { i =>
      val a = (i % 20) * 0.3
      (off + i, Seq(math.cos(a), math.sin(a)))
    }.toDF("vec_id", "emb")
    val out = TextOps.curateLearnedScalable(docsDf, embDf, tau = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length >= 30, s"only ${out.length} rows survived — degenerate quantizer")
    assert(out.forall(_._1 >= off))
    assert(out.map(_._2).toSet.forall(_ >= off), "centroid ids must be survivor ids")
  }

  test("d11 trained path: Lloyd centroids preserve the drop set on separated clusters") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.0, 1.0)),
      (2L, Seq(1.0, 0.01)),
      (3L, Seq(0.1, 1.0))
    ).toDF("vec_id", "emb")
    // two well-separated groups: training moves the 2 centroids to the
    // group means, assignments and therefore drops match the seeded path
    val trained = DedupOps.semanticDedupTrained(emb, k = 2, iters = 2, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    assert(trained == Set((0L, false), (1L, false), (2L, true), (3L, true)))
    // structural contract holds regardless of where centroids land:
    // every dropped vec shares a cluster with a smaller kept vec
    val rows = DedupOps.semanticDedupTrained(emb, k = 2, iters = 1, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    rows.filter(_._3).foreach { case (v, c, _) =>
      assert(rows.exists { case (v2, c2, d2) => c2 == c && v2 < v && !d2 })
    }
  }

  test("t27: DSIR weights tilt toward the target source's vocabulary") {
    import spark.implicits._
    // target docs (src0) speak vocab {alpha beta}; the pool adds docs in a
    // disjoint vocab {omega psi}. A pool doc written in the target's vocab
    // must outweigh an equally long doc written in the foreign vocab.
    val docsDf = Seq(
      (0L, "alpha beta alpha beta", "src0"),
      (1L, "beta alpha beta alpha", "src0"),
      (2L, "alpha beta alpha beta", "srcX"),
      (3L, "omega psi omega psi", "srcX"),
      (4L, "   ", "srcX")
    ).toDF("doc_id", "text", "source")
    val out = TextOps.dsirKeyed(docsDf, "src0").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L)) // blank doc not scored
    assert(out(2L)._1 == 7L) // 4 unigrams + 3 bigrams
    assert(out(2L)._2 > out(3L)._2,
      s"target-vocab doc ${out(2L)._2} must outweigh foreign ${out(3L)._2}")
    // weight is a per-doc function of content: same text, same logw
    assert(math.abs(out(0L)._2 - out(2L)._2) < 1e-12)
  }

  test("t27: sampled count is exactly ceil(N/5); logw repartition-stable") {
    val docsDf = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val gate = TextOps.t27.run(spark, "/root/testdata/sf0.001")
    val n = gate.count()
    val k = gate.filter(org.apache.spark.sql.functions.col("sampled")).count()
    assert(k == (n + 4) / 5, s"sampled $k of $n")
    val a = TextOps.dsirKeyed(docsDf, "src0").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    val b = TextOps.dsirKeyed(docsDf.repartition(17), "src0").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    assert(a.sameElements(b), "ROUND-6 weights must not drift with partitioning")
  }

  test("t27 scale twin: percentile-cutoff selection matches the gate's rank set") {
    import org.apache.spark.sql.functions.col
    val docsDf = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val gateSet = TextOps.t27.run(spark, "/root/testdata/sf0.001")
      .filter(col("sampled")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val twinSet = TextOps.dsirResampleScalable(docsDf, "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(twinSet == gateSet,
      s"twin ${twinSet.size} vs gate ${gateSet.size}; diff ${(twinSet diff gateSet) ++ (gateSet diff twinSet)}")
  }

  test("t27 scale twin: parity holds when frac*N is non-integral") {
    import org.apache.spark.sql.functions.col
    // 497 scoreable docs: ceil(0.2*497)=100, but a naive
    // approx_percentile(gkey, 0.8) cutoff sits at rank ceil(0.8*497)=398
    // and keeps only 99 — the boundary the twin must get right
    val docsDf = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 497)
    val keyed = TextOps.dsirKeyed(docsDf, "src0")
      .select("doc_id", "gkey")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val n = keyed.length
    assert(n % 5 != 0, s"fixture must exercise the non-integral boundary, n=$n")
    val k = (n + 4) / 5
    val gateSet = keyed.sortBy { case (id, g) => (-g, id) }.take(k).map(_._1).toSet
    val twinSet = TextOps.dsirResampleScalable(docsDf, "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(twinSet == gateSet, s"twin ${twinSet.size} vs gate $k of $n")
  }
}
