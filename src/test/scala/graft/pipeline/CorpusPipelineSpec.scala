package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CorpusPipelineSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // vocabulary chosen so language ID resolves to 'en' and shingles are
  // controllable; doc 0 is the benchmark holdout (0 % 97 == 0)
  private val base = "the quick brown fox jumps over one lazy dog and then runs far away home"
  private def mk(id: Long, text: String) =
    (id, text, "en", "fixture", text.length.toLong)

  private val docs = Seq(
    // benchmark slice (0 % 97 == 0) — its own vocabulary, no overlap with base
    mk(0L, "benchmark secret eval questions appear here in fixed order"),
    mk(1L, base + " alpha beta gamma delta"),      // survivor
    mk(2L, base + " alpha beta gamma delta"),      // exact dup of 1 → dropped
    mk(3L, base + " alpha beta gamma echo"),       // near-dup of 1 → dropped
    mk(4L, "spam spam spam spam spam spam"),       // repetition → dropped
    mk(5L, "tiny doc"),                            // too short → dropped
    // quotes 4 benchmark trigrams, otherwise disjoint → decontaminated
    mk(6L, "unrelated prose which still quotes benchmark secret eval questions appear verbatim"),
    mk(7L, "completely different words compose this other document nicely")
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("each curation stage drops exactly its targets") {
    val corpus = CorpusPipeline.corpusSlice(docs)
    assert(corpus.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))

    val q = CorpusPipeline.qualityFilter(corpus)
    assert(q.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L, 6L, 7L))

    val ed = CorpusPipeline.exactDedup(q)
    assert(ed.select("doc_id").as[Long].collect().toSet == Set(1L, 3L, 6L, 7L))

    val nd = CorpusPipeline.nearDedup(ed)
    assert(nd.select("doc_id").as[Long].collect().toSet == Set(1L, 6L, 7L))

    val clean = CorpusPipeline.decontaminate(nd, CorpusPipeline.benchmarkSlice(docs))
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(1L, 7L))
  }

  test("decontaminate size contract: over-limit benchmark falls back to shuffle, same rows") {
    // plan contract, asserted on the LAZY contamination plan (decontaminate
    // itself checkpoints the id set eagerly, so the hint is consumed
    // before its returned plan): under the limit the bench side carries a
    // broadcast hint; at limit 0 it must not (the planner may shuffle)
    val corpus = CorpusPipeline.corpusSlice(docs)
    val bench = CorpusPipeline.benchmarkSlice(docs)
    import graft.operators.DedupOps
    val dsh = DedupOps.shingles(corpus)
    val bsh = DedupOps.shingles(bench).withColumnRenamed("doc_id", "bench_id")
    val nBench = bsh.count()
    val hintedIds = CorpusPipeline.contaminatedIds(dsh, bsh, nBench)
    val fallbackIds = CorpusPipeline.contaminatedIds(dsh, bsh, nBench, broadcastLimit = 0L)
    assert(hintedIds.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"))
    assert(!fallbackIds.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"))
    // result contract: identical rows through the public API either way
    val hinted = CorpusPipeline.decontaminate(corpus, bench)
    val fallback = CorpusPipeline.decontaminate(corpus, bench, broadcastLimit = 0L)
    assert(fallback.select("doc_id").as[Long].collect().toSet ==
      hinted.select("doc_id").as[Long].collect().toSet)
  }

  test("curate end-to-end labels language and split deterministically") {
    val out = CorpusPipeline.curate(docs)
      .select("doc_id", "pred_lang", "split").collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 7L))
    assert(out.forall(r => Set("train", "val", "test").contains(r.getString(2))))
    // doc 1 is dominated by English markers
    assert(out.find(_.getLong(0) == 1L).get.getString(1) == "en")
    // re-run: identical (hash-deterministic, no sampling state)
    val again = CorpusPipeline.curate(docs)
      .select("doc_id", "pred_lang", "split").collect()
    assert(out.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("curateConfigured with every flag off IS curate") {
    val sf = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = CorpusPipeline.curate(sf).collect().map(_.toString).sorted.toSeq
    val b = CorpusPipeline.curateConfigured(sf).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("optional stages splice at their documented positions (manual composition parity)") {
    import graft.operators.{DedupOps, TextOps}
    import org.apache.spark.sql.functions.{col, explode}
    val sf = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val cfg = CorpusPipeline.Config(
      dropBoilerplateMinDocs = Some(4), removeSpanTok = Some(8),
      softWeights = true, dsirTarget = Some("src0"), dsirFrac = 0.2)
    val got = CorpusPipeline.curateConfigured(sf, cfg)
    // manual composition through the same public stage functions, spliced
    // exactly where Config documents them
    val corpus = CorpusPipeline.corpusSlice(sf, cfg)
    val bench = CorpusPipeline.benchmarkSlice(sf, cfg)
    val rw = DedupOps.removeDupSpansRewrite(
      DedupOps.dropCommonLinesRewrite(
        CorpusPipeline.exactDedup(CorpusPipeline.qualityFilter(corpus, cfg)), 4), 8)
    val arr = DedupOps.shingleArrs(rw).cache()
    arr.count()
    val nd = CorpusPipeline.softWeightStage(rw, cfg, arr)
    val clean = CorpusPipeline.decontaminate(nd, bench, cfg,
      docShingles = Some(arr.select(col("doc_id"), explode(col("shArr")).as("sh"))))
    arr.unpersist(blocking = false)
    val sel = clean.join(
      TextOps.dsirResampleScalable(clean, "src0", 0.2).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val expect = CorpusPipeline.withSplit(TextOps.withLangPred(sel))
    val gotRows = got.collect().map(_.toString).sorted.toSeq
    assert(gotRows == expect.collect().map(_.toString).sorted.toSeq)
    // behavioral pins: soft weights keep every decontam survivor with a
    // (0,1] weight; DSIR then keeps ceil(0.2·N) of the SCORABLE (non-
    // blank — a span rewrite can empty a fully-duplicated doc) survivors
    val nClean = clean.filter(
      org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.trim(col("text"))) > 0).count()
    val gotDf = CorpusPipeline.curateConfigured(sf, cfg)
    assert(gotDf.columns.contains("weight"))
    val n = gotDf.count()
    assert(n == math.ceil(0.2 * nClean).toLong,
      s"DSIR kept $n of $nClean")
    assert(gotDf.select(col("weight")).collect()
      .forall(r => r.getDouble(0) > 0.0 && r.getDouble(0) <= 1.0))
  }

  test("d12/d15 rewrite stages actually rewrite: boilerplate and dup spans leave the text") {
    import graft.operators.DedupOps
    // four docs share the injected pseudo-line model's boilerplate; the
    // rewrite drops any >=4-doc line from every text
    val sf = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val rw = DedupOps.dropCommonLinesRewrite(sf, 4)
    // same universe, byte size can only shrink or hold per doc
    assert(rw.count() == sf.count())
    val joined = sf.select($"doc_id", $"n_chars".as("before"))
      .join(rw.select($"doc_id", $"n_chars".as("after")), Seq("doc_id"))
    assert(joined.filter($"after" > $"before").count() == 0)
    // span removal: the d15 gate's n_kept per doc equals the rewrite's
    // token count per doc (the two forms agree on WHAT survives)
    val gate = DedupOps.removeDupSpans(sf, winTok = 8)
      .select($"doc_id", $"n_kept")
    val rw2 = DedupOps.removeDupSpansRewrite(sf, winTok = 8)
      .select($"doc_id",
        org.apache.spark.sql.functions.expr(
          "size(filter(split(text, '[ ]+'), x -> x <> ''))").cast("long")
          .as("toks"))
    val both = gate.join(rw2, Seq("doc_id"))
    assert(both.filter($"n_kept" =!= $"toks").count() == 0)
    // the d18 (maximal-span) rewrite agrees with ITS gate the same way,
    // and the spanMaximal flag routes the pipeline stage to it
    val gateMax = DedupOps.removeDupSpansMaximal(sf, winTok = 8)
      .select($"doc_id", $"n_kept")
    val rwMax = DedupOps.removeDupSpansMaximalRewrite(sf, winTok = 8)
      .select($"doc_id",
        org.apache.spark.sql.functions.expr(
          "size(filter(split(text, '[ ]+'), x -> x <> ''))").cast("long")
          .as("toks"))
    assert(gateMax.join(rwMax, Seq("doc_id"))
      .filter($"n_kept" =!= $"toks").count() == 0)
    val viaFlag = CorpusPipeline.curateConfigured(sf,
      CorpusPipeline.Config(removeSpanTok = Some(8), spanMaximal = true))
      .collect().map(_.toString).sorted.toSeq
    val manual = CorpusPipeline.withSplit(graft.operators.TextOps.withLangPred(
      CorpusPipeline.decontaminate(
        CorpusPipeline.nearDedup(
          DedupOps.removeDupSpansMaximalRewrite(
            CorpusPipeline.exactDedup(
              CorpusPipeline.qualityFilter(CorpusPipeline.corpusSlice(sf))), 8)),
        CorpusPipeline.benchmarkSlice(sf))))
      .collect().map(_.toString).sorted.toSeq
    assert(viaFlag == manual)
  }
}
