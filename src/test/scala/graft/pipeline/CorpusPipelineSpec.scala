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
}
