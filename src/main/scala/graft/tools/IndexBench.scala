package graft.tools

import graft.Tables
import graft.operators.{AnnOps, IndexStore, RetrievalOps}

/** Build-vs-query latency split for the at-rest retrieval indexes — the
  * measurement the a10/a11 gate floors can't show on their own (the gate
  * pays the build once via ensure*, then every rep is query-only; this
  * driver times the two phases separately and the legacy
  * rebuild-per-query path beside them).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.IndexBench [reps]
  */
object IndexBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = ToolSession.local()
    val root = java.nio.file.Files
      .createTempDirectory("graft-ixbench").toString

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def minOf(label: String)(f: => Long): Double = {
      val best = (1 to reps).map { _ =>
        val (t, n) = time(f)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        assert(n > 0, s"$label returned no rows")
        t
      }.min
      println(f"[ixbench] $label%-28s min-of-$reps: $best%.2f s")
      best
    }

    // BM25: one build, then query-only reps vs the rebuild-per-query gate
    val (bmBuild, bmLoc) = time {
      val loc = s"$root/bm25"
      IndexStore.buildBm25(Tables.load(spark, dir, "documents"), loc)
      loc
    }
    println(f"[ixbench] bm25 build:                 $bmBuild%.2f s (once)")
    val bmQ = minOf("bm25 query-from-index")(
      IndexStore.bm25TopKHotTermsFromIndex(spark, bmLoc).count())
    val bmLegacy = minOf("bm25 rebuild-per-query")(
      RetrievalOps.bm25TopKHotTerms(Tables.load(spark, dir, "documents")).count())

    // IVF-PQ: same split
    val (pqBuild, pqLoc) = time {
      val loc = s"$root/ivfpq"
      val e = AnnOps.embTable(spark, dir)
      IndexStore.buildIvfPq(e, loc)
      e.unpersist(blocking = false)
      loc
    }
    println(f"[ixbench] ivfpq build:                $pqBuild%.2f s (once)")
    val pqQ = minOf("ivfpq query-from-index")(
      IndexStore.ivfPqRefinedFromIndex(spark, dir, pqLoc).count())
    val pqLegacy = minOf("ivfpq rebuild-per-query")(
      AnnOps.ivfPqKnnRefined(spark, dir).count())

    // ---- lifecycle rungs (round-12): append → delete → compact, and the
    // IVF maintenance ladder with its two drift signals (cell skew +
    // measured recall). Each op is timed ONCE on a fresh location — these
    // are maintenance costs, not query floors, and the interesting claim
    // is the SHAPE (append ≪ build, delete is posting-bounded, compact is
    // an index-sized rewrite, rebalance ≪ rebuild).
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val docs = Tables.load(spark, dir, "documents")
    val bmLoc2 = s"$root/bm25_life"
    val (bmBuild23, _) = time(
      IndexStore.buildBm25(docs.filter(pmod(col("doc_id"), lit(3)) =!= 0), bmLoc2))
    val (bmAppend, _) = time(
      IndexStore.appendBm25(docs.filter(pmod(col("doc_id"), lit(3)) === 0), bmLoc2))
    println(f"[ixbench] bm25 build 2/3 + append 1/3: $bmBuild23%.2f + $bmAppend%.2f s")
    val (bmDel, _) = time(IndexStore.deleteBm25(
      docs.filter(pmod(col("doc_id"), lit(7)) === 0).select(col("doc_id")), bmLoc2))
    val (bmQDel, nQDel) = time(
      IndexStore.bm25TopKHotTermsFromIndex(spark, bmLoc2).count())
    assert(nQDel > 0, "bm25 query after delete returned no rows")
    val (bmCompact, _) = time(IndexStore.compactBm25(spark, bmLoc2))
    val (bmQCompact, nQc) = time(
      IndexStore.bm25TopKHotTermsFromIndex(spark, bmLoc2).count())
    assert(nQc > 0, "bm25 query after compact returned no rows")
    println(f"[ixbench] bm25 delete/query/compact/query: " +
      f"$bmDel%.2f / $bmQDel%.2f / $bmCompact%.2f / $bmQCompact%.2f s")

    // IVF: prefix build + tail append reproduces the frozen-quantizer
    // drift (the spec's shape); the probe pair measures what it costs and
    // what the rebalance rung recovers.
    val e2 = AnnOps.embTable(spark, dir)
    val nVec = e2.count()
    val cut = math.max(60L, (nVec * 6) / 10)
    val pqLoc2 = s"$root/ivfpq_life"
    val (pqBuildPre, _) = time(
      IndexStore.buildIvfPq(e2.filter(col("vec_id") < cut), pqLoc2))
    val (pqAppend, _) = time(
      IndexStore.appendIvfPq(e2.filter(col("vec_id") >= cut), pqLoc2))
    val (_, _, _, skewBefore) = IndexStore.ivfCellStats(spark, pqLoc2)
    val (recBeforeMean, recBeforeMin) = IndexStore.ivfRecallProbe(spark, dir, pqLoc2)
    val (pqRebal, ran) = time(IndexStore.rebalanceIvfPq(
      e2, pqLoc2, skewBound = math.max(1.0, skewBefore - 0.01)))
    val (_, _, _, skewAfter) = IndexStore.ivfCellStats(spark, pqLoc2)
    val (recAfterMean, recAfterMin) = IndexStore.ivfRecallProbe(spark, dir, pqLoc2)
    println(f"[ixbench] ivfpq build60 $pqBuildPre%.2f s, append40 $pqAppend%.2f s, " +
      f"rebalance(ran=$ran) $pqRebal%.2f s")
    println(f"[ixbench] ivf skew $skewBefore%.2f -> $skewAfter%.2f, " +
      f"recall mean/min $recBeforeMean%.2f/$recBeforeMin%.2f -> " +
      f"$recAfterMean%.2f/$recAfterMin%.2f")
    val (pqDel, _) = time(IndexStore.deleteIvfPq(
      e2.filter(pmod(col("vec_id"), lit(9)) === 7).select(col("vec_id")), pqLoc2))
    val (pqQDel, nPqDel) = time(
      IndexStore.ivfPqRefinedFromIndex(spark, dir, pqLoc2).count())
    assert(nPqDel > 0, "ivfpq query after delete returned no rows")
    val (pqCompact, _) = time(IndexStore.compactIvfPq(spark, pqLoc2))
    println(f"[ixbench] ivfpq delete/query/compact: " +
      f"$pqDel%.2f / $pqQDel%.2f / $pqCompact%.2f s")
    e2.unpersist(blocking = false)

    val json = s"""{"bm25_build_sec":$bmBuild,"bm25_query_sec":$bmQ,""" +
      s""""bm25_rebuild_per_query_sec":$bmLegacy,""" +
      s""""ivfpq_build_sec":$pqBuild,"ivfpq_query_sec":$pqQ,""" +
      s""""ivfpq_rebuild_per_query_sec":$pqLegacy,""" +
      s""""lifecycle":{"bm25_build_two_thirds_sec":$bmBuild23,""" +
      s""""bm25_append_sec":$bmAppend,"bm25_delete_sec":$bmDel,""" +
      s""""bm25_query_after_delete_sec":$bmQDel,""" +
      s""""bm25_compact_sec":$bmCompact,""" +
      s""""bm25_query_after_compact_sec":$bmQCompact,""" +
      s""""ivfpq_build_prefix_sec":$pqBuildPre,"ivfpq_append_sec":$pqAppend,""" +
      s""""ivf_cell_skew_after_append":$skewBefore,""" +
      s""""ivf_recall_after_append":{"mean":$recBeforeMean,"min":$recBeforeMin},""" +
      s""""ivfpq_rebalance_sec":$pqRebal,"ivfpq_rebalance_ran":$ran,""" +
      s""""ivf_cell_skew_after_rebalance":$skewAfter,""" +
      s""""ivf_recall_after_rebalance":{"mean":$recAfterMean,"min":$recAfterMin},""" +
      s""""ivfpq_delete_sec":$pqDel,"ivfpq_query_after_delete_sec":$pqQDel,""" +
      s""""ivfpq_compact_sec":$pqCompact},"reps":$reps,"sf":"$dir"}"""
    println(json)
    // SPARK_GRAFT_IXBENCH_KEY=sf0.1 merges the run into BENCH_INDEX.json
    // under that key (the committed-artifact path; stdout stays primary)
    sys.env.get("SPARK_GRAFT_IXBENCH_KEY").foreach(k =>
      ArtifactJson.merge("BENCH_INDEX.json", k, json))
    spark.stop()
  }
}
