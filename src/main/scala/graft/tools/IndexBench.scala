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

    println(s"""{"bm25_build_sec":$bmBuild,"bm25_query_sec":$bmQ,""" +
      s""""bm25_rebuild_per_query_sec":$bmLegacy,""" +
      s""""ivfpq_build_sec":$pqBuild,"ivfpq_query_sec":$pqQ,""" +
      s""""ivfpq_rebuild_per_query_sec":$pqLegacy,"reps":$reps,"sf":"$dir"}""")
    spark.stop()
  }
}
