package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named INTERNAL DataFrames for plan capture (r17 optimization round).
  *
  * Many gates end in `localCheckpoint(true)` — correct for their
  * measurement contract (materialize, release caches), but it makes the
  * gate's own `.explain` a trivial scan of the checkpointed RDD. The
  * physical plans the optimization round reasons about (Exchange counts,
  * join strategies, partial aggregation) live in the frames BELOW the
  * checkpoint. This registry exposes exactly those frames to
  * [[graft.tools.PlanDump]] so the committed before/after plan files
  * under plans/r17 carry honest evidence. Dev-only: nothing on the driver contract path calls
  * this.
  */
object PlanProbes {
  /** name -> (session, sfDir) => the internal frame whose plan matters.
    * Naming convention: `<gate>__<probe>` ties the probe to the gate
    * family it serves.
    */
  val probes: Map[String, (SparkSession, String) => DataFrame] = Map(
    // nearest-centroid assignment core (a03/a06/a07/a11/a14/a15/a16, d11/d14)
    "ann__centroid_assign" -> ((s: SparkSession, dir: String) => {
      val e = AnnOps.embTable(s, dir)
      val out = CentroidAssign.nearest(e, AnnOps.seededCents(e, 16))
      e.unpersist(blocking = false)
      out
    }),
    // PQ encode of the corpus against the seeded codebook (a06/a07/a11/a14)
    "ann__pq_encode" -> ((s: SparkSession, dir: String) => {
      val e = AnnOps.embTable(s, dir)
      val subs = AnnOps.subvectors(e)
      val out = AnnOps.pqEncode(subs.filter(col("vec_id") >= 5),
        AnnOps.seededCodebook(subs))
      e.unpersist(blocking = false)
      out
    }),
    // one trained k-means pass (a15/a16 ingest, rebalance/retrain rungs)
    "ann__kmeans_centroids" -> ((s: SparkSession, dir: String) => {
      val e = AnnOps.embTable(s, dir)
      val out = AnnOps.kmeansCentroids(e, 16, 2)
      e.unpersist(blocking = false)
      out
    }),
    // trained PQ codebooks (a15/a16 ingest, retrain rung)
    "ann__pq_codebooks" -> ((s: SparkSession, dir: String) => {
      val e = AnnOps.embTable(s, dir)
      val out = AnnOps.pqCodebooks(AnnOps.subvectors(e), 16)
      e.unpersist(blocking = false)
      out
    }),
    // BM25 inverted-index build core (a08/a10/a12/a13 build+append path)
    "bm25__index_tf" -> ((s: SparkSession, dir: String) => {
      val ix = RetrievalOps.buildIndexTables(graft.Tables.load(s, dir, "documents"))
      val out = ix.tf
      out
    }),
    // BM25 hot-terms scoring join (a08/a10/a12/a13 query path, pre-top-k)
    "bm25__hot_score" -> ((s: SparkSession, dir: String) => {
      val ix = RetrievalOps.buildIndexTables(graft.Tables.load(s, dir, "documents"))
      val probe = ix.dfreq.orderBy(org.apache.spark.sql.functions.col("df").desc,
        org.apache.spark.sql.functions.col("w")).limit(3)
        .select(org.apache.spark.sql.functions.col("w"))
      RetrievalOps.scoreProbes(ix, probe, 1.2, 0.75)
    }),
    // same scoring join with the r18 doclen Bloom prune FORCED (threshold
    // 0) — the shape the query takes at 100 TB where dl outgrows both the
    // broadcast threshold and [[RetrievalOps.dlBloomBytes]]
    "bm25__hot_score_bloom" -> ((s: SparkSession, dir: String) => {
      val ix = RetrievalOps.buildIndexTables(graft.Tables.load(s, dir, "documents"))
      val probe = ix.dfreq.orderBy(org.apache.spark.sql.functions.col("df").desc,
        org.apache.spark.sql.functions.col("w")).limit(3)
        .select(org.apache.spark.sql.functions.col("w"))
      sys.props("spark.graft.bm25.dlBloomBytes") = "0"
      try RetrievalOps.scoreProbes(ix, probe, 1.2, 0.75)
      finally sys.props.remove("spark.graft.bm25.dlBloomBytes")
    }),
    // a03's pre-checkpoint search frame (r18 seeded-panel form)
    "ann__ivf_seeded_search" -> ((s: SparkSession, dir: String) => {
      val e = AnnOps.embTable(s, dir)
      val out = AnnOps.ivfSearchSeeded(e, AnnOps.collectSeeds(e, 16))
      e.unpersist(blocking = false)
      out
    }),
    // a07's ADC candidate scoring (r18: seed-panel probes/assign + LUT)
    "ann__ivfpq_scored" -> ((s: SparkSession, dir: String) => {
      val e = AnnOps.embTable(s, dir)
      val out = AnnOps.ivfPqAdcScored(e, 16, 4)
      e.unpersist(blocking = false)
      out
    }),
    // g05-family weighted edge construction (r18 VERDICT Next #8:
    // ReadSchema pruning evidence at the orders⋈lineitem source)
    "g05__edge_build" -> ((s: SparkSession, dir: String) =>
      graft.graph.GraphQueries.edgeBuildProbe(s, dir)))
}
