package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextOps

/** Rehearsal driver for the t23 SCALE TWIN ([[TextOps.curateLearnedScalable]])
  * on a ScaleData-materialized N× directory.
  *
  * Why a dedicated driver instead of the Bench harness: the twin is
  * deliberately not a gate (trained k-means centroids are
  * partition-summation-order dependent, so the rank-window gate form keeps
  * the DuckDB oracle and the twin is parity-pinned in TrainPrepOpsSpec),
  * and on ScaleData output the doc/vec id spaces decorrelate — ScaleData
  * shifts each table by its OWN stride (documents 5 000/copy, embeddings
  * 2 000/copy at sf0.1), so copy i's vec_ids no longer fall inside copy
  * i's doc_id range and the chain's doc↔vec semi-join would quietly
  * shrink the dedup stage. This driver re-bases each copied vec_id onto
  * its copy's doc range (`(vec_id DIV vecStride) * docStride + (vec_id
  * MOD vecStride)`), restoring the base-scale correlation — every copy
  * contributes its full embedding slice to the semantic-dedup stage, the
  * workload shape a real N× corpus has.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<scaled dir> runMain graft.tools.TwinBench
  *        [reps] [vecStride] [docStride]
  * (strides default to the sf0.1 table sizes ScaleData reports.)
  */
object TwinBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val vecStride = args.lift(1).map(_.toLong).getOrElse(2000L)
    val docStride = args.lift(2).map(_.toLong).getOrElse(5000L)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = ToolSession.local()

    val docsDf = Tables.load(spark, dir, "documents")
    val embDf = Tables.load(spark, dir, "embeddings")
      .select(
        expr(s"(vec_id DIV $vecStride) * $docStride + (vec_id % $vecStride)")
          .cast("long").as("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("emb"))

    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = TextOps.curateLearnedScalable(docsDf, embDf).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[twin] rep$i: $t%.2f s rows=$n")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
