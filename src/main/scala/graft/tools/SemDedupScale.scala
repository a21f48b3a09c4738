package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.DedupOps

/** The measured half of d11's 100× named cause (BENCH_100x_full.json):
  * the gate form keeps the 16-seed-centroid convention (oracle-pinned),
  * so within-cluster cosine pairs grow as (N/16)²·16 — quadratic with
  * fixed k. The documented production path is
  * [[DedupOps.semanticDedupTrained]] with k ~ √N, which bounds
  * within-cluster pairs at ~N·√N/2 total. This probe times both on the
  * same corpus so the artifact carries the fix's number, not just its
  * name.
  *
  * Usage: SemDedupScale <dir> — prints one JSON line.
  */
object SemDedupScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_full100")
    val spark = ToolSession.local()
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("emb"))
      .cache()
    val n = emb.count()
    val k = math.max(16, math.sqrt(n.toDouble).toInt)
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    val (tTrained, nTrained) = time {
      DedupOps.semanticDedupTrained(emb, k = k).count() }
    val (tSeed, nSeed) = time { DedupOps.semanticDedup(emb).count() }
    emb.unpersist(blocking = false)
    println(s"""[semscale] {"dir":"$dir","n_vectors":$n,"k_sqrtN":$k,""" +
      s""""trained_sqrtN_sec":${f"$tTrained%.1f"},"seeded_16_sec":${f"$tSeed%.1f"},""" +
      s""""rows":{"trained":$nTrained,"seeded":$nSeed}}""")
    spark.stop()
  }
}
