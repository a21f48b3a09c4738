package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.sim.SimilarityJoin

/** Hot-token skew rehearsal for the set-similarity join (J6): time
  * [[SimilarityJoin.join]] (overlap counted in the token equi-join — one
  * hot token shared by f·N docs a side emits (f·N)² rows through that
  * key) against [[SimilarityJoin.joinGuarded]] (hot tokens leave
  * candidate generation, verify recomputes exact Jaccard from full sets)
  * on the SkewData corpus with the byte-identical mass EXCLUDED
  * (doc_id % 5 != 1): what remains is the boilerplate-prefix
  * distribution — ~40% of docs share 8 hot tokens without being
  * near-duplicates, the Zipf head every crawl corpus has. The identical
  * mass is excluded because it is the d19/d20 recipe's job (its pairs
  * are REAL matches; no token guard should hide them).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<skewed dir> runMain graft.tools.SimSkewProbe [t]
  */
object SimSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_skew/sf0.1")
    val t = args.headOption.map(_.toDouble).getOrElse(0.5)
    val spark = ToolSession.local()
    val docs = Tables.load(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(5)) =!= 1)
      .select(col("doc_id"), col("text")).cache()
    val n = docs.count()
    def time(label: String)(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); docs.cache(); docs.count()
      println(f"[simskew] $label%-10s $sec%8.2f s, $rows%8d pairs")
      (sec, rows)
    }
    val l = docs.select(col("doc_id").as("id"), col("text"))
    val (gSec, gRows) = time("guarded")(
      SimilarityJoin.joinGuarded(l, "id", col("text"), l, "id", col("text"), t)
        .filter(col("l_id") < col("r_id")).count())
    val (nSec, nRows) = time("naive")(
      SimilarityJoin.join(l, "id", col("text"), l, "id", col("text"), t)
        .filter(col("l_id") < col("r_id")).count())
    println(s"""{"metric":"simjoin_skew","n_docs":$n,"threshold":$t,""" +
      s""""guarded_sec":$gSec,"guarded_pairs":$gRows,""" +
      s""""naive_sec":$nSec,"naive_pairs":$nRows,"sf":"$dir"}""")
    spark.stop()
  }
}
