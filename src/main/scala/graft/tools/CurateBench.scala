package graft.tools

import graft.Tables
import graft.pipeline.CorpusPipeline

/** Timed end-to-end readings for the configurable curation chain — the
  * t12 default against the full-option variant (d12 boilerplate rewrite,
  * d15 span rewrite, d16 soft weights, t27 DSIR selection), so the cost
  * of each published add-on stage is a number, not a guess.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.CurateBench [reps]
  */
object CurateBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = ToolSession.local()
    val docs = Tables.load(spark, dir, "documents")

    def minOf(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        (t, n)
      }
      println(f"[curatebench] $label%-34s min-of-$reps: ${ts.map(_._1).min}%.2f s (rows=${ts.head._2})")
    }

    minOf("t12 default chain")(CorpusPipeline.curate(docs))
    minOf("+ d12 boilerplate rewrite")(CorpusPipeline.curateConfigured(docs,
      CorpusPipeline.Config(dropBoilerplateMinDocs = Some(4))))
    minOf("+ d15 span rewrite")(CorpusPipeline.curateConfigured(docs,
      CorpusPipeline.Config(removeSpanTok = Some(8))))
    minOf("soft weights instead of drop")(CorpusPipeline.curateConfigured(docs,
      CorpusPipeline.Config(softWeights = true)))
    minOf("+ DSIR top-20% selection")(CorpusPipeline.curateConfigured(docs,
      CorpusPipeline.Config(dsirTarget = Some("src0"))))
    minOf("ALL optional stages on")(CorpusPipeline.curateConfigured(docs,
      CorpusPipeline.Config(dropBoilerplateMinDocs = Some(4),
        removeSpanTok = Some(8), softWeights = true,
        dsirTarget = Some("src0"))))
    spark.stop()
  }
}
