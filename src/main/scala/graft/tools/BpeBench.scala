package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.BpeTrainer
import graft.Tables

/** Dev-only: time BPE application (expression vs chained-regexp fold) on
  * the documents corpus at increasing merge-table sizes. Substantiates
  * the `bpe_encode` expression's O(word)-per-row claim; not part of the
  * driver contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.BpeBench [maxMerges]
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val maxMerges = args.headOption.map(_.toInt).getOrElse(512)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.requiredConf.foldLeft(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val merges = BpeTrainer.train(docs, maxMerges)
    println(s"[bpebench] trained ${merges.length} merges")
    val words = docs.select(explode(regexp_extract_all(col("text"),
      lit(BpeTrainer.preTokRe), lit(0))).as("w")).cache()
    println(s"[bpebench] ${words.count()} word instances")
    for (k <- Seq(32, 128, merges.length).distinct.filter(_ <= merges.length)) {
      val tbl = merges.take(k)
      def time(label: String, f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"[bpebench] k=$k%4d $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (sum toks=$n)")
      }
      time("expression",
        BpeTrainer.encodeWords(words, tbl)
          .agg(sum(size(col("toks")))).head().getLong(0))
      time("regexp fold",
        graft.text.BpeTrainer.encodeWordsFold(words, tbl)
          .agg(sum(size(col("toks")))).head().getLong(0))
    }
    spark.stop()
  }
}
