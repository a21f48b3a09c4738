package graft.tools

import java.nio.file.{Files, Paths}


import graft.operators.PlanProbes

/** Dev-only check for r17 VERDICT Next #1's first step: does Spark's
  * AUTOMATIC runtime Bloom filter (SPARK-32268, guide §3.2) already fire
  * on the BM25 postings⋈doclen scoring join when that join is the
  * sort-merge it becomes at 100 TB?
  *
  * Scale-representative session: auto-broadcast disabled (the dl side
  * stops broadcasting once corpus-sized; the probe-side joins keep their
  * explicit hints, exactly as in production), and every runtime-bloom
  * threshold floored so the optimizer injects wherever it STRUCTURALLY
  * can — if no `might_contain` appears here, the decision is structural
  * (the creation side is a join output, not a selectively-filtered
  * scan), not a sizing artifact. Dumps the final adaptive plan
  * (isFinalPlan=true) to `<outDir>/bm25__hot_score_bloomcheck.txt` and
  * prints a one-line verdict.
  *
  * Usage: runMain graft.tools.BloomCheck [outDir]
  */
object BloomCheck {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r18")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = ToolSession.local(defaultCpus = "8", shuffleFromCpus = true)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "8GB")
    val df = PlanProbes.probes("bm25__hot_score")(spark, sfDir)
    df.write.format("noop").mode("overwrite").save() // AQE finalizes the plan
    val finalPlan = df.queryExecution.executedPlan.toString
    val hit = finalPlan.contains("might_contain") ||
      finalPlan.contains("bloom_filter_agg")
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(outDir, "bm25__hot_score_bloomcheck.txt"),
      s"# auto runtime bloom fired: $hit\n" +
      s"# session: autoBroadcastJoinThreshold=-1, bloom thresholds floored\n" +
      finalPlan)
    // manual-prune contrast under the SAME no-broadcast session: the dl
    // scan carries the mightContain predicate regardless of join strategy
    // (the probe forces the prune branch via the system property)
    val pruned = PlanProbes.probes("bm25__hot_score_bloom")(spark, sfDir)
    pruned.write.format("noop").mode("overwrite").save()
    Files.writeString(Paths.get(outDir, "bm25__hot_score_bloom_smj.txt"),
      "# manual dl Bloom prune forced, autoBroadcastJoinThreshold=-1\n" +
      pruned.queryExecution.executedPlan.toString)
    println(s"""{"auto_runtime_bloom_fired":$hit,"out":"$outDir"}""")
    spark.stop()
  }
}
