package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.er.EntityResolution

/** ER blocking at load (round-12 VERDICT item 1): `blockPairs`'
  * `gramDfCap` was the last candidate-generation guard in the repo
  * without a measured operating point. This probe measures the
  * candidate-pairs-vs-labels curve at 1×/10×/100× the reference's 3.6k
  * NER labels (data_integration.ipynb c39-c42 — the dedupe blocking step
  * whose 104 s train dominates the reference pipeline), with the cap at
  * its 1000 default AND uncapped — the BENCH_SKEW before/after shape for
  * the relational-ER skew class.
  *
  * The synthetic vocabulary is PipelineBench's mentions generator made
  * scale-parametric: `labels(n)` emits 3 spelling variants per entity
  * ("EntityN Corp" / "EntityN Corp inc" / "EntityN Corps") across the 4
  * NER types. That shape is exactly the hostile one for token blocking:
  * the "corp"/"inc" tokens (and the "ent"/"nti"/"ity" character grams)
  * occur in EVERY label of a type, so uncapped blocking pushes
  * O((labels/type)²) pairs through each hot key — quadratic in corpus
  * size — while the capped path keeps only entity-local keys (df ≤ 3)
  * and stays linear. ErEvalSpec pins the sub-quadratic capped curve at
  * fixture scale; this tool measures it at load.
  *
  * Usage: ErLoadProbe [outPath] ; env SPARK_GRAFT_ER_SCALES (default
  * "1,10,100"), SPARK_GRAFT_ER_TIMEOUT_SEC per-measurement bound for the
  * uncapped "before" legs (default 900).
  */
object ErLoadProbe {
  /** 1218 entities × 3 variants = 3,654 distinct labels per unit scale —
    * the reference's label count. Deterministic, seedless.
    */
  def labels(s: SparkSession, scale: Int): DataFrame = {
    val types = Seq("ORG", "GPE", "PERSON", "PRODUCT")
    val nEnts = 1218 * scale
    s.range(0, nEnts.toLong * 3)
      .select(col("id"),
        (col("id") / 3).cast("long").as("ent"),
        pmod(col("id"), lit(3)).as("v"))
      .select(col("id"),
        concat(lit("Entity"), col("ent"),
          element_at(array(lit(" Corp"), lit(" Corp inc"), lit(" Corps")),
            (col("v") + 1).cast("int"))).as("label"),
        element_at(typedLit(types), (pmod(col("ent"), lit(4)) + 1).cast("int"))
          .as("type"))
  }

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("BENCH_ER.json")
    val scales = sys.env.getOrElse("SPARK_GRAFT_ER_SCALES", "1,10,100")
      .split(',').map(_.trim.toInt).toSeq
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_ER_TIMEOUT_SEC", "900").toInt
    val spark = ToolSession.local()
    val pool = java.util.concurrent.Executors.newCachedThreadPool(
      (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)

    /** (seconds, rows, note) — rows = -1 with a note on timeout OR
      * failure (the Bench job-group pattern; an OOM on the uncapped
      * 100× leg must cost that one measurement, not the artifact).
      */
    def timed(tag: String)(mk: => DataFrame): (Double, Long, Option[String]) = {
      val t0 = System.nanoTime()
      val group = s"erload-$tag"
      val fut = scala.concurrent.Future {
        spark.sparkContext.setJobGroup(group, tag, interruptOnCancel = true)
        try mk.count() finally spark.sparkContext.clearJobGroup()
      }
      val (n, note) = try (scala.concurrent.Await.result(fut,
        scala.concurrent.duration.Duration(timeoutSec, "s")), None)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(group)
          (-1L, Some(s"timeout after ${timeoutSec}s"))
        case e: Throwable =>
          spark.sparkContext.cancelJobGroup(group)
          (-1L, Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}"))
      }
      ((System.nanoTime() - t0) / 1e9, n, note)
    }

    val rows = new scala.collection.mutable.ArrayBuffer[String]
    def flush(): Unit = { // incremental: a late-scale failure keeps earlier rows
      // key-replacing merge (ArtifactJson): the artifact also carries the
      // phases/family/reading sections other probes own — a curve re-run
      // must refresh ONLY the curve
      ArtifactJson.merge(outPath, "what",
        s""""EntityResolution.blockPairs candidate-pairs-vs-labels curve at 1x/10x/100x the reference's 3.6k NER labels (PipelineBench vocabulary shape: 3 variants/entity, corp/inc tokens hot across each type). gramDfCap=1000 (production default) vs uncapped; chain = blockPairs -> scorePairs -> threshold 0.6 -> connected components at the default cap. Uncapped legs bounded by SPARK_GRAFT_ER_TIMEOUT_SEC=${timeoutSec}s (-1 = timeout/failure, see note)."""")
      ArtifactJson.merge(outPath, "curve", s"[${rows.mkString(",")}]")
    }
    def noteJson(key: String, n: Option[String]): String =
      n.map(s => s""","$key":"${s.replace("\"", "'")}"""").getOrElse("")
    for (l <- scales) {
      val lbl = labels(spark, l).cache()
      val nLabels = lbl.count()
      val (sCap, nCap, capNote) = timed(s"cap-$l") {
        EntityResolution.blockPairs(lbl) } // gramDfCap = 1000 default
      // full production chain at the default cap: block -> score -> CC
      val (sChain, nClusters, chainNote) = timed(s"chain-$l") {
        EntityResolution.cluster(lbl, Map.empty, 0.6)
          .select(col("cluster_id")).distinct() }
      val (sUncap, nUncap, uncapNote) = timed(s"uncap-$l") {
        EntityResolution.blockPairs(lbl, Int.MaxValue) }
      lbl.unpersist(blocking = true)
      val line =
        s"""{"scale":$l,"labels":$nLabels,""" +
        s""""capped_pairs":$nCap,"capped_sec":${f"$sCap%.2f"},""" +
        s""""capped_pairs_per_label":${if (nCap >= 0) f"${nCap.toDouble / nLabels}%.2f" else -1},""" +
        s""""chain_sec":${f"$sChain%.2f"},"clusters":$nClusters,""" +
        s""""uncapped_pairs":$nUncap,"uncapped_sec":${f"$sUncap%.2f"}""" +
        noteJson("capped_note", capNote) + noteJson("chain_note", chainNote) +
        noteJson("uncapped_note", uncapNote) + "}"
      rows += line
      println(s"[erload] $line")
      flush()
    }
    println(s"[erload] wrote $outPath")
    spark.stop()
  }
}
