package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{AnnOps, EpochIndex, IndexStore}

/** Dev-only phase timer for the a15/a16 epoch gates (r17 optimization
  * round): times each phase of the gate chain — the two per-epoch trained
  * builds, the query panel, and each query leg — so the optimization
  * attacks the measured term, not a guess. Mirrors the gate bodies
  * exactly (fresh temp root, parity split, exact-mode query params).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.EpochGateProbe [reps]
  */
object EpochGateProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = ToolSession.local(defaultCpus = "4", shuffleFromCpus = true)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[epochprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // machine-speed probe (the Bench calibration shape) so readings taken
    // minutes apart on a noisy-neighbor sandbox can be normalized
    def calib(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 50000000L, 1L, 8)
        .selectExpr("sum(id % 1000003) AS s").collect()
      (System.nanoTime() - t0) / 1e9
    }
    calib()
    (1 to reps).foreach { rep =>
      println(f"[epochprobe] === rep $rep (calib ${calib()}%.3f s) ===")
      // the REAL gate bodies (exercise whatever concurrency they carry)
      Seq("a15_epoch_fanout_query", "a16_epoch_prune_query").foreach { g =>
        val fn = graft.SparkEntry.queries(g)
        t(s"$g gate+count")(fn(spark, sfDir).count())
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
    }
    // ---- isolated sub-phases of one trained build (public APIs; the
    // subvector explode is inlined — the expression is 3 lines and the
    // real one is private[operators])
    val e = AnnOps.embTable(spark, sfDir)
    val half = e.filter(col("vec_id") >= 5 && pmod(col("vec_id"), lit(2)) === 0)
    t("build kmeansCentroids(cache+count)") {
      val c = AnnOps.kmeansCentroids(half, 16, 2).cache(); c.count()
      c.unpersist(blocking = false)
    }
    val subs = t("build subvectors(cache+count)") {
      val x = half.select(col("vec_id"), explode(sequence(lit(0), lit(7))).as("s"),
          col("emb"))
        .select(col("vec_id"), col("s"), expr("slice(emb, s * 8 + 1, 8)").as("xs"))
        .cache()
      x.count(); x
    }
    t("build pqCodebooks(cache+count)") {
      val c = AnnOps.pqCodebooks(subs, 16).cache(); c.count()
      c.unpersist(blocking = false)
    }
    subs.unpersist(blocking = false)
    t("full buildIvfPqTrained via ingest (fresh root)") {
      val root2 = java.nio.file.Files
        .createTempDirectory(java.nio.file.Paths.get("/tmp"), "probeB").toString
      EpochIndex.ingest(half, root2, "even")
      t("  query leg ivfPqRefinedFromIndex x1")(
        IndexStore.ivfPqRefinedFromIndex(spark, sfDir,
          EpochIndex.epochLoc(root2, "even"), 16, 10, 1000000).count())
    }
    spark.stop()
  }
}
