package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one warm SparkSession, best-of-N per-query wall
  * times as a single JSON line (BASELINE.md: fixed overhead, not
  * throughput, is the binding constraint at these scales — so codegen/JIT
  * is warmed on the tiny sf first, the cache is cleared between queries so
  * each measurement is self-contained rather than fighting earlier
  * queries' persisted intermediates for storage memory, and each query
  * reports min over SPARK_GRAFT_REPS runs so single-run GC/JIT noise
  * cannot masquerade as a regression).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    // local-dev subset (comma-separated name prefixes); driver runs all
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    def selected(name: String): Boolean = only.forall(_.exists(name.startsWith))
    val spark = graft.tools.ToolSession.local(
      defaultCpus = "4", shuffleFromCpus = true)

    // SPARK_GRAFT_ISOLATE=1: additionally hint a full GC between queries
    // so suite-order interactions (one gate's heap residue inflating the
    // next gate's floor — the r5 d02 anomaly class) are detectable on
    // demand by diffing isolated vs suite numbers.
    val isolate = sys.env.get("SPARK_GRAFT_ISOLATE").contains("1")

    // timed region covers the query only; cache cleanup between queries is
    // untimed (round-1 ADVICE: clearCache in the finally block billed each
    // query for unpersisting its own intermediates). clearCache only drops
    // SQL-cached plans — GraphX's internal RDD persists (EdgeRDD/VertexRDD
    // from the Louvain/CC gates) outlive it and squat on storage memory
    // into later queries, so persistent RDDs are unpersisted too.
    // Failures keep the -1 sentinel but also surface the exception
    // instead of reading as "fast".
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                dir: String): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val r = try { fn(spark, dir).count(); (0.0, None) } catch {
        case e: Throwable => (-1.0, Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // measurements stay independent
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      if (isolate) System.gc()
      if (r._2.isEmpty) (elapsed, None) else r
    }

    // best-of-N (round-3/4 VERDICT: single-shot per-query timings swing
    // ±2.5x run-to-run from GC/codegen timing — BENCH_r03 vs r04 differed
    // 19% on byte-identical code. min-of-N is the standard answer: the
    // minimum is the least noise-contaminated estimate of the query's
    // true cost, and it is what makes round-over-round regression
    // detection possible at all). A rep that fails short-circuits: the
    // error is the result, retrying an exception is not a measurement.
    // Try-parse: a stray non-numeric env value must not abort the bench
    // before any query runs; the reps count is echoed in the JSON line so
    // round-over-round comparisons are self-describing (min-of-3 floors
    // are not comparable to earlier single-run rounds).
    val reps = scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
      .toOption.getOrElse(3).max(1)
    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
               dir: String): (Double, Option[String]) = {
      var best = Double.MaxValue
      var i = 0
      while (i < reps) {
        val (t, err) = runOnce(name, fn, dir)
        if (err.isDefined) return (t, err)
        best = math.min(best, t)
        i += 1
      }
      (best, None)
    }

    // untimed warmup: JIT + codegen caches, tiny scale (one rep is enough)
    if (warmupDir.nonEmpty && new java.io.File(warmupDir).isDirectory)
      SparkEntry.queries.filter(kv => selected(kv._1))
        .foreach { case (n, fn) => runOnce(n, fn, warmupDir) }

    val results = SparkEntry.queries.filter(kv => selected(kv._1))
      .map { case (name, fn) => name -> runOne(name, fn, sfDir) }
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // escape ALL control chars (not just \n\r\t): an exception message
    // carrying e.g. an ANSI escape byte would otherwise emit invalid JSON
    // exactly when error visibility matters most (the Verify.q convention)
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    val errs = results.collect { case (k, (_, Some(e))) =>
      "\"" + k + "\":\"" + esc(e) + "\"" }
      .mkString("{", ",", "}")
    val total = results.values.map(_._1).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"isolate":$isolate,"queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // self-contained artifact (r10 VERDICT item 5): the driver captures
    // stdout, which truncated BENCH_r10.json mid-JSON — so the full
    // per-gate map is ALSO written to a file the round can commit as-is.
    // The default path is git-IGNORED scratch (round-11 ADVICE: the
    // default must never clobber a committed artifact); a run whose map
    // should be kept sets SPARK_GRAFT_BENCH_OUT to the round-numbered
    // name explicitly. Best-effort: a read-only cwd must not fail the
    // measurement run.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    if (outPath.nonEmpty)
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
        line + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    spark.stop()
  }
}
