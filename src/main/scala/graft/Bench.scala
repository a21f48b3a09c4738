package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one warm SparkSession, per-query wall times as a
  * single JSON line (BASELINE.md: fixed overhead, not throughput, is the
  * binding constraint at these scales — so codegen/JIT is warmed on the
  * tiny sf first, and the cache is cleared between queries so each
  * measurement is self-contained rather than fighting earlier queries'
  * persisted intermediates for storage memory).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
               dir: String): Double = {
      val t0 = System.nanoTime()
      try fn(spark, dir).count() catch { case _: Throwable => return -1.0 }
      finally spark.catalog.clearCache() // measurements stay independent
      (System.nanoTime() - t0) / 1e9
    }

    // untimed warmup: JIT + codegen caches, tiny scale
    if (warmupDir.nonEmpty && new java.io.File(warmupDir).isDirectory)
      SparkEntry.queries.foreach { case (n, fn) => runOne(n, fn, warmupDir) }

    val results = SparkEntry.queries.map { case (name, fn) =>
      name -> runOne(name, fn, sfDir)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.filter(_ >= 0).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
