package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic parquet corpus (TESTDATA.md).
  *
  * At cluster scale these reads are plain splittable parquet scans; every
  * query below them relies on Catalyst pushing filters/projections into the
  * scan (verified via `.explain` — see Bench).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session settings every graft session needs; apply ONCE at session
    * construction (Verify/Bench/test builders) instead of mutating config
    * as a side effect of loading a table (round-1 ADVICE: a mid-session
    * toggle silently changes semantics of unrelated later reads).
    *
    *  - nanosAsLong: `events.ts` is parquet TIMESTAMP(NANOS), which the
    *    vectorized reader rejects; read it as a nanosecond long.
    */
  val requiredConf: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // pointed failure instead of a deep parquet-reader error when a
    // session was built without requiredConf (an external driver using
    // its own builder would otherwise die inside the events scan)
    if (name == "events")
      require(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
          .contains("true"),
        "events.ts is parquet TIMESTAMP(NANOS): build the session with " +
          "graft.Tables.requiredConf (spark.sql.legacy.parquet.nanosAsLong=true)")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so the whole gate surface is also
    * reachable through `spark.sql` (free SQL front-end via Catalyst).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
