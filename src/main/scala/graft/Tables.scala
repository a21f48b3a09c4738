package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, timestamp_micros, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** The parquet file as-is (no column normalization). Streaming readers
    * need this: `readStream.schema(...)` must match the file's physical
    * schema, so they peek this schema and then apply [[normalizeEventTs]]
    * on the streaming DataFrame themselves.
    */
  def loadRaw(spark: SparkSession, dir: String, name: String): DataFrame = {
    // pointed failure instead of a deep parquet-reader error when a
    // session was built without requiredConf (an external driver using
    // its own builder would otherwise die inside a TIMESTAMP(NANOS) scan)
    if (name == "events")
      require(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
          .contains("true"),
        "events.ts may be parquet TIMESTAMP(NANOS): build the session with " +
          "graft.Tables.requiredConf (spark.sql.legacy.parquet.nanosAsLong=true)")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Normalize `events.ts` to an epoch-NANOSECOND long regardless of how
    * the generator wrote it — TIMESTAMP(NANOS) (reads as ns-long under
    * nanosAsLong) or timestamp[us] (reads as TIMESTAMP_NTZ). Everything
    * downstream does integer epoch math on the ns long, which is identical
    * in every engine; the NTZ→TZ cast interprets the naive value in the
    * session timezone (pinned UTC session-wide), matching the DuckDB
    * oracle's `epoch_ms(CAST(ts AS TIMESTAMP))` on the same file.
    */
  /** The normalized epoch-ns `ts` long as a TimestampType column (µs,
    * ns FLOOR-divided via pmod — exact for pre-epoch values too). ONE
    * definition shared by every consumer that needs a real timestamp
    * (the streaming event-time gates, e12's hopping windows).
    */
  def eventTsAsTimestamp: org.apache.spark.sql.Column =
    timestamp_micros(expr("(ts - pmod(ts, 1000)) DIV 1000"))

  /** The normalized epoch-ns `ts` long as epoch MILLISECONDS (floor via
    * pmod — exact for pre-epoch values too). The ONE definition of the
    * millisecond twin; e10/e11/st04/st05 used to hand-copy the string.
    */
  val EventTsMsSql: String = "(ts - pmod(ts, 1000000)) DIV 1000000"
  def eventTsMs: org.apache.spark.sql.Column = expr(EventTsMsSql)

  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts has unexpected type $other")
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = loadRaw(spark, dir, name)
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Register every table as a temp view so the whole gate surface is also
    * reachable through `spark.sql` (free SQL front-end via Catalyst).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
