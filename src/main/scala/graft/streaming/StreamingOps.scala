package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.QueryDef

/** Structured Streaming surface. The reference is 100% batch (SURVEY §1.1
  * item 5); this is the streaming extension of the same event pipeline:
  * `readStream` → event-time tumbling window aggregation → sink. The gate
  * query runs it synchronously over the parquet corpus with an AvailableNow
  * trigger and a memory sink, and its oracle is the *batch* SQL for the
  * same window — proving stream/batch parity of the aggregation.
  *
  * At scale the same plan runs continuously with a watermark bounding
  * state: `withWatermark("ts", "2 hours")` keeps only open windows in the
  * state store; the shuffle is (window, event_type)-keyed like the batch
  * groupBy.
  */
object StreamingOps {
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),        // TIMESTAMP(NANOS) read as ns-long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling 1-hour event-time window counts, computed by an actual
    * streaming query (memory sink), matching e02's batch semantics.
    */
  val st01 = QueryDef(
    "st01_stream_windows",
    "structured-streaming tumbling 1h window counts (memory sink)",
    (s, dir) => {
      val tableName = "st01_stream_out"
      val src = s.readStream
        .schema(eventsSchema)
        .parquet(s"$dir/*events*") // glob: stream file source requires a directory basePath
        .withColumn("event_ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) DIV 1000")))
        .withWatermark("event_ts", "2 hours")
      val agg = src
        .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(tableName)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        q.processAllAvailable()
      } finally {
        q.stop()
      }
      s.table(tableName)
        .select(
          unix_millis(col("window.start")).as("window_ms"),
          col("event_type"), col("n"))
        .orderBy(col("window_ms"), col("event_type"))
    },
    Some("""SELECT ms - (ms % 3600000) AS window_ms, event_type, COUNT(*) AS n
      FROM (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, event_type FROM events) t
      GROUP BY 1, 2 ORDER BY window_ms, event_type"""))

  /** Append-mode production shape: same window aggregation, but the sink
    * receives each window ONCE when the watermark passes its end
    * (emitted iff window.end <= max_event_time - 2h, verified by the
    * probe in StreamingSpec) and the state store purges it — bounded
    * state, no driver-side result materialization (the memory-sink
    * complete-mode gate st01 keeps every window forever; fine as a
    * harness, wrong at 100 TB). File sink + checkpoint dir = exactly-once
    * restartable output.
    *
    * The oracle is the batch SQL restricted to closed windows — stream/
    * batch parity plus the watermark-eviction boundary in one gate.
    */
  val st02 = QueryDef(
    "st02_stream_append",
    "append-mode streaming windows: watermark-closed only, file sink",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_st02").toString
      val src = s.readStream
        .schema(eventsSchema)
        .parquet(s"$dir/*events*")
        .withColumn("event_ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) DIV 1000")))
        .withWatermark("event_ts", "2 hours")
      val agg = src
        .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(
          unix_millis(col("window.start")).as("window_ms"),
          col("event_type"), col("n"))
      val q = agg.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", s"$tmp/data")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        q.processAllAvailable()
      } finally {
        q.stop()
      }
      s.read.parquet(s"$tmp/data")
        .orderBy(col("window_ms"), col("event_type"))
    },
    Some("""WITH t AS (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, event_type FROM events),
      wm AS (SELECT MAX(ms) - 7200000 AS wm FROM t)
      SELECT ms - (ms % 3600000) AS window_ms, event_type, COUNT(*) AS n
      FROM t
      WHERE (ms - (ms % 3600000)) + 3600000 <= (SELECT wm FROM wm)
      GROUP BY 1, 2 ORDER BY window_ms, event_type"""))

  val all: Seq[QueryDef] = Seq(st01, st02)
}
