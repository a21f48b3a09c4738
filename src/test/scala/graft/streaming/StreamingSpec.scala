package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Append-mode streaming semantics (st02): the file sink receives exactly
  * the watermark-closed windows — window.end <= max_event_time - delay —
  * and their counts match the batch aggregation (stream/batch parity on
  * the closed set). The complete-mode gate st01 is oracle-verified by the
  * driver; this pins the eviction boundary st02's oracle encodes.
  */
class StreamingSpec extends AnyFunSuite with graft.SparkTestSession {
  import spark.implicits._

  test("st02: append emits exactly the closed windows, counts batch-exact") {
    val base = Files.createTempDirectory("graft_st_spec").toString
    // 2 events in hour h for h=0..9 (ts in ns); watermark 2h => max=9h,
    // wm=7h, closed windows end<=7h are hours 0..6
    val rows = for (h <- 0 until 10; i <- 0 until 2)
      yield (h.toLong * 10 + i, h * 3600000000000L + i * 1000000000L, 7L, "a", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/events.parquet")

    val got = StreamingOps.st02.run(spark, base).collect()
      .map(r => (r.getLong(0) / 3600000, r.getString(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == (0L to 6L), got.mkString(","))
    assert(got.forall { case (_, t, n) => t == "a" && n == 2L })
  }
}
