package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Append-mode streaming semantics (st02): the file sink receives exactly
  * the watermark-closed windows — window.end <= max_event_time - delay —
  * and their counts match the batch aggregation (stream/batch parity on
  * the closed set). The complete-mode gate st01 is oracle-verified by the
  * driver; this pins the eviction boundary st02's oracle encodes.
  *
  * The production-sink tests pin that every append-mode gate (st02–st06)
  * drains through the parquet FILE sink at runtime — the memory sink
  * retains all batches in driver memory, which is the wrong shape for a
  * corpus-proportional output at 100 TB, so its reappearance anywhere but
  * st01's complete mode is a regression.
  */
class StreamingSpec extends AnyFunSuite with graft.SparkTestSession {
  import spark.implicits._

  // 2 events in hour h for h=0..9 (ts in ns); watermark 2h => max=9h,
  // wm=7h, closed windows end<=7h are hours 0..6. user_id spread over 3
  // users and event types alternate click/purchase so st03/st05 also
  // produce rows on the same fixture. Events sit at h:00:01/h:00:02, NOT
  // h:00:00 — a row whose event time is exactly epoch 0 equals the
  // query's INITIAL watermark and Spark's late-row filter (ts <= wm)
  // silently drops it from stream-stream join input.
  private lazy val base: String = {
    val dir = Files.createTempDirectory("graft_st_spec").toString
    val rows = for (h <- 0 until 10; i <- 0 until 2)
      yield (h.toLong * 10 + i, h * 3600000000000L + (i + 1) * 1000000000L,
        (h % 3).toLong, if (i == 0) "click" else "purchase", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // customer dimension for the st06 stream-static join (users 0..2 plus
    // an unreferenced key proving the join filters, not decorates)
    Seq((0L, "c0", 0, 0.0, "SEG_A"), (1L, "c1", 0, 0.0, "SEG_B"),
        (2L, "c2", 0, 0.0, "SEG_A"), (99L, "c99", 0, 0.0, "SEG_Z"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // documents for the doc-stream gates: 0 passes st07's keep rule
    // (31 long tokens), 1 fails on length (5 tokens), 2 fails on
    // short_frac (30 one-char tokens -> 1.0), 3 is blank
    Seq(
      (0L, Seq.fill(31)("longword").mkString(" "), "en", "sA", 0L),
      (1L, "tiny doc of five tokens", "en", "sA", 0L),
      (2L, Seq.fill(30)("a").mkString(" "), "de", "sB", 0L),
      (3L, "   ", "de", "sB", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("st02: append emits exactly the closed windows, counts batch-exact") {
    val got = StreamingOps.st02.run(spark, base).collect()
      .map(r => (r.getLong(0) / 3600000, r.getString(1), r.getLong(2)))
    assert(got.map(_._1).distinct.sorted.toSeq == (0L to 6L), got.mkString(","))
    assert(got.forall { case (_, t, n) => (t == "click" || t == "purchase") && n == 1L })
    assert(StreamingOps.sinkDescriptions.get("st02").exists(_.contains("FileSink")),
      s"st02 sink was '${StreamingOps.sinkDescriptions.get("st02")}', expected a file sink")
  }

  test("st03: streaming dedup emits the distinct key set via the file sink") {
    val got = StreamingOps.st03.run(spark, base).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // 3 users x {click, purchase}, all keys occur
    assert(got == (0L to 2L).flatMap(u => Seq((u, "click"), (u, "purchase"))).toSet)
    assert(StreamingOps.sinkDescriptions.get("st03").exists(_.contains("FileSink")),
      s"st03 sink was '${StreamingOps.sinkDescriptions.get("st03")}', expected a file sink")
  }

  test("st04: stateful sessions drain through the file sink") {
    val got = StreamingOps.st04.run(spark, base).collect()
    assert(got.nonEmpty)
    assert(StreamingOps.sinkDescriptions.get("st04").exists(_.contains("FileSink")),
      s"st04 sink was '${StreamingOps.sinkDescriptions.get("st04")}', expected a file sink")
  }

  test("st06: stream-static join enriches purchases with the dimension, file sink") {
    val got = StreamingOps.st06.run(spark, base).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // purchases are event_id h*10+1 for h=0..9, user h%3; segment comes
    // from the customer fixture (0->SEG_A, 1->SEG_B, 2->SEG_A); the
    // unreferenced dim key 99 must not appear (inner join, not decorate)
    val seg = Map(0L -> "SEG_A", 1L -> "SEG_B", 2L -> "SEG_A")
    val expected = (0 until 10)
      .map(h => (h.toLong * 10 + 1, (h % 3).toLong, seg((h % 3).toLong))).toSet
    assert(got == expected, s"got=$got")
    assert(StreamingOps.sinkDescriptions.get("st06").exists(_.contains("FileSink")),
      s"st06 sink was '${StreamingOps.sinkDescriptions.get("st06")}', expected a file sink")
  }

  test("st05: stream-stream interval join matches batch and uses the file sink") {
    val got = StreamingOps.st05.run(spark, base).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch truth: same-user purchases within [click_ts, click_ts + 1h];
    // each hour h has click (h*10) at h:00:01 and purchase (h*10+1) at
    // h:00:02 for user h%3 (the i+1 shift keeps events off the epoch-0
    // initial watermark) — the only in-window same-user purchase is the
    // same hour's: the NEXT hour's purchase at (h+1):00:02 is 1s past
    // the click+1h bound, and its user rotates to (h+1)%3 anyway
    val expected = (0 until 10).map(h => ((h % 3).toLong, h.toLong * 10, h.toLong * 10 + 1)).toSet
    assert(got == expected, s"got=$got")
    assert(StreamingOps.sinkDescriptions.get("st05").exists(_.contains("FileSink")),
      s"st05 sink was '${StreamingOps.sinkDescriptions.get("st05")}', expected a file sink")
  }

  test("st07: stateless streaming curation keeps exactly the batch-rule set") {
    val got = StreamingOps.st07.run(spark, base).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toList
    // only doc 0 passes: 31 tokens, all >= 4 chars -> short_frac 0.0
    assert(got == List((0L, 31L, 0.0)), s"got=$got")
    assert(StreamingOps.sinkDescriptions.get("st07").exists(_.contains("FileSink")),
      s"st07 sink was '${StreamingOps.sinkDescriptions.get("st07")}', expected a file sink")
  }

  test("st08: running per-(source,lang) totals match the batch aggregate") {
    val got = StreamingOps.st08.run(spark, base).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // blank doc 3 excluded; (sA,en): docs 0+1 = 31+5 tokens; (sB,de): doc 2
    assert(got == Set(("sA", "en", 2L, 36L), ("sB", "de", 1L, 30L)), s"got=$got")
  }

  // own dir: the shared `base` docs have no near-dup pair to exercise a drop
  private lazy val st09dir: String = {
    val dir = Files.createTempDirectory("graft_st09_spec").toString
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (0L, dup, "en", "s", 0L), // new (id%3==0), exact dup of old 1: dropped
      (1L, dup, "en", "s", 0L), // old corpus copy
      (3L, "completely different words entirely fresh content here",
        "en", "s", 0L),         // new, unique: admitted
      (2L, "other old corpus text goes here", "en", "s", 0L), // old
      (6L, "   ", "en", "s", 0L) // new, blank (no shingles): admits trivially
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("st09: foreachBatch ingest dedup admits exactly the d08 batch relation") {
    val got = StreamingOps.st09.run(spark, st09dir).collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 6L), s"got=$got")
    // the production sink here IS foreachBatch (state lives in the corpus
    // index, the per-batch write is overwrite-by-batch-id idempotent)
    assert(StreamingOps.sinkDescriptions.get("st09")
        .exists(_.contains("ForeachBatchSink")),
      s"st09 sink was '${StreamingOps.sinkDescriptions.get("st09")}'")
    // stream/batch parity: the batch gate on the same dir agrees
    val batch = graft.operators.DedupOps.d08.run(spark, st09dir).collect()
      .map(_.getLong(0)).toSeq
    assert(got == batch, s"stream=$got batch=$batch")
  }

  test("st09 invariance: micro-batch splits cannot change the admit set") {
    import graft.operators.DedupOps
    // admit depends only on the static corpus side, so the union of
    // per-batch admits over ANY partition of the incoming docs equals the
    // one-shot admit — the property that lets the d08 batch oracle gate a
    // stream however the file source slices it into micro-batches.
    val docs = spark.read.parquet(s"$st09dir/documents.parquet")
    val isNew = pmod(col("doc_id"), lit(3)) === 0
    val oldArr = DedupOps.shingleArrs(docs.filter(!isNew))
    def admit(nd: org.apache.spark.sql.DataFrame): Set[Long] =
      DedupOps.admitNewAgainstOld(nd.select(col("doc_id")).distinct(),
          nd.count(), DedupOps.shingleArrs(nd), oldArr)
        .collect().map(_.getLong(0)).toSet
    val newDocs = docs.filter(isNew)
    val oneShot = admit(newDocs)
    val split = admit(newDocs.filter(col("doc_id") < 3)) ++
      admit(newDocs.filter(col("doc_id") >= 3))
    assert(split == oneShot, s"split=$split oneShot=$oneShot")
    assert(oneShot == Set(3L, 6L))
  }

  test("st10: streaming decontam admits exactly the clean corpus docs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_st10_spec").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon", "en", "s", 0L), // bench (0%97==0)
      (1L, "prefix words then beta gamma delta inside", "en", "s", 0L), // hit: dropped
      (2L, "totally clean corpus content with many safe words", "en", "s", 0L),
      (3L, "one two", "en", "s", 0L),  // < 3 tokens: admits trivially
      (4L, "   ", "en", "s", 0L)       // blank: admits trivially
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = StreamingOps.st10.run(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 3L, 4L), s"got=$got")
    // append-mode production sink: files, never driver memory
    assert(StreamingOps.sinkDescriptions.get("st10").exists(_.contains("FileSink")),
      s"st10 sink was '${StreamingOps.sinkDescriptions.get("st10")}'")
  }

  test("st11: decontam bench is the FIXED 64-doc slice, not the whole pool") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_st11_spec").toString
    // 66 reserved-pool docs (doc_id % 97 == 0): the fixed bench is the 64
    // LOWEST — pool docs 64 and 65 are OUTSIDE the benchmark. Each pool
    // doc carries one unique 3-shingle.
    val pool = (0 until 66).map { i =>
      (i * 97L, s"pool${i}a pool${i}b pool${i}c", "en", "s", 0L)
    }
    val stream = Seq(
      (1L, "xx pool0a pool0b pool0c yy", "en", "s", 0L),   // hits in-slice doc 0
      (2L, "totally clean corpus content here", "en", "s", 0L),
      (3L, "xx pool65a pool65b pool65c yy", "en", "s", 0L)) // hits OUT-of-slice doc 65
    (pool ++ stream).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // st11: only the fixed slice decontaminates — doc 3's contamination
    // source is outside the benchmark, so it is ADMITTED
    val got11 = StreamingOps.st11.run(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(got11 == Seq(2L, 3L), s"st11 got=$got11")
    // st10 on the same fixture: the whole pool is the bench, doc 3 drops —
    // the semantic difference the fixed-slice re-cut exists to pin
    val got10 = StreamingOps.st10.run(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(got10 == Seq(2L), s"st10 got=$got10")
    assert(StreamingOps.sinkDescriptions.get("st11").exists(_.contains("FileSink")),
      s"st11 sink was '${StreamingOps.sinkDescriptions.get("st11")}'")
  }
}
