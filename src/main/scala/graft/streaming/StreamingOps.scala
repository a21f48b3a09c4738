package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.QueryDef

/** Structured Streaming surface. The reference is 100% batch (SURVEY §1.1
  * item 5); this is the streaming extension of the same event pipeline:
  * `readStream` → event-time transforms → sink. Each gate runs its query
  * synchronously over the parquet corpus with an AvailableNow trigger and
  * oracles against the *batch* SQL for the same semantics — stream/batch
  * parity. All append-mode gates (st02–st07) drain through the shared
  * parquet file-sink harness ([[runAppendToFiles]] — the production
  * shape); only the complete-mode gates use the memory sink, which that
  * mode requires and whose output those gates bound by construction
  * (st01: the window histogram; st08: the |sources|×|langs| key grid).
  *
  * At scale the same plans run continuously with watermarks bounding
  * state: `withWatermark("ts", "2 hours")` keeps only open windows in the
  * state store; the shuffle is (window, event_type)-keyed like the batch
  * groupBy.
  */
object StreamingOps {

  /** Per-gate sink descriptions captured from StreamingQueryProgress so
    * StreamingSpec can assert at RUNTIME (not by source inspection) that
    * every append-mode gate drains through the file sink, never the
    * driver-memory sink. Keyed by gate name — a single "most recent" slot
    * would let one gate's description overwrite another's under
    * concurrent suites, making the assertion flaky or vacuous.
    */
  private[streaming] val sinkDescriptions =
    new scala.collection.concurrent.TrieMap[String, String]

  /** All [[runAppendToFiles]] output lands under one per-JVM root that a
    * shutdown hook deletes recursively — the read-back is lazy, so the
    * dirs cannot be deleted inside the harness itself, but nothing
    * outlives the run (best-of-N Bench reps were leaving ~3x
    * corpus-proportional parquet + checkpoint dirs in /tmp per run).
    */
  private lazy val tmpRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_stream_run")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file._
      import java.util.Comparator
      try Files.walk(root).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      catch { case _: Throwable => () } // cleanup is best-effort at exit
    }))
    root
  }

  /** State-store partition count for a gate's streaming query: one per
    * ~64 MB of source bytes, CEILINGED by the session's configured
    * shuffle partitions (cluster sizing still governs at 100 TB) and
    * falling back to that ceiling when the source isn't a local
    * directory (production object stores). Stateful operators create one
    * state store per shuffle partition and pay per-microbatch
    * open/commit work on each, so dozens of near-empty stores dominate
    * wall time on small inputs — [[graft.graph.GraphAlgs.loopParts]]'s
    * sizing principle applied to streaming state. The width is captured
    * at query START and pinned in the checkpoint thereafter, which is
    * why the scope must cover start-to-drain, and why a per-gate fresh
    * checkpoint re-derives it per run.
    */
  private def streamParts(s: SparkSession, srcDir: String,
      table: String = "events"): Int = {
    val ceil = s.conf.get("spark.sql.shuffle.partitions").toInt
    try {
      val files = new java.io.File(srcDir).listFiles
      if (files == null) ceil
      else {
        def size(f: java.io.File): Long =
          if (f.isDirectory) Option(f.listFiles).map(_.map(size).sum).getOrElse(0L)
          else f.length
        val bytes = files.filter(_.getName.contains(table)).map(size).sum
        math.max(1, math.min(ceil.toLong, bytes / (64L << 20) + 1L).toInt)
      }
    } catch { case _: Throwable => ceil }
  }

  /** Run `f` (query start + drain) with shuffle partitions scoped to the
    * stream-state width for `srcDir`, restoring the session value after.
    * SERIALIZED on a lock: the read/set/restore touches a session-GLOBAL
    * conf key, so two concurrent gates interleaving would pin one gate's
    * width into the other's checkpoint and could leave the session at the
    * wrong width permanently after both restores ran out of order.
    */
  private val streamPartsLock = new Object
  private def withStreamParts[T](s: SparkSession, srcDir: String,
      table: String = "events")(f: => T): T = streamPartsLock.synchronized {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    val n = streamParts(s, srcDir, table).toString
    if (old == n) f
    else {
      s.conf.set(key, n)
      try f finally s.conf.set(key, old)
    }
  }

  /** The production sink shape shared by every append-mode gate
    * (st02–st06): parquet file sink + checkpoint dir = exactly-once,
    * restartable, executor-side output — state the stream's own size,
    * not the result's, bounds driver memory. (The memory sink retains
    * every batch in driver memory; it survives only in st01, whose
    * complete-mode output REQUIRES a driver-side table and is
    * vertex-histogram-sized by construction.) Results are read back
    * from the files with the plan's own schema, so a run that emits
    * zero rows still yields an empty, well-typed DataFrame. The query
    * starts and drains inside a [[withStreamParts]] scope sized to
    * `srcDir`.
    */
  private def runAppendToFiles(s: SparkSession, out: DataFrame,
                               name: String, srcDir: String,
                               table: String = "events"): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory(tmpRoot, name).toString
    withStreamParts(s, srcDir, table) {
      val q = out.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", s"$tmp/data")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        q.processAllAvailable()
        // Batch-parity guard: these gates oracle against the batch SQL,
        // which assumes NO row was late-dropped. One AvailableNow drain
        // over a static dir normally runs a single micro-batch (watermark
        // starts at -inf), but if the file source ever splits the corpus
        // into multiple batches with newer files first, the advanced
        // watermark silently drops the older rows and the oracle
        // mismatches in a way that looks like an operator bug. Fail LOUD
        // with the real cause instead. (Inside the try, not the finally:
        // a drain failure must surface as itself, not as this guard.)
        val dropped = q.recentProgress.iterator
          .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
        if (dropped > 0) {
          throw new IllegalStateException(
            s"$name: $dropped rows dropped by watermark across " +
              s"${q.recentProgress.length} micro-batches - the static corpus " +
              "did not drain in one batch, so the result diverges from the " +
              "batch oracle (raise maxFilesPerTrigger or coalesce the input)")
        }
      } finally {
        sinkDescriptions(name) =
          Option(q.lastProgress).map(_.sink.description).getOrElse("")
        q.stop()
      }
    }
    s.read.schema(out.schema).parquet(s"$tmp/data")
  }

  /** Streaming events source with `ts` normalized to an epoch-ns long.
    * The file-source schema must match the parquet physically, and the
    * generator has shipped both TIMESTAMP(NANOS) and timestamp[us] `ts`
    * columns across rounds — so peek the real footer schema via a batch
    * read (one footer, driver-side, O(1)) and apply the same
    * normalization the batch path uses ([[graft.Tables.normalizeEventTs]]).
    */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val fileSchema = graft.Tables.loadRaw(s, dir, "events").schema
    graft.Tables.normalizeEventTs(
      s.readStream
        .schema(fileSchema)
        .parquet(s"$dir/*events*")) // glob: stream file source requires a directory basePath
  }

  /** Tumbling 1-hour event-time window counts, computed by an actual
    * streaming query (memory sink), matching e02's batch semantics.
    */
  val st01 = QueryDef(
    "st01_stream_windows",
    "structured-streaming tumbling 1h window counts (memory sink)",
    (s, dir) => {
      val tableName = "st01_stream_out"
      val src = eventsStream(s, dir)
        .withColumn("event_ts", graft.Tables.eventTsAsTimestamp)
        .withWatermark("event_ts", "2 hours")
      val agg = src
        .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      withStreamParts(s, dir) {
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
      }
      s.table(tableName)
        .select(
          unix_millis(col("window.start")).as("window_ms"),
          col("event_type"), col("n"))
        .orderBy(col("window_ms"), col("event_type"))
    },
    Some("""SELECT ms - (((ms % 3600000) + 3600000) % 3600000) AS window_ms,
             event_type, COUNT(*) AS n
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
      val src = eventsStream(s, dir)
        .withColumn("event_ts", graft.Tables.eventTsAsTimestamp)
        .withWatermark("event_ts", "2 hours")
      val agg = src
        .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(
          unix_millis(col("window.start")).as("window_ms"),
          col("event_type"), col("n"))
      runAppendToFiles(s, agg, "st02", dir)
        .orderBy(col("window_ms"), col("event_type"))
    },
    Some("""WITH t AS (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, event_type FROM events),
      wm AS (SELECT MAX(ms) - 7200000 AS wm FROM t)
      SELECT ms - (((ms % 3600000) + 3600000) % 3600000) AS window_ms,
             event_type, COUNT(*) AS n
      FROM t
      WHERE (ms - (((ms % 3600000) + 3600000) % 3600000)) + 3600000
              <= (SELECT wm FROM wm)
      GROUP BY 1, 2 ORDER BY window_ms, event_type"""))

  /** Streaming deduplication with watermark-bounded state:
    * `dropDuplicatesWithinWatermark` keeps a key's dedup state only until
    * the watermark passes its event time + delay, so state is bounded by
    * the (horizon x key-arrival-rate), not by history — the only viable
    * dedup shape for an unbounded 100 TB/day stream (plain
    * `dropDuplicates` state grows forever). The gate projects just the
    * key columns so the emitted set is deterministic (first-seen row
    * choice is arrival-order-dependent; the key set is not).
    */
  val st03 = QueryDef(
    "st03_stream_dedup",
    "streaming dedup via dropDuplicatesWithinWatermark (bounded state)",
    (s, dir) => {
      val src = eventsStream(s, dir)
        .withColumn("event_ts", graft.Tables.eventTsAsTimestamp)
        .withWatermark("event_ts", "2 hours")
        .select(col("user_id"), col("event_type"), col("event_ts"))
        .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type"))
      // distinct: within-watermark dedup re-emits a key whose state was
      // purged >horizon ago, so if the source ever splits into multiple
      // micro-batches the sink may hold such re-emissions — the invariant
      // the oracle checks is the KEY SET, which distinct() pins without
      // depending on single-batch file listing
      runAppendToFiles(s, src, "st03", dir).distinct()
        .orderBy(col("user_id"), col("event_type"))
    },
    Some("""SELECT DISTINCT user_id, event_type FROM events
      ORDER BY user_id, event_type"""))

  /** Arbitrary-stateful sessionization: `flatMapGroupsWithState` with
    * event-time timeouts ([[StatefulSessions.sessionize]]). Gap-closed
    * sessions emit inline; each user's trailing open session emits when
    * the watermark (0s delay ⇒ max event time) passes its end + gap.
    * The oracle is batch gap-sessionization restricted to exactly those
    * closable sessions — stream/batch parity for custom state, the
    * companion gate to st02's windowed-aggregation parity.
    */
  val st04 = QueryDef(
    "st04_stream_sessions",
    "flatMapGroupsWithState sessionization with event-time timeout",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      import StatefulSessions._
      val src = eventsStream(s, dir)
        .withColumn("ms", graft.Tables.eventTsMs)
        .withColumn("event_ts", timestamp_millis(col("ms")))
        .withWatermark("event_ts", "0 seconds")
        .select(col("user_id"), col("event_id"), col("ms"), col("event_ts"))
      val sessions = src
        .as[SessEvent] // untyped select upstream keeps the watermark tag
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
          sessionize(1800000L))
      runAppendToFiles(s, sessions.toDF(), "st04", dir)
        .orderBy(col("user_id"), col("session_start"))
    },
    Some("""WITH e AS (SELECT user_id, event_id,
              epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
        l AS (SELECT user_id, ms, event_id,
                lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_ms
              FROM e),
        f AS (SELECT user_id, ms, event_id,
                CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS ns
              FROM l),
        g AS (SELECT user_id, ms,
                SUM(ns) OVER (PARTITION BY user_id ORDER BY ms, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
              FROM f),
        sess AS (SELECT user_id, sid, MIN(ms) AS session_start,
                   MAX(ms) AS session_end, COUNT(*) AS n_events
                 FROM g GROUP BY 1, 2),
        mx AS (SELECT MAX(ms) AS max_ms FROM e)
      SELECT user_id, session_start, session_end, n_events
      FROM sess, mx
      WHERE session_end + 1800000 < max_ms
      ORDER BY user_id, session_start"""))

  /** Watermarked stream-stream interval join — the remaining core
    * Structured Streaming shape after windows (st01/st02), dedup (st03)
    * and custom state (st04): clicks joined to same-user purchases that
    * land within the following hour. Both sides carry watermarks and the
    * join condition bounds event time on BOTH ends, which is exactly what
    * lets Spark evict join state (a click's state is droppable once the
    * purchase watermark passes click_ts + 1h) — without the time bound,
    * stream-stream join state grows forever and the plan is
    * un-runnable on an unbounded stream. Inner join + AvailableNow over
    * the finite corpus emits the complete match set, so the oracle is the
    * same interval join in batch SQL (ms-truncated event time on both
    * engines, the st04 convention).
    */
  val st05 = QueryDef(
    "st05_stream_stream_join",
    "watermarked stream-stream interval join (click -> purchase <= 1h)",
    (s, dir) => {
      def side(tpe: String, p: String): DataFrame = eventsStream(s, dir)
        .filter(col("event_type") === tpe)
        .withColumn(s"${p}_ts",
          timestamp_millis(graft.Tables.eventTsMs))
        .withWatermark(s"${p}_ts", "1 hour")
        .select(col("event_id").as(s"${p}_id"), col("user_id").as(s"${p}_user"),
          col(s"${p}_ts"))
      val j = side("click", "c").join(side("purchase", "p"),
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      val out = j.select(col("c_user").as("user_id"),
        col("c_id").as("click_id"), col("p_id").as("purchase_id"))
      runAppendToFiles(s, out, "st05", dir)
        .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
    },
    Some("""WITH e AS (SELECT event_id, user_id, event_type,
              epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
      c AS (SELECT event_id AS click_id, user_id, ms AS cms FROM e
            WHERE event_type = 'click'),
      p AS (SELECT event_id AS purchase_id, user_id, ms AS pms FROM e
            WHERE event_type = 'purchase')
      SELECT c.user_id AS user_id, click_id, purchase_id
      FROM c JOIN p ON c.user_id = p.user_id
        AND pms >= cms AND pms <= cms + 3600000
      ORDER BY 1, 2, 3"""))

  /** Stream-static enrichment join — the standard dimension-join shape
    * and the one core Structured Streaming pattern st01–st05 leave
    * uncovered. A stream-static equi-join is STATELESS: no watermark, no
    * state store — each micro-batch plans a fresh batch join of its rows
    * against the static side (which is re-resolved every batch, so a
    * changing dimension source is picked up between batches). The static
    * side here is a classic small dimension and rides a size-guarded
    * broadcast with the usual shuffle fallback above the contract: an
    * unconditional broadcast of a corpus-proportional "dimension" would
    * pay the ship-to-every-executor cost once per MICRO-BATCH, which is
    * the same OOM as batch but repeated indefinitely.
    */
  val st06 = QueryDef(
    "st06_stream_static_join",
    "stateless stream-static dimension join (purchases -> customer segment)",
    (s, dir) => {
      val src = eventsStream(s, dir)
        .filter(col("event_type") === "purchase")
      val dim = graft.Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val nDim = dim.count() // bounds the broadcast (dimension row count)
      val joined = src
        .join(graft.operators.DedupOps.broadcastIfUnder(dim, nDim),
          col("user_id") === col("c_custkey"))
        .select(col("event_id"), col("user_id"),
          col("c_mktsegment").as("segment"), col("value"))
      runAppendToFiles(s, joined, "st06", dir).orderBy(col("event_id"))
    },
    Some("""SELECT e.event_id, e.user_id, c.c_mktsegment AS segment, e.value
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      WHERE e.event_type = 'purchase'
      ORDER BY event_id"""))

  /** Streaming documents source — the curation pipeline's ingest shape
    * (the continuous-crawl case: new document files land, the filter
    * chain runs on arrival). Schema peeked from the parquet footer like
    * [[eventsStream]].
    */
  private def docsStream(s: SparkSession, dir: String): DataFrame = {
    val fileSchema = graft.Tables.loadRaw(s, dir, "documents").schema
    s.readStream.schema(fileSchema).parquet(s"$dir/*documents*")
  }

  /** st07: STATELESS streaming curation — the quality-filter stage of the
    * t04/t12 family run over `readStream` instead of `read`. Every metric
    * is row-local (HOFs over the token array: no explode, no state, no
    * watermark — the embarrassingly-streamable part of a curation
    * pipeline, which is exactly why it belongs in the streaming family's
    * coverage), and the keep rule drops short and short-token-heavy docs.
    * File sink + checkpoint = exactly-once restartable output; the oracle
    * is the identical batch predicate — stream/batch parity for the doc
    * pipeline.
    */
  val st07 = QueryDef(
    "st07_stream_curate",
    "stateless streaming curation filter (row-local HOF metrics, file sink)",
    (s, dir) => {
      // toks is lambda-BOUND (the st10 let-binding idiom): the keep-rule
      // filter below pushes past this projection by inlining it, and a
      // withColumn("toks", split(...)) chain re-tokenizes the text once
      // per toks reference (3 in the metrics + again per output column).
      // A stream has no cache to absorb that, so bind once.
      val m = element_at(transform(
        array(split(trim(col("text")), graft.Tok.Ws)), toks =>
          struct(size(toks).cast("bigint").as("n_tokens"),
            (size(filter(toks, x => length(x) < 4)).cast("double")
              / size(toks).cast("double")).as("short_frac"))), 1)
      val src = docsStream(s, dir)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), m.as("m"),
          length(trim(col("text"))).cast("bigint").as("n_chars"))
        .select(col("doc_id"), col("m.n_tokens").as("n_tokens"),
          col("n_chars"), col("m.short_frac").as("short_frac"))
        .filter(col("n_tokens") >= 30 && col("short_frac") < 0.8)
      runAppendToFiles(s, src, "st07", dir, table = "documents")
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (SELECT doc_id, trim(text) AS tx,
              string_split_regex(trim(text), '\s+') AS toks
            FROM documents WHERE length(trim(text)) > 0),
      m AS (SELECT doc_id,
              CAST(len(toks) AS BIGINT) AS n_tokens,
              CAST(length(tx) AS BIGINT) AS n_chars,
              CAST(len(list_filter(toks, x -> length(x) < 4)) AS DOUBLE)
                / len(toks) AS short_frac
            FROM t)
      SELECT doc_id, n_tokens, n_chars, short_frac FROM m
      WHERE n_tokens >= 30 AND short_frac < 0.8 ORDER BY doc_id"""))

  /** st08: per-source corpus accounting as a running streaming aggregate
    * (complete-mode memory sink, the st01 harness shape) — the live
    * datasheet a continuous ingest keeps: docs and token mass per
    * (source, lang). Key space is |sources|×|langs| (tiny, bounded), so
    * complete mode is safe here; the append/watermark variant of this
    * family is st02's covered territory.
    */
  val st08 = QueryDef(
    "st08_stream_source_totals",
    "streaming running per-(source,lang) doc/token totals (complete mode)",
    (s, dir) => {
      val tableName = "st08_stream_out"
      val agg = docsStream(s, dir)
        .filter(length(trim(col("text"))) > 0)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(trim(col("text")), graft.Tok.Ws)).cast("bigint"))
            .as("n_tokens"))
      withStreamParts(s, dir, table = "documents") {
        val q = agg.writeStream
          .outputMode("complete")
          .format("memory")
          .queryName(tableName)
          .trigger(Trigger.AvailableNow())
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(tableName)
        .select(col("source"), col("lang"), col("n_docs").cast("bigint"),
          col("n_tokens").cast("bigint"))
        .orderBy(col("source"), col("lang"))
    },
    Some("""SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
      FROM documents WHERE length(trim(text)) > 0
      GROUP BY 1, 2 ORDER BY source, lang"""))

  /** st09: CONTINUOUS-INGEST dedup — d08's batch-vs-corpus admit run as a
    * stream, in the production pattern for curation against mutable
    * corpus state: `foreachBatch`. The corpus-side index (shingle
    * arrays; bands derive from them as narrow column functions) is
    * STATIC, computed once and cached across every micro-batch — exactly
    * the precomputed (doc_id, band, sig) index the d08 doc names for
    * scale. Each micro-batch runs the full batch admit plan (band
    * equi-join candidates → candidate-driven exact-Jaccard verify →
    * left-anti) of its docs against that index and writes the admitted
    * ids to a parquet dir KEYED BY BATCH ID with overwrite — a retried
    * batch rewrites its own dir, which is the idempotence recipe that
    * makes foreachBatch file output exactly-once. No watermark and no
    * state store: admit depends only on the static side, so the result
    * is micro-batch-partitioning INVARIANT (the spec pins a forced
    * two-batch split), and d08's batch oracle applies verbatim however
    * the file source slices the stream.
    */
  val st09 = QueryDef(
    "st09_stream_ingest_dedup",
    "foreachBatch continuous-ingest dedup vs a static corpus LSH index",
    (s, dir) => {
      import graft.operators.DedupOps
      // band signatures analyze against the session OWNING each frame:
      // the corpus index against `s`, the batch side against the
      // micro-batch CLONE — register the expression family in both
      graft.functions.GraftFunctions.register(s)
      val docsAll = graft.Tables.load(s, dir, "documents")
      val isNew = pmod(col("doc_id"), lit(3)) === 0
      val oldArr = DedupOps.shingleArrs(docsAll.filter(!isNew)).cache()
      oldArr.count() // one corpus-index build, reused by every micro-batch
      // the (doc_id, band, sig) index is ALSO cached: band signatures are
      // a corpus-sized minhash projection, and deriving them from oldArr
      // inside the admit plan would replay that projection every
      // micro-batch — the precomputed-index contract the d08 doc names.
      // CAPPED per (band, sig) bucket (the admitNewAgainstOld oldBandsPre
      // contract): the degenerate-bucket guard is part of the index, so
      // it is paid once here, never per micro-batch.
      val oldBands = DedupOps.capBands(DedupOps.bandsFromArrs(oldArr)).cache()
      oldBands.count()
      try {
        val tmp = java.nio.file.Files.createTempDirectory(tmpRoot, "st09")
        val out = s"$tmp/data"
        val src = docsStream(s, dir).filter(isNew)
        withStreamParts(s, dir, table = "documents") {
          val q = src.writeStream
            .foreachBatch { (batch: DataFrame, batchId: Long) =>
              // the micro-batch frame belongs to a CLONED session with its
              // own function registry — register the codegen'd expression
              // family there or minhash_sig fails to resolve (idempotent)
              graft.functions.GraftFunctions.register(batch.sparkSession)
              val nNew = batch.count()
              DedupOps.admitNewAgainstOld(
                  batch.select(col("doc_id")).distinct(), nNew,
                  DedupOps.shingleArrs(batch), oldArr,
                  oldBandsPre = Some(oldBands))
                .select(col("doc_id"))
                .write.mode("overwrite").parquet(s"$out/batch=$batchId")
              ()
            }
            .option("checkpointLocation", s"$tmp/chk")
            .trigger(Trigger.AvailableNow())
            .start()
          try q.processAllAvailable()
          finally {
            sinkDescriptions("st09") =
              Option(q.lastProgress).map(_.sink.description).getOrElse("")
            q.stop()
          }
        }
        if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(out)))
          s.range(0).select(col("id").as("doc_id")) // empty stream: no batch ran
        else
          s.read.parquet(out).select(col("doc_id")).orderBy(col("doc_id"))
      } finally {
        oldBands.unpersist(blocking = false)
        oldArr.unpersist(blocking = false)
      }
    },
    graft.operators.DedupOps.d08.oracle)

  /** STREAMING DECONTAMINATION (the st10/st11 shared core) — the d05/d07
    * benchmark guard run on the ingest stream, in the production shape:
    * every arriving document is admitted iff it shares NO 3-shingle with
    * the static held-out benchmark set (`benchDocs`; st10 passes the
    * whole reserved `% 97 == 0` pool, st11 a FIXED 64-doc slice of it).
    * Two stateless stages, no watermark, no state store:
    *
    *  1. a broadcast BLOOM prefilter ([[graft.functions.BloomMightContain]],
    *     codegen'd) runs as a `filter()` HOF over the doc's own shingle
    *     array — a narrow map that clears ~all clean docs without any
    *     join (a doc too short to shingle admits trivially), and leaves
    *     each suspect carrying ONLY its Bloom-positive shingles: a true
    *     overlap can never fail the Bloom (no false negatives), so the
    *     exact verify needs nothing else, and the per-pair work below is
    *     bounded by the suspect's MATCHING shingles, not its text length;
    *  2. the surviving suspects (Bloom false positives + real hits, a
    *     match-bounded trickle) are exact-verified by a stream-static
    *     LEFT ANTI join on `arrays_overlap` against the broadcast bench
    *     arrays — the join mode the streaming family didn't cover yet
    *     (st06 is stream-static INNER). The anti side is batch/static,
    *     so the join is stateless and append-safe.
    *
    * Exact verify removes Bloom false positives, so the admit set — and
    * the batch DuckDB oracle — is FP-independent and micro-batch-
    * partitioning invariant. At 100 TB the bench side is an eval suite
    * (KBs–MBs, the d05 size contract, broadcast only under
    * [[graft.operators.DedupOps.broadcastIfUnder]]'s limit) while the
    * corpus streams through map-side work: no corpus-sized shuffle
    * anywhere.
    */
  private def decontamAgainst(s: SparkSession, dir: String,
      benchDocs: DataFrame, gate: String): DataFrame = {
      import graft.operators.DedupOps
      graft.functions.GraftFunctions.register(s)
      val benchArr = DedupOps.shingleArrs(benchDocs)
        .select(col("doc_id").as("bench_id"), col("shArr").as("benchArr"))
        .cache()
      val nBenchDocs = benchArr.count() // cache fill + size contract probe
      try {
        val benchSh = benchArr.select(explode(col("benchArr")).as("sh")).distinct()
        val bfBytes = {
          val bf = benchSh.select(xxhash64(col("sh")).as("h"))
            .stat.bloomFilter("h", math.max(benchSh.count(), 1L), 0.01)
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          bos.toByteArray
        }
        // The shingle build is the codegen'd shingle_arr expression — one
        // compiled pass per row. That ALSO disarms the predicate-inlining
        // hazard this gate once measured at 5.5x: the size(shPos)
        // predicates below push down past this projection by inlining the
        // expression, and an HOF chain (withColumn toks + transform with
        // toks[i] element accesses) re-tokenized the text once per
        // shingle ELEMENT when substituted; a single compiled call just
        // evaluates twice per row at worst. A stream has no cache to hide
        // the build behind, which is why the batch gates never saw this.
        // coalesce: null text must admit trivially like a short doc (the
        // expression is null-on-null by SQL convention).
        val shPosCol = filter(
          coalesce(graft.functions.GraftFunctions.shingleArr(col("text"), 3),
            array().cast("array<string>")),
          x => graft.functions.GraftFunctions.bloomMightContain(
            xxhash64(x), bfBytes))
        val src = docsStream(s, dir)
          .filter(pmod(col("doc_id"), lit(97)) =!= 0)
          .select(col("doc_id"), shPosCol.as("shPos"))
        val clean = src.filter(size(col("shPos")) === 0).select(col("doc_id"))
        val verified = src.filter(size(col("shPos")) > 0)
          .join(DedupOps.broadcastIfUnder(benchArr, nBenchDocs),
            arrays_overlap(col("shPos"), col("benchArr")), "left_anti")
          .select(col("doc_id"))
        runAppendToFiles(s, clean.union(verified), gate, dir,
            table = "documents")
          .orderBy(col("doc_id"))
      } finally benchArr.unpersist(blocking = false)
  }

  val st10 = QueryDef(
    "st10_stream_decontam",
    "streaming decontamination: Bloom prefilter + stream-static anti verify",
    (s, dir) => decontamAgainst(s, dir,
      graft.Tables.load(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(97)) === 0), "st10"),
    Some(s"""WITH ${graft.operators.DedupOps.shingleSqlFrom("documents")},
      bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
      hit AS (SELECT DISTINCT doc_id FROM sh
              WHERE doc_id % 97 <> 0 AND sh IN (SELECT sh FROM bench))
      SELECT doc_id FROM documents
      WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM hit)
      ORDER BY doc_id"""))

  /** st11: st10 re-cut to the PRODUCTION contract (r11 VERDICT item 4 —
    * "kill the st10 asterisk"): the benchmark side is a FIXED 64-doc
    * slice of the reserved pool (lowest doc_ids of `% 97 == 0` — a
    * TakeOrderedAndProject, never a corpus sort), so it does NOT grow
    * with the corpus. st10's bench side is a constant FRACTION of the
    * corpus, which makes its gate-form scale readings measure a bench
    * that grows 10× under a 10× corpus — a synthetic artifact three
    * rounds of evidence had to asterisk. Here the 10× gate-form reading
    * is directly interpretable: fixed eval suite, stream grows, cost
    * tracks the stream linearly.
    */
  val st11 = QueryDef(
    "st11_stream_decontam_fixed",
    "streaming decontamination against a FIXED 64-doc benchmark slice",
    (s, dir) => decontamAgainst(s, dir,
      graft.Tables.load(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(97)) === 0)
        .orderBy(col("doc_id")).limit(64), "st11"),
    Some(s"""WITH ${graft.operators.DedupOps.shingleSqlFrom("documents")},
      benchdocs AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 0
                    ORDER BY doc_id LIMIT 64),
      bench AS (SELECT DISTINCT sh FROM sh
                WHERE doc_id IN (SELECT doc_id FROM benchdocs)),
      hit AS (SELECT DISTINCT doc_id FROM sh
              WHERE doc_id % 97 <> 0 AND sh IN (SELECT sh FROM bench))
      SELECT doc_id FROM documents
      WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM hit)
      ORDER BY doc_id"""))

  val all: Seq[QueryDef] =
    Seq(st01, st02, st03, st04, st05, st06, st07, st08, st09, st10, st11)
}
