package graft.tools

import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.SparkEntry

/** Dev-only phase breakdown for the streaming gates (r17 VERDICT Next
  * #7): the r17 round left st01–st11 alone on the claim that their cost
  * is micro-batch MACHINERY (checkpoint setup, offset/commit logs, state
  * store bookkeeping), not query execution — a claim asserted from plan
  * shape, never measured. This probe attaches a
  * [[StreamingQueryListener]] to the real gate bodies (no replication —
  * whatever the gate starts, the listener sees) and splits each
  * invocation's wall time into:
  *
  *   - `pre_start_sec`: gate entry → first query-start event (session
  *     prep, source schema peek, checkpoint dir creation, plan analysis;
  *     for st09 also the corpus index build);
  *   - `add_batch_sec`: Σ durationMs("addBatch") — the actual micro-batch
  *     query execution;
  *   - `machinery_sec`: Σ (triggerExecution − addBatch) + the
  *     offset/commit log writes (walCommit + commitOffsets + getBatch +
  *     latestOffset + queryPlanning are its named parts);
  *   - `state_commit_sec`: Σ stateOperators.commitTimeMs;
  *   - `post_drain_sec`: everything after the last progress event
  *     (stop, file-sink read-back, the gate's final count()).
  *
  * Usage: runMain graft.tools.StreamPhaseProbe [outDir] [gate1,gate2,...]
  * Writes one JSON line per (gate, rep) to `<outDir>/stream_phase_probe.json`.
  */
object StreamPhaseProbe {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r18")
    val gates = args.lift(1).getOrElse("st05_stream_stream_join,st09_stream_ingest_dedup")
      .split(',').toSeq.filter(_.nonEmpty)
    val reps = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = ToolSession.local(defaultCpus = "8", shuffleFromCpus = true)

    final case class Ev(kind: String, atNanos: Long,
        durationMs: Map[String, Long], stateCommitMs: Long, batchId: Long)
    val events = ArrayBuffer[Ev]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        events.synchronized {
          events += Ev("start", System.nanoTime(), Map.empty, 0L, -1L)
        }
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        events.synchronized {
          val dm = {
            val m = e.progress.durationMs
            val it = m.keySet().iterator()
            val b = Map.newBuilder[String, Long]
            while (it.hasNext) { val k = it.next(); b += k -> m.get(k).longValue() }
            b.result()
          }
          val st = e.progress.stateOperators.map(_.commitTimeMs).sum
          events += Ev("progress", System.nanoTime(), dm, st, e.progress.batchId)
        }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        events.synchronized {
          events += Ev("stop", System.nanoTime(), Map.empty, 0L, -1L)
        }
    }
    spark.streams.addListener(listener)

    Files.createDirectories(Paths.get(outDir))
    val out = new StringBuilder
    gates.foreach { g =>
      val fn = SparkEntry.queries(g)
      (1 to reps).foreach { rep =>
        events.synchronized(events.clear())
        spark.sparkContext.setJobDescription(s"phase-probe $g rep $rep")
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t1 = System.nanoTime()
        val evs = events.synchronized(events.toList)
        val total = (t1 - t0) / 1e9
        val firstStart = evs.find(_.kind == "start").map(_.atNanos).getOrElse(t1)
        val lastProgress = evs.filter(_.kind == "progress")
          .map(_.atNanos).maxOption.getOrElse(firstStart)
        val prog = evs.filter(_.kind == "progress")
        def sumKey(k: String): Double = prog.map(_.durationMs.getOrElse(k, 0L)).sum / 1e3
        val addBatch = sumKey("addBatch")
        val trigger = sumKey("triggerExecution")
        val json =
          s"""{"gate":"$g","rep":$rep,"total_sec":${f"$total%.3f"},""" +
          s""""pre_start_sec":${f"${(firstStart - t0) / 1e9}%.3f"},""" +
          s""""n_batches":${prog.count(_.batchId >= 0)},""" +
          s""""add_batch_sec":${f"$addBatch%.3f"},""" +
          s""""trigger_exec_sec":${f"$trigger%.3f"},""" +
          s""""machinery_sec":${f"${math.max(0.0, trigger - addBatch)}%.3f"},""" +
          s""""wal_commit_sec":${f"${sumKey("walCommit")}%.3f"},""" +
          s""""commit_offsets_sec":${f"${sumKey("commitOffsets")}%.3f"},""" +
          s""""query_planning_sec":${f"${sumKey("queryPlanning")}%.3f"},""" +
          s""""state_commit_sec":${f"${prog.map(_.stateCommitMs).sum / 1e3}%.3f"},""" +
          s""""post_drain_sec":${f"${math.max(0.0, (t1 - lastProgress) / 1e9)}%.3f"}}"""
        println(json)
        out.append(json).append('\n')
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.streams.active.foreach(q =>
          try q.stop() catch { case _: Throwable => () })
      }
    }
    Files.writeString(Paths.get(outDir, "stream_phase_probe.json"), out.toString)
    spark.stop()
  }
}
