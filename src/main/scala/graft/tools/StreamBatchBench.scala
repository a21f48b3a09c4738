package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.operators.DedupOps

/** Per-MICRO-BATCH cost rehearsal for the continuous-ingest gates (r10
  * VERDICT item 7): st09/st10's scale claim is that a micro-batch costs
  * O(|batch|) against the once-built static sides (corpus LSH index /
  * benchmark Bloom+arrays), not O(corpus). The gate-form rehearsals
  * can't show that — AvailableNow over a static dir drains in ONE batch
  * — so this driver splits a batch stream into `nFiles` single-file
  * micro-batches (maxFilesPerTrigger=1) and times each batch
  * individually, with the STATIC side built from either the base corpus
  * or an N× corpus (SPARK_GRAFT_INDEX_SF_DIR), holding the batch stream
  * fixed. Flat per-batch timings across batches = no state accumulates;
  * similar timings under the 1× and 10× static side = the per-batch cost
  * is bounded by the batch, with the index contributing only its
  * (embarrassingly parallel) map-side probe scan.
  *
  * st10's benchmark side is held at the BASE-scale %97 slice regardless
  * of the corpus dir — the d05 fixed-eval-suite contract (the r10
  * fixed-bench rehearsal's framing).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<batch-stream dir> \
  *        SPARK_GRAFT_INDEX_SF_DIR=<static-side dir> \
  *        runMain graft.tools.StreamBatchBench [nFiles]
  */
object StreamBatchBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(8)
    val batchDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val indexDir = sys.env.getOrElse("SPARK_GRAFT_INDEX_SF_DIR", batchDir)
    val spark = ToolSession.local()
    graft.functions.GraftFunctions.register(spark)

    // split the BATCH stream into nFiles files → nFiles micro-batches
    val split = java.nio.file.Files.createTempDirectory("graft_sbb").toString
    Tables.load(spark, batchDir, "documents").repartition(nFiles)
      .write.mode("overwrite").parquet(s"$split/documents.parquet")
    val schema = spark.read.parquet(s"$split/documents.parquet").schema
    def src(): DataFrame = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$split/*documents*")

    // ---------------------------------------------------------- st09
    val idxDocs = Tables.load(spark, indexDir, "documents")
    val isNew = pmod(col("doc_id"), lit(3)) === 0
    val oldArr = DedupOps.shingleArrs(idxDocs.filter(!isNew)).cache()
    val nIdx = oldArr.count()
    val oldBands = DedupOps.capBands(DedupOps.bandsFromArrs(oldArr)).cache()
    oldBands.count()
    println(s"[sbb] st09 static index: $nIdx docs from $indexDir")
    val times = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val chk1 = java.nio.file.Files.createTempDirectory("graft_sbb_chk1").toString
    val q1 = src().filter(isNew).writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.functions.GraftFunctions.register(batch.sparkSession)
        val t0 = System.nanoTime()
        val nNew = batch.count()
        val admitted = DedupOps.admitNewAgainstOld(
          batch.select(col("doc_id")).distinct(), nNew,
          DedupOps.shingleArrs(batch), oldArr,
          oldBandsPre = Some(oldBands)).count()
        times += ((id, nNew, (System.nanoTime() - t0) / 1e9))
        println(f"[sbb] st09 batch $id%2d: $nNew%6d in, $admitted%6d admitted, ${(System.nanoTime() - t0) / 1e9}%.2f s")
        ()
      }
      .option("checkpointLocation", chk1)
      .trigger(Trigger.AvailableNow()).start()
    q1.processAllAvailable(); q1.stop()
    val tail1 = times.drop(1).map(_._3) // batch 0 carries JIT/codegen warmup
    println(f"[sbb] st09 per-batch sec (post-warmup): min ${tail1.min}%.2f, max ${tail1.max}%.2f over ${tail1.size} batches of ~${times.map(_._2).max} docs")

    // ------------------------------------------ st09 HOSTILE micro-batch
    // The identical-doc flood arriving IN one micro-batch (r12 VERDICT
    // item 6): batch-side skew cannot blow the admit plan up by design —
    // the batch joins only the CORPUS index, whose (band, sig) buckets
    // are capped, so a 50%-identical batch contributes ≤ |hot docs| ×
    // bandBucketCap × nBands candidate rows, linear in the batch. This
    // leg measures that claim: two equal-size micro-batches against the
    // SAME static index, one healthy, one with 50% of its texts replaced
    // by the SkewData identical passage (the byte-mass that collides
    // with the index's degenerate bucket when the index dir is a
    // SkewData corpus). Flat hostile-vs-healthy timing = the guard holds
    // on the stream side too.
    val hostSplit = java.nio.file.Files
      .createTempDirectory("graft_sbb_host").toString
    val batchDocs = Tables.load(spark, batchDir, "documents")
      .filter(isNew).cache()
    val nBatch = batchDocs.count()
    batchDocs.repartition(1)
      .write.mode("overwrite").parquet(s"$hostSplit/f0_healthy.parquet")
    Thread.sleep(1100) // file mtime orders the micro-batches
    batchDocs.withColumn("text",
        when(pmod(col("doc_id"), lit(2)) === 0, lit(SkewData.identicalPassage))
          .otherwise(col("text")))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$hostSplit/f1_hostile.parquet")
    batchDocs.unpersist(blocking = false)
    val hostTimes = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val chkH = java.nio.file.Files.createTempDirectory("graft_sbb_chkh").toString
    val qh = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$hostSplit/f*.parquet")
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.functions.GraftFunctions.register(batch.sparkSession)
        val t0 = System.nanoTime()
        val nNew = batch.count()
        val admitted = DedupOps.admitNewAgainstOld(
          batch.select(col("doc_id")).distinct(), nNew,
          DedupOps.shingleArrs(batch), oldArr,
          oldBandsPre = Some(oldBands)).count()
        hostTimes += ((id, nNew, admitted, (System.nanoTime() - t0) / 1e9))
        println(f"[sbb] hostile-leg batch $id%2d: $nNew%6d in, $admitted%6d admitted, ${(System.nanoTime() - t0) / 1e9}%.2f s")
        ()
      }
      .option("checkpointLocation", chkH)
      .trigger(Trigger.AvailableNow()).start()
    qh.processAllAvailable(); qh.stop()
    if (hostTimes.size >= 2) {
      val healthy = hostTimes(0); val hostile = hostTimes(1)
      println(f"[sbb] hostile 50%%-identical batch of $nBatch docs: healthy ${healthy._4}%.2f s " +
        f"vs hostile ${hostile._4}%.2f s (${hostile._4 / math.max(healthy._4, 1e-9)}%.1fx; " +
        "capBands on the index side bounds the flood's candidates)")
    }
    Seq(oldBands, oldArr).foreach(_.unpersist(blocking = false))

    // ---------------------------------------------------------- st10
    // benchmark side FIXED at the base-scale eval-suite slice
    val benchArr = DedupOps.shingleArrs(
        Tables.load(spark, "/root/testdata/sf0.1", "documents")
          .filter(pmod(col("doc_id"), lit(97)) === 0))
      .select(col("doc_id").as("bench_id"), col("shArr").as("benchArr"))
      .cache()
    val nBench = benchArr.count()
    val benchSh = benchArr.select(explode(col("benchArr")).as("sh")).distinct()
    val bfBytes = {
      val bf = benchSh.select(xxhash64(col("sh")).as("h"))
        .stat.bloomFilter("h", math.max(benchSh.count(), 1L), 0.01)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    println(s"[sbb] st10 fixed bench: $nBench docs (base-scale %97 slice)")
    val shPosCol = filter(
      coalesce(graft.functions.GraftFunctions.shingleArr(col("text"), 3),
        array().cast("array<string>")),
      x => graft.functions.GraftFunctions.bloomMightContain(
        xxhash64(x), bfBytes))
    val s10 = src().filter(pmod(col("doc_id"), lit(97)) =!= 0)
      .select(col("doc_id"), shPosCol.as("shPos"))
    val clean = s10.filter(size(col("shPos")) === 0).select(col("doc_id"))
    val verified = s10.filter(size(col("shPos")) > 0)
      .join(DedupOps.broadcastIfUnder(benchArr, nBench),
        arrays_overlap(col("shPos"), col("benchArr")), "left_anti")
      .select(col("doc_id"))
    val tmp10 = java.nio.file.Files.createTempDirectory("graft_sbb_st10").toString
    val q2 = clean.union(verified).writeStream
      .outputMode("append").format("parquet")
      .option("path", s"$tmp10/data")
      .option("checkpointLocation", s"$tmp10/chk")
      .trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable()
    val prog = q2.recentProgress.toSeq
    q2.stop()
    benchArr.unpersist(blocking = false)
    val rows = prog.map(p => (p.batchId, p.numInputRows,
      p.durationMs.getOrDefault("triggerExecution", 0L).toDouble / 1e3))
      .filter(_._2 > 0)
    rows.foreach { case (id, n, t) =>
      println(f"[sbb] st10 batch $id%2d: $n%6d in, $t%.2f s") }
    val tail2 = rows.drop(1).map(_._3)
    if (tail2.nonEmpty)
      println(f"[sbb] st10 per-batch sec (post-warmup): min ${tail2.min}%.2f, max ${tail2.max}%.2f over ${tail2.size} batches")
    spark.stop()
  }
}
