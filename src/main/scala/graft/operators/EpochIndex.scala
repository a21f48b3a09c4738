package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef

/** Per-epoch IVF-PQ index family — the rung ABOVE the monolithic
  * maintenance ladder (append → rebalance → retrain), for the regime the
  * r14 drift measurement proved dead: at drift ≥ 0.45 every in-index
  * recovery (rebalance, retrain, even a k-bumped retrain) leaves recall
  * at 0.12–0.24 against the 0.80 build floor, because ONE quantizer
  * cannot represent a corpus whose embedding distribution has moved that
  * far — the normal case for a continuously-retrained-model pipeline
  * (BENCH_INDEX `drift` cycles 3–4; RUNBOOK capacity-rung row prescribed
  * "split the corpus into per-epoch indexes" with no code behind it
  * until r15).
  *
  * The split: each drift EPOCH (a model version, an ingest era — any
  * boundary the deployer draws where the embedding distribution moved)
  * gets its OWN [[IndexStore]] loc under one root, trained on ITS
  * distribution:
  *
  *   <root>/epoch-<name>/     a full IVF-PQ loc (manifests, lock, the
  *                            works) — [[IndexStore.buildIvfPqTrained]]
  *                            on first ingest, [[IndexStore.appendIvfPq]]
  *                            within the epoch
  *
  * Queries fan out across the epoch indexes and merge top-k by the
  * REFINED EXACT cosine ([[IndexStore.ivfPqRefinedFromIndex]] ends in an
  * exact-score refine, so the cross-epoch merge is exact over the union
  * of candidates — per-epoch top-k keeps at least k of each epoch's
  * best, and a global top-k never needs more than k from any one
  * source). Cost is K single-index queries — linear fan-out, each leg
  * lock-free and independently maintainable/compactable/vacuumable; the
  * measured trade (BENCH_INDEX `drift` `recall_epoch_split` +
  * `epoch_query_sec`) is that fan-out cost against recall restored to
  * ≈ the per-epoch build floor where the monolithic index reads 0.12.
  *
  * At 100 TB the epoch count stays small (epochs are model versions, not
  * batches — tens, not thousands), each epoch's postings are probed and
  * pruned exactly as a single index's are, and old epochs are immutable
  * cold state: compact once, then serve reads forever.
  */
object EpochIndex {
  def epochLoc(root: String, epoch: String): String = s"$root/epoch-$epoch"

  private def fs(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Epoch names with a committed index under `root`, sorted. */
  def listEpochs(s: SparkSession, root: String): Seq[String] = {
    val f = fs(s, root)
    val rp = new Path(root)
    if (!f.exists(rp)) Nil
    else f.listStatus(rp).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("epoch-"))
      .map(_.getPath.getName.stripPrefix("epoch-"))
      .filter(name => IndexManifest.current(s, epochLoc(root, name)).isDefined)
      .sorted
  }

  /** Ingest a `(vec_id, emb, norm)` batch into `epoch`'s index: the
    * FIRST batch of an epoch trains that epoch's quantizer + codebooks
    * on its own distribution (the whole point of the split — the batch
    * IS a sample of the epoch's distribution); later batches of the same
    * epoch append against them (the within-epoch frozen-model contract,
    * same as a monolithic index). vec_ids must be globally disjoint
    * across epochs (the d08/st09 admit contract, corpus-wide).
    */
  def ingest(e: DataFrame, root: String, epoch: String,
      k: Int = 16, iters: Int = 2): Unit = {
    val s = e.sparkSession
    val loc = epochLoc(root, epoch)
    IndexLock.withLock(s, loc) { _ => // one decision+build/append, atomic
      if (IndexManifest.current(s, loc).isEmpty)
        IndexStore.buildIvfPqTrained(e, loc, k, iters)
      else IndexStore.appendIvfPq(e, loc)
    }
  }

  /** Top-k across every epoch index under `root`: fan the query over the
    * epochs, merge by refined exact cosine (ties to the smaller vec_id —
    * the single-index convention), re-rank globally. Same output schema
    * as [[IndexStore.ivfPqRefinedFromIndex]]; with ONE epoch this is
    * exactly the single-index query plus a no-op re-rank.
    */
  def searchTopK(s: SparkSession, dir: String, root: String,
      nProbes: Int = 4, topK: Int = 10, refineFactor: Int = 8): DataFrame = {
    val epochs = listEpochs(s, root)
    require(epochs.nonEmpty, s"no committed epoch indexes under $root")
    val per = epochs.map(name => IndexStore.ivfPqRefinedFromIndex(
      s, dir, epochLoc(root, name), nProbes, topK, refineFactor))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    per.reduce(_.unionByName(_))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("vec_id"), col("rank"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** The epoch fan-out under the driver oracle, in EXACT mode: two
    * epochs partition the corpus by vec_id parity, every cell is probed
    * and the refine window covers each epoch — so the merged top-k must
    * equal brute-force cosine top-k over the WHOLE corpus regardless of
    * what the per-epoch k-means trained (the candidates are everything
    * either way; only the refine's exact scores rank them). That makes a
    * nondeterministically-trained structure hash-checkable: the oracle
    * is a01's brute-force SQL with the refine's 6-dp rounding. Fresh
    * temp root per invocation (the a12–a14 convention): every rep pays
    * the real train+train+fan-out chain.
    */
  val a15 = QueryDef(
    "a15_epoch_fanout_query",
    "per-epoch split: all-cells fan-out + exact merge == brute-force top-k",
    (s, dir) => {
      val root = java.nio.file.Files
        .createTempDirectory(IndexStore.tmpRoot, "a15").toString
      val e = AnnOps.embTable(s, dir)
      ingest(e.filter(col("vec_id") >= 5 && pmod(col("vec_id"), lit(2)) === 0),
        root, "even")
      ingest(e.filter(col("vec_id") >= 5 && pmod(col("vec_id"), lit(2)) === 1),
        root, "odd")
      val out = searchTopK(s, dir, root,
        nProbes = 16, topK = 10, refineFactor = 1000000)
      e.unpersist(blocking = false)
      out
    },
    Some("""WITH e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings),
      n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS norm FROM e),
      q AS (SELECT vec_id AS q_id, emb AS q_emb, norm AS q_norm FROM n WHERE vec_id < 5),
      sc AS (SELECT q_id, vec_id,
               list_dot_product(emb, q_emb) / (norm * q_norm) AS sim
             FROM n CROSS JOIN q WHERE vec_id >= 5)
      SELECT q_id, vec_id, rank, cos FROM (
        SELECT q_id, vec_id, ROUND(sim, 6) AS cos,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY ROUND(sim, 6) DESC, vec_id) AS rank
        FROM sc) t
      WHERE rank <= 10 ORDER BY q_id, rank"""))

  val all: Seq[QueryDef] = Seq(a15)
}
