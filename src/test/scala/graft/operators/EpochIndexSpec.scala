package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The per-epoch index split (r14 VERDICT "Next" #1) contracts:
  *   - the cross-epoch merge is EXACT over the union of candidates: with
  *     every cell probed and a refine window covering each epoch, the
  *     fan-out equals brute-force top-k over the whole corpus;
  *   - one epoch degenerates to the single-index query;
  *   - within-epoch ingest appends (frozen epoch model), a new epoch
  *     trains fresh.
  */
class EpochIndexSpec extends AnyFunSuite with graft.SparkTestSession {
  private val dir = "/root/testdata/sf0.001"

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-epoch-$tag").toString

  private def collectPairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.select(col("q_id"), col("vec_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq

  test("all-cells fan-out over two epochs equals brute-force top-k over the union") {
    val root = tmpRoot("exact")
    val e = AnnOps.embTable(spark, dir)
    // two epochs partitioning the corpus by vec_id parity — each trains
    // its own quantizer/codebooks on its own slice
    EpochIndex.ingest(e.filter(col("vec_id") >= 5 && pmod(col("vec_id"), lit(2)) === 0),
      root, "even")
    EpochIndex.ingest(e.filter(col("vec_id") >= 5 && pmod(col("vec_id"), lit(2)) === 1),
      root, "odd")
    assert(EpochIndex.listEpochs(spark, root) == Seq("even", "odd"))
    // every cell probed + refine window >= epoch size: each leg is exact
    // within its epoch, so the merged top-k must equal global brute force
    val fanout = EpochIndex.searchTopK(spark, dir, root,
      nProbes = 16, topK = 10, refineFactor = 1000000)
    val exact = AnnOps.denseTopK(spark, dir, 10)
      .select(col("q_id"), col("vec_id"), col("rank"))
    assert(collectPairs(fanout) == collectPairs(exact),
      "exact-mode epoch fan-out diverged from brute-force top-k")
    e.unpersist(blocking = false)
  }

  test("an offset-id epoch trains real codebooks (the vec_id<k seed bug)") {
    // Regression pin for the bug the DriftProbe epoch leg surfaced:
    // pqCodebooks seeded codes with a literal `vec_id < k`, so an epoch
    // whose ids are all large (every appended batch in a sharded/epoched
    // corpus) trained EMPTY codebooks and its queries returned zero rows
    // — recall exactly 0. The fix seeds with the k smallest ids present.
    val e = AnnOps.embTable(spark, dir)
    val shifted = e.filter(col("vec_id") >= 5)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("emb"), col("norm"))
    val cb = AnnOps.pqCodebooks(AnnOps.subvectors(shifted))
    assert(cb.count() > 0, "offset-id subvectors trained an empty codebook")
    assert(cb.select(col("s")).distinct().count() == 8,
      "codebook must cover all 8 subspaces")
    // dense-from-0 id spaces keep the exact old seeding (ids 0..15)
    val cbDense = AnnOps.pqCodebooks(AnnOps.subvectors(e))
    assert(cbDense.select(col("j")).distinct().count() == 16)
    assert(cbDense.agg(org.apache.spark.sql.functions.max(col("j"))).head().getLong(0) == 15L)
    e.unpersist(blocking = false)
  }

  test("one epoch degenerates to the single-index query; within-epoch ingest appends") {
    val root = tmpRoot("degen")
    val e = AnnOps.embTable(spark, dir)
    val (half, rest) = (e.filter(col("vec_id") >= 5 && col("vec_id") % 2 === 0),
      e.filter(col("vec_id") >= 5 && col("vec_id") % 2 === 1))
    EpochIndex.ingest(half, root, "a") // trains
    val loc = EpochIndex.epochLoc(root, "a")
    val v1 = IndexManifest.currentVersion(spark, loc)
    EpochIndex.ingest(rest, root, "a") // same epoch: appends, no retrain
    assert(IndexManifest.currentVersion(spark, loc) == v1 + 1,
      "second ingest into one epoch must append one commit")
    // centroids are the epoch's FROZEN model: the append must not retrain
    val single = IndexStore.ivfPqRefinedFromIndex(spark, dir, loc)
    val fanout = EpochIndex.searchTopK(spark, dir, root)
    assert(collectPairs(fanout) == collectPairs(single),
      "single-epoch fan-out must equal the single-index query")
    e.unpersist(blocking = false)
  }
}
