package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with graft.SparkTestSession {

  test("synthetic media has the declared schema and mixed kinds") {
    val m = Multimodal.syntheticMedia(spark, 30)
    assert(m.schema("payload").dataType.typeName == "binary")
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decodeFeatures: deterministic, dim-stable, partition-parallel") {
    val m = Multimodal.syntheticMedia(spark, 20).repartition(5)
    val f1 = Multimodal.decodeFeatures(m, dim = 16)
    val rows = f1.collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Seq[Float]]("features").length == 16))
    // determinism across runs (stub decode is hash-derived)
    val f2 = Multimodal.decodeFeatures(m, dim = 16).collect()
    val m1 = rows.map(r => r.getLong(0) -> r.getAs[Seq[Float]]("features")).toMap
    val m2 = f2.map(r => r.getLong(0) -> r.getAs[Seq[Float]]("features")).toMap
    assert(m1 == m2)
    // no shuffle: decode is narrow
    assert(f1.rdd.getNumPartitions == 5)
  }

  test("resizePlan preserves aspect ratio and caps the long side") {
    val m = Multimodal.syntheticMedia(spark, 10)
    val r = Multimodal.resizePlan(m, maxSide = 100).collect()
    r.foreach { row =>
      assert(row.getAs[Int]("target_w") <= 100 + 1)
      assert(row.getAs[Int]("target_h") <= 100 + 1)
    }
  }

  test("sampleFrames emits every k-th frame for videos only") {
    val m = Multimodal.syntheticMedia(spark, 12)
    val s = Multimodal.sampleFrames(m, everyK = 7)
    val byId = s.collect().groupBy(_.getLong(0))
    assert(byId.nonEmpty)
    byId.values.foreach { frames =>
      val idxs = frames.map(_.getAs[Int]("frame_idx")).sorted
      assert(idxs.head == 0 && idxs.forall(_ % 7 == 0))
    }
  }
}
