package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.DedupOps

/** Band/width tuning probe for [[graft.operators.DedupOps.embBandPairs]]
  * (the d04/d20 family): for each (nBands, perBand) grouping of the SAME
  * hyperplane sequence, measure PAIR-LEVEL recall against the exact
  * cosine-threshold ground truth and the candidate volume the banding
  * admits to the verify stage. The verify makes precision exactly 1
  * (every emitted pair re-scores above the threshold), so recall and
  * candidate volume are the whole trade: widening `perBand` divides
  * expected bucket occupancy by 2 per bit (verify work shrinks), at the
  * price of band-collision recall — the knob embBandPairs exposes and
  * the number a production corpus tunes against (the a04 Scaladoc
  * convention, measured here at pair level instead of query level).
  *
  * Ground truth is the all-pairs exact join — quadratic BY DESIGN and
  * only viable at probe scale (this is a tuning harness run on a sample,
  * never a production operator; sample-based tuning is how band/width
  * choices are made on corpora where all-pairs is impossible).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.BandProbe [minSim]
  * Prints one line per config and a final JSON summary.
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val minSim = args.headOption.map(_.toDouble).getOrElse(0.35)
    val spark = ToolSession.local()
    graft.functions.GraftFunctions.register(spark)

    val raw = Tables.load(spark, dir, "embeddings")
    val e = raw
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("emb"))
      .withColumn("norm",
        sqrt(graft.functions.GraftFunctions.vecDot(col("emb"), col("emb"))))
      .cache()
    val nVec = e.count()

    // exact ground truth: every pair at or above the threshold
    val exact = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (graft.functions.GraftFunctions.vecDot(col("a.emb"), col("b.emb"))
          / (col("a.norm") * col("b.norm"))).as("sim"))
      .filter(col("sim") >= minSim)
      .select(col("vec_a"), col("vec_b"))
      .cache()
    val nExact = exact.count()
    println(s"[bandprobe] $nVec vectors, $nExact exact pairs at sim>=$minSim")

    val configs = Seq((8, 2), (4, 4), (2, 8), (1, 16))
    val results = configs.map { case (nb, pb) =>
      // minSim = -1 admits every candidate through the verify: its count
      // IS the candidate volume the banding hands the verify stage
      val nCand = DedupOps.embBandPairs(raw, -1.0, nb, pb).count()
      val got = DedupOps.embBandPairs(raw, minSim, nb, pb)
        .select(col("vec_a"), col("vec_b")).cache()
      val nGot = got.count()
      val hit = got.join(exact, Seq("vec_a", "vec_b"), "left_semi").count()
      got.unpersist(blocking = false)
      assert(hit == nGot, s"precision != 1 at ${nb}x$pb: $hit of $nGot in exact")
      val recall = if (nExact > 0) nGot.toDouble / nExact else 1.0
      val candFrac = nCand.toDouble / (nVec.toDouble * (nVec - 1) / 2)
      println(f"[bandprobe] ${nb}x$pb: candidates $nCand%8d (${candFrac * 100}%.1f%% of all pairs), recall $recall%.3f")
      (s"${nb}x$pb", nCand, candFrac, recall)
    }
    val js = results.map { case (c, n, f, r) =>
      s""""$c":{"candidates":$n,"cand_frac":$f,"recall":$r}""" }.mkString(",")
    println(s"""{"metric":"band_probe","n_vec":$nVec,"min_sim":$minSim,"n_exact_pairs":$nExact,"configs":{$js},"sf":"$dir"}""")
    spark.stop()
  }
}
