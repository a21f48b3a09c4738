package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.GraphAlgs

/** Guard-flip load rehearsal (round-9 VERDICT item 3): run the iterative
  * graph algorithms on a graph whose VERTEX set exceeds the 1M-row
  * broadcast guard, so the shuffle-fallback plans — test-pinned
  * row-identical by the forced-path unit tests — execute on real data
  * under real load.
  *
  * The 10x rehearsal kept every vertex side under the guard (160k); the
  * UNFILTERED customer–supplier graph over an 80x key-shifted copy of
  * sf0.1 has 16k x 80 = 1.28M vertices, so:
  *   - articleRank falls from the broadcast-pull path to the GraphX
  *     shuffle-superstep path (exercised by Bench g04 on the same dir);
  *   - louvainUnd / connectedComponentsUnd pass the driver probe AND the
  *     nVerts >= 1M broadcast guard, so every per-sweep vertex join runs
  *     as a shuffle against the pre-partitioned edge table;
  * d06's CC fallback is NOT reachable this way: its vertex set is the
  * near-dup PAIR graph, which grows only linearly with disjoint copies
  * (a 2000x corpus would be needed); its fallback stays pinned by the
  * forced-path tests.
  *
  * Prints one JSON line with phase timings and the same validity /
  * refinement invariants the g05 gate checks, so the artifact shows the
  * flipped plans both COMPLETE and stay CORRECT.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<80x dir> runMain graft.tools.GuardFlip
  */
object GuardFlip {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf01x80g")
    val spark = ToolSession.local()

    var t0 = System.nanoTime()
    def lap(): Double = {
      val s = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      s
    }

    val o = Tables.load(spark, sfDir, "orders")
    val li = Tables.load(spark, sfDir, "lineitem")
    val e = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    // shared symmetrized build, as the g05/g06 gates do
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst"))).cache()
    val m2 = und.count()
    val nVerts = und.select(col("src")).distinct().count()
    val tBuild = lap()

    val cc = GraphAlgs.connectedComponentsUnd(und).localCheckpoint(true)
    val nComps = cc.select(col("component")).distinct().count()
    val ccNodes = cc.count()
    val tCc = lap()

    // 1 level / 2 sweeps: the rehearsal measures the flipped per-sweep
    // shuffle plan under load, not convergence depth
    val assign = GraphAlgs.louvainUnd(und, maxLevels = 1, maxSweeps = 2)
      .localCheckpoint(true)
    val nAssigned = assign.count()
    val nComms = assign.select(col("community")).distinct().count()
    val tLouvain = lap()

    // g05-style validity + refinement on the flipped-path outputs
    val ext = assign.toDF("node_id", "lc")
      .join(cc.toDF("node_id", "ccmp"), Seq("node_id"), "full")
    val v = ext.agg(
      count(when(col("lc").isNull || col("ccmp").isNull, 1)).as("bad"),
      countDistinct(col("lc")).as("ncomm"),
      countDistinct(col("lc"), col("ccmp")).as("npair")).head()
    val valid = v.getLong(0) == 0L && nAssigned == nVerts && ccNodes == nVerts
    val refines = v.getLong(1) == v.getLong(2)
    val tCheck = lap()

    println(s"""{"metric":"guard_flip","sf":"$sfDir","n_vertices":$nVerts,""" +
      s""""sym_edges":$m2,"vertex_guard":1000000,""" +
      s""""n_components":$nComps,"n_communities":$nComms,""" +
      s""""valid_partition":$valid,"refines_components":$refines,""" +
      s""""sec_edge_build":${f"$tBuild%.1f"},"sec_cc":${f"$tCc%.1f"},""" +
      s""""sec_louvain_1lvl_2sweeps":${f"$tLouvain%.1f"},"sec_invariants":${f"$tCheck%.1f"}}""")
    spark.stop()
  }
}
