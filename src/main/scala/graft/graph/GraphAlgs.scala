package graft.graph

import org.apache.spark.graphx._
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** GraphX algorithm layer — the Spark-native replacement for the
  * reference's Neo4j GDS calls (Writeup.pdf §Queries: gds.articleRank,
  * gds.louvain, gds.graph.project with orientation:'undirected').
  *
  * DataFrame edge tables in, DataFrame results out; GraphX only inside.
  * All algorithms are deterministic (fixed iteration counts, explicit
  * tie-breaks) so results are stable under re-partitioning — required for
  * the golden tests and for reproducible runs on a real cluster.
  */
object GraphAlgs {

  /** Build a GraphX graph from an edge DataFrame with long src/dst cols.
    * `undirected = true` reproduces gds.graph.project's
    * orientation:'undirected' by emitting each edge both ways.
    */
  def buildGraph(edges: DataFrame, src: String, dst: String,
                 undirected: Boolean = false): Graph[Unit, Unit] = {
    val e0: RDD[Edge[Unit]] = edges
      .select(col(src).cast("long"), col(dst).cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val e = if (undirected) e0.flatMap(x => Iterator(x, Edge(x.dstId, x.srcId, ()))) else e0
    Graph.fromEdges(e, (), StorageLevel.MEMORY_AND_DISK, StorageLevel.MEMORY_AND_DISK)
  }

  /** ArticleRank (Neo4j GDS variant of PageRank, Writeup.pdf §Queries Q1):
    * the neighbour contribution is damped by (outDeg(u) + avgOutDeg)
    * instead of outDeg(u), so low-degree neighbours count less.
    *
    *   AR(v) <- (1 - d) + d * sum_{u->v} AR(u) / (outDeg(u) + avgOutDeg)
    *
    * Synchronous fixed-iteration loop in DataFrames: the static
    * edge+degree table is cached once, each superstep is one shuffle
    * keyed by dst plus one vertex join, and per-iteration persist/count/
    * unpersist keeps the lineage depth constant (chaining GraphX graph
    * views re-ships every prior superstep's vertices — quadratic; this
    * formulation is the one that scales).
    */
  def articleRank(g: Graph[Unit, Unit], iters: Int = 20,
                  damping: Double = 0.85): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    val edges = g.edges.map(e => (e.srcId, e.dstId)).toDF("src", "dst")
    articleRankDF(edges, iters, damping)
  }

  /** Vertex-side tables produced by localCheckpoint have no Catalyst
    * stats, so AQE would sort-merge them against the (much larger) edge
    * table every superstep. Below ~1M vertices the ranks/labels table is
    * broadcast explicitly; above, the joins fall back to shuffles against
    * edges pre-partitioned on src (the co-partitioned plan a 100 TB graph
    * needs — broadcast of V rows would not survive there).
    */
  private val broadcastVertexLimit = 1000000L

  /** DataFrame-native ArticleRank over an (src, dst) edge table. */
  def articleRankDF(edges: DataFrame, iters: Int = 20,
                    damping: Double = 0.85): DataFrame = {
    import org.apache.spark.sql.functions._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long")).cache()
    val vertices = e.select(col("src").as("node_id"))
      .union(e.select(col("dst").as("node_id"))).distinct().cache()
    val outDeg = e.groupBy(col("src").as("node_id"))
      .agg(count(lit(1)).cast("double").as("deg"))
    val nVerts = vertices.count().toDouble
    val avgDeg = e.count().toDouble / nVerts
    def small(df: DataFrame): DataFrame =
      if (nVerts < broadcastVertexLimit) broadcast(df) else df
    // static per-edge damping denominator, cached once, partitioned by the
    // per-iteration join key so the big side never re-shuffles
    val edgesWithDeg = e.join(outDeg, e("src") === outDeg("node_id"))
      .select(col("src"), col("dst"), (col("deg") + avgDeg).as("denom"))
      .repartition(col("src"))
      .cache()
    edgesWithDeg.count()

    // localCheckpoint TRUNCATES the logical plan each superstep — without
    // it the analyzed plan doubles per iteration and the driver spends
    // exponential time in Catalyst, not in the data. (On a cluster with
    // executor churn, swap for reliable checkpoint(dir) — same shape.)
    var ranks = vertices.select(col("node_id"), lit(1.0).as("rank"))
      .localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val msgs = edgesWithDeg
        .join(small(ranks), edgesWithDeg("src") === col("node_id"))
        .select(col("dst"), (col("rank") / col("denom")).as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("msg"))
      val next = vertices
        .join(small(msgs), vertices("node_id") === msgs("dst"), "left")
        .select(col("node_id"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("msg"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(true) // materializes AND truncates lineage
      ranks.unpersist(blocking = false)
      ranks = next
      i += 1
    }
    ranks.select(col("node_id"), col("rank"))
  }

  /** Connected components (GraphX built-in: component id = min vertex id
    * reachable — matches a min-label-propagation oracle).
    */
  def connectedComponents(g: Graph[Unit, Unit]): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    val sym = Graph.fromEdges(
      g.edges.flatMap(e => Iterator(e, Edge(e.dstId, e.srcId, e.attr))), ())
    sym.connectedComponents().vertices
      .map { case (id, comp) => (id, comp) }.toDF("node_id", "component")
  }

  /** Deterministic synchronous label propagation (community detection —
    * the LPA stand-in for gds.louvain, divergence documented in SURVEY
    * §2.10 Q7). GraphX's LabelPropagation breaks frequency ties by map
    * iteration order (nondeterministic); here ties break on the SMALLEST
    * label, so goldens are stable.
    */
  def labelPropagation(g: Graph[Unit, Unit], iters: Int = 10): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    val edges = g.edges.map(e => (e.srcId, e.dstId)).toDF("src", "dst")
    labelPropagationDF(edges, iters)
  }

  /** DataFrame-native deterministic LPA: per superstep, each node adopts
    * the most frequent neighbour label (ties → smallest label), computed
    * as groupBy(node, label).count + row_number window — same bounded-
    * lineage persist/count/unpersist loop as articleRankDF.
    */
  def labelPropagationDF(edges: DataFrame, iters: Int = 10): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().repartition(col("src")).cache()
    val vertices = und.select(col("src").as("node_id")).distinct().cache()
    val nVerts = vertices.count()
    def small(df: DataFrame): DataFrame =
      if (nVerts < broadcastVertexLimit) broadcast(df) else df

    var labels = vertices.select(col("node_id"), col("node_id").as("community"))
      .localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val freq = und
        .join(small(labels), und("src") === labels("node_id"))
        .groupBy(col("dst"), col("community"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("dst"))
        .orderBy(col("n").desc, col("community").asc)
      val elected = freq.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("dst"), col("community").as("new_community"))
      val next = vertices
        .join(small(elected), vertices("node_id") === elected("dst"), "left")
        .select(col("node_id"),
          coalesce(col("new_community"), col("node_id")).as("community"))
        .localCheckpoint(true) // plan truncation, see articleRankDF
      labels.unpersist(blocking = false)
      labels = next
      i += 1
    }
    labels.select(col("node_id"), col("community"))
  }

  /** Static PageRank passthrough (Q6 family baseline for ArticleRank). */
  def pageRank(g: Graph[Unit, Unit], iters: Int = 20,
               resetProb: Double = 0.15): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    g.staticPageRank(iters, resetProb).vertices
      .map { case (id, r) => (id, r) }.toDF("node_id", "rank")
  }
}
