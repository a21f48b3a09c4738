package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Graph-shaped gate queries over the synthetic corpus. The graph is the
  * customer–supplier bipartite graph induced by orders⋈lineitem, with node
  * ids disjointly encoded (customer -> 2k, supplier -> 2k+1).
  *
  * g01/g02 are the DataFrame formulations of the reference's Cypher
  * pattern-match queries (SURVEY §2.10 Q1/Q4/Q8 shapes: neighbour counts
  * and multi-hop joins). g03 runs GraphX connected components against a
  * recursive-SQL min-label oracle. g04/g05 are the iterative GDS-style
  * algorithms (ArticleRank / label propagation) — no SQL oracle (rows-only
  * driver check); their math is pinned by hand-computed fixtures in
  * GraphAlgsSpec.
  */
object GraphQueries {
  /** Distinct customer–supplier edges (encoded ids). */
  private def edges(s: SparkSession, dir: String, filtered: Boolean): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val li = Tables.load(s, dir, "lineitem")
    val j = o.join(li, col("o_orderkey") === col("l_orderkey"))
    val base = if (filtered)
      j.filter(col("l_quantity") === 1 && month(col("l_shipdate")) === 1)
    else j
    base.select(
      (col("o_custkey") * 2).as("a"),
      (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
  }

  /** Q1-shape: neighbour count per node ("tag frequency"). */
  val g01 = QueryDef(
    "g01_degree",
    "per-supplier degree in the customer-supplier graph (Q1 shape)",
    (s, dir) =>
      edges(s, dir, filtered = false)
        .groupBy(col("b").as("supplier_node"))
        .agg(count(lit(1)).as("degree"))
        .orderBy(col("degree").desc, col("supplier_node")),
    Some("""SELECT b AS supplier_node, COUNT(*) AS degree
      FROM (SELECT DISTINCT o_custkey*2 AS a, l_suppkey*2+1 AS b
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey) e
      GROUP BY b ORDER BY degree DESC, supplier_node"""))

  /** Q4/Q8-shape: 2-hop pattern match — pairs of (sampled) customers
    * connected through a shared supplier, with common-neighbour count.
    */
  val g02 = QueryDef(
    "g02_two_hop",
    "2-hop common-supplier customer pairs (Q4 shape)",
    (s, dir) => {
      val e = edges(s, dir, filtered = false)
        // a = custkey*2, so a % 200 == 0 ⟺ custkey % 100 == 0 — the oracle
        // filters o_custkey % 100 = 0 BEFORE the encoding; keep in sync if
        // the 2k/2k+1 node encoding ever changes
        .filter(col("a") % 200 === 0)
      e.as("x").join(e.as("y"),
          col("x.b") === col("y.b") && col("x.a") < col("y.a"))
        .groupBy(col("x.a").as("cust_a"), col("y.a").as("cust_b"))
        .agg(count(lit(1)).as("common_suppliers"))
        .orderBy(col("cust_a"), col("cust_b"))
    },
    Some("""WITH e AS (SELECT DISTINCT o_custkey*2 AS a, l_suppkey*2+1 AS b
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              WHERE o_custkey % 100 = 0)
      SELECT x.a AS cust_a, y.a AS cust_b, COUNT(*) AS common_suppliers
      FROM e x JOIN e y ON x.b = y.b AND x.a < y.a
      GROUP BY x.a, y.a ORDER BY cust_a, cust_b"""))

  /** GraphX connected components vs a recursive min-label-propagation SQL
    * oracle (both define component = min reachable node id).
    */
  val g03 = QueryDef(
    "g03_connected_components",
    "GraphX CC on sparsified graph vs recursive-SQL min-label oracle",
    (s, dir) => {
      val g = GraphAlgs.buildGraph(edges(s, dir, filtered = true), "a", "b")
      GraphAlgs.connectedComponents(g).orderBy(col("node_id"))
    },
    Some("""WITH RECURSIVE
      edges AS (SELECT DISTINCT o_custkey*2 AS a, l_suppkey*2+1 AS b
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                WHERE l_quantity = 1 AND month(l_shipdate) = 1),
      undirected AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
      nodes AS (SELECT DISTINCT a AS node FROM undirected),
      walk(node, lbl) AS (
        SELECT node, node AS lbl FROM nodes
        UNION
        SELECT u.b AS node, w.lbl FROM walk w JOIN undirected u ON u.a = w.node
        WHERE w.lbl < u.b)
      SELECT node AS node_id, MIN(lbl) AS component
      FROM walk GROUP BY node ORDER BY node_id"""))

  /** GDS articleRank analog (Writeup.pdf §Queries Q1/Q3) — top 50 nodes.
    * Iterative float algorithm: no SQL oracle; math pinned in
    * GraphAlgsSpec fixtures. Driver records a rows-only check.
    */
  val g04 = QueryDef(
    "g04_articlerank",
    "ArticleRank top-50 on the undirected customer-supplier graph",
    (s, dir) => {
      // buildGraph materializes the (expensive) orders><lineitem edge
      // list ONCE at the RDD layer and symmetrizes in the same pass — a
      // plain DataFrame union of two selects over the uncached join
      // would scan the join twice (measured +30% on g04)
      val g = GraphAlgs.buildGraph(edges(s, dir, filtered = false), "a", "b",
        undirected = true)
      GraphAlgs.articleRank(g, iters = 20)
        .orderBy(col("rank").desc, col("node_id"))
        .limit(50)
    },
    None)

  /** Q7 (gds.louvain.write): real modularity-greedy Louvain community
    * histogram (deterministic — parity-alternating moves, min-member
    * relabel; math pinned by GraphAlgsSpec clique fixtures). The LPA
    * variant remains in [[GraphAlgs.labelPropagation]] as the cheaper
    * fallback.
    */
  val g05 = QueryDef(
    "g05_communities",
    "Louvain community sizes on the filtered graph (Q7)",
    (s, dir) => {
      val e = edges(s, dir, filtered = true)
        .select(col("a").as("src"), col("b").as("dst"))
      // 2 levels / 4 sweeps: the gate graph converges within these
      // budgets; each extra sweep is pure fixed overhead at gate SF
      GraphAlgs.louvainDF(e, maxLevels = 2, maxSweeps = 4)
        .groupBy(col("community")).agg(count(lit(1)).as("size"))
        .orderBy(col("size").desc, col("community"))
    },
    None)

  val all: Seq[QueryDef] = Seq(g01, g02, g03, g04, g05)
}
