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

  /** Unrolled-CTE DuckDB oracle for ArticleRank: rank step k is one
    * join + group-by CTE over the static edge+denominator table (the
    * same SQL-codegen trick as DedupOps.minhashPairsSql). Every input to
    * the recurrence is an exactly-represented integer-valued double
    * (degrees, counts) except the running rank, so the only cross-engine
    * divergence is float SUMMATION ORDER in each superstep's message
    * aggregate — ~1e-13 after 20 iterations, absorbed by rounding both
    * sides to 6 dp. The ORDER BY uses the rounded score (+ node_id), so
    * the top-50 cut is identical in both engines even at rank ties.
    */
  private def articleRankSql(iters: Int, damping: Double): String = {
    val steps = (1 to iters).map { k =>
      s"""r$k AS (SELECT v.node_id, ${1.0 - damping} + $damping * COALESCE(m.msg, 0.0) AS r
        FROM verts v LEFT JOIN (
          SELECT e.dst, SUM(r.r / e.denom) AS msg
          FROM ewd e JOIN r${k - 1} r ON e.src = r.node_id
          GROUP BY e.dst) m ON v.node_id = m.dst)"""
    }.mkString(",\n      ")
    s"""WITH edges AS (SELECT DISTINCT o_custkey*2 AS a, l_suppkey*2+1 AS b
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      und AS (SELECT a AS src, b AS dst FROM edges
              UNION ALL SELECT b AS src, a AS dst FROM edges),
      verts AS (SELECT DISTINCT src AS node_id FROM und),
      deg AS (SELECT src AS node_id, CAST(COUNT(*) AS DOUBLE) AS d
              FROM und GROUP BY 1),
      ewd AS (SELECT u.src, u.dst,
                d.d + (SELECT CAST(COUNT(*) AS DOUBLE) FROM und)
                        / (SELECT COUNT(*) FROM verts) AS denom
              FROM und u JOIN deg d ON u.src = d.node_id),
      r0 AS (SELECT node_id, 1.0 AS r FROM verts),
      $steps
      SELECT node_id, round(r, 6) AS score FROM r$iters
      ORDER BY score DESC, node_id LIMIT 50"""
  }

  /** GDS articleRank analog (Writeup.pdf §Queries Q1/Q3) — top 50 nodes.
    * Runs on the GraphX path ([[GraphAlgs.articleRankGraphX]]): supersteps
    * are executor-side RDD ops, not 20 DataFrame job dispatches (the r2
    * bench spent 37 % of suite time on the DF loop's fixed overhead).
    * Exact-math parity with [[GraphAlgs.articleRankDF]] is pinned in
    * GraphAlgsSpec; the 6-dp-rounded result is oracled in DuckDB by an
    * unrolled 20-step CTE chain.
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
      GraphAlgs.articleRankGraphX(g, iters = 20)
        .select(col("node_id"), round(col("rank"), 6).as("score"))
        .orderBy(col("score").desc, col("node_id"))
        .limit(50)
    },
    Some(articleRankSql(iters = 20, damping = 0.85)))

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
