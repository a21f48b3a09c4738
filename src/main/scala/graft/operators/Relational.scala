package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.{QueryDef, Tables}
import graft.functions.Exact._

/** Relational operator surface of the engine, exercised over the synthetic
  * TPC-H-ish corpus. Each query maps to rows of SURVEY.md §2 (cited per
  * query) and carries a DuckDB oracle for the driver's hash-compare gate.
  *
  * Scale notes (local[32] here, 1000-executor cluster in spirit):
  *  - dimension tables (region/nation/supplier/part sides that reduce to
  *    few rows) are explicitly `broadcast()` so the big fact scan never
  *    shuffles for them;
  *  - all money aggregation is exact-decimal (see [[graft.functions.Exact]])
  *    so results are partitioning-independent;
  *  - filters/projections are plain Catalyst expressions and reach the
  *    parquet scan (PushedFilters — verified in Bench's explain dump).
  */
object Relational {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def ts(lit0: String): Column = lit(lit0).cast("timestamp")

  /** SURVEY §2.5 A1/A7, §2.3 P1: grouped aggregation with exact sums
    * (TPC-H Q1 shape — the reference's group-count/weight pattern,
    * data_integration.ipynb c49, generalized).
    */
  val q01 = QueryDef(
    "q01_agg_pricing",
    "grouped agg: exact decimal sums, avg, counts (A1/A7)",
    (s, dir) => {
      val li = T(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          (moneySum(col("l_extendedprice")) / count(col("l_quantity"))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      SUM(l_quantity) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_price,
      COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** SURVEY §2.3 P1/P6/P9: conjunctive/range predicates + projection, all
    * pushed to the parquet scan. Row-level output → bit-exact by
    * construction.
    */
  val q02 = QueryDef(
    "q02_filter_project",
    "predicate pushdown + projection (P1/P6/P9)",
    (s, dir) => {
      val li = T(s, dir, "lineitem")
      li.filter(
          col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      ORDER BY l_orderkey, l_linenumber"""))

  /** SURVEY §2.4 J1/J2: multi-way equi-join fact→dims with broadcast of the
    * small dimensions (nation 25 rows, region 5 rows — never shuffle the
    * lineitem scan for these).
    */
  val q03 = QueryDef(
    "q03_join_revenue",
    "5-table join + grouped exact revenue (J1/J2 broadcast)",
    (s, dir) => {
      val li = T(s, dir, "lineitem")
      val o = T(s, dir, "orders")
      val c = T(s, dir, "customer")
      val n = T(s, dir, "nation")
      val r = T(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""SELECT r_name, n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  /** SURVEY §2.3 P4: membership filter as a left-semi join (the reference's
    * isin-against-a-column, data_integration.ipynb c24-c25).
    */
  val q04 = QueryDef(
    "q04_semi_join",
    "left-semi join membership filter (P4)",
    (s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders").filter(col("o_totalprice") > 200000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
      ORDER BY c_custkey"""))

  /** SURVEY §2.3 P5: negated membership as a left-anti join (the
    * reference's ~isin skip logic, gitapi.py:130-135).
    */
  val q05 = QueryDef(
    "q05_anti_join",
    "left-anti join: customers with no high-value order (P5)",
    (s, dir) => {
      val c = T(s, dir, "customer")
      // predicate keeps the anti-join result non-empty at every SF (the
      // bare "no orders at all" form returned 0 rows at gate scale — a
      // vacuous pass that proved nothing about anti-join correctness)
      val o = T(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      ORDER BY c_custkey"""))

  /** SURVEY §2.8 O3/O4: global top-k with deterministic tie-break; Spark
    * plans TakeOrderedAndProject (no full sort at scale).
    */
  val q06 = QueryDef(
    "q06_topk",
    "ORDER BY ... LIMIT top-k (O3/O4)",
    (s, dir) =>
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  /** SURVEY §2.5 A3: per-group argmax via row_number window with pinned
    * tie-break (the reference's idxmax best-label election, c48).
    */
  val q07 = QueryDef(
    "q07_window_argmax",
    "per-group argmax via row_number window (A3)",
    (s, dir) => {
      val o = T(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn = 1 ORDER BY o_custkey"""))

  /** SURVEY §2.5 A4: distinct on a projection (drop_duplicates). */
  val q08 = QueryDef(
    "q08_distinct",
    "DISTINCT projection (A4)",
    (s, dir) =>
      T(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"))
        .distinct()
        .orderBy(col("c_nationkey"), col("c_mktsegment")),
    Some("""SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
      ORDER BY c_nationkey, c_mktsegment"""))

  /** SURVEY §2.9 U1: union-all + dedup across two sources (pd.concat). */
  val q09 = QueryDef(
    "q09_union_distinct",
    "unionByName + distinct (U1)",
    (s, dir) => {
      val c = T(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val su = T(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.unionByName(su).distinct().orderBy(col("nationkey"))
    },
    Some("""SELECT DISTINCT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL SELECT s_nationkey AS nationkey FROM supplier) t
      ORDER BY nationkey"""))

  /** SURVEY §2.6 E1/E5 + §2.5 A1: explode a tokenized column and count —
    * the reference's regex-findall→explode→group-count spine (c10-c17).
    */
  val q10 = QueryDef(
    "q10_explode_wordcount",
    "split + explode + group-count (E1/E5/A1)",
    (s, dir) =>
      T(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word")),
    Some("""SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split(p_name, ' ')) AS word FROM part) t
      GROUP BY word ORDER BY cnt DESC, word"""))

  /** SURVEY §2.7 F1-F13: string function battery (row-level → bit-exact). */
  val q11 = QueryDef(
    "q11_string_funcs",
    "string functions: upper/regexp_replace/split/lpad/concat_ws/substring (F*)",
    (s, dir) =>
      T(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        regexp_replace(col("p_brand"), "[^0-9]", "").as("brand_num"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        lpad(col("p_size").cast("string"), 5, "0").as("size_pad"),
        concat_ws("-", col("p_type"), col("p_brand")).as("type_brand"),
        length(col("p_name")).cast("bigint").as("name_len"),
        substring(col("p_name"), 1, 3).as("name_pre"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
      upper(p_name) AS name_upper,
      regexp_replace(p_brand, '[^0-9]', '', 'g') AS brand_num,
      string_split(p_name, ' ')[1] AS first_word,
      lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_pad,
      concat_ws('-', p_type, p_brand) AS type_brand,
      CAST(length(p_name) AS BIGINT) AS name_len,
      substring(p_name, 1, 3) AS name_pre
      FROM part ORDER BY p_partkey"""))

  /** SURVEY §2.7 D1-D3: calendar bucketing + exact sums. */
  val q12 = QueryDef(
    "q12_date_buckets",
    "year/month bucketing + exact sums (D1-D3)",
    (s, dir) =>
      T(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("bigint").as("yr"),
          month(col("o_orderdate")).cast("bigint").as("mo"))
        .agg(
          count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("total"))
        .orderBy(col("yr"), col("mo")),
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      CAST(month(o_orderdate) AS BIGINT) AS mo,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY yr, mo ORDER BY yr, mo"""))

  /** SURVEY §2.5 A6-A8: stats battery incl. exact COUNT(DISTINCT). */
  val q13 = QueryDef(
    "q13_agg_stats",
    "count/count-distinct/min/max/exact-avg per group (A6-A8)",
    (s, dir) =>
      T(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("c_nationkey")).as("n_nations"),
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"),
          exactAvg(col("c_acctbal")).as("avg_bal"))
        .orderBy(col("c_mktsegment")),
    Some("""SELECT c_mktsegment,
      COUNT(*) AS n,
      COUNT(DISTINCT c_nationkey) AS n_nations,
      MIN(c_acctbal) AS min_bal,
      MAX(c_acctbal) AS max_bal,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** SURVEY §2.3 P9/N3: CASE WHEN conditional aggregation (when/otherwise);
    * counts (not SUM of ints) so both engines yield BIGINT.
    */
  val q14 = QueryDef(
    "q14_conditional_agg",
    "CASE WHEN conditional aggregation (P9/N3)",
    (s, dir) =>
      T(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(when(col("o_orderpriority").startsWith("1") ||
                     col("o_orderpriority").startsWith("2"), 1)).as("high_cnt"),
          count(when(!(col("o_orderpriority").startsWith("1") ||
                       col("o_orderpriority").startsWith("2")), 1)).as("low_cnt"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus")),
    Some("""SELECT o_orderstatus,
      COUNT(CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%' THEN 1 END) AS high_cnt,
      COUNT(CASE WHEN NOT (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%') THEN 1 END) AS low_cnt,
      COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** SURVEY §2.8 (window frames beyond A3): running total per customer with
    * an explicit ROWS frame and full tie-break — exact decimal so the
    * cumulative sum is order-of-evaluation independent.
    */
  val q15 = QueryDef(
    "q15_window_running",
    "cumulative windowed sum with ROWS frame",
    (s, dir) => {
      val o = T(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.select(
          col("o_custkey"), col("o_orderkey"),
          sum(dec2(col("o_totalprice"))).over(w).cast(DoubleType).as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      FROM orders ORDER BY o_custkey, o_orderkey"""))

  /** Multi-level aggregation (GROUP BY ROLLUP): per-nation, per-region
    * subtotals and the grand total in ONE pass — Spark expands the
    * grouping sets with partial aggregation per level, so at scale it is
    * still a single shuffle instead of three queries + union. NULL
    * ordering pinned explicitly (Spark defaults nulls-first, DuckDB
    * nulls-last).
    */
  val q16 = QueryDef(
    "q16_rollup",
    "ROLLUP subtotals: revenue by region, nation, and grand total",
    (s, dir) => {
      val o = T(s, dir, "orders")
      val c = T(s, dir, "customer")
      val n = T(s, dir, "nation")
      val r = T(s, dir, "region")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(moneySum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },
    Some("""SELECT r_name, n_name,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey  = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST"""))

  /** PIVOT (long→wide): counts per (user bucket, event_type) with the
    * type values spread into columns. The value list is EXPLICIT —
    * without it Spark runs an extra distinct job to discover values and
    * the output schema becomes data-dependent, which is exactly what a
    * 100 TB pipeline must not do (schema drift on a new event type).
    * Missing combinations are pinned to 0 (Spark pivots them to null;
    * the oracle's conditional COUNT yields 0).
    */
  val q17 = QueryDef(
    "q17_pivot",
    "pivot event counts to one column per event type (explicit values)",
    (s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = T(s, dir, "events")
        .select(pmod(col("user_id"), lit(10)).as("bucket"), col("event_type"))
        .groupBy(col("bucket"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      wide.select(col("bucket") +:
          types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("bucket"))
    },
    Some {
      val cols = Seq("click", "error", "purchase", "signup", "view")
        .map(t => s"CAST(COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS BIGINT) AS $t")
        .mkString(", ")
      // floor-mod fold: Spark's pmod has floor semantics, DuckDB % truncates
      // — the e02/e12 double-mod idiom keeps the engines aligned if user_id
      // is ever negative
      s"""SELECT ((user_id % 10) + 10) % 10 AS bucket, $cols
        FROM events GROUP BY 1 ORDER BY bucket"""
    })

  /** UNPIVOT/melt (wide→long): the inverse shape, e.g. turning a metrics
    * table into (entity, metric, value) rows for generic downstream
    * consumers. Spark's `unpivot` keeps this a narrow map (no shuffle
    * beyond the upstream aggregate); the oracle is the UNION ALL
    * expansion.
    */
  val q18 = QueryDef(
    "q18_unpivot",
    "melt per-nation metrics into (nation, metric, value) rows",
    (s, dir) => {
      val wide = T(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).cast("double").as("n_customers"),
          moneySum(col("c_acctbal")).as("total_acctbal"))
      wide.unpivot(Array(col("c_nationkey")),
          Array(col("n_customers"), col("total_acctbal")),
          "metric", "value")
        .orderBy(col("c_nationkey"), col("metric"))
    },
    Some("""WITH w AS (SELECT c_nationkey,
              CAST(COUNT(*) AS DOUBLE) AS n_customers,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
            FROM customer GROUP BY c_nationkey)
      SELECT c_nationkey, metric, value FROM (
        SELECT c_nationkey, 'n_customers' AS metric, n_customers AS value FROM w
        UNION ALL
        SELECT c_nationkey, 'total_acctbal' AS metric, total_acctbal AS value FROM w) u
      ORDER BY c_nationkey, metric"""))

  /** Sorted group-concat (string_agg): a deterministic per-group list
    * column. collect_list order is partition-arrival-dependent, so the
    * sort INSIDE the aggregate value is what makes the result stable
    * under any partitioning — the same determinism discipline as the
    * money decimals.
    */
  val q19 = QueryDef(
    "q19_group_concat",
    "per-region sorted comma-joined nation list (deterministic string_agg)",
    (s, dir) => {
      val n = T(s, dir, "nation")
      val r = T(s, dir, "region")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy(col("r_name"))
    },
    Some("""SELECT r_name,
        string_agg(n_name, ',' ORDER BY n_name) AS nations,
        COUNT(*) AS n_nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  /** INTERSECT / EXCEPT — the remaining set operators next to q09's
    * UNION: customers ordering in both January and February 1995 vs
    * January-only. Both plan as aggregating joins (left-semi /
    * left-anti over distinct inputs), so they shuffle once on the key
    * like any equi-join — no pairwise comparison semantics to worry
    * about at scale.
    */
  val q20 = QueryDef(
    "q20_intersect_except",
    "set ops: customers in both Jan+Feb 1995 vs Jan-only (INTERSECT/EXCEPT)",
    (s, dir) => {
      val o = T(s, dir, "orders")
      def monthKeys(m: Int) = o
        .filter(year(col("o_orderdate")) === 1995 && month(col("o_orderdate")) === m)
        .select(col("o_custkey")).distinct()
      val jan = monthKeys(1)
      val feb = monthKeys(2)
      jan.intersect(feb).select(lit("both").as("tag"), col("o_custkey"))
        .unionAll(jan.except(feb).select(lit("jan_only").as("tag"), col("o_custkey")))
        .orderBy(col("tag"), col("o_custkey"))
    },
    Some("""WITH jan AS (SELECT DISTINCT o_custkey FROM orders
              WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 1),
      feb AS (SELECT DISTINCT o_custkey FROM orders
              WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 2)
      SELECT 'both' AS tag, o_custkey
      FROM (SELECT o_custkey FROM jan INTERSECT SELECT o_custkey FROM feb) b
      UNION ALL
      SELECT 'jan_only' AS tag, o_custkey
      FROM (SELECT o_custkey FROM jan EXCEPT SELECT o_custkey FROM feb) j
      ORDER BY tag, o_custkey"""))

  /** Ranking-window variety beyond q07's argmax and q15's running frame:
    * ntile / percent_rank / cume_dist / first_value in one windowed
    * pass. The ORDER BY carries a unique tiebreak (o_orderkey), so every
    * rank function is fully determined; percent_rank and cume_dist are
    * single divisions of exact integers — bit-identical cross-engine.
    * One shuffle on the partition key, like any window at scale.
    */
  val q21 = QueryDef(
    "q21_rank_windows",
    "ntile/percent_rank/cume_dist/first_value over priority partitions",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast("bigint").as("quartile"), // DuckDB ntile is BIGINT
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          first(col("o_orderkey")).over(w).as("top_order"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_orderpriority,
        ntile(4)      OVER w AS quartile,
        percent_rank() OVER w AS pr,
        cume_dist()    OVER w AS cd,
        first_value(o_orderkey) OVER w AS top_order
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_orderpriority, o_orderkey"""))

  /** GROUP BY CUBE — the full grouping-sets lattice next to q16's
    * hierarchical ROLLUP: every (region, priority) margin including the
    * priority-only one ROLLUP omits. Same single-shuffle expansion with
    * per-level partial aggregation; NULL ordering pinned as in q16.
    */
  val q22 = QueryDef(
    "q22_cube",
    "CUBE margins: revenue by region x order priority incl. all subtotals",
    (s, dir) => {
      val o = T(s, dir, "orders")
      val c = T(s, dir, "customer")
      val n = T(s, dir, "nation")
      val r = T(s, dir, "region")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .cube(col("r_name"), col("o_orderpriority"))
        .agg(moneySum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },
    Some("""SELECT r_name, o_orderpriority,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey  = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY CUBE(r_name, o_orderpriority)
      ORDER BY r_name ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""))

  val all: Seq[QueryDef] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
        q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22)
}
