package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The two join shapes that keep 100 TB workloads off the shuffle floor:
  * bucketed co-located joins (no exchange at query time) and salted joins
  * (no single-reducer skew key). Both are UTILITIES the pipelines reach
  * for when data volumes demand them — the plan-shape tests in
  * ScaleOpsSpec pin that they actually eliminate the exchange / spread
  * the hot key, which is the part that silently regresses.
  */
object ScaleOps {

  /** Write `df` as a bucketed, sorted table: co-locates and pre-sorts
    * rows by `key` so every later equi-join or aggregation on `key`
    * against a table bucketed the same way runs WITHOUT a shuffle or
    * sort (SortMergeJoin with both exchanges elided). This is the
    * at-rest layout for fact tables scanned by many key-joins — pay one
    * shuffle at write time, never again.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Range-partitioned, sorted at-rest layout: the write-side half of
    * scan pruning. `repartitionByRange` gives every output file a
    * DISJOINT key range and `sortWithinPartitions` makes each file's
    * row groups internally ordered, so parquet min/max statistics let a
    * later range scan (`key BETWEEN ...`) skip whole files and row
    * groups instead of decoding the corpus — the at-rest layout for
    * time-series and id-range access at 100 TB. Pay one range shuffle
    * (sampling + exchange) at write time; every later range read prunes.
    * ScaleOpsSpec pins both halves: file ranges are disjoint, and a
    * 1%-selectivity scan against this layout decodes a fraction of the
    * rows a random layout decodes.
    */
  def writeRangePartitioned(df: DataFrame, path: String, key: String,
                            partitions: Int): Unit =
    df.repartitionByRange(partitions, col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(path)

  /** Salted equi-join for skewed keys: the build side's hot keys would
    * land on one reducer in a plain shuffle join. Every left row gets a
    * random-free deterministic salt derived from a stable column
    * (`saltBy`, e.g. a unique id), the right side is replicated
    * `salts`-fold, and the join key becomes (key, salt) — spreading each
    * hot key over `salts` reducers. Result is row-identical to the
    * unsalted join (inner/left semantics preserved; right rows fan out
    * and fold back via the key equality).
    *
    * Use when AQE's skew-join split does not apply (e.g. the skew is in
    * a broadcast-ineligible dimension or under an aggregation). `salts`
    * of 8-32 removes practically any single-key hotspot; the cost is a
    * `salts`-fold replication of the (small) right side.
    */
  /** Join types for which salting is row-identical to the unsalted join.
    * Right/full outer are rejected: the right side is cross-joined with
    * the salt range BEFORE the join, so unmatched right rows would be
    * emitted `salts` times.
    */
  private val saltableJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBy: Column, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(saltableJoinTypes.contains(joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")),
      s"saltedJoin preserves only inner/left/semi/anti semantics, got $joinType")
    require(!(left.columns ++ right.columns).contains("__salt"),
      "saltedJoin reserves the internal column name __salt")
    val spark = left.sparkSession
    val l = left.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts)))
    val saltRange = spark.range(salts.toLong)
      .select(col("id").cast("int").as("__salt"))
    val r = right.crossJoin(broadcast(saltRange))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
