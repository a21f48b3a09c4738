package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gate query: a Spark implementation plus (where SQL-expressible) an
  * equivalent DuckDB oracle SQL over the same parquet tables.
  *
  * Column names AND value bit-patterns must match the oracle exactly — the
  * driver sorts columns by name and hash-compares values. Floating-point
  * aggregation therefore goes through exact decimal arithmetic (see
  * [[graft.functions.Exact]]) so results are identical regardless of Spark's
  * partition-parallel summation order.
  *
  * Cache policy: a gate may cache intermediates it consumes more than once;
  * multi-consumer pipelines (curate, g05) release their caches before the
  * final action, and the remaining single-fill caches (e.g. a gate's shared
  * token scan) are SESSION-SCOPED — the bench harness clears the SQL cache
  * and persistent RDDs between queries, and a library user embedding a gate
  * in a long-lived session should do the same or call unpersist on the
  * returned plan's sources.
  */
final case class QueryDef(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
