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
  */
final case class QueryDef(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
