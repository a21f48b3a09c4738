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

/** Cross-engine tokenization constants shared by every gate's Spark side. */
object Tok {
  /** Whitespace-run splitter — an EXPLICIT class, not `\s`.
    *
    * Java regex `\s` is `[ \t\n\x0B\f\r]` but DuckDB's RE2 `\s` is
    * `[\t\n\f\r ]`: they differ on vertical tab (U+000B), which the
    * modeled input set includes (TextClean's printable filter keeps it).
    * Pinning the RE2 class on the Spark side makes both engines tokenize
    * "foo\x0Bbar" identically (one token); oracles keep their `\s+`. It
    * also matches the repo's convention that U+000B is printable content,
    * not a separator.
    */
  val Ws = "[ \\t\\n\\f\\r]+"

  /** Code-point string comparison — the ordering Spark's UTF8String
    * binary sort and DuckDB's default (UTF-8 byte) collation both use.
    *
    * Plain `String.compareTo` is UTF-16 CODE-UNIT order, which ranks
    * supplementary-plane symbols (surrogate pairs, 0xD800-0xDFFF units)
    * BELOW U+E000..U+FFFF — so a driver-local tie-break using it can pick
    * a different winner than the distributed/oracle sort on non-BMP
    * input. Every driver-local tie-break that mirrors a Spark `orderBy`
    * or a DuckDB `ORDER BY` must compare through this instead.
    */
  def cpCompare(a: String, b: String): Int = {
    val ai = a.codePoints().iterator()
    val bi = b.codePoints().iterator()
    while (ai.hasNext && bi.hasNext) {
      val c = Integer.compare(ai.next(), bi.next())
      if (c != 0) return c
    }
    java.lang.Boolean.compare(ai.hasNext, bi.hasNext)
  }
}
