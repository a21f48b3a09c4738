package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed band (range) join: pair left and right rows in the same
  * key group whose times differ by at most `tolerance` — the interval/
  * proximity join (events near events, sensor alignment, ad-click
  * attribution windows).
  *
  * Spark's built-in answer to `|l.t - r.t| <= tol` is a sort-merge join
  * on the key with the band as a post-join filter — which degenerates to
  * per-key O(|L|x|R|) when keys are few or hot. The scalable shape is
  * BUCKETING: quantize both sides to floor(t / tol) buckets, explode the
  * left side into its bucket and both neighbours (3 rows), and equi-join
  * on (key, bucket). Every true pair lands in exactly one of the three
  * bucket alignments, the join is a plain hash join on a high-cardinality
  * compound key, and the final |Δt| <= tol filter trims the bucket-edge
  * false positives. Cost: 3x left fan-out instead of a quadratic blow-up,
  * and AQE can split residual hot (key, bucket) cells.
  */
object RangeJoin {
  /** Columns: left/right must share `keys`; `leftTime`/`rightTime` are
    * epoch-scaled longs in the same unit as `tolerance`. Right payload
    * column names must not collide with left's.
    */
  def banded(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, tolerance: Long): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    require(!(left.columns ++ right.columns).contains("__bucket"),
      "banded reserves the internal column name __bucket")
    // exact integer floor division: pmod gives floor semantics for
    // negatives, and DIV keeps the arithmetic integral — Column `/` is
    // DOUBLE division, which loses bucket precision for |t| > 2^53
    // (epoch-nanosecond timestamps) and would silently drop edge pairs
    // identifiers are backtick-quoted so column names with spaces or
    // operator characters ("event ms", "t-1") parse as names, not SQL
    def bucket(c: String) = {
      val q = "`" + c.replace("`", "``") + "`"
      expr(s"($q - pmod($q, $tolerance)) DIV $tolerance")
    }
    val lB = left.withColumn("__bucket",
      explode(array((-1 to 1).map(d => bucket(leftTime) + d): _*)))
    val rB = right.withColumn("__bucket", bucket(rightTime))
    lB.join(rB, keys :+ "__bucket")
      .filter(abs(col(leftTime) - col(rightTime)) <= tolerance)
      .drop("__bucket")
  }
}
