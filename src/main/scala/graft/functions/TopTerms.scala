package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** The typed-UDAF surface (SURVEY §7.3: expose the `Aggregator` pattern
  * for the north-star extensions): exact bounded top-k selection per
  * group.
  *
  * Contract: inputs are PRE-AGGREGATED (term, n) rows — each term appears
  * once per group (one upstream groupBy). Under that contract merging
  * per-partition top-k buffers is EXACT, the buffer is O(k), and Spark
  * runs it with map-side partial aggregation — so "top k terms per key"
  * costs a bounded-state shuffle instead of a full window sort over every
  * (group, term) count. Ties break on the lexicographically smaller term
  * (deterministic goldens).
  */
case class TermCount(term: String, n: Long)

class TopTerms(k: Int) extends Aggregator[TermCount, Seq[TermCount], Seq[TermCount]] {
  require(k > 0, s"k must be positive, got $k")

  // count DESC, term ASC by CODE POINT — Scala's String ordering is
  // UTF-16 code-unit order, but the t08 oracle's ORDER BY (DuckDB UTF-8
  // binary) and a Spark window-sort twin (UTF8String binary) both rank by
  // code point; they diverge on non-BMP terms tying at the kth slot
  private val ord: Ordering[TermCount] = (x: TermCount, y: TermCount) => {
    val c = java.lang.Long.compare(y.n, x.n)
    if (c != 0) c else graft.Tok.cpCompare(x.term, y.term)
  }

  private def trim(xs: Seq[TermCount]): Seq[TermCount] =
    xs.sorted(ord).take(k)

  override def zero: Seq[TermCount] = Nil
  override def reduce(b: Seq[TermCount], a: TermCount): Seq[TermCount] =
    if (b.length < k) trim(b :+ a)
    else {
      // the buffer is trim-sorted, so b.last is the current kth (weakest)
      // entry: reject rows that can't displace it in O(1) instead of
      // re-sorting the whole buffer for every pre-aggregated input row
      val w = b.last
      if (ord.compare(a, w) < 0) trim(b :+ a) else b
    }
  override def merge(b1: Seq[TermCount], b2: Seq[TermCount]): Seq[TermCount] = trim(b1 ++ b2)
  override def finish(r: Seq[TermCount]): Seq[TermCount] = r
  override def bufferEncoder: Encoder[Seq[TermCount]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TermCount]] = ExpressionEncoder()
}

object TopTerms {
  /** DataFrame-facing column function: `topTerms(k)(col(term), col(n))`. */
  def apply(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopTerms(k), Encoders.product[TermCount])
}
