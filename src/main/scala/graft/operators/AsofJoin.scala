package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (temporal) join: for each left row, attach the most
  * recent right row with `rightTime` <= `leftTime` within the same key
  * group (the trades⋈quotes operator; Spark has no built-in for it).
  *
  * Implementation is the scalable union-and-sweep plan, NOT a range join:
  * tag both inputs, union them, and take a running `last(right payload)`
  * over one (keys)-partitioned window ordered by (time, tag). That is a
  * single shuffle on the key columns and an in-partition sort — cost
  * O(n log n) per key group — where the naive inequality join
  * (`l.key = r.key AND r.t <= l.t` + argmax) explodes to O(|L|x|R|) rows
  * per key before aggregation. At 100 TB the union-sweep is the only
  * viable shape; it is also AQE-friendly (skewed keys split fine because
  * the window frame is cumulative).
  *
  * Contract: right rows must be unique per (keys, rightTime) — ties there
  * have no deterministic winner; pre-aggregate (e.g. max id per timestamp)
  * if the source can collide. Ties between a left and a right row at the
  * same time INCLUDE the right row (>= semantics, matching SQL ASOF JOIN).
  * Right payload columns (everything except the keys) must not collide
  * with left column names.
  */
object AsofJoin {
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String): DataFrame = {
    val payload = right.columns.filterNot(keys.contains).toSeq
    val leftRest = left.columns.filterNot(keys.contains).toSeq
    require(payload.intersect(left.columns.toSeq).isEmpty,
      s"right payload ${payload.mkString(",")} collides with left columns")
    val reserved = (left.columns ++ right.columns)
      .filter(Set("__t", "__tag", "__r").contains)
    require(reserved.isEmpty,
      s"asof reserves internal column names ${reserved.mkString(",")}")

    val lU = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__tag")) ++
        leftRest.map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rU = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__tag")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // row-level semantics: the whole right payload travels as one struct,
    // so a NULL inside a right column never falls back to an older row
    lU.unionByName(rU)
      .withColumn("__r", last(
        when(col("__tag") === 0, struct(payload.map(col): _*)),
        ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(left.columns.toSeq.map(col) ++
        payload.map(c => col(s"__r.$c").as(c)): _*)
  }
}
