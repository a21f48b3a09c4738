package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite with graft.SparkTestSession {

  test("jaccard_sim: matches the array_intersect/union composition") {
    import spark.implicits._
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("x"), Seq("x")),
      (Seq("x", "x", "y"), Seq("x")), // duplicates ignored (set semantics)
      (Seq("p"), Seq("q"))
    ).toDF("a", "b")
    val got = df.select(GraftFunctions.jaccardSim(col("a"), col("b"))).as[Double].collect()
    val ref = df.select(
      size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("b")))).as[Double].collect()
    assert(got.toSeq == ref.toSeq)
    assert(got.toSeq == Seq(0.5, 1.0, 0.5, 0.0))
  }

  test("jaccard_sim: total on empty sets (1.0) and null-safe") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq.empty[String]), Some(Seq.empty[String])),
      (None, Some(Seq("a"))),
      (Some(Seq("a")), None)
    ).toDF("a", "b")
    val got = df.select(GraftFunctions.jaccardSim(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 1.0)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
  }

  test("ascii_fold: NFD + strip marks + lowercase, null-safe") {
    import spark.implicits._
    val df = Seq(Some("Crème BRÛLÉE"), Some("Ångström"), None).toDF("t")
    val got = df.select(GraftFunctions.asciiFold(col("t"))).collect()
    assert(got(0).getString(0) == "creme brulee")
    assert(got(1).getString(0) == "angstrom")
    assert(got(2).isNullAt(0))
  }

  test("extensions: functions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT jaccard_sim(array('a','b'), array('b','c')) AS j,
                ascii_fold('Ünïcødé') AS f""").collect()
    // ø has no NFD decomposition — it survives the fold (unidecode-lite)
    assert(rows(0) == Row(1.0 / 3.0, "unicøde"))
  }

  test("vec_dot: bit-identical to the aggregate(zip_with) fold; min-length; null-safe") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (Some(Seq(0.1, 0.2, 0.3, 0.9)), Some(Seq(0.7, 0.31, 0.11))), // min-length fold
      (None, Some(Seq(1.0))) // array-level null propagates
    ).toDF("a", "b")
    val got = df.select(GraftFunctions.vecDot(col("a"), col("b"))).collect()
    val hof = df.filter(col("a").isNotNull).select(expr(
      "aggregate(zip_with(slice(a, 1, least(size(a), size(b))), slice(b, 1, least(size(a), size(b))), (x, y) -> x * y), 0D, (acc, v) -> acc + v)"))
      .as[Double].collect()
    assert(got(0).getDouble(0) == hof(0) && got(0).getDouble(0) == 32.0)
    assert(got(1).getDouble(0) == hof(1)) // exact same sequential fold
    assert(got(2).isNullAt(0))
  }

  test("vec_dot: inside whole-stage codegen") {
    val df = spark.range(3)
      .selectExpr("array(cast(id AS double), 2D) AS a", "array(3D, cast(id AS double)) AS b")
      .select(GraftFunctions.vecDot(col("a"), col("b")).as("d"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 5.0, 10.0))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
  }

  test("codegen: expressions stay inside whole-stage codegen (no UDF node)") {
    // inputs derive from range's id so they are non-foldable — a pure
    // LocalRelation would be constant-folded into a LocalTableScan and
    // prove nothing about codegen
    val df = spark.range(2)
      .select(split(concat_ws(",", lit("a"), lit("b"), col("id")), ",").as("a"),
              split(concat_ws(",", lit("b"), col("id")), ",").as("b"))
      .select(GraftFunctions.jaccardSim(col("a"), col("b")).as("j"))
    val got = df.collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(2.0 / 3.0, 2.0 / 3.0)) // {a,b,id} vs {b,id}
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
  }
}
