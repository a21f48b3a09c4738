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

  test("vec_dot: exact aggregate(zip_with) semantics incl. null algebra") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (Some(Seq(0.1, 0.2, 0.3)), Some(Seq(0.7, 0.31, 0.11))),
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))), // unequal length → null (pad poisons)
      (None, Some(Seq(1.0)))                 // array-level null → null
    ).toDF("a", "b")
    val hofExpr =
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    val got = df.select(GraftFunctions.vecDot(col("a"), col("b"))).collect()
    val hof = df.select(expr(hofExpr)).collect()
    (0 until 4).foreach { i =>
      assert(got(i).isNullAt(0) == hof(i).isNullAt(0), s"row $i nullability")
      if (!got(i).isNullAt(0))
        assert(got(i).getDouble(0) == hof(i).getDouble(0), s"row $i value")
    }
    assert(got(0).getDouble(0) == 32.0)
    assert(got(2).isNullAt(0) && got(3).isNullAt(0))
  }

  test("VecDotRewrite: HOF dot products optimize into vec_dot automatically") {
    GraftFunctions.register(spark)
    val df = spark.range(4)
      .selectExpr("array(cast(id AS double), 2D, 3D) AS a",
        "array(1D, cast(id AS double), 2D) AS b")
      .selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v) AS dot")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("vec_dot"), opt)
    assert(!opt.toLowerCase.contains("aggregate(zip_with"), opt)
    // a·b = id*1 + 2*id + 3*2 = 3*id + 6
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(6.0, 9.0, 12.0, 15.0))
    // a non-dot fold must NOT be rewritten
    val keep = spark.range(1)
      .selectExpr("array(1D) AS a", "array(2D) AS b")
      .selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x + y), 0D, (acc, v) -> acc + v) AS s")
    assert(!keep.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    assert(keep.collect().head.getDouble(0) == 3.0)
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
