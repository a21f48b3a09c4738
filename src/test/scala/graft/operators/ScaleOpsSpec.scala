package graft.operators


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the scale utilities: bucketing must ELIMINATE the
  * join-time exchange, salting must spread a hot key and stay
  * row-identical to the plain join.
  */
class ScaleOpsSpec extends AnyFunSuite with graft.SparkTestSession {
  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // finalize AQE so the printed plan is the real one
    // count textually: AdaptiveSparkPlanExec does not expose the final
    // plan as tree children, so a TreeNode collect sees nothing
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
  }

  test("bucketed tables join with ZERO shuffle exchanges") {
    // (managed tables land in the default ./spark-warehouse — dropped in
    // the finally, dir gitignored)
    // force a join strategy that would otherwise shuffle both sides
    // (both the planner and AQE runtime broadcast conversions)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = spark.range(1000).select(col("id").as("k"),
        (col("id") % 7).as("v"))
      val dims = spark.range(100).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      ScaleOps.writeBucketed(facts, "facts_b", "k", 4)
      ScaleOps.writeBucketed(dims, "dims_b", "k", 4)
      val joined = spark.table("facts_b").join(spark.table("dims_b"), "k")
      assert(shuffles(joined) == 0,
        joined.queryExecution.executedPlan.toString)
      assert(joined.count() == 100)
      // same join on the raw (unbucketed) frames shuffles both sides
      val plain = facts.join(dims, "k")
      assert(shuffles(plain) >= 2)
    } finally {
      spark.sql("DROP TABLE IF EXISTS facts_b")
      spark.sql("DROP TABLE IF EXISTS dims_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("saltedJoin: row-identical to plain join, hot key spread over salts") {
    // skewed left: 10k rows of key "hot", a few of others
    val left = spark.range(10000)
      .select(when(col("id") < 9990, "hot").otherwise(concat(lit("k"), col("id")))
        .as("key"), col("id"))
    val right = Seq(("hot", 1), ("k9995", 2), ("absent", 3)).toDF("key", "r")
    val plain = left.join(right, Seq("key")).select(col("key"), col("id"), col("r"))
    val salted = ScaleOps.saltedJoin(left, right, "key", col("id"), salts = 8)
      .select(col("key"), col("id"), col("r"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the salt actually spreads the hot key: all 8 salt values occur
    val saltDist = left
      .withColumn("s", pmod(xxhash64(col("id")), lit(8)))
      .filter(col("key") === "hot")
      .select(col("s")).distinct().count()
    assert(saltDist == 8)
    // left-join semantics preserved too (unmatched keys keep null r)
    val lp = left.join(right, Seq("key"), "left")
    val ls = ScaleOps.saltedJoin(left, right, "key", col("id"), 8, "left")
    assert(ls.count() == lp.count())
  }
}
