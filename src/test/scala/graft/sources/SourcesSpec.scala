package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite with graft.SparkTestSession {

  test("checkpoint: computes once, then reads from disk (skip-if-exists)") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val dir = Files.createTempDirectory("ckpt").toString + "/stage1"
    var computes = 0
    def expensive = { computes += 1; Seq(1, 2, 3).toDF("x") }
    val first = Checkpoints.checkpoint(expensive, dir)
    assert(first.count() == 3 && computes == 1)
    val second = Checkpoints.checkpoint(expensive, dir)
    assert(second.count() == 3)
    assert(computes == 1, "second call must skip recompute")
  }

  test("rate limiter: sleeps only when the window budget is exhausted") {
    var clock = 0L
    var slept = Vector.empty[Long]
    val rl = new RateLimiter(2, 1000,
      now = () => clock,
      sleep = ms => { slept :+= ms; clock += ms })
    rl.acquire(); rl.acquire() // budget of 2 used, no sleep
    assert(slept.isEmpty)
    rl.acquire() // third within the window -> sleeps the remainder
    assert(slept == Vector(1000L))
    clock += 10
    rl.acquire() // fresh window has budget
    assert(slept.size == 1)
  }

  test("SQL surface: gate queries are answerable via spark.sql temp views") {
    graft.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val viaSql = spark.sql(
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer
         GROUP BY c_mktsegment ORDER BY c_mktsegment""").collect()
    val viaDf = {
      import org.apache.spark.sql.functions._
      graft.Tables.load(spark, "/root/testdata/sf0.001", "customer")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment")).collect()
    }
    assert(viaSql.map(r => (r.getString(0), r.getLong(1))).toSeq ==
           viaDf.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }
}
