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

  test("writeRangePartitioned: disjoint file ranges; range scans decode a fraction of a random layout") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_range_layout")
    try {
      val sortedPath = s"$dir/sorted"
      val randomPath = s"$dir/random"
      // 10k rows; md5 order = the "however the upstream job happened to
      // partition it" layout every real table starts with
      val df = spark.range(10000).select(col("id").as("k"),
        md5(col("id").cast("string")).as("payload"))
      ScaleOps.writeRangePartitioned(df.orderBy(col("payload")), sortedPath, "k", 10)
      df.orderBy(col("payload")).repartition(10)
        .write.mode("overwrite").parquet(randomPath)

      // layout half: every file covers a disjoint k-range
      val perFile = spark.read.parquet(sortedPath)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(perFile.length == 10, perFile.mkString(","))
      perFile.sliding(2).foreach {
        case Array((_, hi), (lo, _)) => assert(hi < lo, perFile.mkString(","))
        case _ =>
      }
      // and nothing was lost or duplicated
      assert(spark.read.parquet(sortedPath).count() == 10000)

      // pruning half: rows the scan DECODES for a 1% range predicate —
      // with disjoint sorted files, parquet row-group min/max stats keep
      // all but ~one file out of the reader; a random layout decodes
      // every row-group because each spans the full key range
      def scanRows(path: String): Long = {
        val q = spark.read.parquet(path).filter(col("k") >= 4000 && col("k") < 4100)
        q.collect()
        val plan = q.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        plan.collect { case f: FileSourceScanExec =>
          f.metrics("numOutputRows").value }.sum
      }
      val pruned = scanRows(sortedPath)
      val full = scanRows(randomPath)
      assert(full == 10000L, s"random layout unexpectedly pruned: $full")
      // the 1% predicate straddles at most a couple of sampled range
      // boundaries: <= 3 of 10 files decode (vs all of them above)
      assert(pruned <= 3000L, s"range layout decoded $pruned of 10000 rows")
    } finally {
      import java.nio.file._
      import java.util.Comparator
      Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
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
