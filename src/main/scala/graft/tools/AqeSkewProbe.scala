package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables

/** Relational join-key skew rehearsal: the brief's third skew class
  * (beside the LSH band bucket and the similarity-join hot token) is a
  * hot EQUI-JOIN key — one customer owning a constant fraction of all
  * orders. The engine's answer here is deliberately NOT hand-rolled:
  * Spark's AQE skew-join (`spark.sql.adaptive.skewJoin`, ON by default
  * since 3.2) splits oversized shuffle partitions at runtime, which is
  * exactly what the brief's "salting for skew, AQE for runtime re-plan"
  * prescribes. This probe MEASURES that the default config actually
  * engages on this engine's join shape instead of declaring it:
  *
  *  - materialize a skewed copy of orders (the `% 5 == 1` fifth of all
  *    rows re-keyed to ONE hot customer — SkewData's distribution on the
  *    join key), sized ×N via ScaleData-style unioned key-shifted copies
  *    of the healthy remainder so the hot partition dominates;
  *  - run the q03-shape sort-merge join customer ⋈ orders twice: AQE
  *    skew handling ON (default) and OFF (same session, per-query conf);
  *  - report wall times and whether the executed plan shows the skew
  *    split (`isSkew=true` partitions in the exchange read).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.AqeSkewProbe [copies]
  */
object AqeSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = args.headOption.map(_.toInt).getOrElse(20)
    val spark = ToolSession.local()
    import spark.implicits._

    val orders0 = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val customer = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"))
    val hotKey = customer.agg(min(col("c_custkey"))).as[Long].head()

    // x`copies` orders with key-shifted order keys; every 5th row re-keyed
    // to the ONE hot customer (customers are NOT scaled, so the hot key
    // owns ~20% of a corpus `copies`x the base — one shuffle partition)
    val stride = orders0.agg(max(col("o_orderkey"))).as[Long].head() + 1
    val big = (0 until copies).map { i =>
      orders0.select(
        (col("o_orderkey") + lit(i * stride)).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice"))
    }.reduce(_ unionByName _)
      .withColumn("o_custkey",
        when(pmod(col("o_orderkey"), lit(5)) === 1, lit(hotKey))
          .otherwise(col("o_custkey")))
    val work = java.nio.file.Files.createTempDirectory("graft_aqe").toString
    big.write.mode("overwrite").parquet(s"$work/orders.parquet")
    val orders = spark.read.parquet(s"$work/orders.parquet")
    val n = orders.count()
    println(s"[aqeskew] $n orders, hot key owns ~${n / 5} rows")

    def run(label: String, skewOn: Boolean): (Double, Boolean) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      // force the sort-merge path: a broadcast of the dim side would hide
      // the skewed shuffle this probe exists to exercise
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // thresholds scaled to the rehearsal corpus: the defaults (256 MB
      // skewed-partition threshold, 64 MB advisory target) are sized for
      // production shuffles and a ~15 MB hot partition rightly does not
      // trigger them; at 100 TB the same 20%-hot distribution crosses the
      // DEFAULT thresholds naturally. Scaling them down exercises the
      // split MECHANISM on rehearsal data instead of declaring it.
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      val q = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name")).agg(sum(col("o_totalprice")).as("rev"))
      // execute through THIS DataFrame's own QueryExecution: df.count()
      // builds a separate one, so inspecting q.queryExecution afterward
      // would show the INITIAL adaptive plan, never the final skew reads
      val qe = q.queryExecution
      val t0 = System.nanoTime()
      assert(qe.toRdd.count() > 0)
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = qe.executedPlan.toString
      // Spark 4 markers: the SMJ prints "SortMergeJoin(skew=true)" and the
      // shuffle read "AQEShuffleRead coalesced and skewed" / "skewed"
      val split = plan.contains("skew=true") || plan.contains("skewed")
      plan.linesIterator.filter(_.toLowerCase.contains("skew"))
        .take(2).foreach(l => println(s"[aqeskew]   plan: ${l.trim.take(100)}"))
      println(f"[aqeskew] $label%-18s $sec%6.2f s, skew-split in plan: $split")
      (sec, split)
    }
    run("warmup", skewOn = true)
    val (onSec, onSplit) = run("skewJoin ON", skewOn = true)
    val (offSec, _) = run("skewJoin OFF", skewOn = false)
    println(s"""{"metric":"aqe_skew","orders":$n,"hot_fraction":0.2,""" +
      s""""skew_on_sec":$onSec,"skew_on_split":$onSplit,""" +
      s""""skew_off_sec":$offSec,"sf":"$dir","copies":$copies}""")
    spark.stop()
  }
}
