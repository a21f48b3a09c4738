package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Dev-only profiling harness: run one gate N times against a SF dir,
  * print per-rep wall time and (optionally) the formatted plan. Not part
  * of the driver contract — local feedback loop for plan iteration.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.Profile <gate> [reps] [explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("d10_sim_join_declarative")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val doExplain = args.lift(2).contains("explain")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = ToolSession.local()
    val fn = SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name rep$i: $t%.3f s rows=$n")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
  }
}
