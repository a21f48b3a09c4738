package graft

import org.apache.spark.sql.SparkSession

/** One quiet local session per suite (spark_guide: lazy val per suite). */
trait SparkTestSession {
  lazy val spark: SparkSession = {
    val s = graft.Tables.requiredConf.foldLeft(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
