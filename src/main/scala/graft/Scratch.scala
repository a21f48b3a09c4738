package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      e.printSchema()
      e.show(3, false)
    } catch { case ex: Throwable => println("READ FAILED: " + ex.getMessage.take(500)) }
    spark.stop()
  }
}
