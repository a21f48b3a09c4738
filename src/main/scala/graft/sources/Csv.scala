package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingest/egress boundary (SURVEY §2.1 S8, §2.2 K1/K5/K6).
  *
  * Reads are header-aware and handle QUOTE_ALL files with embedded
  * newlines (the reference's enterprise-attack.csv,
  * mitre_json_to_csv.py:153-167 writes csv.QUOTE_ALL): `multiLine` plus
  * quote-escape `""`. NOTE multiLine makes a single file non-splittable —
  * at 100 TB, CSV with embedded newlines should be a *landing* format
  * converted to parquet at the edge (many medium files parallelize by
  * file, not by block), which is exactly what [[graft.Tables]] models.
  *
  * Writes: Spark never emits a pandas-style index column, so K1
  * ("no-index CSV writer") is the default shape; `quoteAll` mirrors K2;
  * `shards` gives the K5 sharded writer (one file per partition).
  */
object Csv {
  /** S8: schema-on-read (header) or explicit schema when provided. */
  def read(spark: SparkSession, path: String,
           schema: Option[StructType] = None,
           multiLine: Boolean = true): DataFrame = {
    val base = spark.read
      .option("header", value = true)
      .option("multiLine", value = multiLine)
      .option("quote", "\"")
      .option("escape", "\"")
    schema.fold(base.option("inferSchema", value = false))(base.schema)
      .csv(path)
  }

  /** K1/K2/K5: header CSV out; `shards` controls output file count. */
  def write(df: DataFrame, path: String,
            quoteAll: Boolean = false, shards: Int = 1): Unit = {
    val out = if (shards > 0) df.repartition(shards) else df
    out.write.mode("overwrite")
      .option("header", value = true)
      .option("quoteAll", value = quoteAll)
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)
  }
}
