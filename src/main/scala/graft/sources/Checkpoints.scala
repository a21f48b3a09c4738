package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Skip-if-exists parquet checkpointing — the reference's feather-cache
  * pattern (data_integration.ipynb c23:33-48: "the 80-min parse is why the
  * cache exists"), kept as a PIPELINE feature, not an engine feature
  * (SURVEY §4.1).
  *
  * `checkpoint(df, path)` computes and writes df only when `path` does not
  * already hold a committed dataset, then always returns the on-disk
  * DataFrame — so a re-run of a long pipeline resumes from the last
  * materialized stage (idempotence by construction, SURVEY §5.1).
  */
object Checkpoints {
  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** `force = true` recomputes even when a committed dataset exists —
    * for stages whose INPUT is known to have changed since the cached
    * run (e.g. new feed files drained this run), where skip-if-exists
    * would silently return stale data.
    */
  def checkpoint(df: => DataFrame, path: String, force: Boolean = false)
                (implicit spark: SparkSession): DataFrame = {
    if (force || !exists(spark, path))
      df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }
}
