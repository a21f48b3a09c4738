package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GitHub enrichment ETL (reference: gitlinks/gitapi.py + data_integration
  * .ipynb c52-c75). The rate-limited API fetch itself is an ingest
  * boundary (S6); this module covers the dataflow around it:
  * URL→repo-path derivation (F8), incremental-skip anti-join (P5/G6),
  * payload flattening (E3/E4), the bot filter, and the re-join to the
  * refs table by EXPLICIT repo-url key — replacing the reference's
  * fragile positional row-index join (J4, SURVEY §7.4 risk 3).
  */
object GitHub {

  /** GitHub reference URLs from the CVE references table (c52: contains
    * filter + distinct, P6/A4).
    */
  def githubRefUrls(cveReferences: DataFrame): DataFrame =
    cveReferences.filter(col("url").contains("github"))
      .select(col("url"), col("cve_id"))
      .distinct()

  /** c54: repo API url = "https://api.github.com/repos" + first two path
    * segments (urlsplit().path.split("/")[:3] re-joined).
    */
  def repoApiUrl(url: Column): Column =
    concat(lit("https://api.github.com/repos"),
      concat_ws("/", slice(split(parse_url(url, lit("PATH")), "/"), 1, 3)))

  /** Incremental fetch skip-list (gitapi.py:123-135): drop repo urls
    * already present in prior output — a left-anti join, not a driver
    * loop.
    */
  def pendingRepos(repoUrls: DataFrame, alreadyFetched: DataFrame): DataFrame =
    repoUrls.join(alreadyFetched.select(col("url")).distinct(),
      Seq("url"), "left_anti")

  /** languages payload {lang: bytes} → one row per language (E3 map
    * explode; the reference's c71 Python row loop).
    */
  def languagesTable(rawLanguages: DataFrame): DataFrame =
    rawLanguages.filter(col("status") === "success")
      .select(col("url"), explode(col("languages")).as(Seq("language", "bytes")))

  /** contributors payload → one row per login, bots dropped (E4 + P5).
    * NOTE: the reference passes "[bot]" to pandas str.contains un-escaped,
    * so it's a regex CHAR CLASS matching any of b/o/t — dropping e.g.
    * "bob". We use a literal contains and document the divergence
    * (SURVEY §5.3).
    */
  def contributorsTable(rawContributors: DataFrame): DataFrame =
    rawContributors.filter(col("status") === "success")
      .select(col("url"), explode(col("contributors")).as("c"))
      .select(col("url"), col("c.login").as("logins"),
        col("c.contributions").as("contributions"))
      .filter(!col("logins").contains("[bot]"))
      .dropDuplicates()

  /** Executor-side fetch of the pending frontier through the live-HTTP
    * DataSourceV2 ([[graft.sources.HttpSource]]) — replaces the
    * reference's driver-side request loop (gitapi.py:142-186) with a
    * partition-parallel, rate-limited, resumable source read. `raw.body`
    * feeds [[languagesTable]]/[[contributorsTable]] after `from_json`.
    *
    * The pending set is the INCREMENTAL frontier (post-[[pendingRepos]]
    * anti-join), so collecting the URL column to plan partitions is
    * bounded by new-repos-per-run, not corpus size; for a full backfill
    * pass a file via the source's `urlsPath` option instead.
    */
  def fetchPending(spark: SparkSession, pendingUrls: DataFrame,
                   requestsPerWindow: Int, windowMillis: Long,
                   alreadyFetchedUrls: Seq[String] = Nil): DataFrame = {
    val urls = pendingUrls.select(col("url")).distinct()
      .collect().map(_.getString(0))
    spark.read.format("graft.sources.HttpSource")
      .option("urls", urls.mkString(","))
      .option("requestsPerWindow", requestsPerWindow)
      .option("windowMillis", windowMillis)
      .option("skipUrls", alreadyFetchedUrls.mkString(","))
      .load()
  }

  /** J4 replacement: re-join payload tables to the refs table on the
    * explicit repo API url key (never a positional index — positional ids
    * are nondeterministic under partitioning).
    */
  def joinToRefs(refsWithRepo: DataFrame, payload: DataFrame,
                 requireCols: Seq[String] = Nil): DataFrame = {
    val joined = refsWithRepo
      .join(payload, refsWithRepo("repo_url") === payload("url"), "left")
      .drop(payload("url"))
    if (requireCols.nonEmpty) joined.na.drop(requireCols) else joined
  }
}
