package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CISA alerts ETL (reference: data_integration.ipynb c7-c18).
  *
  * The scrape itself is an ingest boundary (SURVEY §2.1 S3) — this module
  * takes the scraped table `[link, alert_id, title, date, text]` (fixture
  * -fed in tests) and produces the node/edge tables.
  */
object Alerts {
  /** CVE id pattern (c12: `(CVE-\d{4}-\d*)`). */
  val cvePattern = "(CVE-\\d{4}-\\d*)"

  /** TTP pattern (c11: `(\[|\s)(T\d{4})\.?\d*(\]|\s)`), id in group 2. */
  val ttpPattern = "(\\[|\\s)(T\\d{4})\\.?\\d*(\\]|\\s)"

  /** c15 cleanup: alert id " :" strip, date prefix/suffix cleanup +
    * timestamp parse, full CISA path; c12 extraction: sorted distinct CVE
    * and TTP id lists per alert (regex findall → set → sorted, E5/U3/O1).
    */
  def cleanAlerts(raw: DataFrame): DataFrame =
    raw
      .withColumn("alert_id", trim(regexp_replace(col("alert_id"), " :", "")))
      .withColumn("date", try_to_timestamp(
        // try_: a junk date cell must yield a null row, not fail the job
        // under ANSI mode (the Rss.withPublishedTs convention)
        trim(regexp_replace(
          regexp_replace(col("date"), "Original release date: ", ""),
          "\\|.*", "")),
        lit("MMMM d, yyyy")))
      .withColumn("full_path", concat(lit("https://www.cisa.gov"), col("link")))
      .withColumn("cve_list",
        array_sort(array_distinct(regexp_extract_all(col("text"), lit(cvePattern), lit(1)))))
      .withColumn("ttp_list",
        array_sort(array_distinct(regexp_extract_all(col("text"), lit(ttpPattern), lit(2)))))

  /** alert_nodes (c16): projected + distinct. */
  def alertNodes(alerts: DataFrame): DataFrame =
    alerts.select(col("alert_id"), col("full_path"), col("title"), col("date"))
      .distinct()

  /** alert_cve edges (c17 — CORRECTED). The reference explodes the TTP
    * column and renames it cve_id, so its committed alert_cve_edge.csv
    * contains TTP ids (SURVEY §5.3). `replicateReferenceBug = true`
    * reproduces that behaviour for golden-parity checks; default emits
    * real CVE edges. Plain explode + na.drop reproduces pandas
    * explode-then-dropna semantics (E1/P7).
    */
  def alertCveEdges(alerts: DataFrame, replicateReferenceBug: Boolean = false): DataFrame = {
    val src = if (replicateReferenceBug) col("ttp_list") else col("cve_list")
    alerts.select(col("alert_id"), explode(src).as("cve_id"))
      .distinct()
      .na.drop()
  }

  /** TTP-pair enrichment with MITRE technique data (c18: inner join —
    * "Ok losing any TTPs without the data needed"; techniques ~4k rows ⇒
    * broadcast, J1). Input is (alert_id, ttp_id) pairs.
    */
  def ttpEnrich(alertTtpPairs: DataFrame, techniques: DataFrame): DataFrame =
    alertTtpPairs
      .join(broadcast(techniques.withColumnRenamed("id", "ttp_id")),
        Seq("ttp_id"), "inner")
      .select((Seq(col("alert_id"), col("ttp_id")) ++
        techniques.columns.filter(_ != "id").map(col)): _*)

  /** alert_ttp edges from raw alerts (explode + distinct + enrich). */
  def alertTtpEdges(alerts: DataFrame, techniques: DataFrame): DataFrame =
    ttpEnrich(
      alerts.select(col("alert_id"), explode(col("ttp_list")).as("ttp_id")).distinct(),
      techniques)
}
