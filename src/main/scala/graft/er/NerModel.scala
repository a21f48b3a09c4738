package graft.er

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextClean

/** Pluggable NER inference boundary (SURVEY §2.11 N2 — the reference runs
  * spaCy over alert texts in data_integration.ipynb c28-c29 and commits
  * the output as a fixture).
  *
  * `annotate` maps an alerts table to one row per extracted mention:
  * `(alert_id: String, label: String, type: String)`. A production
  * implementation would batch texts through `mapPartitions` (load the
  * model once per partition, score a batch per call — the standard Spark
  * inference shape; model libs are not in this container, so none ships
  * here). The two shipped implementations keep the pipeline fully
  * deterministic:
  *
  *  - [[FixtureNerModel]] joins pre-labeled mentions by alert_id — the
  *    committed-fixture strategy (FIXTURES.md: engine tests never run a
  *    model);
  *  - [[HeuristicNerModel]] extracts capitalized multi-word spans with a
  *    codegen'd regexp — a model-free fallback so the end-to-end pipeline
  *    runs standalone.
  */
trait NerModel {
  def annotate(alerts: DataFrame, textCol: String): DataFrame
}

/** Pre-labeled mentions (alert_id, label, type) joined to the alert set. */
case class FixtureNerModel(mentions: DataFrame) extends NerModel {
  override def annotate(alerts: DataFrame, textCol: String): DataFrame =
    alerts.select(col("alert_id")).distinct()
      .join(mentions.select(col("alert_id"), col("label"), col("type")),
        Seq("alert_id"), "inner")
}

/** Capitalized 2+-word spans (e.g. "Federal Bureau of Investigation") as
  * UNK-typed mentions; cleans the text with the c27 cascade first.
  */
object HeuristicNerModel extends NerModel {
  private val spanPattern =
    "([A-Z][a-zA-Z]+(?: (?:of|the|for)?[ ]?[A-Z][a-zA-Z]+)+)"

  override def annotate(alerts: DataFrame, textCol: String): DataFrame =
    alerts.select(col("alert_id"),
        explode(regexp_extract_all(
          TextClean.cleanForNer(col(textCol)), lit(spanPattern), lit(1))).as("label"))
      .withColumn("type", lit("UNK"))
}
