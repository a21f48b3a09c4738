package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.er.EntityResolution
import graft.sim.SimilarityJoin
import graft.sources.Csv

/** Golden-file parity against the reference's COMMITTED outputs (SURVEY
  * §5.1: the checked-in node/edge tables are the de-facto golden corpus).
  * Fixtures under resources/golden are byte-for-byte copies of the
  * reference's data/ and alerts/ files (Feather converted to Parquet, ns
  * timestamps to us — see tools/make_golden_fixtures.py).
  *
  * Chains covered (each reproducible purely from committed inputs):
  *  - TTP enrichment join (data_integration.ipynb c18):
  *    alert_cve_edge.csv (931 TTP pairs) >< enterprise-attack.csv
  *    == alert_ttp_data.feather (826 rows, exact).
  *  - CPE-product set-similarity join (alerts/cpe_product.ipynb c8-c15):
  *    cpe_node_data >< PRODUCT label weights == cpe_product_edge
  *    restricted to the committed cpe universe (169 rows — the notebook
  *    ran over all_parsed_cve_cpes.feather, a missing-LFS superset; on
  *    the shared 22% of cpes the edge sets match exactly, verified
  *    against pandas).
  *  - alert_nodes munge (c15-c16): alerts_nodes_munged.csv + date parse
  *    == alert_nodes.feather (286 rows, exact).
  *
  * NOT coverable from committed data (inputs missing, documented):
  * cve/cpe_node_data (raw NVD JSON gz not committed), alert_cve_edge
  * regeneration (scraped alert texts only exist inside a bs4 pickle),
  * github_langs_final (languages_final.feather is a later re-scrape — 64
  * rows differ in both directions), alert_ner_label_weights (dedupe-model
  * cluster assignments not committed).
  */
class GoldenParitySpec extends AnyFunSuite with graft.SparkTestSession {

  private lazy val goldenDir =
    new java.io.File(getClass.getResource("/golden").toURI).getAbsolutePath

  private def golden(name: String): DataFrame =
    spark.read.parquet(s"$goldenDir/$name.parquet")

  /** Order-insensitive exact row-set compare on the golden's column order. */
  private def assertRowSetEqual(ours: DataFrame, gold: DataFrame): Unit = {
    val cols = gold.columns.map(col).toSeq
    val a = ours.select(cols: _*).collect().toSeq
    val b = gold.select(cols: _*).collect().toSeq
    val oursOnly = a.diff(b)
    val goldOnly = b.diff(a)
    if (oursOnly.nonEmpty || goldOnly.nonEmpty) fail(
      s"ours ${a.size} rows vs golden ${b.size}; " +
        s"ours-only ${oursOnly.size} (first: ${oursOnly.take(3).mkString("; ")}); " +
        s"golden-only ${goldOnly.size} (first: ${goldOnly.take(3).mkString("; ")})")
  }

  test("golden: TTP enrichment join reproduces alert_ttp_data (826 rows)") {
    val pairs = Csv.read(spark, s"$goldenDir/alert_cve_edge.csv")
      .withColumnRenamed("cve_id", "ttp_id") // c17 bug: the column holds TTP ids
    val techniques = Csv.read(spark, s"$goldenDir/enterprise-attack.csv")
    val ours = Alerts.ttpEnrich(pairs, techniques)
    val gold = golden("alert_ttp_data")
    assert(gold.count() == 826)
    assertRowSetEqual(ours, gold)
  }

  test("golden: set-similarity join reproduces cpe_product_edge on the committed cpe universe") {
    val cpes = golden("cpe_node_data").select(col("cpe")).na.drop().distinct()
    val products = golden("alert_ner_label_weights")
      .filter(col("type") === "PRODUCT")
      .select(col("best_label")).na.drop().distinct()
    val ours = SimilarityJoin.cpeProductEdges(golden("cpe_node_data"), products)
      .select(col("cpe"), col("best_label"))
    val goldRestricted = golden("cpe_product_edge")
      .join(cpes, Seq("cpe"), "left_semi")
    assert(goldRestricted.count() == 169)
    assertRowSetEqual(ours, goldRestricted)
  }

  /** alert_ner_label_weights is the one committed output with no full
    * regeneration path (the dedupe model's cluster assignments were never
    * committed — header comment). Partial parity instead: (a) the table's
    * own shape/typing/referential invariants, and (b) feed its
    * (alert_id, label, type) rows back through OUR ER chain
    * (EntityResolution.resolve at the c44 thresholds) and assert what
    * re-clustering must preserve — per-(alert, type) mention mass is
    * conserved (each golden row is one mention; merging labels moves mass
    * between best_labels but never across alerts or types), and the
    * high-mass heads stay recognizable. Measured on the committed data:
    * the golden top-20 ORG is two near-dup families — seven "microsoft…"
    * variants at weight 161 and thirteen "…security agency/centre"
    * variants at 126 — which our ER collapses, so exactly 10/20 golden
    * heads survive as their own best_label (deterministic); the merged
    * "microsoft" head absorbs its family's mass. Both facts are pinned.
    */
  test("golden(partial): alert_ner_label_weights invariants + ER re-resolution conservation") {
    val gold = golden("alert_ner_label_weights").cache()
    assert(gold.count() == 15552)
    assert(gold.columns.toSeq ==
      Seq("alert_id", "best_label", "type", "weight"))
    // committed table: every (alert, label, type) appears once, weight 1
    assert(gold.filter(col("weight") =!= 1).isEmpty)
    assert(gold.select(col("type")).distinct().collect().map(_.getString(0)).toSet ==
      Set("ORG", "GPE", "PERSON", "PRODUCT"))
    // referential integrity against the committed alert universe
    val alertIds = golden("alert_nodes").select(col("alert_id"))
    assert(gold.join(alertIds, Seq("alert_id"), "left_anti").isEmpty)

    // re-resolve the golden's own labels with our deterministic ER chain
    val ner = gold.select(col("alert_id"),
      xxhash64(col("best_label"), col("type")).as("id"),
      col("best_label").as("label"), col("type"))
    val thresholds =
      Map("ORG" -> 0.6, "GPE" -> 0.55, "PERSON" -> 0.79, "PRODUCT" -> 0.64)
    val (_, _, weights) = EntityResolution.resolve(ner, thresholds)
    // conservation: mention mass per (alert, type) is invariant under
    // re-clustering
    val before = gold.groupBy(col("alert_id"), col("type"))
      .agg(sum(col("weight")).as("w"))
    val after = weights.groupBy(col("alert_id"), col("type"))
      .agg(sum(col("weight")).as("w"))
    assertRowSetEqual(after, before)
    // head stability: top-20 ORG labels by total mass
    def top20(df: DataFrame): Set[String] = df
      .filter(col("type") === "ORG")
      .groupBy(col("best_label")).agg(sum(col("weight")).as("w"))
      .orderBy(col("w").desc, col("best_label"))
      .limit(20).collect().map(_.getString(0)).toSet
    val overlap = (top20(weights) & top20(gold)).size
    assert(overlap >= 10, s"top-20 ORG overlap $overlap < 10")
    // the microsoft family (7 golden variants, weight 161 each) must
    // consolidate onto the plain "microsoft" head with at least the
    // family's per-variant mass
    val msMass = weights.filter(col("type") === "ORG" &&
        col("best_label") === "microsoft")
      .agg(sum(col("weight"))).head.getLong(0)
    assert(msMass >= 161L, s"merged microsoft mass $msMass < 161")
  }

  test("golden: CSV read + date parse reproduces alert_nodes (286 rows)") {
    val munged = Csv.read(spark, s"$goldenDir/alerts_nodes_munged.csv")
      .select(col("alert_id"), col("full_path"), col("title"),
        to_timestamp(col("date"), "yyyy-MM-dd").as("date"))
    val gold = golden("alert_nodes")
    assert(gold.count() == 286)
    assertRowSetEqual(munged, gold)
  }
}
