package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** NVD CVE 1.1 feed ingest (reference: parse_cve_json_data.py:34-134 and
  * data_integration.ipynb c21-c23).
  *
  * The reference walks ~200k CVE items row-at-a-time through 12 compiled
  * JSONPath expressions (its hottest loop, ~80 min cold). Here the whole
  * pipeline is ONE declarative plan: a schema-pruned json scan → explode →
  * dot-path projections → three writes sharing the scan via persist().
  * The declared nested schema (a) skips Spark's schema inference pass and
  * (b) lets the json reader prune everything outside the 9 needed fields —
  * at 100 TB the scan reads only these columns.
  *
  * Year-to-year drift (2002 feeds lack baseMetricV3,
  * parse_cve_json_data.py:82-95) maps to nullable dot-paths — no special
  * casing needed.
  */
object Nvd {
  /** Hand-declared subset of the NVD 1.1 schema (FIXTURES.md §2),
    * in DDL form for readability.
    */
  val nvdSchema: StructType = StructType.fromDDL(
    """CVE_Items ARRAY<STRUCT<
         cve: STRUCT<
           CVE_data_meta: STRUCT<ID: STRING>,
           references: STRUCT<reference_data: ARRAY<STRUCT<
             url: STRING, name: STRING, refsource: STRING,
             tags: ARRAY<STRING>>>>,
           description: STRUCT<description_data: ARRAY<STRUCT<
             lang: STRING, value: STRING>>>>,
         impact: STRUCT<baseMetricV3: STRUCT<
           cvssV3: STRUCT<baseScore: DOUBLE, attackVector: STRING>,
           exploitabilityScore: DOUBLE, impactScore: DOUBLE>>,
         publishedDate: STRING,
         configurations: STRUCT<nodes: ARRAY<STRUCT<
           operator: STRING,
           cpe_match: ARRAY<STRUCT<vulnerable: BOOLEAN, cpe23Uri: STRING>>,
           children: ARRAY<STRUCT<
             cpe_match: ARRAY<STRUCT<vulnerable: BOOLEAN, cpe23Uri: STRING>>>>>>>>>""")

  /** Read feed files (gzip decompressed transparently; one file per task —
    * acceptable at 21 yearly feeds, SURVEY §2.1 S1) and explode to one row
    * per CVE item.
    */
  def readItems(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(nvdSchema).option("multiLine", value = true).json(path)
      .select(explode(col("CVE_Items")).as("item"))

  /** cve_node_data: id, CVSSv3 scores (null pre-v3), published, joined
    * descriptions (" -|- ", parse_cve_json_data.py:101).
    * `published` is normalized to timestamp (reference keeps the ISO
    * string — documented divergence, SURVEY §1.2).
    */
  def cveNodes(items: DataFrame): DataFrame =
    items.select(
      col("item.cve.CVE_data_meta.ID").as("cve_id"),
      col("item.impact.baseMetricV3.cvssV3.baseScore").as("score"),
      col("item.impact.baseMetricV3.exploitabilityScore").as("exploitability"),
      col("item.impact.baseMetricV3.impactScore").as("impact"),
      col("item.impact.baseMetricV3.cvssV3.attackVector").as("attack_vector"),
      to_timestamp(col("item.publishedDate"), "yyyy-MM-dd'T'HH:mmX").as("published"),
      array_join(
        expr("transform(item.cve.description.description_data, d -> d.value)"),
        " -|- ").as("description"))

  /** cve_references: one row per (reference, tag); references without tags
    * keep a null tag row (pandas explode-of-empty semantics,
    * parse_cve_json_data.py:121-126 → explode_outer).
    */
  def cveReferences(items: DataFrame): DataFrame =
    items.select(
      col("item.cve.CVE_data_meta.ID").as("cve_id"),
      explode(col("item.cve.references.reference_data")).as("ref"))
      .select(
        col("ref.url").as("url"),
        col("ref.name").as("name"),
        col("ref.refsource").as("refsource"),
        explode_outer(col("ref.tags")).as("tag"),
        col("cve_id"))

  /** cpe_node_data: vendor_product from vulnerable cpe23Uris
    * (fields 3-4 of the colon-split URI, '_'-joined —
    * parse_cve_json_data.py:105-108), distinct per (cve, cpe).
    * Includes nodes[].children[].cpe_match (AND-configs); the reference's
    * JSONPath also mixes versionEndIncluding values into the list
    * producing empty-string cpe rows — a quirk we deliberately do NOT
    * replicate (SURVEY §5.3 family).
    */
  def cpeNodes(items: DataFrame): DataFrame = {
    def vendorProduct(uri: Column): Column =
      concat_ws("_", slice(split(uri, ":"), 4, 2))
    val topLevel = items.select(
      col("item.cve.CVE_data_meta.ID").as("cve_id"),
      explode(col("item.configurations.nodes")).as("node"))
    val direct = topLevel.select(col("cve_id"),
      explode(col("node.cpe_match")).as("m"))
    val nested = topLevel.select(col("cve_id"),
      explode(col("node.children")).as("child"))
      .select(col("cve_id"), explode(col("child.cpe_match")).as("m"))
    direct.unionByName(nested)
      .filter(col("m.vulnerable") === true)
      .select(vendorProduct(col("m.cpe23Uri")).as("cpe"), col("cve_id"))
      .distinct()
  }

  /** Full pipeline: one shared scan → the three tables (§3.2's single
    * declarative plan). Caller persists/writes.
    */
  def parseAll(spark: SparkSession, path: String): (DataFrame, DataFrame, DataFrame) = {
    val items = readItems(spark, path).persist()
    (cveNodes(items), cveReferences(items), cpeNodes(items))
  }
}
