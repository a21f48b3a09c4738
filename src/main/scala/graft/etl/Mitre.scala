package graft.etl

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MITRE ATT&CK STIX 2.0 ingest (reference: mitre_json_to_csv.py:14-193).
  *
  * Bundle → explode(objects) → revoked/deprecated filter → techniques
  * table with tactic names resolved via a broadcast join (the reference
  * builds a Python dict; same lookup, distributed).
  */
object Mitre {

  /** minimd text-mode markdown cleanup (mitre_json_to_csv.py:62-101):
    * headers → "# x #", <code> → backticks, attack.mitre.org links →
    * dotted ids, <br> → newline. One-time ingest cleanup (SURVEY F14).
    *
    * [[minimdCol]] is the production form: a pure `regexp_replace` chain
    * (whole-stage codegen, engine-portable). The link rewrite's computed
    * replacement (`group(2).replace("/", ".")`) is expressed by first
    * fencing the captured id in U+0001 markers, then folding `/` → `.`
    * inside fences with a bounded regexp cascade (MITRE ids have at most
    * one sub-path segment; 3 passes is headroom), then dropping fences.
    * [[minimdText]] stays as the scalar reference implementation the
    * parity test checks the Column chain against.
    */
  private val M = "\u0001" // fence marker: cannot occur in STIX JSON text
  def minimdCol(c: Column): Column = {
    val headers = regexp_replace(c, "(?:^|\n)#+([^\n]*)", "# $1 #\n")
    val code = regexp_replace(headers, "(?s)<code>(.*?)</code>", "`$1`")
    // drop any pre-existing marker char so a hostile payload cannot trick
    // the slash-folding into touching non-link text
    val safe = regexp_replace(code, M, "")
    val marked = regexp_replace(safe,
      "https://attack\\.mitre\\.org/(techniques|tactics|software)/([^\\])\"]+)",
      M + "$2" + M)
    val dotted = (1 to 3).foldLeft(marked)((acc, _) =>
      regexp_replace(acc, M + "([^" + M + "/]*)/", M + "$1."))
    regexp_replace(regexp_replace(dotted, M, ""), "<br>", "\n")
  }

  private val headerPat = Pattern.compile("(?:^|\n)#+([^\n]*)")
  private val codePat = Pattern.compile("<code>(.*?)</code>", Pattern.DOTALL)
  private val mtilPat = Pattern.compile(
    "https://attack\\.mitre\\.org/(techniques|tactics|software)/([^\\])\"]+)")

  /** Scalar reference implementation of [[minimdCol]] (exact reference
    * semantics with precompiled patterns); used by the parity spec only.
    */
  def minimdText(s: String): String = {
    if (s == null) return null
    var out = headerPat.matcher(s).replaceAll("# $1 #\n")
    out = codePat.matcher(out).replaceAll("`$1`")
    val m = mtilPat.matcher(out)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(out, last, m.start())
      sb.append(m.group(2).replace("/", "."))
      last = m.end()
    }
    sb.append(out.substring(last))
    sb.toString.replace("<br>", "\n")
  }

  /** Read a STIX bundle; enforces spec_version 2.0 like the reference's
    * assert (mitre_json_to_csv.py:25).
    */
  def readBundle(spark: SparkSession, path: String): DataFrame = {
    val bundle = spark.read.option("multiLine", value = true).json(path)
    require(bundle.columns.contains("spec_version"), "missing spec_version")
    require(bundle.columns.contains("objects"), "missing objects")
    val ver = bundle.select(col("spec_version")).first().getString(0)
    require(ver == "2.0", s"Unsupported STIX version $ver")
    bundle.select(explode(col("objects")).as("o")).select(col("o.*"))
  }

  /** Objects with revoked/x_mitre_deprecated dropped (S5 mapping). */
  def liveObjects(objects: DataFrame): DataFrame = {
    val revoked = if (objects.columns.contains("revoked"))
      coalesce(col("revoked"), lit(false)) else lit(false)
    val deprecated = if (objects.columns.contains("x_mitre_deprecated"))
      coalesce(col("x_mitre_deprecated"), lit(false)) else lit(false)
    objects.filter(!revoked && !deprecated)
  }

  /** tactics: shortname -> display name (broadcast dimension). */
  def tactics(objects: DataFrame): DataFrame =
    liveObjects(objects).filter(col("type") === "x-mitre-tactic")
      .select(col("x_mitre_shortname").as("phase_name"),
              col("name").as("tactic_name"))

  /** enterprise-attack techniques table: the reference's CSV columns
    * (name, id, url, platforms, "kill chain phases", description,
    * "data sources", detection), sorted by technique id
    * (mitre_json_to_csv.py:170).
    *
    * The mitre-attack external reference wins LAST on duplicates (the
    * reference's loop overwrites), phase order is preserved via
    * posexplode, and kill-chain phases are resolved to tactic names.
    */
  def techniques(spark: SparkSession, objects: DataFrame): DataFrame = {
    val ap = liveObjects(objects).filter(col("type") === "attack-pattern")
      .withColumn("mitre_ref", try_element_at(
        // try_: an attack-pattern with no mitre-attack reference yields an
        // EMPTY filtered array, and plain element_at(empty, -1) throws
        // under Spark 4's default ANSI mode — the isNotNull drop below is
        // the intended path for such rows
        expr("filter(external_references, r -> r.source_name = 'mitre-attack')"), lit(-1)))
      .filter(col("mitre_ref").isNotNull)
      .select(
        col("id").as("stix_id"),
        col("mitre_ref.external_id").as("ttp_id"),
        coalesce(col("name"), lit("")).as("name"),
        col("mitre_ref.url").as("url"),
        coalesce(col("x_mitre_platforms"), array()).as("platforms_arr"),
        coalesce(col("kill_chain_phases"),
          array()).as("phases_arr"),
        coalesce(col("x_mitre_data_sources"), array()).as("sources_arr"),
        coalesce(col("description"), lit("")).as("description_raw"),
        coalesce(col("x_mitre_detection"), lit("")).as("detection_raw"))

    // phases: keep mitre-attack chain, map to tactic display names,
    // preserve order (posexplode + ordered re-agg)
    val phaseNames = ap.select(col("stix_id"),
        posexplode_outer(expr(
          "filter(phases_arr, p -> p.kill_chain_name = 'mitre-attack')")))
      .join(broadcast(tactics(objects)),
        col("col.phase_name") === col("phase_name"), "left")
      .groupBy(col("stix_id"))
      .agg(concat_ws(", ", array_compact(expr(
        "transform(array_sort(collect_list(struct(pos, tactic_name))), x -> x.tactic_name)")))
        .as("kill_chain_phases"))

    ap.join(phaseNames, Seq("stix_id"), "left")
      .select(
        col("name"),
        col("ttp_id").as("id"),
        col("url"),
        concat_ws(", ", col("platforms_arr")).as("platforms"),
        coalesce(col("kill_chain_phases"), lit("")).as("kill chain phases"),
        minimdCol(col("description_raw")).as("description"),
        concat_ws(", ", col("sources_arr")).as("data sources"),
        minimdCol(col("detection_raw")).as("detection"))
      .orderBy(col("id"))
  }

  /** K2: quote-all CSV writer matching csv.QUOTE_ALL
    * (mitre_json_to_csv.py:153-167).
    */
  def writeCsvQuoteAll(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", value = true)
      .option("quoteAll", value = true)
      .csv(path)
}
