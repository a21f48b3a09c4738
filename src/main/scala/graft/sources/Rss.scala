package graft.sources

import java.io.ByteArrayInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RSS/Atom feed reader (SURVEY §2.1 S4 — the reference's `feedparser`
  * probe of the CISA alerts feed, alerts/parse_alert.ipynb c1-c11: one row
  * per entry with title/link/published).
  *
  * Spark shape: `binaryFile` source (one row per feed document, payload in
  * `content`) → partition-wise DOM parse → one output row per
  * `<item>`/`<entry>`. The parse is pure per-file work, so the SAME
  * function serves `spark.read` (batch) and `spark.readStream` (the
  * files-appearing-in-a-directory streaming source) — matching how the
  * reference would have productionized the probe (§7: optional Structured
  * Streaming source).
  *
  * Feeds are untrusted input: the parser disables DTDs and external
  * entities (XXE), and a document that fails to parse yields zero rows
  * rather than a failed task.
  */
object Rss {

  val schema: StructType = StructType(Seq(
    StructField("feed_title", StringType),
    StructField("title", StringType),
    StructField("link", StringType),
    StructField("published", StringType), // raw feed string; normalize below
    StructField("guid", StringType),
    StructField("summary", StringType)))

  /** Parse one feed document into (feed_title, title, link, published,
    * guid, summary) tuples. RSS 2.0 `<channel><item>` and Atom
    * `<feed><entry>` both supported.
    */
  def parseFeed(bytes: Array[Byte]): Seq[(String, String, String, String, String, String)] = {
    try {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      // hardening: no DTDs, no external entities (feeds are untrusted)
      f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      f.setFeature("http://xml.org/sax/features/external-general-entities", false)
      f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
      f.setXIncludeAware(false)
      f.setExpandEntityReferences(false)
      f.setNamespaceAware(false)
      val doc = f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))

      def childText(e: org.w3c.dom.Element, name: String): String = {
        val kids = e.getChildNodes
        var i = 0
        while (i < kids.getLength) {
          kids.item(i) match {
            case c: org.w3c.dom.Element if c.getTagName == name =>
              return Option(c.getTextContent).map(_.trim).orNull
            case _ =>
          }
          i += 1
        }
        null
      }
      def elems(parent: org.w3c.dom.Element, name: String): Seq[org.w3c.dom.Element] = {
        val out = ArrayBuffer.empty[org.w3c.dom.Element]
        val kids = parent.getChildNodes
        var i = 0
        while (i < kids.getLength) {
          kids.item(i) match {
            case c: org.w3c.dom.Element if c.getTagName == name => out += c
            case _ =>
          }
          i += 1
        }
        out.toSeq
      }

      val root = doc.getDocumentElement
      root.getTagName match {
        case "rss" =>
          elems(root, "channel").flatMap { ch =>
            val feedTitle = childText(ch, "title")
            elems(ch, "item").map { it =>
              (feedTitle, childText(it, "title"), childText(it, "link"),
                childText(it, "pubDate"), childText(it, "guid"),
                childText(it, "description"))
            }
          }
        case "feed" => // Atom
          val feedTitle = childText(root, "title")
          elems(root, "entry").map { en =>
            val link = elems(en, "link")
              .find(l => l.getAttribute("rel") == "" || l.getAttribute("rel") == "alternate")
              .map(_.getAttribute("href")).orNull
            (feedTitle, childText(en, "title"), link,
              Option(childText(en, "published")).getOrElse(childText(en, "updated")),
              childText(en, "id"), childText(en, "summary"))
          }
        case _ => Seq.empty
      }
    } catch { case _: Exception => Seq.empty } // malformed feed = no rows
  }

  private def parseRows(files: DataFrame): DataFrame = {
    implicit val enc = RowEncoder.encoderFor(schema)
    files.select(col("content"))
      .mapPartitions(_.flatMap { r =>
        parseFeed(r.getAs[Array[Byte]]("content")).map(t =>
          Row(t._1, t._2, t._3, t._4, t._5, t._6))
      })
  }

  /** Batch read: every `*.xml` under `path`, one row per feed entry, with
    * `published_ts` normalized from the two wire formats (RFC-1123 used
    * by RSS pubDate, ISO-8601 used by Atom).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    withPublishedTs(parseRows(
      spark.read.format("binaryFile").option("pathGlobFilter", "*.xml").load(path)))

  /** Streaming read of the same shape: feeds dropped into a directory
    * become entry rows (the §7 "optional Structured Streaming source").
    */
  def readStream(spark: SparkSession, path: String): DataFrame =
    withPublishedTs(parseRows(
      spark.readStream.format("binaryFile").option("pathGlobFilter", "*.xml")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .load(path)))

  /** Schema of persisted entry rows — [[readStream]]'s output drained
    * through a parquet file sink: [[schema]] plus the normalized
    * `published_ts`. Pass to `spark.read.schema(...)` on the sink dir so
    * an empty first batch still reads back well-typed.
    */
  val entrySchema: StructType =
    StructType(schema.fields :+ StructField("published_ts", TimestampType))

  /** Adapt feed entries to the scraped-alerts input shape
    * `[link, alert_id, title, date, text]` consumed by
    * `etl.Alerts.cleanAlerts` — the productionized form of the
    * reference's abandoned feedparser probe (alerts/parse_alert.ipynb
    * c1-c11 fetched the CISA feed but never joined it into the graph):
    * the alert id comes from the advisory-code title prefix (CISA's
    * "AA##-###X: ..." convention) with guid/link basenames as fallback,
    * the link is made site-relative (cleanAlerts re-prefixes the host),
    * and the published timestamp is re-formatted to the scrape's
    * "MMMM d, yyyy" date string so one cleanup stage serves both paths.
    */
  def entriesAsAlerts(entries: DataFrame): DataFrame = {
    val idFromTitle =
      // [A-Z]{2}: CISA advisory codes use both AA (alerts) and the older
      // TA (technical alerts) prefixes — the golden alert data carries
      // TA18-331A etc., and missing those would emit divergent node rows
      // when the scrape and feed paths carry the same advisory
      regexp_extract(col("title"), "^([A-Z]{2}\\d{2}-\\d{3}[A-Za-z]?)", 1)
    val idFromGuid = regexp_extract(coalesce(col("guid"), lit("")), "([^/]+?)/?$", 1)
    val idFromLink = regexp_extract(coalesce(col("link"), lit("")), "([^/]+?)/?$", 1)
    entries.select(
      regexp_replace(col("link"), "^https?://[^/]+", "").as("link"),
      coalesce(
        nullif(idFromTitle, lit("")),
        nullif(idFromGuid, lit("")),
        nullif(idFromLink, lit(""))).as("alert_id"),
      regexp_replace(col("title"), "^[A-Z]{2}\\d{2}-\\d{3}[A-Za-z]?\\s*:\\s*", "")
        .as("title"),
      date_format(col("published_ts"), "MMMM d, yyyy").as("date"),
      col("summary").as("text"))
  }

  private def withPublishedTs(entries: DataFrame): DataFrame = {
    // RFC-1123 (RSS pubDate): Spark 3+ patterns can't PARSE day-of-week
    // (EEE), so strip it and map the named UTC zones to a numeric offset
    val rfc1123 = regexp_replace(
      regexp_replace(col("published"), "^[A-Za-z]{3},\\s*", ""),
      "\\s+(GMT|UTC?)$", " +0000")
    entries.withColumn("published_ts",
      coalesce( // try_: ANSI mode must not fail the scan on junk dates
        try_to_timestamp(rfc1123, lit("d MMM yyyy HH:mm:ss Z")),
        try_to_timestamp(col("published"))))
  }
}
