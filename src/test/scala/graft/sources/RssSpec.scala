package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S4: the reference probed the CISA alerts RSS feed with feedparser
  * (alerts/parse_alert.ipynb c1-c11 — title/link/published per entry) and
  * abandoned it for batch scraping; this is the productionized version.
  */
class RssSpec extends AnyFunSuite with graft.SparkTestSession {

  private val cisaShaped =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<rss version="2.0">
      |  <channel>
      |    <title>CISA Cybersecurity Advisories</title>
      |    <link>https://www.cisa.gov/</link>
      |    <item>
      |      <title>AA24-109A: Compromise of X</title>
      |      <link>https://www.cisa.gov/advisories/aa24-109a</link>
      |      <pubDate>Thu, 18 Apr 2024 12:00:00 GMT</pubDate>
      |      <guid>https://www.cisa.gov/advisories/aa24-109a</guid>
      |      <description>Advisory text one.</description>
      |    </item>
      |    <item>
      |      <title>AA24-110B: Second advisory</title>
      |      <link>https://www.cisa.gov/advisories/aa24-110b</link>
      |      <pubDate>Fri, 19 Apr 2024 09:30:00 GMT</pubDate>
      |      <guid>guid-2</guid>
      |      <description>Advisory text two.</description>
      |    </item>
      |  </channel>
      |</rss>""".stripMargin

  private val atom =
    """<?xml version="1.0" encoding="utf-8"?>
      |<feed xmlns="http://www.w3.org/2005/Atom">
      |  <title>Atom Feed</title>
      |  <entry>
      |    <title>Entry One</title>
      |    <link rel="alternate" href="https://example.org/1"/>
      |    <id>urn:1</id>
      |    <published>2024-04-18T12:00:00Z</published>
      |    <summary>First.</summary>
      |  </entry>
      |</feed>""".stripMargin

  test("rss 2.0 and atom documents parse to entry rows; malformed yields none") {
    val rss = Rss.parseFeed(cisaShaped.getBytes("UTF-8"))
    assert(rss.size == 2)
    assert(rss.head == ("CISA Cybersecurity Advisories",
      "AA24-109A: Compromise of X",
      "https://www.cisa.gov/advisories/aa24-109a",
      "Thu, 18 Apr 2024 12:00:00 GMT",
      "https://www.cisa.gov/advisories/aa24-109a",
      "Advisory text one."))
    val at = Rss.parseFeed(atom.getBytes("UTF-8"))
    assert(at == Seq(("Atom Feed", "Entry One", "https://example.org/1",
      "2024-04-18T12:00:00Z", "urn:1", "First.")))
    assert(Rss.parseFeed("<html>not a feed</html>".getBytes).isEmpty)
    assert(Rss.parseFeed("no xml here".getBytes).isEmpty)
    // XXE probe: doctype is rejected, not resolved
    val xxe = """<?xml version="1.0"?><!DOCTYPE r [<!ENTITY x SYSTEM
      |"file:///etc/passwd">]><rss version="2.0"><channel><title>&x;</title>
      |</channel></rss>""".stripMargin
    assert(Rss.parseFeed(xxe.getBytes).isEmpty)
  }

  test("batch read over a directory normalizes published timestamps") {
    val dir = Files.createTempDirectory("rss").toFile
    Files.write(Paths.get(dir.toString, "cisa.xml"), cisaShaped.getBytes("UTF-8"))
    Files.write(Paths.get(dir.toString, "atom.xml"), atom.getBytes("UTF-8"))
    Files.write(Paths.get(dir.toString, "junk.xml"), "not xml".getBytes("UTF-8"))
    val df = Rss.read(spark, dir.toString).cache()
    assert(df.count() == 3)
    // both wire formats normalized to the same timestamp type and instant
    val ts = df.filter(col("published_ts").isNotNull)
      .select(col("published_ts").cast("string")).collect().map(_.getString(0)).sorted
    assert(ts.length == 3)
    assert(ts.head.startsWith("2024-04-18 12:00:00")) // RFC-1123 == ISO instant
    val feeds = df.select(col("feed_title")).distinct().collect().map(_.getString(0)).toSet
    assert(feeds == Set("CISA Cybersecurity Advisories", "Atom Feed"))
  }

  test("streaming read emits the same rows as batch (file-drop source)") {
    val dir = Files.createTempDirectory("rss-stream").toFile
    Files.write(Paths.get(dir.toString, "cisa.xml"), cisaShaped.getBytes("UTF-8"))
    val q = Rss.readStream(spark, dir.toString)
      .writeStream.format("memory").queryName("rss_entries")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("rss_entries")
    assert(got.count() == 2)
    assert(got.select(col("title")).collect().map(_.getString(0)).toSet ==
      Set("AA24-109A: Compromise of X", "AA24-110B: Second advisory"))
  }
}
