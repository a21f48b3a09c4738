package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.er.FixtureNerModel
import graft.sources.Csv

/** End-to-end pipeline over the ingest fixtures: every stage A-F runs,
  * the exported CSV set is readable and non-degenerate, and a re-run
  * resumes from the stage checkpoints without recomputing them.
  */
class PipelineSpec extends AnyFunSuite with graft.SparkTestSession {
  import spark.implicits._

  private def res(p: String) = getClass.getResource(p).getPath

  private lazy val base = Files.createTempDirectory("graft_pipeline").toString

  private lazy val conf = {
    // scraped-alerts boundary: raw table as parquet. The text embeds a CVE
    // the NVD fixture knows (github ref) and the TTP the MITRE fixture has.
    Seq(
      ("/alert/aa22-001a", "AA22-001A :", "Fixture Alert",
       "Original release date: January 5, 2022 | Last revised: February 1, 2022",
       "Actors exploit CVE-2022-0001 with scripting [T1064] tricks. " +
         "The Evil Corp group and Evil Corp again; also Initech Systems."),
      ("/alert/aa22-002a", "AA22-002A", "Second Alert",
       "Original release date: March 1, 2022",
       "Mentions CVE-2022-0002 and technique T1064 via Evil Corporation."))
      .toDF("link", "alert_id", "title", "date", "text")
      .write.mode("overwrite").parquet(s"$base/alerts_raw")
    // GitHub payload boundary: fetch output as parquet (S6 shape)
    Seq(("https://api.github.com/repos/owner/repo", "success",
         Map("Python" -> 100L, "C" -> 50L)))
      .toDF("url", "status", "languages")
      .write.mode("overwrite").parquet(s"$base/gh_langs")
    Seq(("https://api.github.com/repos/owner/repo", "success",
         Seq(("alice", 10L), ("dependabot[bot]", 5L))))
      .toDF("url", "status", "contributors")
      .withColumn("contributors", expr(
        "transform(contributors, c -> struct(c._1 AS login, c._2 AS contributions))"))
      .write.mode("overwrite").parquet(s"$base/gh_contribs")
    PipelineConfig(
      nvdGlob = res("/nvd/nvdcve-1.1-TEST.json.gz"),
      mitreBundle = res("/mitre/enterprise-attack-test.json"),
      alertsParquet = s"$base/alerts_raw",
      workDir = s"$base/work", outDir = s"$base/out",
      githubLanguagesParquet = Some(s"$base/gh_langs"),
      githubContributorsParquet = Some(s"$base/gh_contribs"))
  }

  // pre-labeled mentions: two Evil Corp spellings must co-cluster
  private lazy val nerFixture = FixtureNerModel(Seq(
    ("AA22-001A", "Evil Corp", "ORG"),
    ("AA22-001A", "Evil Corp", "ORG"),
    ("AA22-001A", "Initech Systems", "ORG"),
    ("AA22-002A", "Evil Corporation", "ORG"))
    .toDF("alert_id", "label", "type"))

  test("pipeline: all stages run and the exported CSV set is consistent") {
    val counts = CyberPipeline.run(spark, conf, nerFixture)
    // NVD fixture: 3 CVEs, 3+1 references (incl. github), 3 cpe pairs
    assert(counts("cve_node_data") == 3)
    assert(counts("cpe_node_data") == 3)
    // MITRE fixture: 1 live technique; both alerts mention it
    assert(counts("enterprise_attack") == 1)
    assert(counts("alert_ttp_data") == 2)
    assert(counts("alert_nodes") == 2)
    // corrected CVE edges: one real CVE id per alert
    assert(counts("alert_cve_edge") == 2)
    // ER: Evil Corp + Evil Corporation co-cluster => one weight row per
    // (alert, best_label, type): AA22-001A gets 2 rows, AA22-002A 1 row
    assert(counts("alert_ner_label_weights") == 3)
    assert(counts("ner_node") == 2) // 2 clusters: evil corp, initech systems
    // GitHub enrichment: the fixture CVE's github ref joins the payload
    assert(counts("github_langs_merged") == 2)  // Python + C for CVE-2022-0001
    assert(counts("github_usernames_merged") == 1) // alice (bot dropped)

    // label cleanup strips company suffixes (c35: corp/corporation ->
    // ""), so both Evil spellings normalize to 'evil' pre-clustering
    val weights = Csv.read(spark, s"${conf.outDir}/alert_ner_label_weights")
    val labels = weights.select(col("best_label")).distinct()
      .as[String].collect().toSet
    assert(labels == Set("evil", "initech systems"))
  }

  test("pipeline: learned ER scorer path reproduces the golden ER outputs") {
    // r9 VERDICT item 6: the scorer=Some(...) path exercised END-TO-END
    // through stage D, not only in ErEvalSpec isolation. Train the J7
    // spark.ml pair scorer on a tiny labeled set (same-or-variant org
    // names match, unrelated ones don't), run the WHOLE pipeline with it,
    // and require the same golden ER outputs as the threshold path.
    val labeled = Seq(
      ("evil", "evil", "ORG", 1.0),
      ("acme systems", "acme systems", "ORG", 1.0),
      ("evil corp", "evil corporation", "ORG", 1.0),
      ("globex", "globex inc", "ORG", 1.0),
      ("initech systems", "initech", "ORG", 1.0),
      ("evil", "initech systems", "ORG", 0.0),
      ("acme systems", "globex", "ORG", 0.0),
      ("umbrella", "wayne enterprises", "ORG", 0.0),
      ("initech systems", "globex inc", "ORG", 0.0),
      ("evil", "acme systems", "ORG", 0.0))
      .toDF("label_a", "label_b", "type", "is_match")
    val model = graft.er.EntityResolution.trainPairScorer(labeled)
    val b = Files.createTempDirectory("graft_pipeline_learned").toString
    val confLearned = conf.copy(workDir = s"$b/work", outDir = s"$b/out",
      erScorer = Some(model))
    val counts = CyberPipeline.run(spark, confLearned, nerFixture)
    // identical golden ER floors as the threshold path's run
    assert(counts("alert_ner_label_weights") == 3)
    assert(counts("ner_node") == 2)
    val weights = Csv.read(spark, s"${confLearned.outDir}/alert_ner_label_weights")
    val labels = weights.select(col("best_label")).distinct()
      .as[String].collect().toSet
    assert(labels == Set("evil", "initech systems"))
  }

  test("pipeline: RSS feed entries flow through the streaming path into every stage") {
    // fresh work/out dirs: this test must not resume from the other
    // tests' alerts_clean checkpoint, which predates the feed union
    val base2 = Files.createTempDirectory("graft_pipeline_rss").toString
    val feedDir = s"$base2/feeds"
    Files.createDirectories(java.nio.file.Paths.get(feedDir))
    // a third advisory arriving by feed: CVE + the fixture TTP in the
    // summary, advisory code in the title (the CISA convention)
    val feedXml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<rss version="2.0"><channel>
        |  <title>CISA Cybersecurity Advisories</title>
        |  <item>
        |    <title>AA22-003A: Feed Alert</title>
        |    <link>https://www.cisa.gov/alert/aa22-003a</link>
        |    <pubDate>Wed, 06 Apr 2022 00:00:00 GMT</pubDate>
        |    <guid>https://www.cisa.gov/alert/aa22-003a</guid>
        |    <description>Feed actors exploit CVE-2022-0003 using [T1064] macros.</description>
        |  </item>
        |</channel></rss>""".stripMargin
    Files.write(java.nio.file.Paths.get(s"$feedDir/alerts.xml"),
      feedXml.getBytes("UTF-8"))
    val rssConf = conf.copy(workDir = s"$base2/work", outDir = s"$base2/out",
      rssFeedDir = Some(feedDir))
    val counts = CyberPipeline.run(spark, rssConf, nerFixture)
    // the feed advisory lands next to the two scraped ones everywhere
    assert(counts("alert_nodes") == 3)
    assert(counts("alert_cve_edge") == 3)  // CVE-2022-0003 extracted
    assert(counts("alert_ttp_data") == 3)  // T1064 joins the MITRE fixture
    // NER fixture has no mentions for AA22-003A: ER surface unchanged
    assert(counts("alert_ner_label_weights") == 3)
    val nodes = Csv.read(spark, s"${rssConf.outDir}/alert_nodes")
    val feedRow = nodes.filter(col("alert_id") === "AA22-003A").collect()
    assert(feedRow.length == 1)
    assert(feedRow(0).getAs[String]("title") == "Feed Alert")
    assert(feedRow(0).getAs[String]("full_path") ==
      "https://www.cisa.gov/alert/aa22-003a")
    assert(String.valueOf(feedRow(0).getAs[Any]("date")).startsWith("2022-04-06"))

    // a NEW feed file lands after the first run — the stream drains only
    // it (checkpointed source), and the alerts_clean/alert_ner checkpoints
    // must be invalidated (feedFresh) or the new advisory would never
    // reach extraction/export on the re-run. The advisory uses the older
    // TA advisory-code prefix, pinning the [A-Z]{2} id extraction: the id
    // must come from the title code (not the link basename) and the title
    // must have the code stripped, matching what the scrape path yields.
    val feedXml2 =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<rss version="2.0"><channel>
        |  <title>CISA Cybersecurity Advisories</title>
        |  <item>
        |    <title>TA18-331A: 3ve - Major Online Ad Fraud Operation</title>
        |    <link>https://www.cisa.gov/ncas/alerts/TA18-331A</link>
        |    <pubDate>Tue, 27 Nov 2018 00:00:00 GMT</pubDate>
        |    <guid>https://www.cisa.gov/ncas/alerts/TA18-331A</guid>
        |    <description>Ad fraud actors leverage [T1064] scripting.</description>
        |  </item>
        |</channel></rss>""".stripMargin
    Files.write(java.nio.file.Paths.get(s"$feedDir/alerts2.xml"),
      feedXml2.getBytes("UTF-8"))
    val counts2 = CyberPipeline.run(spark, rssConf, nerFixture)
    assert(counts2("alert_nodes") == 4, "re-run must surface the newly drained advisory")
    val taRow = Csv.read(spark, s"${rssConf.outDir}/alert_nodes")
      .filter(col("alert_id") === "TA18-331A").collect()
    assert(taRow.length == 1)
    assert(taRow(0).getAs[String]("title") == "3ve - Major Online Ad Fraud Operation")

    // and with NO new feed files, a further re-run resumes from the
    // (now-updated) checkpoints without recomputing them
    val marker = new java.io.File(s"${rssConf.workDir}/alerts_clean/_SUCCESS")
    val mtime = marker.lastModified
    val counts3 = CyberPipeline.run(spark, rssConf, nerFixture)
    assert(counts3("alert_nodes") == 4)
    assert(marker.lastModified == mtime,
      "alerts_clean was recomputed although no new feed files arrived")

    // crash-safety of the staleness signal: the feed-count marker is
    // written only AFTER the dependent checkpoints rewrite, so a run that
    // died in between leaves a mismatch — simulated here by deleting the
    // marker — and the next run must re-force (idempotently) rather than
    // serve the stale parquet forever
    val feedMarker = new java.io.File(s"${rssConf.workDir}/alerts_clean_feed_count")
    assert(feedMarker.exists, "feed-count marker missing after a feed run")
    assert(feedMarker.delete())
    val counts4 = CyberPipeline.run(spark, rssConf, nerFixture)
    assert(counts4("alert_nodes") == 4)
    assert(marker.lastModified != mtime,
      "interrupted-run recovery did not re-force the alerts checkpoint")
    assert(feedMarker.exists, "marker not re-recorded after the recovery run")
  }

  test("pipeline: re-run resumes from checkpoints (stage outputs not recomputed)") {
    CyberPipeline.run(spark, conf, nerFixture) // ensure first run happened
    val marker = new java.io.File(s"${conf.workDir}/cve_node_data/_SUCCESS")
    assert(marker.exists)
    val mtime = marker.lastModified
    val counts2 = CyberPipeline.run(spark, conf, nerFixture)
    assert(marker.lastModified == mtime, "checkpoint was recomputed on re-run")
    assert(counts2("cve_node_data") == 3)
  }
}
