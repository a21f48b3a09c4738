package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-driven specs for the cyber ETL modules (SURVEY §5.2 items 1-2:
  * operator unit tests with the edge cases the reference encodes
  * implicitly — empty tag arrays, missing baseMetricV3, revoked STIX
  * objects, the [bot] literal filter, the c17 explode bug).
  */
class EtlSpec extends AnyFunSuite with graft.SparkTestSession {
  import spark.implicits._

  private def res(p: String) = getClass.getResource(p).getPath

  // ---- NVD ----
  lazy val items = Nvd.readItems(spark, res("/nvd/nvdcve-1.1-TEST.json.gz")).cache()

  test("NVD cveNodes: ids, null pre-v3 scores, joined descriptions, timestamp") {
    val rows = Nvd.cveNodes(items).collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("CVE-2022-0001", "CVE-2002-0999", "CVE-2022-0002"))
    val modern = rows("CVE-2022-0001")
    assert(modern.getDouble(1) == 9.8 && modern.getString(4) == "NETWORK")
    assert(modern.getString(6) == "First description. -|- Second description.")
    assert(modern.getTimestamp(5).toString == "2022-01-05 14:15:00.0")
    val ancient = rows("CVE-2002-0999")
    assert(ancient.isNullAt(1) && ancient.isNullAt(2) && ancient.isNullAt(3))
  }

  test("NVD cveReferences: explode_outer keeps tagless refs with null tag") {
    val refs = Nvd.cveReferences(items).collect()
    val gh = refs.filter(_.getString(0).contains("github"))
    assert(gh.map(_.getString(3)).toSet == Set("Exploit", "Patch"))
    val tagless = refs.filter(_.getString(0) == "https://example.com/adv")
    assert(tagless.length == 1 && tagless(0).isNullAt(3))
  }

  test("NVD cpeNodes: vulnerable-only, children included, distinct vendor_product") {
    val cpes = Nvd.cpeNodes(items).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(cpes == Set(
      ("google_android", "CVE-2022-0001"),
      ("linux_linux_kernel", "CVE-2022-0001"), // from children[].cpe_match
      ("google_android", "CVE-2022-0002")))    // two versions collapse
  }

  // ---- MITRE ----
  test("MITRE techniques: revoked/deprecated dropped, phases resolved, minimd applied") {
    val objects = Mitre.readBundle(spark, res("/mitre/enterprise-attack-test.json"))
    // the fixture also carries a LIVE attack-pattern with no mitre-attack
    // external reference (attack-pattern--4): its filtered ref array is
    // empty, which must yield a dropped row (try_element_at -> null), not
    // an ANSI element_at index error
    val tech = Mitre.techniques(spark, objects).collect()
    assert(tech.length == 1)
    val t = tech(0)
    assert(t.getAs[String]("id") == "T1064")
    assert(t.getAs[String]("name") == "Scripting")
    assert(t.getAs[String]("platforms") == "Windows, Linux")
    assert(t.getAs[String]("kill chain phases") == "Execution") // other-chain dropped
    assert(t.getAs[String]("data sources") == "Process monitoring, File monitoring")
    val desc = t.getAs[String]("description")
    assert(desc.contains("`cmd.exe`"), desc)
    assert(desc.contains("(T1548.002)"), desc)   // link rewritten to dotted id
    assert(desc.contains("#  Header #"), desc)    // minimd header form
    assert(desc.contains("\ndone"), desc)         // <br> -> newline
  }

  test("MITRE minimdCol matches the scalar reference implementation (and uses no UDF)") {
    val cases = Seq(
      "## Header\nbody with <code>cmd.exe /c</code> inline",
      "#NoSpace\nthen [link](https://attack.mitre.org/techniques/T1548/002) done<br>end",
      "start https://attack.mitre.org/tactics/TA0002 and " +
        "\"https://attack.mitre.org/software/S0154\" mixed",
      "(https://attack.mitre.org/techniques/T1059/003) twice " +
        "(https://attack.mitre.org/techniques/T1059)",
      "<code>multi\nline</code> and ### deep header\ntail",
      "no markup at all",
      "")
    val df = cases.toDF("s").select(col("s"), Mitre.minimdCol(col("s")).as("got"))
    df.collect().foreach { r =>
      assert(r.getString(1) == Mitre.minimdText(r.getString(0)), s"input: ${r.getString(0)}")
    }
    // null propagates like the scalar form
    val nullRow = Seq[Option[String]](None).toDF("s")
      .select(Mitre.minimdCol(col("s"))).collect()
    assert(nullRow(0).isNullAt(0))
    // codegen claim: the chain is pure built-ins, no ScalaUDF in the plan
    val plan = df.queryExecution.analyzed.toString
    assert(!plan.contains("UDF"), plan)
  }

  // ---- Alerts ----
  private val rawAlerts = Seq(
    ("/alert/aa22-321a", "AA22-321A :", "Ransomware Alert",
     "Original release date: November 17, 2022 | Last revised: December 1, 2022",
     "Actors exploit CVE-2022-0001 and CVE-2021-44228; also CVE-2022-0001 again. " +
       "Techniques include [T1486] and T1059.003 usage."),
    ("/alert/aa20-006a", "AA20-006A", "Old Alert",
     "Original release date: January 6, 2020", "No ids here."))
    .toDF("link", "alert_id", "title", "date", "text")

  test("Alerts cleanAlerts: id/date/path cleanup + sorted distinct extraction") {
    val a = Alerts.cleanAlerts(rawAlerts).collect()
      .map(r => r.getAs[String]("alert_id") -> r).toMap
    val r1 = a("AA22-321A")
    assert(r1.getAs[String]("full_path") == "https://www.cisa.gov/alert/aa22-321a")
    assert(r1.getAs[java.sql.Timestamp]("date").toString == "2022-11-17 00:00:00.0")
    assert(r1.getAs[scala.collection.Seq[String]]("cve_list").toSeq == Seq("CVE-2021-44228", "CVE-2022-0001"))
    assert(r1.getAs[scala.collection.Seq[String]]("ttp_list").toSeq == Seq("T1059", "T1486"))
    assert(a("AA20-006A").getAs[scala.collection.Seq[String]]("cve_list").toSeq.isEmpty)
  }

  test("Alerts cleanAlerts: an unparseable date yields a null row, not an ANSI failure") {
    val junk = Seq(("/alert/aa99-999a", "AA99-999A", "Junk Date Alert",
      "Updated March 2022", "Mentions CVE-2022-0001."))
      .toDF("link", "alert_id", "title", "date", "text")
    val out = Alerts.cleanAlerts(junk).collect()
    assert(out.length == 1)
    assert(out(0).isNullAt(out(0).fieldIndex("date")))
    // the rest of the cleanup still ran on the null-date row
    assert(out(0).getAs[scala.collection.Seq[String]]("cve_list").toSeq == Seq("CVE-2022-0001"))
  }

  test("Alerts alertCveEdges: corrected vs reference-bug mode") {
    val cleaned = Alerts.cleanAlerts(rawAlerts)
    val good = Alerts.alertCveEdges(cleaned).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(good == Set(("AA22-321A", "CVE-2021-44228"), ("AA22-321A", "CVE-2022-0001")))
    val buggy = Alerts.alertCveEdges(cleaned, replicateReferenceBug = true)
      .collect().map(_.getString(1)).toSet
    assert(buggy == Set("T1059", "T1486")) // TTP ids under the cve_id name (c17 bug)
  }

  test("Alerts alertTtpEdges: inner broadcast join drops unknown TTPs") {
    val cleaned = Alerts.cleanAlerts(rawAlerts)
    val techniques = Seq(("T1486", "Data Encrypted for Impact"))
      .toDF("id", "name")
    val got = Alerts.alertTtpEdges(cleaned, techniques).collect()
    assert(got.length == 1 && got(0).getAs[String]("name") == "Data Encrypted for Impact")
  }

  // ---- GitHub ----
  test("GitHub repoApiUrl: first two path segments") {
    val df = Seq("https://github.com/owner/repo/blob/main/x.md",
                 "https://github.com/onlyowner").toDF("url")
    val got = df.select(GitHub.repoApiUrl(col("url"))).as[String].collect()
    assert(got(0) == "https://api.github.com/repos/owner/repo")
    assert(got(1) == "https://api.github.com/repos/onlyowner")
  }

  test("GitHub contributorsTable: bot filter is LITERAL, unlike the reference regex bug") {
    val raw = Seq(
      ("u1", "success", Seq(("alice", 10L), ("dependabot[bot]", 5L), ("bob", 3L))),
      ("u2", "failed", Seq(("ignored", 1L))))
      .toDF("url", "status", "contributors")
      .withColumn("contributors", expr(
        "transform(contributors, c -> struct(c._1 AS login, c._2 AS contributions))"))
    val got = GitHub.contributorsTable(raw).collect().map(_.getString(1)).toSet
    // 'bob' survives (the reference's un-escaped "[bot]" regex would drop him)
    assert(got == Set("alice", "bob"))
  }

  test("GitHub languagesTable + pendingRepos + joinToRefs") {
    val langs = Seq(("u1", "success", Map("Python" -> 100L, "C" -> 50L)),
                    ("u2", "error", Map.empty[String, Long]))
      .toDF("url", "status", "languages")
    val flat = GitHub.languagesTable(langs).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSet
    assert(flat == Set(("Python", 100L), ("C", 50L)))

    val repos = Seq("a", "b", "c").toDF("url")
    val done = Seq("b").toDF("url")
    assert(GitHub.pendingRepos(repos, done).as[String].collect().toSet == Set("a", "c"))

    val refs = Seq(("CVE-1", "u1"), ("CVE-2", "u9")).toDF("cve_id", "repo_url")
    val payload = Seq(("u1", "alice")).toDF("url", "logins")
    val joined = GitHub.joinToRefs(refs, payload, requireCols = Seq("logins"))
      .collect().map(r => (r.getString(0), r.getString(2)))
    assert(joined.toSeq == Seq(("CVE-1", "alice")))
  }
}
