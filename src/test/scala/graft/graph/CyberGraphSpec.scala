package graft.graph

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Q1–Q8 over a hand-built miniature of the reference's property graph
  * (FIXTURES.md §4): known answers, incl. Q2's exact 1.5 CVEs/alert and
  * Q3's known lag.
  */
class CyberGraphSpec extends AnyFunSuite with graft.SparkTestSession {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("Q1 tag frequency orders by count desc") {
    val edges = Seq(("CVE-1", "exploit"), ("CVE-2", "exploit"), ("CVE-3", "patch"))
      .toDF("cve_id", "tag")
    val got = CyberGraphQueries.q1TagFrequency(edges).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("exploit", 2L), ("patch", 1L)))
  }

  test("Q2 avg CVEs per alert = 1.5 on the 2-alert/3-CVE fixture") {
    val edges = Seq(("A1", "CVE-1"), ("A1", "CVE-2"), ("A2", "CVE-3"))
      .toDF("alert_id", "cve_id")
    val got = CyberGraphQueries.q2AvgCvesPerAlert(edges).collect()(0).getDouble(0)
    assert(got == 1.5)
  }

  test("Q3 publish->alert lag: alert 100 days after publication") {
    val edges = Seq(("A1", "CVE-1")).toDF("alert_id", "cve_id")
    val alerts = Seq(("A1", ts("2022-04-11"))).toDF("alert_id", "date")
    val cves = Seq(("CVE-1", ts("2022-01-01"))).toDF("cve_id", "published")
    val got = CyberGraphQueries.q3PublishAlertLag(edges, alerts, cves)
      .collect()(0).getDouble(0)
    assert(got == 100.0)
  }

  test("Q4 severe geo actors: 4-hop join with score filter and excludes") {
    val mentioned = Seq(
      ("A1", "Russia", "GPE"), ("A1", "Acme Corp", "ORG"),
      ("A2", "China", "GPE"), ("A2", "United States", "GPE"))
      .toDF("alert_id", "actor_label", "actor_type")
    val referenced = Seq(("A1", "CVE-1"), ("A2", "CVE-2"))
      .toDF("alert_id", "cve_id")
    val openTo = Seq(("CVE-1", "NETWORK"), ("CVE-2", "LOCAL"))
      .toDF("cve_id", "attack_vector")
    val cves = Seq(("CVE-1", 10.0), ("CVE-2", 5.0)).toDF("cve_id", "score")
    val got = CyberGraphQueries.q4SevereGeoActors(
      mentioned, referenced, openTo, cves, excludeLabels = Seq("United"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    // CVE-2 fails score>=10; ORG filtered; 'United States' excluded
    assert(got.toSeq == Seq(("Russia", "NETWORK")))
  }

  test("Q5 vectors histogram counts distinct CVEs per vector") {
    val mentioned = Seq(("A1", "Russia", "GPE"), ("A2", "China", "GPE"))
      .toDF("alert_id", "actor_label", "actor_type")
    val referenced = Seq(("A1", "CVE-1"), ("A2", "CVE-1"), ("A2", "CVE-2"))
      .toDF("alert_id", "cve_id")
    val openTo = Seq(("CVE-1", "NETWORK"), ("CVE-2", "NETWORK"))
      .toDF("cve_id", "attack_vector")
    val cves = Seq(("CVE-1", 9.8), ("CVE-2", 7.5)).toDF("cve_id", "score")
    val got = CyberGraphQueries.q5VectorsByActor(mentioned, referenced, openTo, cves)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("NETWORK", 2L)))
  }

  test("Q6 two-hop neighbourhood on a path graph") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val got = CyberGraphQueries.q6TwoHopNeighbourhood(edges, "a")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("b", "c")) // d is 3 hops away
  }

  test("Q7 community sizes histogram") {
    val comm = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L))
      .toDF("node_id", "community")
    val got = CyberGraphQueries.q7CommunitySizes(comm).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 3L), (10L, 1L)))
  }

  test("Q8 language popularity with exclusion") {
    val writtenIn = Seq(
      ("Python", "CVE-1"), ("Python", "CVE-2"), ("C", "CVE-1"),
      ("documentation_url", "CVE-9"))
      .toDF("language", "cve_id")
    val got = CyberGraphQueries.q8LanguagePopularity(
      writtenIn, exclude = Seq("documentation_url"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("Python", 2L), ("C", 1L)))
  }
}
