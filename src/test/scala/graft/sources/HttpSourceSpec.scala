package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Drives the live-HTTP DataSourceV2 against a loopback fixture server
  * (zero egress): pagination walk, partition-parallel URL-list fetch,
  * rate-limit spacing, resume-skip, and error-as-row semantics — the
  * S3/S6 fetch shapes of gitapi.py:142-186 / data_integration.ipynb
  * c7:10-41, with no driver-side request loop.
  */
class HttpSourceSpec extends AnyFunSuite with BeforeAndAfterAll with SparkTestSession {

  private var server: HttpServer = _
  private var base: String = _
  // every request the server saw: (path+query, wall-clock millis)
  private val seen = new ConcurrentLinkedQueue[(String, Long)]()

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: HttpExchange, status: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    }
    def record(ex: HttpExchange): String = {
      val q = Option(ex.getRequestURI.getQuery).map("?" + _).getOrElse("")
      val p = ex.getRequestURI.getPath + q
      seen.add((p, System.currentTimeMillis()))
      p
    }
    // paginated endpoint: 3 pages of JSON arrays, then []
    server.createContext("/alerts", (ex: HttpExchange) => {
      val p = record(ex)
      val page = "page=(\\d+)".r.findFirstMatchIn(p).map(_.group(1).toInt).getOrElse(1)
      if (page <= 3) reply(ex, 200, s"""[{"page":$page,"title":"alert-$page"}]""")
      else reply(ex, 200, "[]")
    })
    // per-repo endpoint: JSON keyed by trailing path segment; /missing 404s
    server.createContext("/repos", (ex: HttpExchange) => {
      val p = record(ex)
      val repo = p.split('/').last
      if (repo == "missing") reply(ex, 404, """{"message":"Not Found"}""")
      else reply(ex, 200, s"""{"name":"$repo","stars":${repo.length}}""")
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def requests: Seq[(String, Long)] = { seen.asScala.toSeq }

  test("paginated mode walks pages until the empty page, in order") {
    seen.clear()
    // sort locally: a Spark orderBy would add a range-partitioning sample
    // job that re-reads (and so re-fetches) the whole source
    val rows = spark.read.format("graft.sources.HttpSource")
      .option("url", s"$base/alerts").option("pageParam", "page")
      .load().collect().sortBy(_.getAs[String]("url"))
    assert(rows.length === 3)
    assert(rows.map(_.getAs[Int]("status")).forall(_ == 200))
    assert(rows.map(_.getAs[String]("body").trim) ===
      (1 to 3).map(p => s"""[{"page":$p,"title":"alert-$p"}]"""))
    // the stop probe (page=4 → []) was issued exactly once, nothing after
    assert(requests.map(_._1) ===
      (1 to 4).map(p => s"/alerts?page=$p"))
  }

  test("url-list mode fetches every url, 404 and success both as rows") {
    seen.clear()
    val urls = Seq("alpha", "beta", "missing").map(r => s"$base/repos/$r")
    val rows = spark.read.format("graft.sources.HttpSource")
      .option("urls", urls.mkString(","))
      .load().collect()
    assert(rows.length === 3)
    val byUrl = rows.map(r => r.getAs[String]("url") -> r).toMap
    assert(byUrl(s"$base/repos/alpha").getAs[Int]("status") === 200)
    assert(byUrl(s"$base/repos/alpha").getAs[String]("body").contains("\"stars\":5"))
    assert(byUrl(s"$base/repos/missing").getAs[Int]("status") === 404)
    assert(rows.forall(_.getAs[String]("error") == null))
  }

  test("resume: skipUrls drops already-fetched urls before any request") {
    seen.clear()
    val urls = Seq("alpha", "beta", "gamma").map(r => s"$base/repos/$r")
    val rows = spark.read.format("graft.sources.HttpSource")
      .option("urls", urls.mkString(","))
      .option("skipUrls", s"$base/repos/alpha,$base/repos/gamma")
      .load().collect()
    assert(rows.map(_.getAs[String]("url")).toSeq === Seq(s"$base/repos/beta"))
    assert(requests.map(_._1) === Seq("/repos/beta"))
  }

  test("rate limit: a 2-per-window budget spaces request batches by the window") {
    seen.clear()
    val urls = (1 to 6).map(i => s"$base/repos/r$i")
    val t0 = System.currentTimeMillis()
    val rows = spark.read.format("graft.sources.HttpSource")
      .option("urls", urls.mkString(","))
      .option("numPartitions", "1") // one limiter sees all six requests
      .option("requestsPerWindow", "2")
      .option("windowMillis", "300")
      .load().collect()
    val elapsed = System.currentTimeMillis() - t0
    assert(rows.length === 6)
    // 6 requests at 2/window ⇒ two window waits (≥ ~600ms; small slack for
    // the wait being measured from the window's first request, not t0)
    assert(elapsed >= 550, s"6 fetches at 2/300ms finished in ${elapsed}ms")
    assert(requests.size === 6)
  }

  test("pipeline: pendingRepos anti-join feeds fetchPending with no driver fetch loop") {
    seen.clear()
    import spark.implicits._
    val all = Seq(s"$base/repos/alpha", s"$base/repos/beta", s"$base/repos/new1")
      .toDF("url")
    val already = Seq(s"$base/repos/alpha", s"$base/repos/beta").toDF("url")
    val pending = graft.etl.GitHub.pendingRepos(all, already)
    val raw = graft.etl.GitHub.fetchPending(spark, pending,
      requestsPerWindow = 100, windowMillis = 1000)
    val got = raw.collect()
    assert(got.map(_.getAs[String]("url")).toSeq === Seq(s"$base/repos/new1"))
    assert(got.head.getAs[String]("body").contains("\"name\":\"new1\""))
    // only the frontier was requested
    assert(requests.map(_._1) === Seq("/repos/new1"))
  }

  test("urlsPath: newline-delimited file plans the same fetch set") {
    seen.clear()
    val f = java.nio.file.Files.createTempFile("graft-urls", ".txt")
    try {
      java.nio.file.Files.write(f,
        s"$base/repos/pa\n$base/repos/pb\n".getBytes(StandardCharsets.UTF_8))
      val rows = spark.read.format("graft.sources.HttpSource")
        .option("urlsPath", f.toString)
        .load().collect()
      assert(rows.map(_.getAs[String]("url")).sorted ===
        Array(s"$base/repos/pa", s"$base/repos/pb"))
    } finally java.nio.file.Files.delete(f)
  }

  test("transport error surfaces as a row, not a failed task") {
    // unroutable port on loopback: connection refused
    val dead = "http://127.0.0.1:1/nope"
    val rows = spark.read.format("graft.sources.HttpSource")
      .option("urls", dead).option("timeoutMs", "500")
      .load().collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Int]("status") === -1)
    assert(rows.head.getAs[String]("error") != null)
  }

  private def planParts(props: Map[String, String]): Array[HttpUrlPartition] = {
    val lc = props.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    new HttpTable(lc)
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        new java.util.HashMap[String, String]()))
      .build().toBatch.planInputPartitions()
      .collect { case p: HttpUrlPartition => p }
  }

  test("plan divides the GLOBAL request budget across url partitions (B/P each)") {
    val urls = (1 to 8).map(i => s"http://x/$i")
    val parts = planParts(Map(
      "urls" -> urls.mkString(","), "numPartitions" -> "4",
      "requestsPerWindow" -> "8"))
    assert(parts.length === 4)
    assert(parts.forall(_.requestsPerWindow == 2), // 8/4, not 8 each
      parts.map(_.requestsPerWindow).mkString(","))
    assert(parts.flatMap(_.urls).sorted === urls.sorted.toArray)
  }

  test("plan caps partition count when the budget is smaller than P") {
    // B=2 < requested P=6: 6 partitions at the 1-slot floor would issue
    // 6/window against a 2/window budget — the plan must shrink to B
    val urls = (1 to 6).map(i => s"http://x/$i")
    val parts = planParts(Map(
      "urls" -> urls.mkString(","), "numPartitions" -> "6",
      "requestsPerWindow" -> "2"))
    assert(parts.length === 2)
    assert(parts.forall(_.requestsPerWindow == 1))
    assert(parts.flatMap(_.urls).sorted === urls.sorted.toArray)
  }

  test("plan splits the budget across BOTH modes when urls and url are combined") {
    // 8 urls + a paginated endpoint under B=4: the page walk is one more
    // consumer, so url partitions shrink to 3 and everyone gets 4/4 = 1
    // slot — url partitions each running B/P(urls) while the page walk
    // ALSO ran the full B would issue 2B against the endpoint
    val lc = Map(
      "urls" -> (1 to 8).map(i => s"http://x/$i").mkString(","),
      "url" -> "http://x/paged", "numpartitions" -> "4",
      "requestsperwindow" -> "4")
    val parts = new HttpTable(lc)
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        new java.util.HashMap[String, String]()))
      .build().toBatch.planInputPartitions()
    val urlParts = parts.collect { case p: HttpUrlPartition => p }
    val pageParts = parts.collect { case p: HttpPagePartition => p }
    assert(urlParts.length === 3 && pageParts.length === 1)
    val totalSlots = urlParts.map(_.requestsPerWindow).sum +
      pageParts.map(_.requestsPerWindow).sum
    assert(totalSlots <= 4, s"combined modes exceed the global budget: $totalSlots")
    assert(urlParts.forall(_.requestsPerWindow == 1))
    assert(pageParts.head.requestsPerWindow == 1)
  }

  test("pagination stops after a persistent HTTP failure instead of walking to maxPages") {
    seen.clear()
    server.createContext("/broken", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).map("?" + _).getOrElse("")
      seen.add((ex.getRequestURI.getPath + q, System.currentTimeMillis()))
      val bytes = """{"error":"internal"}""".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(500, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    val rows = spark.read.format("graft.sources.HttpSource")
      .option("url", s"$base/broken").option("pageParam", "page")
      .load().collect()
    // the failing page is surfaced as a row (error-as-row contract), then
    // the walk stops — no second request
    assert(rows.length === 1)
    assert(rows.head.getAs[Int]("status") === 500)
    assert(requests.map(_._1) === Seq("/broken?page=1"))
  }
}
