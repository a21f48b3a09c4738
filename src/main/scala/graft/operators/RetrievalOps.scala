package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Sparse (lexical) retrieval — the BM25 counterpart to [[AnnOps]]'s
  * dense family. A RAG/data-curation stack needs both: dense ANN for
  * semantic recall, BM25 for exact-term precision and as the first-stage
  * candidate generator hybrid retrievers re-rank.
  *
  * Scale shape: the corpus side collapses to per-(doc, term) counts —
  * ONE map-side-combinable aggregation over the token stream, the same
  * inverted-index relation every search engine builds. Document-frequency
  * and length tables are aggregates over it; the probe is an equi-join
  * on the term (posting-list traversal), so a query only ever touches
  * the docs that contain it. Per-query top-k is a rank window
  * PARTITIONED BY query — bounded by the posting-list size, the q07
  * per-group-argmax shape, never corpus-global. Scoring is pure column
  * math (ln/mul/div of exact counts — no float sums), ROUND 6 under the
  * t18/g04 cross-engine convention.
  */
object RetrievalOps {

  /** BM25 (Okapi, k1 = 1.2, b = 0.75) top-`k` docs per query term.
    *
    * `queries` is a one-column (`q`) frame of probe terms; scores follow
    * the standard formula with idf = ln(1 + (N − df + 0.5)/(df + 0.5)),
    * tf saturation k1, length normalization b against the corpus mean
    * document length.
    */
  def bm25TopK(docsDf: DataFrame, queries: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Core(docsDf, (_, q) => q.select(col("q").as("w")), k, k1, b,
      Some(queries))

  /** BM25 with the probe set derived from the index itself: the corpus's
    * `nProbes` most document-frequent terms (ties by term asc) — the hot
    * posting lists, where length normalization and tf saturation
    * actually discriminate. The index is built ONCE and shared by the
    * probe derivation and the scoring join (no second corpus pass).
    */
  def bm25TopKHotTerms(docsDf: DataFrame, nProbes: Int = 3,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Core(docsDf, (dfreq, _) =>
      dfreq.orderBy(col("df").desc, col("w")).limit(nProbes).select(col("w")),
      k, k1, b, None)

  private def bm25Core(docsDf: DataFrame,
      probes: (DataFrame, DataFrame) => DataFrame, k: Int, k1: Double,
      b: Double, extQueries: Option[DataFrame]): DataFrame = {
    val toks = docsDf.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
    val tf = toks.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
      .cache() // inverted index: feeds df/dl aggregates + the probe join
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val scal = tf.agg(sum(col("tf")), countDistinct(col("doc_id"))).head
    val (totTok, nDocs) = (scal.getLong(0), scal.getLong(1))
    val avgdl = totTok.toDouble / nDocs
    val idf = log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + lit(0.5))
      / (col("df") + lit(0.5)))
    val score = round(idf * col("tf").cast("double") * lit(k1 + 1.0)
      / (col("tf").cast("double")
        + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdl))), 6)
    val scored = tf
      .join(broadcast(probes(dfreq, extQueries.orNull)), Seq("w"))
      .join(dfreq, Seq("w"))
      .join(dl, Seq("doc_id"))
      .select(col("w").as("q"), col("doc_id"), col("tf").as("tf"),
        score.as("score"))
    val out = scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q")).orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .select(col("q"), col("rk").cast("bigint").as("rk"), col("doc_id"),
        col("tf").cast("bigint").as("tf"), col("score"))
      .orderBy(col("q"), col("rk"))
      .localCheckpoint(true)
    tf.unpersist(blocking = false)
    out
  }

  val a08 = QueryDef(
    "a08_bm25_topk",
    "BM25 top-10 per query over the corpus inverted index (k1=1.2, b=0.75)",
    (s, dir) => bm25TopKHotTerms(Tables.load(s, dir, "documents")),
    Some("""WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
              FROM documents WHERE length(trim(text)) > 0),
      tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
      dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
      scal AS (SELECT CAST(SUM(tf) AS DOUBLE) / COUNT(DISTINCT doc_id) AS avgdl,
                      CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM tf),
      probes AS (SELECT w AS q FROM dfreq
                 ORDER BY df DESC, w LIMIT 3),
      scored AS (SELECT t.w AS q, t.doc_id, t.tf,
               ROUND(ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5))
                 * CAST(t.tf AS DOUBLE) * (1.2 + 1.0)
                 / (CAST(t.tf AS DOUBLE)
                    + 1.2 * ((1.0 - 0.75) + 0.75 * CAST(l.dl AS DOUBLE) / s.avgdl)), 6)
                 AS score
             FROM tf t JOIN probes p ON t.w = p.q
                  JOIN dfreq f ON f.w = t.w
                  JOIN dl l ON l.doc_id = t.doc_id
                  CROSS JOIN scal s),
      ranked AS (SELECT q, doc_id, tf, score,
               row_number() OVER (PARTITION BY q ORDER BY score DESC, doc_id) AS rk
             FROM scored)
      SELECT q, CAST(rk AS BIGINT) AS rk, doc_id, CAST(tf AS BIGINT) AS tf, score
      FROM ranked WHERE rk <= 10 ORDER BY q, rk"""))

  val all: Seq[QueryDef] = Seq(a08)
}
