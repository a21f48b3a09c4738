package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Near-duplicate detection over `documents` — the LLM-training-data dedup
  * family: token-shingle Jaccard self-join, MinHash+LSH banding, SimHash.
  *
  * Design for scale (SURVEY §2.4 J6/J7 are the same algorithm family):
  *  - the all-pairs Jaccard join is an *inverted-index* join (explode
  *    shingles, equi-join on shingle, group by pair) — never a cross join;
  *  - MinHash+LSH replaces the quadratic candidate space with
  *    (band, signature) equi-join buckets, the standard 100-TB path;
  *  - hash functions are md5-based and engine-agnostic, so the DuckDB
  *    oracle replicates them exactly (minhash = lexicographic min of the
  *    salted md5 hex — a valid random permutation family).
  *
  * At production scale the shingle join adds a document-frequency cap on
  * shingles (stop-shingle pruning) to bound skew; at gate SF the exact
  * semantics are kept oracle-identical instead.
  */
object DedupOps {
  private def shingleDf(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    d.select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")).as("sh"))
      .distinct()
  }

  private val shingleSql =
    """toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                FROM documents WHERE len(string_split_regex(trim(text), '\s+')) >= 3),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(len(toks)-2),
                       i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS sh
              FROM toks)"""

  /** N-gram (word 3-shingle) Jaccard similarity self-join via inverted
    * index + size verification (no cross join).
    */
  val d01 = QueryDef(
    "d01_ngram_jaccard",
    "3-shingle Jaccard near-dup pairs (inverted-index self-join)",
    (s, dir) => {
      val sh = shingleDf(s, dir).cache()
      val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val pairs = sh.as("a")
        .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
      pairs
        .join(broadcast(cnt).as("ca"), col("doc_a") === col("ca.doc_id"))
        .join(broadcast(cnt).as("cb"), col("doc_b") === col("cb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          (col("shared").cast("double") /
            (col("ca.n") + col("cb.n") - col("shared"))).as("jac"))
        .filter(col("jac") >= 0.2)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""WITH $shingleSql,
      cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
                FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT doc_a, doc_b,
             CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) AS jac
      FROM pairs
      JOIN cnt ca ON ca.doc_id = doc_a
      JOIN cnt cb ON cb.doc_id = doc_b
      WHERE CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) >= 0.2
      ORDER BY doc_a, doc_b"""))

  /** MinHash (16 salted-md5 hashes) + LSH banding (8 bands x 2 rows) +
    * exact Jaccard verification of candidates.
    */
  val d02 = QueryDef(
    "d02_minhash_lsh",
    "MinHash+LSH banded near-dup candidates + Jaccard verify",
    (s, dir) => {
      val sh = shingleDf(s, dir).cache()
      val mh = sh
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, 15), i -> struct(i AS hidx, md5(concat(cast(i AS string), ':', sh)) AS h))")).as("x"))
        .select(col("doc_id"), col("x.hidx").as("hidx"), col("x.h").as("h"))
        .groupBy(col("doc_id"), col("hidx"))
        .agg(min(col("h")).as("mh"))
      val bands = mh
        .withColumn("band", expr("hidx DIV 2"))
        .groupBy(col("doc_id"), col("band"))
        .agg(md5(concat_ws("|",
          min(when(col("hidx") % 2 === 0, col("mh"))),
          min(when(col("hidx") % 2 === 1, col("mh")))).cast("binary")).as("sig"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val shared = cand
        .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sh.as("sb"), col("doc_b") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("shared"))
      shared
        .join(broadcast(cnt).as("ca"), col("doc_a") === col("ca.doc_id"))
        .join(broadcast(cnt).as("cb"), col("doc_b") === col("cb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          (col("shared").cast("double") /
            (col("ca.n") + col("cb.n") - col("shared"))).as("jac"))
        .filter(col("jac") >= 0.3)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""WITH $shingleSql,
      hashed AS (SELECT doc_id, r.range AS hidx,
                        md5(CAST(r.range AS VARCHAR) || ':' || sh) AS h
                 FROM sh CROSS JOIN range(16) r),
      mh AS (SELECT doc_id, hidx, MIN(h) AS mh FROM hashed GROUP BY doc_id, hidx),
      bands AS (SELECT doc_id, hidx // 2 AS band,
                       md5(concat_ws('|',
                         MIN(CASE WHEN hidx % 2 = 0 THEN mh END),
                         MIN(CASE WHEN hidx % 2 = 1 THEN mh END))) AS sig
                FROM mh GROUP BY doc_id, hidx // 2),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
      cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      shared AS (SELECT doc_a, doc_b, COUNT(*) AS shared
                 FROM cand
                 JOIN sh sa ON sa.doc_id = doc_a
                 JOIN sh sb ON sb.doc_id = doc_b AND sa.sh = sb.sh
                 GROUP BY doc_a, doc_b)
      SELECT doc_a, doc_b,
             CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) AS jac
      FROM shared
      JOIN cnt ca ON ca.doc_id = doc_a
      JOIN cnt cb ON cb.doc_id = doc_b
      WHERE CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) >= 0.3
      ORDER BY doc_a, doc_b"""))

  /** 16-bit SimHash over the distinct-token set: bit b's sign comes from
    * hex digit b of md5(token) (one hash per token, no per-bit fan-out —
    * at scale this is a single groupBy(doc) with 16 conditional partial
    * sums, i.e. one map-side-combined shuffle of 16 ints per doc).
    */
  val d03 = QueryDef(
    "d03_simhash",
    "16-bit SimHash signature per document",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val toks = d
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
        .distinct()
        .withColumn("h", md5(col("tok").cast("binary")))
      val sumCols = (0 until 16).map(b =>
        sum(when(substring(col("h"), b + 1, 1) < "8", 1).otherwise(-1)).as(s"s$b"))
      toks.groupBy(col("doc_id"))
        .agg(sumCols.head, sumCols.tail: _*)
        .select(col("doc_id"),
          concat((0 until 16).map(b =>
            when(col(s"s$b") >= 0, "1").otherwise("0")): _*).as("simhash"))
        .orderBy(col("doc_id"))
    },
    Some {
      val bits = (0 until 16).map(b =>
        s"CASE WHEN SUM(CASE WHEN substring(h, ${b + 1}, 1) < '8' THEN 1 ELSE -1 END) >= 0 THEN '1' ELSE '0' END")
        .mkString(" || ")
      s"""WITH toks AS (SELECT DISTINCT doc_id,
              unnest(string_split_regex(trim(text), '\\s+')) AS tok
            FROM documents WHERE length(trim(text)) > 0),
        hashed AS (SELECT doc_id, md5(tok) AS h FROM toks)
        SELECT doc_id, $bits AS simhash FROM hashed GROUP BY doc_id ORDER BY doc_id"""
    })

  val all: Seq[QueryDef] = Seq(d01, d02, d03)
}
