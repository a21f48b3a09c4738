package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Count-min sketch word frequencies — the sketch companion to e07's HLL
  * distinct counts, and the shape that replaces exact token counting when
  * the VOCABULARY is the scale problem.
  *
  * An exact word count shuffles one row per distinct token (billions for a
  * web corpus); the CMS counter table is at most `depth × width` rows no
  * matter how large the corpus, because partial aggregation collapses each
  * partition to the counter grid before the exchange. Estimates are then
  * one broadcast-sized join of the query keys' buckets against the grid:
  * est(tok) = min over the `depth` rows of the bucket counters — never an
  * undercount; overcounts only from bucket collisions, bounded by
  * ε ≈ e/width with probability 1-δ, δ ≈ e^-depth (Cormode & Muthu 2005).
  *
  * Hashing is the repo's engine-agnostic md5 convention (bucket = first 2
  * hex chars of md5("j:" || tok) as an int), so the DuckDB oracle replays
  * the sketch EXACTLY — the gate hash-compares estimates, not just
  * invariants. The t16 gate estimates every distinct token of the corpus
  * (small here); at 100 TB the query side would be a curated key list
  * while the counter build cost stays the same.
  */
object SketchOps {
  val depth = 4
  val width = 256 // 2 hex chars

  /** Bucket of `tok` under hash row `j`: first 2 md5 hex chars as int. */
  private def bucketCol(j: Int, tok: Column): Column =
    conv(substring(md5(concat(lit(s"$j:"), tok).cast("binary")), 1, 2), 16, 10)
      .cast("int")

  /** DuckDB twin of [[bucketCol]] over a SQL expression `tok`. */
  private def bucketSql(j: Int, tok: String): String = {
    def hexVal(pos: Int) =
      s"(strpos('0123456789abcdef', substring(md5('$j:' || $tok), $pos, 1)) - 1)"
    s"(${hexVal(1)} * 16 + ${hexVal(2)})"
  }

  /** The depth×width counter grid for a token column: one aggregation
    * whose shuffle is ≤ depth·width rows regardless of corpus size
    * (map-side combine collapses each partition to the grid first).
    */
  private[operators] def cmsCounters(toks: DataFrame): DataFrame =
    toks.select(posexplode(array((0 until depth).map(j =>
        bucketCol(j, col("tok"))): _*)).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** CMS frequency estimates for `keys` (a `tok` column): min over the
    * depth rows of each key's bucket counters. The grid side is at most
    * depth·width rows, so it broadcasts unconditionally.
    *
    * LEFT join + coalesce-to-0: a key absent from the corpus may hit
    * buckets no corpus token touched — an inner join would either drop
    * the key entirely or take the min over only its colliding cells
    * (a collision-only over-estimate). Empty cells are exact zeros in
    * the counter grid, so the min must see them: est = 0 for unseen
    * keys, the true CMS semantics.
    */
  private[operators] def cmsEstimates(toks: DataFrame, keys: DataFrame): DataFrame = {
    val probes = keys.select(col("tok"),
        posexplode(array((0 until depth).map(j =>
          bucketCol(j, col("tok"))): _*)).as(Seq("j", "bucket")))
    probes.join(broadcast(cmsCounters(toks)), Seq("j", "bucket"), "left")
      .groupBy(col("tok"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  private def tokens(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(explode(split(trim(col("text")), graft.Tok.Ws)).as("tok"))

  val t16 = QueryDef(
    "t16_cms_counts",
    "count-min sketch word frequencies (4x256 grid, bounded shuffle)",
    (s, dir) => {
      val toks = tokens(s, dir).cache()
      toks.count() // grid build and key list share one token pass
      val out = cmsEstimates(toks, toks.distinct())
        .orderBy(col("tok"))
        .localCheckpoint(true) // materialize (key-space-sized), then free
      toks.unpersist(blocking = false) // the corpus-sized token cache
      out
    },
    Some {
      val bucketRows = (0 until depth).map(j =>
        s"SELECT tok, $j AS j, ${bucketSql(j, "tok")} AS bucket FROM toks")
        .mkString(" UNION ALL ")
      s"""WITH toks AS (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
              FROM documents WHERE length(trim(text)) > 0),
        tb AS ($bucketRows),
        grid AS (SELECT j, bucket, COUNT(*) AS c FROM tb GROUP BY 1, 2),
        keys AS (SELECT DISTINCT tok FROM toks),
        kb AS (${(0 until depth).map(j =>
          s"SELECT tok, $j AS j, ${bucketSql(j, "tok")} AS bucket FROM keys")
          .mkString(" UNION ALL ")})
        SELECT kb.tok, MIN(COALESCE(g.c, 0)) AS est
        FROM kb LEFT JOIN grid g USING (j, bucket)
        GROUP BY kb.tok ORDER BY tok"""
    })

  val all: Seq[QueryDef] = Seq(t16)
}
