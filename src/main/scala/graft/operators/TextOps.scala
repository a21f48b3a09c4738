package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Text-analytics operators over the `documents` table — the pieces a
  * large-scale training-data pipeline needs (exact dedup, fingerprinting,
  * token statistics, quality scoring, language ID). All are single-pass
  * narrow transformations + one aggregation, so at 100 TB they scale
  * linearly with input splits; no operator here shuffles more than
  * (doc_id → small aggregate) rows.
  *
  * Reference anchors: the text-cleanup/NER column pipeline of
  * data_integration.ipynb c27/c35 (SURVEY §2.11) generalizes to these
  * column-level text metrics.
  */
object TextOps {
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Literal (non-regex) substring occurrence count — the classic
    * length-difference trick; deterministic and identical in any engine.
    */
  private def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(marker), ""))) / marker.length).cast("bigint")

  /** Exact deduplication by content hash (SURVEY north-star dedup op):
    * md5 groups + min-id winner + copy count. A pure hash-shuffle groupBy —
    * at 100 TB this is the cheapest possible exact dedup (no sort, map-side
    * partial aggregation on the hash).
    */
  val t01 = QueryDef(
    "t01_dedup_exact",
    "exact dedup via md5 content hash (groupBy)",
    (s, dir) =>
      docs(s, dir)
        .groupBy(md5(col("text").cast("binary")).as("text_md5"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("text_md5")),
    Some("""SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM documents GROUP BY 1 ORDER BY text_md5"""))

  /** Document fingerprinting: canonicalize (lower, collapse non-alnum,
    * trim) then hash — near-dup-robust exact matching.
    */
  val t02 = QueryDef(
    "t02_fingerprint",
    "normalized content fingerprint (lower+collapse+md5)",
    (s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).cast("binary")).as("fp"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      FROM documents ORDER BY doc_id"""))

  /** Token counting: whitespace tokens, distinct tokens, token chars
    * (explode + group — partial aggregation keeps the shuffle tiny).
    */
  val t03 = QueryDef(
    "t03_token_stats",
    "whitespace token counts per document (E1/A1)",
    (s, dir) =>
      docs(s, dir)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), explode(split(trim(col("text")), graft.Tok.Ws)).as("tok"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("n_distinct"),
          sum(length(col("tok"))).cast("bigint").as("tok_chars"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_distinct,
      CAST(SUM(length(tok)) AS BIGINT) AS tok_chars
      FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
            FROM documents WHERE length(trim(text)) > 0) t
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Quality scoring: length / word count / stopword ratio — all integer
    * counts plus one double ratio (single deterministic division).
    */
  val t04 = QueryDef(
    "t04_quality",
    "doc quality features: chars, words, stopword ratio",
    (s, dir) => {
      val d = docs(s, dir)
      val words = size(split(trim(col("text")), graft.Tok.Ws)).cast("bigint")
      val stops = regexp_count(col("text"), lit("\\b(the|a|of|and|to|in|is)\\b")).cast("bigint")
      d.filter(length(trim(col("text"))) > 0)
        .select(
          col("doc_id"),
          length(col("text")).cast("bigint").as("n_chars_m"),
          words.as("n_words"),
          stops.as("stop_cnt"),
          (stops.cast("double") / words.cast("double")).as("stop_ratio"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      CAST(length(text) AS BIGINT) AS n_chars_m,
      CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
      CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is)\b')) AS BIGINT) AS stop_cnt,
      CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is)\b')) AS DOUBLE)
        / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS stop_ratio
      FROM documents WHERE length(trim(text)) > 0 ORDER BY doc_id"""))

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "los", "que"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "les", "et", "une"),
    "zh" -> Seq("de", "shi", "bu", "wo"))

  /** Adds score_<lang> columns and pred_lang (argmax, ties resolved in
    * [[langMarkers]] order) — the language-ID heuristic, factored so the
    * gate (t05) and the corpus pipeline share one definition.
    */
  private[graft] def withLangPred(df: DataFrame): DataFrame = {
    val padded = concat(lit(" "), col("text"), lit(" "))
    def sc(markers: Seq[String]): Column =
      markers.map(m => occurrences(padded, s" $m ")).reduce(_ + _)
    val scored = langMarkers.foldLeft(df) { case (d, (lang, ms)) =>
      d.withColumn(s"score_$lang", sc(ms))
    }
    val langs = langMarkers.map(_._1)
    val pred = langs.init.zipWithIndex.foldLeft(when(lit(false), "")) {
      case (acc, (lang, i)) =>
        val rest = langs.drop(i + 1)
        acc.when(rest.map(o => col(s"score_$lang") >= col(s"score_$o"))
          .reduce(_ && _), lang)
    }.otherwise(langs.last)
    scored.withColumn("pred_lang", pred)
  }

  /** SQL twin of [[withLangPred]]: a subquery string over `src` emitting
    * src.* plus score_<lang> and pred_lang.
    */
  private[graft] def langPredSql(src: String): String = {
    def occ(m: String) =
      s"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' $m ', ''))) / ${m.length + 2} AS BIGINT)"
    def sc(ms: Seq[String]) = ms.map(occ).mkString("(", " + ", ")")
    val scores = langMarkers
      .map { case (lang, ms) => s"${sc(ms)} AS score_$lang" }.mkString(", ")
    val langs = langMarkers.map(_._1)
    val whens = langs.init.zipWithIndex.map { case (lang, i) =>
      val cond = langs.drop(i + 1).map(o => s"score_$lang >= score_$o")
        .mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }.mkString(" ")
    s"""(SELECT *, CASE $whens ELSE '${langs.last}' END AS pred_lang
         FROM (SELECT *, $scores FROM $src) scored_)"""
  }

  /** Language ID: marker-token n-gram heuristic (count per-language marker
    * words, argmax with a fixed tie order). Deterministic string ops only.
    */
  val t05 = QueryDef(
    "t05_langid",
    "marker-word language-ID heuristic with fixed tie order",
    (s, dir) =>
      withLangPred(docs(s, dir))
        .select(col("doc_id"), col("score_en"), col("score_es"),
          col("score_de"), col("score_fr"), col("score_zh"), col("pred_lang"))
        .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id, score_en, score_es, score_de, score_fr, score_zh,
        pred_lang
      FROM ${langPredSql("documents")} t
      ORDER BY doc_id"""))

  /** Deterministic 80/10/10 split membership from the md5 prefix of the
    * doc id — ONE definition shared by the t06 gate and
    * [[graft.pipeline.CorpusPipeline.withSplit]] (and mirrored by
    * [[trainSplitSqlExpr]]), so the gate and the pipeline cannot drift.
    */
  private[graft] def trainSplitColOn(id: Column): Column = {
    val h = substring(md5(id.cast("string").cast("binary")), 1, 2)
    when(h < "cd", "train").when(h < "e6", "val").otherwise("test")
  }

  private[graft] def trainSplitCol: Column = trainSplitColOn(col("doc_id"))

  private[graft] def trainSplitSqlExprOn(id: String): String =
    s"""CASE WHEN substring(md5(CAST($id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
         WHEN substring(md5(CAST($id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
         ELSE 'test' END"""

  private[graft] val trainSplitSqlExpr: String = trainSplitSqlExprOn("doc_id")

  /** Per-doc (top_word_n, n_tokens) — shared by t09 and the pipeline's
    * quality stage.
    */
  private[graft] def topWordStats(df: DataFrame): DataFrame =
    df.select(col("doc_id"), explode(split(trim(col("text")), graft.Tok.Ws)).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("top_word_n"),
        sum(col("n")).cast("bigint").as("n_tokens"))

  /** Deterministic train/val/test split — the curation op every training
    * corpus needs: membership is a pure function of the document id
    * (md5 hex prefix compared lexicographically, ~80/10/10), so the split
    * is stable across runs, engines, cluster sizes, and re-partitioning —
    * no sampling state, no seed coordination. At 100 TB this is a narrow
    * map + one tiny aggregation.
    */
  val t06 = QueryDef(
    "t06_train_split",
    "deterministic hash 80/10/10 split with per-split stats",
    (s, dir) => {
      docs(s, dir)
        .withColumn("split", trainSplitCol)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("bigint").as("total_chars"),
          min(col("doc_id")).as("min_doc"))
        .orderBy(col("split"))
    },
    Some(s"""SELECT split, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars, MIN(doc_id) AS min_doc
      FROM (SELECT doc_id, n_chars, $trainSplitSqlExpr AS split
            FROM documents) t
      GROUP BY split ORDER BY split"""))

  /** Stratified deterministic sampling: k docs per (lang, source) stratum,
    * ordered by the md5 of the id — "random" but reproducible, the
    * per-source quota pattern used to rebalance training mixtures. One
    * shuffle on the stratum key; rank is a bounded per-group window.
    */
  val t07 = QueryDef(
    "t07_stratified_sample",
    "k-per-(lang,source) deterministic stratified sample",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"), col("source"))
        .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
      docs(s, dir)
        .withColumn("rk", row_number().over(w).cast("bigint"))
        .filter(col("rk") <= 20)
        .select(col("doc_id"), col("lang"), col("source"), col("rk"))
        .orderBy(col("lang"), col("source"), col("rk"))
    },
    Some("""SELECT doc_id, lang, source, rk FROM (
        SELECT doc_id, lang, source,
               row_number() OVER (PARTITION BY lang, source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents) t
      WHERE rk <= 20 ORDER BY lang, source, rk"""))

  /** Mixture re-weighting — the companion to t07's per-stratum quotas:
    * each SOURCE gets a sampling RATE (here even-numbered sources keep
    * everything, odd-numbered keep ~30 % — the shape of down-weighting
    * low-quality crawls in a training mixture), and membership is a pure
    * hash function of the doc id against the rate threshold. Like t06's
    * split this needs no sampling state, no seed coordination, and is
    * stable under re-partitioning and re-runs — at 100 TB it is a narrow
    * map; the only shuffle is the reporting aggregate. The threshold
    * compares the first 4 md5 hex chars against floor(rate·16^4) in hex
    * ('g' > every hex digit = rate 1.0), so DuckDB replays membership
    * exactly.
    */
  val t17 = QueryDef(
    "t17_mixture_sample",
    "deterministic per-source rate sampling (training-mixture reweighting)",
    (s, dir) => {
      // uncapped tail substring — the oracle's substring(source, 4) parses
      // the IDENTICAL characters; a length-capped Spark side would diverge
      // silently (null-drop vs hard CAST error) if the source naming
      // contract ever grew past the cap
      val srcNum = col("source").substr(lit(4), length(col("source"))).cast("int")
      val threshold = when(pmod(srcNum, lit(2)) === 0, "g").otherwise("4ccc")
      val frac = substring(
        md5(concat(lit("mix:"), col("doc_id").cast("string")).cast("binary")), 1, 4)
      docs(s, dir)
        .filter(frac < threshold)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("bigint").as("total_chars"),
          min(col("doc_id")).as("min_doc"))
        .orderBy(col("source"))
    },
    Some("""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars, MIN(doc_id) AS min_doc
      FROM documents
      WHERE substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4) <
            CASE WHEN CAST(substring(source, 4) AS INT) % 2 = 0
                 THEN 'g' ELSE '4ccc' END
      GROUP BY source ORDER BY source"""))

  /** Character-entropy quality score: H(doc) = -Σ p(ch)·ln p(ch) over
    * the document's characters — the cheap repetitiveness/gibberish
    * signal next to t09's token-level repetition cut (low entropy ⇒
    * repeated characters/patterns; high ⇒ diverse text). Two keyed
    * aggregations, both map-side combinable: (doc, char) counts then the
    * per-doc entropy fold.
    *
    * Float parity: the per-char terms are ln over exact integer ratios,
    * but their SUM is partition-order-dependent (and libm ln may differ
    * in the last ulp cross-engine), so both sides round to 6 dp — the
    * g04 ArticleRank oracle convention.
    */
  /** t18 core over any documents-shaped frame, factored for the non-BMP
    * parity spec. Codepoint-safe segmentation: Java-regex `.` consumes one
    * CODE POINT (a surrogate pair stays one match), matching DuckDB's
    * codepoint-based substring/length — split(text, "") segments by UTF-16
    * code unit and would silently break hash parity on any non-BMP
    * character (emoji, rare CJK). (?s) so newlines count.
    */
  private[operators] def charEntropy(d: DataFrame): DataFrame = {
    val chars = d
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit("(?s)."), lit(0))).as("ch"))
    val cnt = chars.groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
    cnt.join(tot, Seq("doc_id"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).cast("bigint").as("n_chars_counted"),
        round(-sum((col("c") / col("n")) * log(col("c") / col("n"))), 6)
          .as("entropy"))
      .orderBy(col("doc_id"))
  }

  val t18 = QueryDef(
    "t18_char_entropy",
    "per-doc character-entropy quality score (6 dp, g04 rounding convention)",
    (s, dir) => charEntropy(docs(s, dir)),
    Some("""WITH chars AS (SELECT doc_id, substring(text, CAST(i AS INT) + 1, 1) AS ch
              FROM (SELECT doc_id, text, unnest(range(length(text))) AS i
                    FROM documents WHERE length(trim(text)) > 0) t),
      cnt AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2),
      tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1)
      SELECT cnt.doc_id, MAX(tot.n) AS n_chars_counted,
             ROUND(-SUM((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)), 6) AS entropy
      FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
      GROUP BY cnt.doc_id ORDER BY cnt.doc_id"""))

  /** Top-3 terms per language via the typed [[graft.functions.TopTerms]]
    * Aggregator: word counts (one shuffle) feed a bounded-buffer top-k
    * aggregation (second shuffle with O(k) state and map-side partial
    * merge) — at 100 TB this replaces a full window sort over every
    * (lang, word) count with k-row buffers.
    */
  val t08 = QueryDef(
    "t08_top_terms",
    "exact top-3 terms per language via bounded typed Aggregator",
    (s, dir) => {
      val counts = docs(s, dir)
        .filter(length(trim(col("text"))) > 0)
        .select(col("lang"), explode(split(trim(col("text")), graft.Tok.Ws)).as("term"))
        .groupBy(col("lang"), col("term"))
        .agg(count(lit(1)).as("n"))
      val topk = graft.functions.TopTerms(3)
      counts
        .groupBy(col("lang"))
        .agg(topk(col("term"), col("n")).as("top"))
        .select(col("lang"), posexplode(col("top")).as(Seq("pos", "tc")))
        .select(col("lang"), (col("pos") + 1).cast("bigint").as("rank"),
          col("tc.term").as("term"), col("tc.n").as("n"))
        .orderBy(col("lang"), col("rank"))
    },
    Some("""WITH w AS (SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS term
              FROM documents WHERE length(trim(text)) > 0),
        c AS (SELECT lang, term, COUNT(*) AS n FROM w GROUP BY lang, term)
      SELECT lang, rank, term, n FROM (
        SELECT lang, term, n,
               row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rank
        FROM c) t
      WHERE rank <= 3 ORDER BY lang, rank"""))

  /** Repetition-ratio quality filters (the Gopher-style "fraction of
    * tokens in the most common n-gram" signals used to drop template/
    * boilerplate documents from training corpora): top-word fraction and
    * top-bigram fraction per document. Two narrow explode→count chains
    * whose shuffles carry only (doc_id, gram) counts — linear at 100 TB,
    * and the per-doc aggregate state is O(1).
    */
  val t09 = QueryDef(
    "t09_repetition",
    "repetition filters: top-word and top-bigram token fractions",
    (s, dir) => {
      val arr = split(trim(col("text")), graft.Tok.Ws)
      val base = docs(s, dir)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), arr.as("arr"))
      val wc = topWordStats(docs(s, dir).filter(length(trim(col("text"))) > 0))
      val bc = base
        .select(col("doc_id"), explode(expr(
          "zip_with(slice(arr, 1, size(arr) - 1), slice(arr, 2, size(arr) - 1)," +
            " (a, b) -> concat(a, ' ', b))")).as("b"))
        .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id")).agg(max(col("n")).as("top_bigram_n"))
      wc.join(bc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"), col("top_word_n"),
          (col("top_word_n").cast("double") / col("n_tokens").cast("double"))
            .as("top_word_frac"),
          coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
          when(col("n_tokens") > 1,
            coalesce(col("top_bigram_n"), lit(0L)).cast("double") /
              (col("n_tokens") - 1).cast("double"))
            .otherwise(lit(0.0)).as("top_bigram_frac"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS arr
              FROM documents WHERE length(trim(text)) > 0),
        wc AS (SELECT doc_id, w, COUNT(*) AS n
               FROM (SELECT doc_id, unnest(arr) AS w FROM toks) GROUP BY 1, 2),
        tops AS (SELECT doc_id, MAX(n) AS top_word_n, CAST(SUM(n) AS BIGINT) AS n_tokens
                 FROM wc GROUP BY 1),
        bc AS (SELECT doc_id, b, COUNT(*) AS n
               FROM (SELECT doc_id,
                       unnest(list_transform(range(1, len(arr)),
                         i -> arr[i] || ' ' || arr[i + 1])) AS b
                     FROM toks) GROUP BY 1, 2),
        topb AS (SELECT doc_id, MAX(n) AS top_bigram_n FROM bc GROUP BY 1)
      SELECT t.doc_id, t.n_tokens, t.top_word_n,
        CAST(t.top_word_n AS DOUBLE) / t.n_tokens AS top_word_frac,
        COALESCE(b.top_bigram_n, 0) AS top_bigram_n,
        CASE WHEN t.n_tokens > 1
             THEN CAST(COALESCE(b.top_bigram_n, 0) AS DOUBLE) / (t.n_tokens - 1)
             ELSE 0.0 END AS top_bigram_frac
      FROM tops t LEFT JOIN topb b USING (doc_id) ORDER BY t.doc_id"""))

  /** PII redaction: mask emails and IPv4 addresses, count what was
    * masked. The corpus is synthetic word salad with no PII, so the gate
    * first decorates each document with a deterministic email + IP derived
    * from doc_id — otherwise the pass would be vacuous (q05's round-1
    * lesson). Redaction itself is two codegen'd regexp_replace passes —
    * a narrow map, trivially linear at 100 TB. Regexes stay inside the
    * RE2-compatible subset so the Java and DuckDB engines agree.
    */
  val t10 = QueryDef(
    "t10_pii_redact",
    "PII redaction: mask emails + IPv4, per-doc redaction counts",
    (s, dir) => {
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val decorated = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com from 10.0."),
        pmod(col("doc_id"), lit(256L)).cast("string"), lit(".7"))
      docs(s, dir)
        .select(col("doc_id"), decorated.as("t"))
        .select(col("doc_id"),
          regexp_count(col("t"), lit(emailRe)).cast("bigint").as("n_emails"),
          regexp_count(col("t"), lit(ipRe)).cast("bigint").as("n_ips"),
          md5(regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"),
            ipRe, "<IP>").cast("binary")).as("redacted_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id,
          text || ' contact user' || CAST(doc_id AS VARCHAR) ||
            '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        md5(regexp_replace(
          regexp_replace(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS redacted_md5
      FROM d ORDER BY doc_id"""))

  /** Most distinctive term per document, scored tf/df (idf weighting
    * without the log — bigint ratios divide to bit-identical doubles in
    * every engine, where ln() parity is libm-dependent). Two shuffles
    * (doc-term counts, then term df) + one bounded per-doc window; the
    * df table is the only cross-doc state and it is O(vocabulary).
    */
  val t11 = QueryDef(
    "t11_distinctive_terms",
    "top distinctive term per doc by tf/df ratio",
    (s, dir) => {
      val toks = docs(s, dir)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), explode(split(trim(col("text")), graft.Tok.Ws)).as("term"))
      val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
      tf.join(df, Seq("term"))
        .withColumn("score", col("tf").cast("double") / col("df").cast("double"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
              FROM documents WHERE length(trim(text)) > 0),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        sc AS (SELECT doc_id, term, tf, df, CAST(tf AS DOUBLE) / df AS score,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY CAST(tf AS DOUBLE) / df DESC, term) AS rk
               FROM tf JOIN df USING (term))
      SELECT doc_id, term, tf, df, score FROM sc WHERE rk = 1 ORDER BY doc_id"""))

  /** Sequence packing: assign documents to fixed-token-budget training
    * bins (the greedy fill used to build packed LM training sequences).
    * Deterministic distributed variant: within each language partition,
    * docs are ordered by (md5(id), id) and binned by cumulative token
    * count DIV budget — a single per-partition window cumsum, no
    * sequential packer. Bins can overflow by at most one document
    * (standard greedy-fill contract). At 100 TB packing runs per
    * (lang, shard) partition — the window never sees more than one
    * partition's rows.
    */
  val t13 = QueryDef(
    "t13_seq_pack",
    "token-budget sequence packing via per-lang cumsum binning",
    (s, dir) => {
      val budget = 2000L
      val nTok = size(split(trim(col("text")), graft.Tok.Ws)).cast("bigint")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      docs(s, dir)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), col("lang"), nTok.as("n_tok"))
        .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("bin", expr(s"cum_before DIV $budget"))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("bigint").as("bin_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("lang"), col("bin"))
    },
    Some("""WITH d AS (SELECT doc_id, lang,
            CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
          FROM documents WHERE length(trim(text)) > 0),
        c AS (SELECT doc_id, lang, n_tok,
            CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY lang
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
          FROM d)
      SELECT lang, cum_before // 2000 AS bin, COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS bin_tokens, MIN(doc_id) AS first_doc
      FROM c GROUP BY 1, 2 ORDER BY lang, bin"""))

  /** BPE-style token counting: letter runs, digit runs, and single
    * non-alphanumeric marks as separate tokens (the pre-tokenizer split
    * every byte-pair encoder starts from), next to t03's whitespace
    * counts. The corpus is pure lowercase words, so the gate decorates
    * each doc with doc_id-derived digits and punctuation to make the
    * letter/digit/mark split non-vacuous. Patterns stay in the
    * RE2 ∩ java.util.regex common subset.
    */
  val t14 = QueryDef(
    "t14_bpe_tokens",
    "BPE-ish pre-tokenizer counts: letter runs, digit runs, marks",
    (s, dir) => {
      val tokRe = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
      val decorated = concat(col("text"), lit(" v"), col("doc_id").cast("string"),
        lit(".x, rev-"), pmod(col("doc_id"), lit(7L)).cast("string"), lit("!"))
      docs(s, dir)
        .select(col("doc_id"),
          explode(regexp_extract_all(decorated, lit(tokRe), lit(0))).as("tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("n_distinct"),
          count(when(col("tok").rlike("^[0-9]+$"), 1)).as("n_digit_runs"),
          count(when(col("tok").rlike("^[^a-zA-Z0-9]$"), 1)).as("n_marks"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(
            text || ' v' || CAST(doc_id AS VARCHAR) || '.x, rev-' ||
              CAST(doc_id % 7 AS VARCHAR) || '!',
            '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS tok
          FROM documents)
      SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_distinct,
             COUNT(CASE WHEN regexp_matches(tok, '^[0-9]+$') THEN 1 END) AS n_digit_runs,
             COUNT(CASE WHEN regexp_matches(tok, '^[^a-zA-Z0-9]$') THEN 1 END) AS n_marks
      FROM toks GROUP BY doc_id ORDER BY doc_id"""))

  /** Document chunking — the dual of t13's packing: split each document
    * into overlapping word windows (size 64, stride 48 — the standard
    * long-context training prep). Pure column math (split + sequence +
    * slice, all codegen'd): one narrow pass, chunk count ~ tokens/stride,
    * no shuffle until the output sort. Window starts step by `stride`;
    * the tail window may be short but is never empty.
    */
  val t15 = QueryDef(
    "t15_chunking",
    "overlapping word-window chunks (size 64, stride 48)",
    (s, dir) => {
      val (win, stride) = (64, 48)
      docs(s, dir)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), split(trim(col("text")), graft.Tok.Ws).as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0), size(col("toks")) - 1, lit(stride))).as("start"))
        .select(col("doc_id"),
          (col("start") / stride).cast("long").as("chunk_idx"),
          size(slice(col("toks"), col("start") + 1, lit(win))).cast("long").as("n_tokens"),
          array_join(slice(col("toks"), col("start") + 1, lit(win)), " ").as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some("""WITH toks AS (SELECT doc_id,
              string_split_regex(trim(text), '\s+') AS toks
            FROM documents WHERE length(trim(text)) > 0),
      starts AS (SELECT doc_id, toks,
              unnest(range(0, len(toks), 48)) AS start FROM toks)
      SELECT doc_id,
             start // 48 AS chunk_idx,
             len(toks[start + 1 : start + 64]) AS n_tokens,
             array_to_string(toks[start + 1 : start + 64], ' ') AS chunk_text
      FROM starts ORDER BY doc_id, chunk_idx"""))

  /** Bigram language-model quality score — the KenLM-style perplexity
    * filter of a training-data pipeline, reduced to its aggregation
    * skeleton: build add-one-smoothed bigram probabilities from the corpus
    * itself and score every document by its mean log-probability (low =
    * unnatural token sequences → filter candidate).
    *
    * Scale shape: the bigram stream is collapsed to per-(doc, bigram)
    * counts FIRST (map-side combinable groupBy), so the model tables
    * (`cb`, `cctx`) and the probe join all run over the reduced relation,
    * never the raw token stream; the `docBig` subplan feeding both the
    * model build and the probe is identical, so Catalyst reuses one
    * shuffle exchange. Vocabulary size is the only driver scalar. Hot
    * bigrams ("of the") skew the (w1, w2) join key — that is AQE
    * skew-join territory, not a window-over-partition buffer, which is
    * why this is joins over aggregates rather than two count windows.
    * Mean log-prob is ROUND(…, 6) under the t18/g04 cross-engine float
    * convention (summation-order drift ~1e-13 ≪ 5e-7).
    */
  def bigramLmScores(docsDf: DataFrame): DataFrame = {
    val toks = docsDf
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(trim(col("text")), graft.Tok.Ws).as("t"))
      .cache() // single fill: vocab scalar + the bigram stream
    val vocab = toks.select(explode(col("t")).as("w"))
      .agg(countDistinct(col("w"))).head.getLong(0)
    val docBig = toks.filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(expr(
          "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1), " +
            "(a, b) -> named_struct('w1', a, 'w2', b))")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))
    val cb = docBig.groupBy(col("w1"), col("w2"))
      .agg(sum(col("n")).as("cb"))
    val cctx = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cctx"))
    // pre-join the context totals INTO the bigram model (model-sized
    // shuffle) so the corpus-sized docBig relation shuffles once for the
    // probe, not once per model table
    val model = cb.join(cctx, Seq("w1"))
    // materialize the per-doc score frame, then release the cached token
    // arrays (r9 ADVICE session-cache hygiene) — also saves t23's chain
    // from replaying the LM build per downstream consumer
    val out = docBig.join(model, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).cast("bigint").as("n_bigrams"),
        round(sum(col("n") * log((col("cb") + lit(1)).cast("double")
          / (col("cctx") + lit(vocab)).cast("double")))
          / sum(col("n")), 6).as("lm_score"))
      .orderBy(col("doc_id"))
      .localCheckpoint(true)
    toks.unpersist(blocking = false)
    out
  }

  val t19 = QueryDef(
    "t19_ngram_lm",
    "bigram-LM quality score: add-one-smoothed mean log-prob per doc",
    (s, dir) => bigramLmScores(docs(s, dir)),
    Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents WHERE length(trim(text)) > 0),
      v AS (SELECT COUNT(DISTINCT w) AS vv
            FROM (SELECT unnest(t) AS w FROM toks) u),
      big AS (SELECT doc_id,
                   t[CAST(i AS INT) + 1] AS w1, t[CAST(i AS INT) + 2] AS w2
              FROM (SELECT doc_id, t, unnest(range(len(t) - 1)) AS i
                    FROM toks WHERE len(t) >= 2) x),
      db AS (SELECT doc_id, w1, w2, COUNT(*) AS n FROM big GROUP BY 1, 2, 3),
      cb AS (SELECT w1, w2, SUM(n) AS cb FROM db GROUP BY 1, 2),
      cctx AS (SELECT w1, SUM(cb) AS cctx FROM cb GROUP BY 1)
      SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
             ROUND(SUM(n * ln((cb + 1.0) / (cctx + vv))) / SUM(n), 6) AS lm_score
      FROM db JOIN cb USING (w1, w2) JOIN cctx USING (w1) CROSS JOIN v
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Deterministic global training-order shuffle: every epoch pipeline
    * needs a reproducible corpus permutation; the scalable form is a
    * seeded-hash range sort (Spark's `orderBy` = range-partitioned
    * TeraSort shape, no single-reducer window) followed by
    * `zipWithIndex`, which assigns contiguous global positions with two
    * narrow passes (per-partition counts, then offset add) — the standard
    * global-index idiom that never funnels rows through one partition.
    * Output is position-dense (0..N-1), so a downstream trainer can range
    * on it directly.
    */
  def corpusShuffle(docsDf: DataFrame, seed: String = "graft42"): DataFrame = {
    val spark = docsDf.sparkSession
    import spark.implicits._
    val sorted = docsDf
      .select(col("doc_id"),
        md5(concat_ws(":", col("doc_id"), lit(seed))).as("k"))
      .orderBy(col("k"), col("doc_id"))
      .select(col("doc_id"))
    sorted.rdd.zipWithIndex
      .map { case (r, i) => (r.getLong(0), i) }
      .toDF("doc_id", "pos")
      .orderBy(col("pos"))
  }

  val t20 = QueryDef(
    "t20_corpus_shuffle",
    "deterministic corpus shuffle: seeded md5 order + dense global position",
    (s, dir) => corpusShuffle(docs(s, dir)),
    Some("""SELECT doc_id,
             CAST(row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':graft42'), doc_id) - 1
               AS BIGINT) AS pos
      FROM documents ORDER BY pos"""))

  /** Corpus datasheet — the per-(source, lang) report every curated
    * training set ships with: document/token/char totals, the exact-dup
    * rate (distinct md5 texts vs rows), and exact nearest-rank length
    * quartiles (the e06 integer-rank convention — window sort within the
    * group; at extreme group sizes the approx_percentile sketch is the
    * substitute, as e07 is for countDistinct). One narrow feature pass,
    * one window sort, one group aggregate.
    */
  /** Scale path for the t21 datasheet: ONE shuffle-scalable groupBy pass —
    * `approx_percentile` (GK sketch, mergeable map-side state) replaces
    * the exact nearest-rank window and `approx_count_distinct` (HLL++)
    * replaces the exact distinct-hash count, exactly as e07 stands beside
    * e06. No per-group window sort anywhere, so a source×lang group with
    * billions of rows costs the same plan as a small one. At gate-sized
    * groups the sketches recover the exact answers (pinned in
    * TrainPrepOpsSpec against the window form).
    */
  def corpusProfileApprox(docsDf: DataFrame,
                          accuracy: Int = 10000): DataFrame =
    docsDf.filter(length(trim(col("text"))) > 0)
      .select(col("source"), col("lang"),
        length(col("text")).cast("bigint").as("nc"),
        size(split(trim(col("text")), graft.Tok.Ws)).cast("bigint").as("nw"),
        md5(col("text").cast("binary")).as("h"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nw")).cast("bigint").as("n_tokens"),
        sum(col("nc")).cast("bigint").as("n_chars"),
        approx_count_distinct(col("h"), 0.01).as("n_unique_texts"),
        expr(s"approx_percentile(nc, 0.25, $accuracy)").as("len_p25"),
        expr(s"approx_percentile(nc, 0.50, $accuracy)").as("len_p50"),
        expr(s"approx_percentile(nc, 0.75, $accuracy)").as("len_p75"))
      .orderBy(col("source"), col("lang"))

  val t21 = QueryDef(
    "t21_corpus_profile",
    "per-(source,lang) datasheet: docs, tokens, chars, unique texts, length quartiles",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"), col("lang"))
      val base = docs(s, dir).filter(length(trim(col("text"))) > 0)
        .select(col("source"), col("lang"), col("doc_id"),
          length(col("text")).cast("bigint").as("nc"),
          size(split(trim(col("text")), graft.Tok.Ws)).cast("bigint").as("nw"),
          md5(col("text").cast("binary")).as("h"))
      val ranked = base
        .withColumn("rk", row_number().over(w.orderBy(col("nc"), col("doc_id"))))
        .withColumn("n", count(lit(1)).over(w))
      def pick(p: Int) =
        max(when(col("rk") === expr(s"(n * $p + 99) DIV 100"), col("nc")))
      ranked.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nw")).cast("bigint").as("n_tokens"),
          sum(col("nc")).cast("bigint").as("n_chars"),
          countDistinct(col("h")).as("n_unique_texts"),
          pick(25).as("len_p25"), pick(50).as("len_p50"),
          pick(75).as("len_p75"))
        .orderBy(col("source"), col("lang"))
    },
    Some("""WITH b AS (SELECT source, lang, doc_id,
              CAST(length(text) AS BIGINT) AS nc,
              CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nw,
              md5(text) AS h
            FROM documents WHERE length(trim(text)) > 0),
      r AS (SELECT *,
              row_number() OVER (PARTITION BY source, lang ORDER BY nc, doc_id) AS rk,
              COUNT(*) OVER (PARTITION BY source, lang) AS n
            FROM b)
      SELECT source, lang, COUNT(*) AS n_docs,
             CAST(SUM(nw) AS BIGINT) AS n_tokens,
             CAST(SUM(nc) AS BIGINT) AS n_chars,
             COUNT(DISTINCT h) AS n_unique_texts,
             MAX(CASE WHEN rk = (n * 25 + 99) // 100 THEN nc END) AS len_p25,
             MAX(CASE WHEN rk = (n * 50 + 99) // 100 THEN nc END) AS len_p50,
             MAX(CASE WHEN rk = (n * 75 + 99) // 100 THEN nc END) AS len_p75
      FROM r GROUP BY source, lang ORDER BY source, lang"""))

  /** Oracle gate for the t21 sketch twin (the e07-beside-e06 pattern,
    * r9 VERDICT item 3): run [[corpusProfileApprox]] — the 100 TB path —
    * and hash-pin its EXACT columns (docs/tokens/chars totals are plain
    * sums in both forms) while each sketch bound is VALUE-ENCODED in the
    * g06 convention (no literal-TRUE pins): the gate emits a value the
    * oracle independently recomputes only when the bound holds, −1
    * otherwise —
    *
    *  - `n_unique_exact_ok`: the exact distinct-hash count, emitted when
    *    the HLL++ estimate sits within e07's 5% bar (+1 for tiny groups);
    *  - `pXX_lo_ok`: the lower rank-bound value, emitted when the GK
    *    quantile is the `nc` of a row whose rank sits within the
    *    sketch's guaranteed ±⌊n/accuracy⌋ rank error (+2 slack for the
    *    ceil-vs-floor target-rank convention gap) of the t21
    *    nearest-rank target — a sketch that drifted out of its guarantee
    *    flips the value and fails the hash;
    *  - `quartiles_ordered_docs`: the group row count, emitted when
    *    p25 ≤ p50 ≤ p75.
    *
    * The exact side reuses t21's window form — affordable at gate scale,
    * and exactly the honesty cross-check a user runs once per corpus
    * before trusting the sketch path on the full 100 TB.
    */
  val t24 = QueryDef(
    "t24_profile_sketch",
    "sketch-datasheet gate: exact totals hash-pinned, GK/HLL inside proven bounds",
    (s, dir) => {
      val accuracy = 10000
      val ap = corpusProfileApprox(docs(s, dir), accuracy)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"), col("lang"))
      val ranked = docs(s, dir).filter(length(trim(col("text"))) > 0)
        .select(col("source"), col("lang"), col("doc_id"),
          length(col("text")).cast("bigint").as("nc"),
          md5(col("text").cast("binary")).as("h"))
        .withColumn("rk", row_number().over(w.orderBy(col("nc"), col("doc_id"))))
        .withColumn("n", count(lit(1)).over(w))
      def boundVal(p: Int, lo: Boolean) = {
        val target = expr(s"(n * $p + 99) DIV 100")
        val err = expr(s"n DIV $accuracy") + lit(2)
        val rank = if (lo) greatest(lit(1), target - err)
                   else least(col("n"), target + err)
        max(when(col("rk") === rank, col("nc")))
      }
      val exact = ranked.groupBy(col("source"), col("lang"))
        .agg(countDistinct(col("h")).as("exact_uniq"),
          boundVal(25, lo = true).as("lo25"), boundVal(25, lo = false).as("hi25"),
          boundVal(50, lo = true).as("lo50"), boundVal(50, lo = false).as("hi50"),
          boundVal(75, lo = true).as("lo75"), boundVal(75, lo = false).as("hi75"))
      // VALUE-ENCODED invariants (the g06 convention, r9 'no literal-TRUE
      // pins' rule): each sketch bound emits a value DuckDB independently
      // recomputes — the exact distinct count, the lower rank-bound
      // quantile value, the group row count — only when the bound holds,
      // else −1. A Spark-side bug that made a bound trivially true would
      // still have to reproduce the oracle's exact value to hash-match.
      ap.join(exact, Seq("source", "lang"))
        .select(col("source"), col("lang"),
          col("n_docs"), col("n_tokens"), col("n_chars"),
          when(abs(col("n_unique_texts") - col("exact_uniq")).cast("double") <=
            col("exact_uniq").cast("double") * 0.05 + 1, col("exact_uniq"))
            .otherwise(lit(-1L)).as("n_unique_exact_ok"),
          when(col("len_p25") >= col("lo25") && col("len_p25") <= col("hi25"),
            col("lo25")).otherwise(lit(-1L)).as("p25_lo_ok"),
          when(col("len_p50") >= col("lo50") && col("len_p50") <= col("hi50"),
            col("lo50")).otherwise(lit(-1L)).as("p50_lo_ok"),
          when(col("len_p75") >= col("lo75") && col("len_p75") <= col("hi75"),
            col("lo75")).otherwise(lit(-1L)).as("p75_lo_ok"),
          when(col("len_p25") <= col("len_p50") && col("len_p50") <= col("len_p75"),
            col("n_docs")).otherwise(lit(-1L)).as("quartiles_ordered_docs"))
        .orderBy(col("source"), col("lang"))
    },
    Some("""WITH b AS (SELECT source, lang, doc_id,
              CAST(length(text) AS BIGINT) AS nc,
              CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nw,
              md5(text) AS h
            FROM documents WHERE length(trim(text)) > 0),
      r AS (SELECT *,
              row_number() OVER (PARTITION BY source, lang ORDER BY nc, doc_id) AS rk,
              COUNT(*) OVER (PARTITION BY source, lang) AS n
            FROM b)
      SELECT source, lang, COUNT(*) AS n_docs,
             CAST(SUM(nw) AS BIGINT) AS n_tokens,
             CAST(SUM(nc) AS BIGINT) AS n_chars,
             CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique_exact_ok,
             MAX(CASE WHEN rk = GREATEST(1, (n * 25 + 99) // 100 - (n // 10000 + 2))
                 THEN nc END) AS p25_lo_ok,
             MAX(CASE WHEN rk = GREATEST(1, (n * 50 + 99) // 100 - (n // 10000 + 2))
                 THEN nc END) AS p50_lo_ok,
             MAX(CASE WHEN rk = GREATEST(1, (n * 75 + 99) // 100 - (n // 10000 + 2))
                 THEN nc END) AS p75_lo_ok,
             COUNT(*) AS quartiles_ordered_docs
      FROM r GROUP BY source, lang ORDER BY source, lang"""))

  /** Scalable twin of t22's window form: at 100 TB a handful of sources
    * means a handful of ENORMOUS window partitions — a per-source
    * single-reducer sort. This form range-partitions on (source, k) so
    * each source's seeded order spans MANY partitions, then computes the
    * running token sum in two passes (per-(partition, source) subtotals →
    * driver prefix over the partition order → per-partition offset add) —
    * the zipWithIndex global-index idiom generalized to prefix SUMS.
    * Driver traffic is bounded by partitions × sources, never rows.
    * Row-identical to the window form (TrainPrepOpsSpec parity pin);
    * the gate keeps the declarative window shape the oracle mirrors.
    */
  def tokenBudgetSample(docsDf: DataFrame, budget: Long,
                        seed: String = "budget42"): DataFrame = {
    val spark = docsDf.sparkSession
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = docsDf.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        size(split(trim(col("text")), graft.Tok.Ws)).cast("long").as("n_tokens"),
        md5(concat_ws(":", col("doc_id"), lit(seed))).as("k"))
      .as[(Long, String, Long, String)]
      .repartitionByRange(parts, col("source"), col("k"), col("doc_id"))
      .sortWithinPartitions(col("source"), col("k"), col("doc_id"))
      .cache() // two passes: subtotals, then the offset-adjusted scan
    val partSums = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val sums = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { case (_, src, nt, _) =>
        sums.update(src, sums.getOrElse(src, 0L) + nt)
      }
      Iterator.single((pid, sums.toSeq))
    }.collect().sortBy(_._1)
    val offsets: Map[(Int, String), Long] = {
      val running = scala.collection.mutable.HashMap.empty[String, Long]
      val b = Map.newBuilder[(Int, String), Long]
      partSums.foreach { case (pid, sums) =>
        sums.foreach { case (src, s) =>
          b += ((pid, src) -> running.getOrElse(src, 0L))
          running.update(src, running.getOrElse(src, 0L) + s)
        }
      }
      b.result()
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val out = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val run = scala.collection.mutable.HashMap.empty[String, Long]
      it.flatMap { case (id, src, nt, _) =>
        val cur = run.getOrElse(src,
          bc.value.getOrElse((pid, src), 0L)) + nt
        run.update(src, cur)
        if (cur <= budget) Some((src, id, nt, cur)) else None
      }
    }.toDF("source", "doc_id", "n_tokens", "cum_tokens")
    // materialize the kept rows (bounded by the budget), then release the
    // cached range-sorted scan (r9 ADVICE session-cache hygiene)
    val kept = out.orderBy(col("source"), col("cum_tokens"))
      .localCheckpoint(true)
    sorted.unpersist(blocking = false)
    kept
  }

  /** Token-budget mixture sampling — the complement of t17's rate-based
    * mixing: each source contributes documents in seeded-md5 order until
    * a per-source TOKEN budget fills (how real mixtures are specified:
    * "N tokens of source X", not "p% of rows"). The running-total window
    * is one sort per source partition; the md5 order makes the kept set
    * independent of physical layout, and the inclusive cumulative-sum
    * cutoff admits the document that exactly reaches the budget but not
    * the one that overflows it. At corpus scale the per-source window
    * partition becomes the bottleneck — [[tokenBudgetSample]] is the
    * row-identical two-pass range-partitioned form.
    */
  val t22 = QueryDef(
    "t22_token_budget_sample",
    "per-source token-budget sample: seeded-md5 doc order, cumulative cutoff",
    (s, dir) => {
      val budget = 1000L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("k"), col("doc_id"))
      docs(s, dir).filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), col("source"),
          size(split(trim(col("text")), graft.Tok.Ws)).cast("bigint").as("n_tokens"),
          md5(concat_ws(":", col("doc_id"), lit("budget42"))).as("k"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .filter(col("cum_tokens") <= budget)
        .select(col("source"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
        .orderBy(col("source"), col("cum_tokens"))
    },
    Some("""WITH b AS (SELECT doc_id, source,
              CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
              md5(CAST(doc_id AS VARCHAR) || ':budget42') AS k
            FROM documents WHERE length(trim(text)) > 0),
      c AS (SELECT source, doc_id, n_tokens,
              CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY k, doc_id)
                AS BIGINT) AS cum_tokens
            FROM b)
      SELECT source, doc_id, n_tokens, cum_tokens
      FROM c WHERE cum_tokens <= 1000
      ORDER BY source, cum_tokens"""))

  /** Oracle gate for the t22 scale twin (r9 VERDICT item 3): the
    * two-pass range-partitioned [[tokenBudgetSample]] is ROW-IDENTICAL
    * to the per-source window form by construction, so it earns the
    * strongest oracle available — t22's own SQL, hash-compared. The
    * TrainPrepRandomSpec parity pin checks the two Spark forms against
    * each other; this gate checks the scale form against an independent
    * engine.
    */
  val t25 = QueryDef(
    "t25_budget_sample_scalable",
    "two-pass range-partitioned token-budget sample (t22's scale twin, same oracle)",
    (s, dir) => tokenBudgetSample(docs(s, dir), budget = 1000L),
    t22.oracle)

  /** 100 TB twin of the t23 chain — the two corpus-global constructs the
    * gate form keeps for oracle parity are replaced by their scale
    * shapes, the t21/t22-twin convention:
    *
    *  - the DECILE CUTOFF is a VALUE from `approx_percentile` (GK
    *    sketch, mergeable map-side state — rank error ≤ N/accuracy, so
    *    at gate scale it recovers the exact boundary), not a corpus-wide
    *    unpartitioned `row_number` window. Value semantics at the
    *    boundary: score ties share a fate (all boundary-tied docs drop
    *    together), where the rank form splits ties by doc_id — identical
    *    whenever the 6-dp boundary score is unique, which the parity pin
    *    asserts at gate scale.
    *  - the SEMANTIC-DEDUP stage runs [[DedupOps.semanticDedupTrained]]
    *    with k auto-sized to ≈√N(survivors) (`k = 0` sentinel), the
    *    published SemDeDup sizing: expected cluster size √N keeps the
    *    within-cluster pairwise bound Σ|cluster|² ≈ N^1.5 instead of the
    *    fixed-k N²/k, and Lloyd places cells where the density is.
    *
    * Everything else is the gate chain unchanged: LM scores come from
    * [[bigramLmScores]] (materialized once), the embedding side is
    * semi-joined down to survivors BEFORE dedup, and the survivor set is
    * bounded-small relative to the corpus. Spec: TrainPrepOpsSpec pins
    * survivor-set parity vs the gate's rank form and the structural
    * dedup contract (every dropped vec shares a cluster with a smaller
    * kept vec) at gate scale; the 10× rehearsal carries the flat-growth
    * reading.
    */
  def curateLearnedScalable(docsDf: DataFrame, embDf: DataFrame,
                            dropFrac: Double = 0.10, tau: Double = 0.35,
                            k: Int = 0, iters: Int = 2,
                            accuracy: Int = 10000): DataFrame = {
    val lm = bigramLmScores(docsDf) // localCheckpointed — filters below
                                    // re-read blocks, never the LM chain
    val cutRow = lm
      .agg(expr(s"approx_percentile(lm_score, $dropFrac, $accuracy)"))
      .head
    if (cutRow.isNullAt(0)) // empty/all-blank corpus: degrade like the
      return lm.select(col("doc_id"), col("doc_id").as("c_id"), // gate form
        col("lm_score"))
    val cutoff = cutRow.getDouble(0)
    val surv = lm.filter(col("lm_score") > cutoff)
    val kAuto =
      if (k > 0) k
      else math.max(16, math.ceil(math.sqrt(surv.count().toDouble)).toInt)
    val emb = embDf
      .join(surv.select(col("doc_id").as("vec_id")), Seq("vec_id"),
        "left_semi")
    val kept = DedupOps.semanticDedupTrained(emb, kAuto, iters, tau)
      .filter(!col("dropped"))
      .select(col("vec_id").as("doc_id"), col("c_id"))
    surv.join(kept, Seq("doc_id"))
      .select(col("doc_id"), col("c_id"), col("lm_score"))
      .orderBy(col("doc_id"))
  }

  /** Learned-signal curation chain — the t12 pattern over the round-9
    * family: score every document with the corpus's own bigram LM (t19),
    * drop the bottom decile (exact nearest-rank cutoff on the 6-dp score,
    * doc_id tie-break), then semantic-dedup the survivors' embeddings
    * (d11's centroid assign + cosine drops, seeds re-derived FROM the
    * survivors). One oracle replays the whole chain. The global rank
    * window is corpus-wide by definition — at 100 TB
    * [[curateLearnedScalable]] is the implemented twin: the cutoff VALUE
    * from `approx_percentile` (the t21-twin convention) and trained
    * centroids auto-sized ≈√N; the chain's joins and the dedup stage are
    * the usual broadcast/cluster-bounded shapes.
    */
  val t23 = QueryDef(
    "t23_curate_learned",
    "learned curation: bigram-LM decile filter -> semantic dedup of survivors",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("lm_score"), col("doc_id"))
      val ranked = bigramLmScores(docs(s, dir))
        .withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      val surv = ranked.filter(col("rk") > expr("(n * 10 + 99) DIV 100"))
        .select(col("doc_id"), col("lm_score"))
        .cache() // consumed twice: the embedding semi-join + the final join
                 // (each would otherwise replay the whole LM chain)
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x AS double))").as("emb"))
        .join(surv.select(col("doc_id").as("vec_id")), Seq("vec_id"),
          "left_semi")
      val kept = DedupOps.semanticDedup(emb)
        .filter(!col("dropped"))
        .select(col("vec_id").as("doc_id"), col("c_id"))
      val out = surv.join(kept, Seq("doc_id"))
        .select(col("doc_id"), col("c_id"), col("lm_score"))
        .orderBy(col("doc_id"))
        .localCheckpoint(true) // materialize, then free the survivor cache
      surv.unpersist(blocking = false)
      out
    },
    Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents WHERE length(trim(text)) > 0),
      v AS (SELECT COUNT(DISTINCT w) AS vv
            FROM (SELECT unnest(t) AS w FROM toks) u),
      big AS (SELECT doc_id,
                   t[CAST(i AS INT) + 1] AS w1, t[CAST(i AS INT) + 2] AS w2
              FROM (SELECT doc_id, t, unnest(range(len(t) - 1)) AS i
                    FROM toks WHERE len(t) >= 2) x),
      db AS (SELECT doc_id, w1, w2, COUNT(*) AS n FROM big GROUP BY 1, 2, 3),
      cb AS (SELECT w1, w2, SUM(n) AS cb FROM db GROUP BY 1, 2),
      cctx AS (SELECT w1, SUM(cb) AS cctx FROM cb GROUP BY 1),
      lm AS (SELECT doc_id,
               ROUND(SUM(n * ln((cb + 1.0) / (cctx + vv))) / SUM(n), 6) AS lm_score
             FROM db JOIN cb USING (w1, w2) JOIN cctx USING (w1) CROSS JOIN v
             GROUP BY doc_id),
      ranked AS (SELECT doc_id, lm_score,
               row_number() OVER (ORDER BY lm_score, doc_id) AS rk,
               COUNT(*) OVER () AS nn
             FROM lm),
      surv AS (SELECT doc_id, lm_score FROM ranked
               WHERE rk > (nn * 10 + 99) // 100),
      e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings WHERE vec_id IN (SELECT doc_id FROM surv)),
      nrm AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS norm FROM e),
      seeds AS (SELECT vec_id AS c_id, emb AS c_emb, norm AS c_norm
                FROM nrm ORDER BY vec_id LIMIT 16),
      assign AS (SELECT vec_id, c_id, emb, norm FROM (
          SELECT x.vec_id, sd.c_id, x.emb, x.norm,
                 row_number() OVER (PARTITION BY x.vec_id
                   ORDER BY list_dot_product(x.emb, sd.c_emb) / (x.norm * sd.c_norm) DESC,
                            sd.c_id) AS rn
          FROM nrm x CROSS JOIN seeds sd) t WHERE rn = 1),
      drops AS (SELECT DISTINCT b.vec_id
                FROM assign a JOIN assign b
                  ON a.c_id = b.c_id AND a.vec_id < b.vec_id
                WHERE list_dot_product(a.emb, b.emb) / (a.norm * b.norm) >= 0.35)
      SELECT a.vec_id AS doc_id, a.c_id, s2.lm_score
      FROM assign a JOIN surv s2 ON s2.doc_id = a.vec_id
      WHERE a.vec_id NOT IN (SELECT vec_id FROM drops)
      ORDER BY doc_id"""))

  /** Pseudo-LINE model shared by t26 (within-doc duplicate-line fractions)
    * and d12 (cross-doc boilerplate-line removal). The synthetic corpus has
    * no newlines, so — the t10 decoration convention — "lines" are
    * reconstructed deterministically: the token stream is chunked into
    * 3-token lines, then a boilerplate line ("click here now") is appended
    * `doc_id % 4` times, giving every fourth doc 0/1/2/3 injected copies.
    * With the corpus's small vocabulary, 3-token chunks also collide
    * naturally (within and across documents), so both gates exercise real
    * and injected repetition. Output: one (doc_id, pos, line) row per
    * line, pos = 0-based position in the reconstructed document.
    *
    * Scale shape: a single narrow map (split + chunk + posexplode) —
    * row count is |tokens|/3, linear at 100 TB with no shuffle here.
    */
  private[graft] def docLines(d: DataFrame, lineTok: Int = 3,
      boiler: String = "click here now", inject: Boolean = true): DataFrame = {
    // inject=false (round-11 ADVICE): the REWRITE/pipeline consumers must
    // see only the document's own lines — injecting the synthetic boiler
    // there would write phantom text into rebuilt documents whenever the
    // line falls below a caller's minDocs. Injection stays a gate-only
    // decoration (it gives the detection gates a guaranteed cross-doc
    // duplicate line at every SF).
    val boilerPart =
      if (inject) s", array_repeat('$boiler', cast(doc_id % 4 as int))" else ""
    d.filter(length(trim(col("text"))) > 0)
      .withColumn("toks", split(trim(col("text")), graft.Tok.Ws))
      .select(col("doc_id"), expr(
        s"""concat(
             transform(sequence(0, cast(ceil(size(toks) / $lineTok.0) as int) - 1),
               i -> concat_ws(' ', slice(toks, i * $lineTok + 1, $lineTok)))
             $boilerPart)""").as("arr"))
      .select(col("doc_id"), posexplode(col("arr")).as(Seq("pos", "line")))
  }

  /** DuckDB CTE replaying [[docLines]]: defines `lines(doc_id, pos, line)`.
    * Prepend as `WITH $docLinesSql, ...`.
    */
  private[graft] def docLinesSql(lineTok: Int = 3,
      boiler: String = "click here now"): String =
    s"""ltt AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
             FROM documents WHERE length(trim(text)) > 0),
      lnn AS (SELECT doc_id, toks,
                CAST(ceil(len(toks) / $lineTok.0) AS INT) AS nc FROM ltt),
      lines AS (
        SELECT doc_id, i AS pos,
               array_to_string(toks[i*$lineTok+1 : i*$lineTok+$lineTok], ' ') AS line
        FROM (SELECT doc_id, toks, unnest(range(nc)) AS i FROM lnn) u1
        UNION ALL
        SELECT doc_id, nc + j AS pos, '$boiler' AS line
        FROM (SELECT doc_id, nc, unnest(range(doc_id % 4)) AS j FROM lnn) u2)"""

  /** t26 core over any documents-shaped frame, factored for the spec's
    * hand fixture. Two keyed aggregations, both map-side combinable —
    * (doc, line) counts then the per-doc fold; all counters are exact
    * integers, the two fractions are single double divisions (the t09
    * float convention).
    */
  private[graft] def dupLineStats(d: DataFrame): DataFrame =
    docLines(d)
      .groupBy(col("doc_id"), col("line"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("n")).cast("bigint").as("n_lines"),
        sum(col("n") - 1).cast("bigint").as("n_dup_lines"),
        sum(col("n") * length(col("line"))).cast("bigint").as("line_chars"),
        sum((col("n") - 1) * length(col("line"))).cast("bigint").as("dup_chars"))
      .select(col("doc_id"), col("n_lines"), col("n_dup_lines"),
        (col("n_dup_lines").cast("double") / col("n_lines").cast("double"))
          .as("dup_line_frac"),
        (col("dup_chars").cast("double") / col("line_chars").cast("double"))
          .as("dup_char_frac"))
      .orderBy(col("doc_id"))

  /** Duplicate-LINE fractions — the Gopher/MassiveText repetition filters
    * at line granularity, beside t09's token n-gram fractions: per doc,
    * the fraction of lines that are repeats of an earlier line (each
    * distinct line's occurrences beyond the first) by COUNT and by
    * CHARACTER MASS. Documents full of repeated lines (navigation chrome,
    * cookie banners, templated listings) score high on both and get cut;
    * the char-mass variant catches a few long repeated lines that the
    * count variant underweights. The paragraph-granularity twin is this
    * same operator at a larger [[docLines]] chunk width.
    */
  val t26 = QueryDef(
    "t26_dup_lines",
    "Gopher repetition filters: duplicate-line count + char-mass fractions",
    (s, dir) => dupLineStats(docs(s, dir)),
    Some(s"""WITH ${docLinesSql()},
      c AS (SELECT doc_id, line, COUNT(*) AS n, length(line) AS len
            FROM lines GROUP BY doc_id, line, length(line))
      SELECT doc_id,
        CAST(SUM(n) AS BIGINT) AS n_lines,
        CAST(SUM(n - 1) AS BIGINT) AS n_dup_lines,
        CAST(SUM(n - 1) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS dup_line_frac,
        CAST(SUM((n - 1) * len) AS DOUBLE) / CAST(SUM(n * len) AS DOUBLE)
          AS dup_char_frac
      FROM c GROUP BY doc_id ORDER BY doc_id"""))

  // ---------------------------------------------------------------- t27
  // DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  // select pool documents whose hashed-n-gram profile looks like a target
  // corpus, by the likelihood ratio of two smoothed bag-of-buckets models.

  /** First `n` md5 hex chars of `c` (a binary column) as a long — the
    * engine-agnostic hash family (the SketchOps/t06 md5 convention,
    * generalized to n chars). Mirrored by [[md5HexIntSql]].
    */
  private def md5HexIntCol(c: Column, n: Int): Column =
    conv(substring(md5(c), 1, n), 16, 10).cast("long")

  /** DuckDB twin of [[md5HexIntCol]] over SQL expression `arg` (a VARCHAR):
    * positional strpos folds, the SketchOps bucketSql idiom at width n.
    */
  private def md5HexIntSql(arg: String, n: Int): String = {
    val terms = (1 to n).map { i =>
      val p = math.pow(16, (n - i).toDouble).toLong
      s"(strpos('0123456789abcdef', substring(md5($arg), $i, 1)) - 1) * $p"
    }
    s"(${terms.mkString(" + ")})"
  }

  /** DSIR core shared by the t27 gate and [[dsirResampleScalable]]:
    * per-doc importance weight + deterministic Gumbel key, NO selection.
    *
    * Model: every doc's unigrams and bigrams hash into `buckets` cells
    * (first-2-hex md5, the repo's engine-agnostic convention); the target
    * distribution is the bucket profile of docs with `source =
    * targetSource`, the pool distribution is the whole corpus, both
    * add-one smoothed. log w(doc) = Σ_b c_b · (ln p_t[b] − ln p_r[b]),
    * ROUND 6 (the t18/g04 cross-engine float convention). The Gumbel key
    * implements the paper's Gumbel-top-k resampling seedlessly: u from
    * the first-6-hex md5 of doc_id (the t20 seeded-shuffle idiom), key =
    * logw − ln(−ln u), ROUND 6.
    *
    * Scale shape: the gram stream collapses IMMEDIATELY to per-(doc,
    * bucket) counts (one map-side-combinable groupBy; ≤ `buckets` rows
    * per doc); ONE fused ≤`buckets`-row model table carries both
    * distributions (conditional sum) and broadcasts into the weight
    * aggregation. The only driver scalars are the two corpus totals
    * (one job over the model table). No windows, nothing quadratic —
    * linear in the token stream at 100 TB.
    */
  private[graft] def dsirKeyed(docsDf: DataFrame, targetSource: String,
      buckets: Int = 256): DataFrame = {
    require(buckets == 256, "bucket family is the 2-hex-char md5 convention")
    val toks = docsDf.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("source"),
        split(trim(col("text")), graft.Tok.Ws).as("t"))
    val grams = toks.select(col("doc_id"), col("source"), explode(expr(
      """concat(t, zip_with(slice(t, 1, size(t) - 1),
                            slice(t, 2, size(t) - 1),
                            (a, b) -> concat(a, ' ', b)))""")).as("g"))
    val gb = grams
      .withColumn("b", md5HexIntCol(col("g").cast("binary"), 2))
      .groupBy(col("doc_id"), col("source"), col("b"))
      .agg(count(lit(1)).as("c"))
      .cache() // two consumers: the fused model build + per-doc weights
    // ONE ≤256-row model table carrying both distributions (conditional
    // sum), so the weight join broadcasts a single tiny side
    val model = gb.groupBy(col("b")).agg(sum(col("c")).as("np"),
      coalesce(sum(when(col("source") === targetSource, col("c"))), lit(0L))
        .as("nt"))
    val totals = model
      .agg(coalesce(sum(col("np")), lit(0L)), coalesce(sum(col("nt")), lit(0L)))
      .head
    val (tp, tt) = (totals.getLong(0), totals.getLong(1))
    val out = gb.join(broadcast(model), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("bigint").as("n_grams"),
        round(sum(col("c").cast("double") *
          (log((col("nt") + lit(1)).cast("double")
            / lit((tt + buckets).toDouble))
            - log((col("np") + lit(1)).cast("double")
              / lit((tp + buckets).toDouble)))), 6).as("logw"))
      .withColumn("u",
        (md5HexIntCol(concat(col("doc_id").cast("string"), lit(":dsir42"))
          .cast("binary"), 6).cast("double") + lit(0.5)) / lit(16777216.0))
      .select(col("doc_id"), col("n_grams"), col("logw"),
        round(col("logw") - log(-log(col("u"))), 6).as("gkey"))
      .localCheckpoint(true)
    gb.unpersist(blocking = false)
    out
  }

  /** DuckDB CTE replaying [[dsirKeyed]]: defines
    * `keyed(doc_id, n_grams, logw, gkey)`. Prepend as `WITH $..., ...`.
    */
  private[graft] def dsirKeyedSql(targetSource: String): String =
    s"""dtok AS (SELECT doc_id, source,
              string_split_regex(trim(text), '\\s+') AS t
            FROM documents WHERE length(trim(text)) > 0),
      dgrams AS (
        SELECT doc_id, source, unnest(t) AS g FROM dtok
        UNION ALL
        SELECT doc_id, source,
               t[CAST(i AS INT) + 1] || ' ' || t[CAST(i AS INT) + 2] AS g
        FROM (SELECT doc_id, source, t, unnest(range(len(t) - 1)) AS i
              FROM dtok WHERE len(t) >= 2) x),
      gbk AS (SELECT doc_id, source, ${md5HexIntSql("g", 2)} AS b,
                COUNT(*) AS c
              FROM dgrams GROUP BY 1, 2, 3),
      pool AS (SELECT b, SUM(c) AS np FROM gbk GROUP BY 1),
      tgt AS (SELECT b, SUM(c) AS nt FROM gbk
              WHERE source = '$targetSource' GROUP BY 1),
      tot AS (SELECT (SELECT SUM(np) FROM pool) AS tp,
                     (SELECT COALESCE(SUM(nt), 0) FROM tgt) AS tt),
      wts AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
               ROUND(SUM(CAST(c AS DOUBLE) *
                 (ln((COALESCE(nt, 0) + 1.0) / (tt + 256))
                  - ln((np + 1.0) / (tp + 256)))), 6) AS logw
             FROM gbk JOIN pool USING (b) LEFT JOIN tgt USING (b)
                  CROSS JOIN tot
             GROUP BY doc_id),
      keyed AS (SELECT doc_id, n_grams, logw,
               ROUND(logw - ln(-ln(
                 (${md5HexIntSql("CAST(doc_id AS VARCHAR) || ':dsir42'", 6)}
                  + 0.5) / 16777216.0)), 6) AS gkey
             FROM wts)"""

  /** DSIR at 100 TB: same weights, selection by a cutoff VALUE from
    * `approx_percentile` over the Gumbel key (the t21/t23-twin
    * convention) instead of the gate's corpus-global rank window —
    * filter is a narrow map, no window anywhere. The gate keeps the top
    * K = ceil(frac·N) docs, so the cutoff must be the element at
    * ascending rank N−K — NOT `approx_percentile(gkey, 1−frac)`, whose
    * resolved rank is ceil((1−frac)·N) and overshoots by one whenever
    * frac·N is non-integral (e.g. N=6: rank 5 keeps 1 doc, the gate
    * keeps 2). N is counted first (one scan of the already-checkpointed
    * weights) and the percentile targeted at (N−K−0.5)/N, whose
    * ceil(p·N) = N−K robustly against float rounding; `>` then keeps
    * exactly the top K whenever the sketch resolves the boundary element
    * (TrainPrepOpsSpec pins set parity at gate scale for both N % 5 == 0
    * and N % 5 != 0).
    */
  def dsirResampleScalable(docsDf: DataFrame, targetSource: String,
      frac: Double = 0.2, accuracy: Int = 10000): DataFrame = {
    val keyed = dsirKeyed(docsDf, targetSource)
    val n = keyed.count()
    val k = math.ceil(frac * n).toLong
    if (n == 0L || k >= n) keyed.orderBy(col("doc_id")) // keep everything
    else {
      val p = (n - k - 0.5) / n
      val cut = keyed
        .agg(expr(s"approx_percentile(gkey, $p, $accuracy)"))
        .head.getDouble(0)
      keyed.filter(col("gkey") > cut).orderBy(col("doc_id"))
    }
  }

  /** DSIR importance resampling — the published data-selection recipe a
    * training-data pipeline runs to tilt a raw crawl toward a curated
    * target corpus: hashed-n-gram bag models for target and pool, per-doc
    * log likelihood ratio, Gumbel-top-k sample of the top 20%. The
    * selection rank window is corpus-global by definition — at 100 TB
    * [[dsirResampleScalable]] is the implemented twin (percentile cutoff
    * value, no window).
    */
  val t27 = QueryDef(
    "t27_dsir_sample",
    "DSIR: hashed-ngram importance weights + Gumbel top-20% resample",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("gkey").desc, col("doc_id"))
      dsirKeyed(docs(s, dir), "src0")
        .withColumn("rk", row_number().over(w))
        .withColumn("nn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
        .select(col("doc_id"), col("n_grams"), col("logw"), col("gkey"),
          (col("rk") <= expr("(nn + 4) DIV 5")).as("sampled"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH ${dsirKeyedSql("src0")},
      ranked AS (SELECT doc_id, n_grams, logw, gkey,
               row_number() OVER (ORDER BY gkey DESC, doc_id) AS rk,
               COUNT(*) OVER () AS nn
             FROM keyed)
      SELECT doc_id, n_grams, logw, gkey, rk <= (nn + 4) // 5 AS sampled
      FROM ranked ORDER BY doc_id"""))

  // ---------------------------------------------------------------- t28
  /** t28 core, factored for the spec's hand fixture: per doc, the token
    * and character mass covered by SOME duplicated `n`-gram — the last
    * Gopher/MassiveText repetition filter the suite lacked (t09 has the
    * top-n-gram fractions, t26 the duplicate-line fractions; this is the
    * "fraction of characters in duplicate n-grams" family, which needs
    * position COVERAGE, not counts: overlapping occurrences must not
    * double-count a token).
    *
    * Coverage without interval folds: every start of a duplicated n-gram
    * explodes into its n covered token positions and a per-doc DISTINCT
    * collapses the overlaps — keyed shuffles only (per-(doc,gram) counts,
    * per-(doc,pos) distinct), no windows, per-doc state never exceeds the
    * doc's own token count. Linear at 100 TB.
    */
  private[graft] def dupNgramCoverage(d: DataFrame, n: Int = 5): DataFrame = {
    val toks = d.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(trim(col("text")), graft.Tok.Ws).as("arr"))
    val tl = toks.select(col("doc_id"),
      posexplode(col("arr")).as(Seq("p", "w")))
      .select(col("doc_id"), col("p"), length(col("w")).as("len"))
    val ng = toks.filter(size(col("arr")) >= n)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(arr) - $n), i -> array_join(slice(arr, i + 1, $n), ' '))"))
        .as(Seq("s", "g")))
    val dupStarts = ng.join(
      ng.groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2).select(col("doc_id"), col("g")),
      Seq("doc_id", "g"), "left_semi")
    val covered = dupStarts
      .select(col("doc_id"), explode(expr(s"sequence(s, s + ${n - 1})")).as("p"))
      .distinct()
      .join(tl, Seq("doc_id", "p"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("bigint").as("cov_tokens"),
        sum(col("len")).cast("bigint").as("cov_chars"))
    tl.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("bigint").as("n_tokens"),
        sum(col("len")).cast("bigint").as("tok_chars"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("cov_tokens"), lit(0L)).as("cov_tokens"),
        (coalesce(col("cov_tokens"), lit(0L)).cast("double")
          / col("n_tokens").cast("double")).as("dup_tok_frac"),
        (coalesce(col("cov_chars"), lit(0L)).cast("double")
          / col("tok_chars").cast("double")).as("dup_char_frac"))
      .orderBy(col("doc_id"))
  }

  /** Duplicate-n-gram COVERAGE fractions (Gopher "fraction of characters
    * in duplicate 5-grams"): tokens/chars lying inside at least one
    * 5-gram that occurs ≥2× in the document.
    */
  val t28 = QueryDef(
    "t28_dup_ngram_cover",
    "Gopher dup-5-gram coverage: token + char mass inside repeated 5-grams",
    (s, dir) => dupNgramCoverage(docs(s, dir)),
    Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS arr
              FROM documents WHERE length(trim(text)) > 0),
      tl AS (SELECT doc_id, i AS p, length(arr[CAST(i AS INT) + 1]) AS len
             FROM (SELECT doc_id, arr, unnest(range(len(arr))) AS i FROM toks) x),
      ng AS (SELECT doc_id, i AS st,
               array_to_string(arr[CAST(i AS INT) + 1 : CAST(i AS INT) + 5], ' ') AS g
             FROM (SELECT doc_id, arr, unnest(range(len(arr) - 4)) AS i
                   FROM toks WHERE len(arr) >= 5) x),
      dg AS (SELECT doc_id, g FROM ng GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      cov AS (SELECT DISTINCT doc_id, st + j AS p
              FROM (SELECT n.doc_id, n.st, unnest(range(5)) AS j
                    FROM ng n JOIN dg USING (doc_id, g)) y),
      cv AS (SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS cov_tokens,
               CAST(SUM(len) AS BIGINT) AS cov_chars
             FROM cov c JOIN tl USING (doc_id, p) GROUP BY 1),
      tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(len) AS BIGINT) AS tok_chars
              FROM tl GROUP BY 1)
      SELECT t.doc_id, t.n_tokens,
        COALESCE(cv.cov_tokens, 0) AS cov_tokens,
        CAST(COALESCE(cv.cov_tokens, 0) AS DOUBLE) / t.n_tokens AS dup_tok_frac,
        CAST(COALESCE(cv.cov_chars, 0) AS DOUBLE) / t.tok_chars AS dup_char_frac
      FROM tot t LEFT JOIN cv ON t.doc_id = cv.doc_id
      ORDER BY t.doc_id"""))

  val all: Seq[QueryDef] =
    Seq(t01, t02, t03, t04, t05, t06, t07, t08, t09, t10, t11, t13, t14, t15,
      t17, t18, t19, t20, t21, t22, t23, t24, t25, t26, t27, t28)
}
