package graft.er

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.graph.GraphAlgs
import graft.sim.SimilarityJoin

/** Entity resolution (SURVEY §2.4 J7 — the reference's `dedupe`-library
  * pipeline, data_integration.ipynb c37-c49), decomposed into a
  * deterministic distributed pipeline:
  *
  *   token blocking → pairwise similarity scoring → threshold →
  *   GraphX connected components → cluster ids → best-label election →
  *   edge weights
  *
  * The reference's learned blocking + logistic scoring is stochastic;
  * per SURVEY §7.4 risk 1 we replace it with explicit features
  * (token Jaccard + normalized Levenshtein) and per-type thresholds
  * (reference range 0.55-0.79, c44), and evaluate against labeled
  * match/distinct pairs rather than cloning cluster ids.
  *
  * Scale: blocking is an inverted-index self-join (no cross join);
  * scoring runs only on blocked candidates; the transitive closure is
  * GraphX CC (O(E) per iteration, log-ish rounds) — each stage is a
  * bounded shuffle.
  */
object EntityResolution {

  /** Types that additionally get the character-qgram feature/blocking
    * channel: org/product/person names vary by concatenation glitches and
    * possessives ("ncscuk", "kimsukys") that word tokens can't see. GPE
    * stays word-only — country names are char-wise near ("iran"/"iraq")
    * while semantically distinct, and the labeled ground truth punishes
    * char merging there (measured on ner_training_GPE.json).
    */
  val charTypes: Set[String] = Set("ORG", "PRODUCT", "PERSON")

  /** Plural/possessive fold: strip one trailing 's' from each token >2
    * chars ("dprks" -> "dprk", "centres" -> "centre").
    */
  private def stripS(c: Column): Column =
    concat_ws(" ", transform(split(c, " "),
      t => when(t.like("%s") && length(t) > 2, t.substr(lit(1), length(t) - 1))
        .otherwise(t)))

  /** Candidate pairs within a type: (a) shared plural-folded word token —
    * a strict superset of raw shared-token blocking; (b) for
    * [[charTypes]], shared character 3-gram with a document-frequency cap
    * on hot grams (same skew guard as the dedup joins — a gram occurring
    * in more than `gramDfCap` labels is dropped from blocking, not from
    * scoring). Input: (id: Long, label: String, type: String).
    */
  def blockPairs(labels: DataFrame, gramDfCap: Int = 1000): DataFrame = {
    def selfJoin(keys: DataFrame): DataFrame =
      keys.as("a").join(keys.as("b"),
          col("a.type") === col("b.type") && col("a.tok") === col("b.tok") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.type").as("type"))
    val toks = labels.select(col("id"), col("type"),
      explode(array_distinct(SimilarityJoin.whitespaceTokens(stripS(lower(col("label")))))).as("tok"))
    val grams = labels.filter(col("type").isin(charTypes.toSeq: _*))
      .select(col("id"), col("type"),
        explode(array_distinct(SimilarityJoin.qgrams(lower(col("label"))))).as("tok"))
    val hot = grams.groupBy(col("type"), col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") > gramDfCap).select(col("type"), col("tok"))
    val gramsCapped = grams.join(hot, Seq("type", "tok"), "left_anti")
    selfJoin(toks).union(selfJoin(gramsCapped)).distinct()
  }

  /** Similarity features + combined score for candidate pairs, all on
    * lowercase:
    *  - word score: 0.5·token-Jaccard + 0.5·(1 − levenshtein/maxlen);
    *  - plural fold: score 1.0 when the stripS-folded labels are equal;
    *  - char score ([[charTypes]] only): 0.5·3-gram-Jaccard + 0.5·lev.
    * Final score = greatest of the applicable features.
    */
  def scorePairs(pairs: DataFrame, labels: DataFrame): DataFrame = {
    val l = labels.select(col("id"), lower(col("label")).as("label"))
    val withLabels = pairs
      .join(l.withColumnRenamed("id", "id_a").withColumnRenamed("label", "label_a"), Seq("id_a"))
      .join(l.withColumnRenamed("id", "id_b").withColumnRenamed("label", "label_b"), Seq("id_b"))
    val jac = SimilarityJoin.jaccard(
      array_distinct(SimilarityJoin.whitespaceTokens(col("label_a"))),
      array_distinct(SimilarityJoin.whitespaceTokens(col("label_b"))))
    val lev = lit(1.0) - levenshtein(col("label_a"), col("label_b")).cast("double") /
      greatest(length(col("label_a")), length(col("label_b"))).cast("double")
    val wordScore = jac * 0.5 + lev * 0.5
    val pluralFold = when(stripS(col("label_a")) === stripS(col("label_b")), 1.0)
      .otherwise(0.0)
    val gramJac = SimilarityJoin.jaccard(
      array_distinct(SimilarityJoin.qgrams(col("label_a"))),
      array_distinct(SimilarityJoin.qgrams(col("label_b"))))
    val charScore = when(col("type").isin(charTypes.toSeq: _*),
      gramJac * 0.5 + lev * 0.5).otherwise(0.0)
    withLabels.withColumn("score", greatest(wordScore, pluralFold, charScore))
  }

  /** Cluster ids from thresholded pair edges via connected components;
    * singletons keep their own id as cluster. Per-type thresholds like the
    * reference's c44 map.
    */
  def cluster(labels: DataFrame, thresholds: Map[String, Double],
              defaultThreshold: Double = 0.6): DataFrame = {
    val pairs = scorePairs(blockPairs(labels), labels)
    val thr = thresholds.foldLeft(lit(defaultThreshold)) {
      case (acc, (t, v)) => when(col("type") === t, v).otherwise(acc)
    }
    val edges = pairs.filter(col("score") >= thr)
      .select(col("id_a"), col("id_b"))
    val comp =
      if (edges.isEmpty) labels.select(col("id").as("node_id"), col("id").as("component"))
      else GraphAlgs.connectedComponents(
        GraphAlgs.buildGraph(edges, "id_a", "id_b"))
    labels.join(comp, labels("id") === comp("node_id"), "left")
      .select(col("id"), col("label"), col("type"),
        coalesce(col("component"), col("id")).as("cluster_id"))
  }

  /** A2+A3: per-cluster best label = most frequent, ties to the
    * lexicographically smallest (pins pandas idxmax's first-occurrence
    * nondeterminism, SURVEY §2.5 A3).
    */
  def bestLabels(clustered: DataFrame): DataFrame = {
    val freq = clustered.groupBy(col("cluster_id"), col("label"))
      .agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("freq").desc, col("label").asc)
    freq.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("label").as("best_label"), col("freq"))
  }

  /** A1: alert–entity edge weights — the reference's
    * groupby(alert_id, best_label, type).size().rename("weight") (c49).
    * Input ner: (alert_id, id) links raw NER rows to alerts.
    */
  def labelWeights(ner: DataFrame, clustered: DataFrame,
                   best: DataFrame): DataFrame =
    ner.join(clustered, Seq("id"))
      .join(best.select(col("cluster_id"), col("best_label")), Seq("cluster_id"))
      .groupBy(col("alert_id"), col("best_label"), col("type"))
      .agg(count(lit(1)).as("weight"))

  /** A9 (data_integration.ipynb c42:9-13): the reference's elbow/threshold
    * profiling loop — cluster counts per (threshold, type), used to pick
    * the per-type thresholds (c44 range 0.55–0.79). Blocking + scoring run
    * ONCE (cached); each threshold then costs one connected-components
    * pass over the (shrinking) thresholded edge set. Cluster count per
    * type = components among edge-connected labels + untouched singletons;
    * types never cross-block (blockPairs keys on type), so components are
    * type-pure by construction.
    *
    * A profiling helper, not a hot-path operator: the per-threshold CC
    * runs are sequential driver-submitted jobs, each a bounded shuffle.
    */
  def elbowSweep(labels: DataFrame,
                 thresholds: Seq[Double] = (6 to 17).map(_ * 0.05)): DataFrame = {
    val spark = labels.sparkSession
    import spark.implicits._
    val scored = scorePairs(blockPairs(labels), labels)
      .select(col("id_a"), col("id_b"), col("type"), col("score")).cache()
    val perType = labels.groupBy(col("type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = thresholds.sorted.flatMap { t =>
      val edges = scored.filter(col("score") >= t)
      val stats =
        if (edges.isEmpty) Map.empty[String, (Long, Long)]
        else {
          val comp = GraphAlgs.connectedComponents(
            GraphAlgs.buildGraph(edges.select(col("id_a"), col("id_b")), "id_a", "id_b"))
          // re-attach type: ids are global, each appears under one type
          comp.join(labels.select(col("id").as("node_id"), col("type")), Seq("node_id"))
            .groupBy(col("type"))
            .agg(count(lit(1)).as("v"), countDistinct(col("component")).as("c"))
            .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
        }
      perType.toSeq.map { case (tp, n) =>
        val (v, c) = stats.getOrElse(tp, (0L, 0L))
        (t, tp, c + (n - v))
      }
    }
    rows.toDF("threshold", "type", "n_clusters")
      .orderBy(col("type"), col("threshold"))
  }

  /** Full pipeline: labels + alert links -> (clusters, best, weights). */
  def resolve(ner: DataFrame, thresholds: Map[String, Double] = Map(),
              defaultThreshold: Double = 0.6): (DataFrame, DataFrame, DataFrame) = {
    val labels = ner.select(col("id"), col("label"), col("type")).distinct()
    val clustered = cluster(labels, thresholds, defaultThreshold).cache()
    val best = bestLabels(clustered)
    val weights = labelWeights(ner.select(col("alert_id"), col("id")), clustered, best)
    (clustered, best, weights)
  }
}
