package graft.text

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based document quality filtering — the classifier stage of a
  * large-scale training-data pipeline (the published recipe: a linear
  * model over cheap surface features, trained on a small labeled or
  * distantly-labeled set, scoring the full corpus). Complements the
  * heuristic gates (t04 ratios, t18 entropy, t09 repetition) with the
  * learnable combination of the same signals, exactly as the ER join
  * gained its spark.ml scorer beside the deterministic threshold path
  * (reference `data_integration.ipynb` c41 analog).
  *
  * Scale shape: training runs on the LABELED set (small by construction —
  * human or distant labels, never the corpus); scoring is a pure
  * projection (the feature columns are one narrow regexp/length pass, the
  * model coefficients ride along as literals in the transform), so the
  * corpus-side cost is scan speed with zero shuffles — `.filter` on the
  * returned probability pushes straight down onto the scan.
  */
object QualityModel {

  /** Feature column names, in assembler order. */
  val featureCols: Seq[String] = Seq(
    "f_log_chars", "f_log_words", "f_mean_word_len", "f_stop_ratio",
    "f_punct_ratio", "f_digit_ratio", "f_upper_ratio")

  /** Cheap surface features per document — one narrow column pass, no
    * shuffle (asserted by QualityModelSpec). Log-scaled sizes; ratios are
    * length-normalized so the model sees scale-free signals.
    */
  def features(docs: DataFrame): DataFrame = {
    val text = col("text")
    val nChars = length(text).cast("double")
    val words = size(split(trim(text), graft.Tok.Ws)).cast("double")
    def charRatio(pattern: String) =
      regexp_count(text, lit(pattern)).cast("double") / nChars
    docs.filter(length(trim(text)) > 0)
      .withColumn("f_log_chars", log(nChars + 1))
      .withColumn("f_log_words", log(words + 1))
      .withColumn("f_mean_word_len", nChars / words)
      .withColumn("f_stop_ratio",
        regexp_count(text, lit("\\b(the|a|of|and|to|in|is)\\b"))
          .cast("double") / words)
      .withColumn("f_punct_ratio", charRatio("\\p{Punct}"))
      .withColumn("f_digit_ratio", charRatio("[0-9]"))
      .withColumn("f_upper_ratio", charRatio("[A-Z]"))
  }

  private def assemble(df: DataFrame): DataFrame =
    new VectorAssembler().setInputCols(featureCols.toArray)
      .setOutputCol("fv").transform(df)

  /** Train the quality scorer on labeled `(text, <labelCol> in {0,1})`
    * rows. Standardized L2 logistic regression — convex, so the fit is
    * insensitive to partition-order gradient summation beyond float noise.
    */
  def train(labeled: DataFrame,
            labelCol: String = "is_quality"): LogisticRegressionModel =
    new LogisticRegression()
      .setFeaturesCol("fv").setLabelCol(labelCol)
      .setMaxIter(100).setRegParam(1e-3).setStandardization(true)
      .fit(assemble(features(labeled)))

  /** Score every document: `(doc_id, quality_prob)`; a narrow map over
    * the corpus (coefficients broadcast inside the transform).
    */
  def score(docs: DataFrame, model: LogisticRegressionModel): DataFrame =
    model.transform(assemble(features(docs)))
      .select(col("doc_id"),
        vector_to_array(col("probability"))(1).as("quality_prob"))

  /** The filter form: keep documents scoring at or above `minProb`.
    *
    * Blank/whitespace-only documents are UNSCOREABLE — [[features]] cannot
    * form ratios over zero characters, so they get no `quality_prob` row.
    * By default (`keepUnscoreable = false`) they are dropped, the right
    * call for a quality gate: an empty document is never training-worthy.
    * Pass `keepUnscoreable = true` to let them through unscored instead
    * (the choice the caller owns when the filter feeds an audit rather
    * than a corpus).
    */
  def keep(docs: DataFrame, model: LogisticRegressionModel,
           minProb: Double, keepUnscoreable: Boolean = false): DataFrame = {
    val kept = docs.join(
      score(docs, model).filter(col("quality_prob") >= minProb)
        .select("doc_id"), Seq("doc_id"), "left_semi")
    if (keepUnscoreable)
      kept.unionByName(docs.filter(
        col("text").isNull || length(trim(col("text"))) === 0))
    else kept
  }
}
