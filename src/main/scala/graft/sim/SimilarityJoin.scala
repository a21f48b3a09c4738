package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set-similarity join (SURVEY §2.4 J6 — alerts/cpe_product.ipynb c10-c13):
  * CPE strings vs NER PRODUCT labels, whitespace tokens, Jaccard ≥ t with
  * token-count-ratio pruning.
  *
  * The reference is a nested Python loop over all pairs with a length
  * filter. Here it's the inverted-index (prefix-filter family) plan:
  *
  *   tokenize → explode → equi-join on token → group to candidate pairs
  *   with overlap count → size-ratio prune → Jaccard verify
  *
  * No cross join anywhere: the candidate space is bounded by shared
  * tokens, the overlap count falls out of the group-by (no second pass
  * over token sets), and the whole thing is 2 shuffles — the shape that
  * survives 100 TB. Skewy ultra-common tokens can be capped upstream by
  * document-frequency filtering (see DedupOps note).
  */
object SimilarityJoin {

  /** F15 tokenizers. Blank/whitespace-only input yields an EMPTY array:
    * Java split semantics would return `[""]` there, making every blank
    * text share the "" token and Jaccard-match other blanks at 1.0 —
    * the reference's Python `"".split()` returns `[]` (r10 review
    * finding), so the empty token is filtered like [[alphaTokens]] does.
    */
  def whitespaceTokens(c: Column): Column =
    filter(split(trim(c), graft.Tok.Ws), x => x =!= "")
  def alphaTokens(c: Column): Column =
    filter(split(c, "[^a-zA-Z]+"), x => x =!= "")

  /** Character q-grams (default q=3) via substring transform. */
  def qgrams(c: Column, q: Int = 3): Column =
    when(length(c) < q, array(c)).otherwise(
      transform(sequence(lit(1), length(c) - lit(q - 1)),
        i => c.substr(i, lit(q))))

  /** F16: Jaccard similarity of two token arrays (composition of
    * codegen'd built-ins; custom Expression only if bench-forced,
    * SURVEY §4.3).
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** The J6 join. Inputs are (id, text) tables; output
    * (left_id, right_id, jaccard) with jaccard >= threshold.
    *
    * Size-ratio pruning (cpe_product c13:8-13) uses the RAW (pre-dedup)
    * token counts — that is the reference's semantics and it is
    * result-affecting: `bloodhound project bloodhound` has raw length 3,
    * so a 1-token product fails |B| ≥ t·|A| and is dropped even though
    * the SET Jaccard (1/2) clears the threshold. Golden parity
    * (cpe_product_edge) pins this. The overlap lower bound
    * o ≥ t/(1+t)·(k1+k2) is applied on the DISTINCT set sizes, relaxed by
    * an epsilon for thresholds inexact in binary (see the filter note).
    */
  def join(left: DataFrame, leftId: String, leftText: Column,
           right: DataFrame, rightId: String, rightText: Column,
           threshold: Double): DataFrame = {
    val l = left.select(col(leftId).as("l_id"), whitespaceTokens(leftText).as("l_raw"))
      .withColumn("l_n", size(col("l_raw")))
      .withColumn("l_toks", array_distinct(col("l_raw")))
      .withColumn("l_k", size(col("l_toks")))
    val r = right.select(col(rightId).as("r_id"), whitespaceTokens(rightText).as("r_raw"))
      .withColumn("r_n", size(col("r_raw")))
      .withColumn("r_toks", array_distinct(col("r_raw")))
      .withColumn("r_k", size(col("r_toks")))

    val lTok = l.select(col("l_id"), col("l_n"), col("l_k"), explode(col("l_toks")).as("tok"))
    val rTok = r.select(col("r_id"), col("r_n"), col("r_k"), explode(col("r_toks")).as("tok"))

    val overlap = lTok.join(rTok, Seq("tok"))
      // reference's size-ratio prune on RAW lengths, before the shuffle
      .filter(col("r_n") >= col("l_n") * threshold &&
              col("r_n") <= col("l_n") / threshold)
      .groupBy(col("l_id"), col("r_id"), col("l_k"), col("r_k"))
      .agg(count(lit(1)).as("overlap"))
      // J = o/(k1+k2-o) >= t  <=>  o >= t*(k1+k2)/(1+t). This is a PRUNE,
      // not the decider (the exact jaccard filter below is) — relax it by
      // an epsilon because double rounding can push the computed bound
      // above the exact rational and silently drop a boundary pair: at
      // t=0.2, k1+k2=6 the exact bound is 1.0 but 6*0.2/1.2 rounds to
      // 1.0000000000000002, excluding a pair with jaccard exactly 0.2
      .filter(col("overlap") >=
        (col("l_k") + col("r_k")) * threshold / (1 + threshold) - 1e-9)

    overlap.select(col("l_id"), col("r_id"),
      (col("overlap").cast("double") /
        (col("l_k") + col("r_k") - col("overlap"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** [[join]] with the hot-token guard the family's other inverted
    * indexes carry (DedupOps.shingleDfCap, EntityResolution.gramDfCap):
    * tokens whose document frequency exceeds `dfCap` on EITHER side are
    * dropped from CANDIDATE GENERATION only. [[join]] counts overlap in
    * the token equi-join itself, so it cannot simply skip hot tokens —
    * the count would be wrong for every surviving pair; here candidates
    * are (l_id, r_id) keys only, and the verify stage recomputes the
    * EXACT Jaccard from the full token arrays (hot tokens included), so
    * every emitted pair scores identically to [[join]].
    *
    * Semantics past the cap (the ER convention — hot keys leave
    * blocking, never scoring): a pair whose ONLY shared tokens are
    * ultra-common is not discoverable. On a Zipf corpus that pair is
    * boilerplate noise; on the committed corpora no token crosses the
    * default cap, so joinGuarded ≡ join there (spec-pinned). The scale
    * story: one hot token shared by f·N docs a side makes [[join]]'s
    * equi-join emit (f·N)² rows through THAT key — the single skewed
    * task that stalls a 100 TB run; the guard bounds every token's
    * contribution at dfCap² while the verify join stays
    * candidate-bounded.
    *
    * [[join]]'s overlap lower bound o ≥ t·(k1+k2)/(1+t) is carried too,
    * made CONSERVATIVE under hot-token removal: the candidate stage
    * only counts non-hot overlaps, but the true overlap can exceed that
    * by at most min(h_l, h_r) (each side's own hot-token count), so a
    * pair is pruned only when o_nonhot + min(h_l, h_r) misses the bound
    * — no pair [[join]] would emit is ever dropped by the prune (the
    * dfCap candidate semantics above remain the only divergence).
    */
  def joinGuarded(left: DataFrame, leftId: String, leftText: Column,
           right: DataFrame, rightId: String, rightText: Column,
           threshold: Double, dfCap: Int = 1000): DataFrame = {
    val l = left.select(col(leftId).as("l_id"), whitespaceTokens(leftText).as("l_raw"))
      .withColumn("l_n", size(col("l_raw")))
      .withColumn("l_toks", array_distinct(col("l_raw")))
      .withColumn("l_k", size(col("l_toks")))
    val r = right.select(col(rightId).as("r_id"), whitespaceTokens(rightText).as("r_raw"))
      .withColumn("r_n", size(col("r_raw")))
      .withColumn("r_toks", array_distinct(col("r_raw")))
      .withColumn("r_k", size(col("r_toks")))
    val lTok = l.select(col("l_id"), col("l_n"), explode(col("l_toks")).as("tok"))
    val rTok = r.select(col("r_id"), col("r_n"), explode(col("r_toks")).as("tok"))
    // hot = df > cap on either side; tiny by construction (≤ vocab/cap
    // keys can exceed the cap), so it broadcasts
    val hot = lTok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .unionByName(rTok.groupBy(col("tok")).agg(count(lit(1)).as("df")))
      .groupBy(col("tok")).agg(max(col("df")).as("df"))
      .filter(col("df") > dfCap).select(col("tok"))
    // one-row array of the hot vocabulary (bounded by vocab/dfCap keys):
    // broadcast-nested-loop onto each side so per-doc hot counts (h) and
    // the non-hot token list fall out of plain array ops, no extra shuffle
    val hotArr = hot.agg(coalesce(collect_list(col("tok")),
      array().cast("array<string>")).as("hot_toks"))
    val lg = l.crossJoin(broadcast(hotArr))
      .withColumn("l_nh", array_except(col("l_toks"), col("hot_toks")))
      .withColumn("l_h", col("l_k") - size(col("l_nh")))
    val rg = r.crossJoin(broadcast(hotArr))
      .withColumn("r_nh", array_except(col("r_toks"), col("hot_toks")))
      .withColumn("r_h", col("r_k") - size(col("r_nh")))
    val lTokNh = lg.select(col("l_id"), col("l_n"), col("l_k"), col("l_h"),
      explode(col("l_nh")).as("tok"))
    val rTokNh = rg.select(col("r_id"), col("r_n"), col("r_k"), col("r_h"),
      explode(col("r_nh")).as("tok"))
    val cand = lTokNh.join(rTokNh, Seq("tok"))
      .filter(col("r_n") >= col("l_n") * threshold &&
              col("r_n") <= col("l_n") / threshold)
      .groupBy(col("l_id"), col("r_id"), col("l_k"), col("r_k"),
        col("l_h"), col("r_h"))
      .agg(count(lit(1)).as("overlap"))
      // conservative overlap bound: true overlap ≤ o_nonhot + min(h_l, h_r)
      // (same epsilon relaxation as join's — see its filter note)
      .filter(col("overlap") + least(col("l_h"), col("r_h")) >=
        (col("l_k") + col("r_k")) * threshold / (1 + threshold) - 1e-9)
      .select(col("l_id"), col("r_id"))
    // exact verify from the FULL token sets — hot tokens count here
    cand.join(l.select(col("l_id"), col("l_toks")), Seq("l_id"))
      .join(r.select(col("r_id"), col("r_toks")), Seq("r_id"))
      .select(col("l_id"), col("r_id"),
        jaccard(col("l_toks"), col("r_toks")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** cpe_product_edge reproduction (FIXTURES.md: cpe vs best_label,
    * jaccard ≥ 0.5, '_' → ' ' first per cpe_product c8).
    */
  def cpeProductEdges(cpes: DataFrame, products: DataFrame,
                      threshold: Double = 0.5): DataFrame = {
    val cpeTable = cpes.select(regexp_replace(col("cpe"), "_", " ").as("cpe_text"),
      col("cpe")).distinct()
    val prodTable = products.select(col("best_label")).distinct()
    join(
      cpeTable, "cpe", col("cpe_text"),
      prodTable, "best_label", col("best_label"),
      threshold)
      .select(col("l_id").as("cpe"), col("r_id").as("best_label"),
        col("jaccard"))
  }
}
