package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Optimizer rule: turn a naive set-similarity (Jaccard-threshold) join
  * into the inverted-index equi-join (SURVEY §4.3 item 4 — the
  * declarative twin of [[graft.sim.SimilarityJoin.join]], the way
  * [[BandJoinRewrite]] is the declarative twin of RangeJoin.banded).
  *
  * A user writing the natural form of `cpe_product.ipynb c13:8-13`
  *
  *   left.crossJoin(right).filter(jaccard_sim(lToks, rToks) >= t)
  *
  * gets a CartesianProduct from Spark — O(|L|·|R|) full-array comparisons,
  * the canonical 100-TB scale-killer. The scalable shape is the
  * prefix-filter family's inverted index: explode each side's distinct
  * tokens and hash-join on the token, so the candidate space is bounded by
  * shared-token document-frequency products instead of |L|·|R|.
  *
  *   Join(L, R, Inner|Cross, jaccard_sim(a, b) >= t && rest)
  *     ==>
  *   Project(origOutput,
  *     Join(Generate(explode(emit(lt)) AS __sim_tok_l,
  *            Project(L.*, toks(a) AS __sim_toks_l, L)),
  *          Generate(explode(emit(rt)) AS __sim_tok_r,
  *            Project(R.*, toks(b) AS __sim_toks_r, R)),
  *          Inner,
  *          __sim_tok_l <=> __sim_tok_r
  *            && simjoin_keep(__sim_toks_l, __sim_toks_r, __sim_tok_l)
  *            && rest))
  *
  * with toks(x) = array_except(x, [null]) (distinct, null-elements
  * dropped — exactly the token universe jaccard_sim counts) and
  * emit(x) = CASE WHEN size(toks(x)) = 0 THEN [null] ELSE toks(x) END.
  *
  * [[SimJoinKeep]] (`simjoin_keep`, threshold + strictness baked in at
  * rewrite time) fuses into ONE hash pass over the pre-materialized
  * distinct sets what the first cut of this rule spelled as four separate
  * array ops per candidate row — size prune (t·|A| <= |B| && t·|B| <= |A|),
  * min-shared-token alignment dedup (`tok = array_min(array_intersect)`),
  * and the original jaccard_sim threshold itself — each of which
  * re-derived the distinct sets from the raw arrays. The join condition
  * runs once per CANDIDATE (shared-token pair), so at corpus scale the
  * fusion is the difference between ~6 array materializations per
  * candidate and zero (the sets are computed once per INPUT row, below
  * the explode, where the row count is |L|+|R|, not Σdf²).
  *
  * Soundness, case by case against jaccard_sim's semantics
  * (ExpressionHelpers.jaccard):
  *   - shared-token pairs: every candidate appears once per shared token;
  *     simjoin_keep's min-shared-token tie-break keeps exactly one
  *     alignment, its threshold comparison is bit-identical to
  *     jaccard_sim's (same distinct sets, same `inter/(|A|+|B|-inter)`
  *     double division), and every OTHER original conjunct is kept
  *     verbatim as the residual — the rewrite can never widen the result.
  *   - disjoint non-empty pairs: J = 0 < t (the guard requires t > 0 for
  *     >=, t >= 0 for >), and they produce no matching token row — dropped
  *     on both sides of the rewrite.
  *   - effectively-empty pairs (no non-null elements on BOTH sides):
  *     jaccard_sim defines J(∅,∅) = 1 >= t, so these pairs are real
  *     output. emit() maps each to a single null sentinel token and the
  *     null-SAFE equality (still a hash-joinable equi key) matches them;
  *     the `IS NULL` branch of the dedup conjunct admits the one
  *     alignment. Empty-vs-non-empty never matches (null <=> tok is
  *     false), and J = 0 there — consistent.
  *   - null arrays: jaccard_sim is null-intolerant (row dropped by the
  *     original filter); emit(null) is null and explode(null) emits no
  *     row — dropped here too.
  *
  * Guards (fires only when it provably helps and stays exact):
  *   - inner/cross join, resolved, with NO existing equi-join key (same
  *     fixed-point safety as [[BandJoinRewrite]] — the rewritten join's
  *     token equality is an equi key, so the rule cannot re-fire);
  *   - the threshold is a positive double literal (>= 0 for strict >);
  *   - one token array evaluable on each side, both deterministic.
  */
object SimilarityJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** jaccard_sim(a, b) >= t (strict = false) or > t (strict = true) in
    * either comparison orientation; returns (a, b, t, strict) when the
    * threshold makes the rewrite sound.
    */
  private def simOf(p: Expression): Option[(Expression, Expression, Double, Boolean)] = {
    def thresh(e: Expression): Option[Double] = e match {
      case Literal(v: Double, DoubleType) => Some(v)
      case _                              => None
    }
    p match {
      case GreaterThanOrEqual(JaccardSim(a, b), t) =>
        thresh(t).filter(_ > 0d).map((a, b, _, false))
      case GreaterThan(JaccardSim(a, b), t) =>
        thresh(t).filter(_ >= 0d).map((a, b, _, true))
      case LessThanOrEqual(t, JaccardSim(a, b)) =>
        thresh(t).filter(_ > 0d).map((a, b, _, false))
      case LessThan(t, JaccardSim(a, b)) =>
        thresh(t).filter(_ >= 0d).map((a, b, _, true))
      case _ => None
    }
  }

  /** Distinct non-null token set — the universe jaccard_sim counts.
    * array_except both dedups and drops the null element.
    */
  private def toks(x: Expression): Expression =
    ArrayExcept(x, CreateArray(Seq(Literal(null, StringType))))

  /** The exploded token list: the null sentinel for effectively-empty
    * sets (so J(∅,∅)=1 pairs survive via the null-safe key), the token
    * set otherwise. Size(null array) is null under the modern conf, so a
    * null input falls through to the else branch and explodes to nothing.
    */
  private def emit(ts: Expression): Expression =
    If(EqualTo(Size(ts), Literal(0)),
      CreateArray(Seq(Literal(null, StringType))), ts)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, jt, Some(cond), hint)
        if (jt == Inner || jt == Cross) && j.resolved &&
          !JoinRewriteGuards.hasEquiKey(splitConjunctivePredicates(cond), left, right) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val sim = conjuncts.iterator.flatMap { p =>
        simOf(p).flatMap { case (x, y, t, strict) =>
          // orientation only affects which side explodes first; jaccard
          // itself is symmetric
          if (canEvaluate(x, left) && canEvaluate(y, right))
            Some((p, x, y, t, strict))
          else if (canEvaluate(y, left) && canEvaluate(x, right))
            Some((p, y, x, t, strict))
          else None
        }.filter { case (_, a, b, _, _) => a.deterministic && b.deterministic }
      }.take(1).toSeq.headOption

      sim match {
        case None => j
        case Some((simPred, la, rb, tLit, strict)) =>
          // Materialize each side's distinct non-null token set ONCE per
          // input row, below the explode — the join condition then reads
          // the arrays per candidate without re-deriving them.
          val lToks = Alias(toks(la), "__sim_toks_l")()
          val rToks = Alias(toks(rb), "__sim_toks_r")()
          val projL = Project(left.output :+ lToks, left)
          val projR = Project(right.output :+ rToks, right)
          val lAttr = AttributeReference("__sim_tok_l", StringType)()
          val rAttr = AttributeReference("__sim_tok_r", StringType)()
          val genL = Generate(Explode(emit(lToks.toAttribute)),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(lAttr), child = projL)
          val genR = Generate(Explode(emit(rToks.toAttribute)),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(rAttr), child = projR)
          // One fused pass per candidate: size prune, min-shared-token
          // alignment dedup, and the threshold itself (see SimJoinKeep).
          val keep = SimJoinKeep(lToks.toAttribute, rToks.toAttribute,
            lAttr, tLit, strict)
          val residual = conjuncts.filterNot(_ eq simPred)
          val newCond = (EqualNullSafe(lAttr, rAttr) +: keep +: residual)
            .reduceLeft(And)
          Project(j.output, Join(genL, genR, Inner, Some(newCond), hint))
      }
  }
}
