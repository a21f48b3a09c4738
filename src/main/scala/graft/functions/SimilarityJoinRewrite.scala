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
  *     Join(Generate(explode(emit(a)) AS __sim_tok_l, L),
  *          Generate(explode(emit(b)) AS __sim_tok_r, R),
  *          Inner,
  *          __sim_tok_l <=> __sim_tok_r
  *            && size prune: t·|toks(a)| <= |toks(b)| && t·|toks(b)| <= |toks(a)|
  *            && (__sim_tok_l IS NULL ||
  *                __sim_tok_l = array_min(array_intersect(toks(a), toks(b))))
  *            && <original condition>))
  *
  * with toks(x) = array_except(x, [null]) (distinct, null-elements
  * dropped — exactly the token universe jaccard_sim counts) and
  * emit(x) = CASE WHEN size(toks(x)) = 0 THEN [null] ELSE toks(x) END.
  *
  * Soundness, case by case against jaccard_sim's semantics
  * (ExpressionHelpers.jaccard):
  *   - shared-token pairs: every candidate appears once per shared token;
  *     the `tok = array_min(array_intersect(..))` conjunct keeps exactly
  *     one alignment, and the ORIGINAL predicate is kept verbatim as the
  *     residual, so the rewrite can never widen the result.
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

  /** jaccard_sim(a, b) >= t in either comparison orientation; returns
    * (a, b, t) when the threshold makes the rewrite sound.
    */
  private def simOf(p: Expression): Option[(Expression, Expression, Double)] = {
    def thresh(e: Expression): Option[Double] = e match {
      case Literal(v: Double, DoubleType) => Some(v)
      case _                              => None
    }
    p match {
      case GreaterThanOrEqual(JaccardSim(a, b), t) =>
        thresh(t).filter(_ > 0d).map((a, b, _))
      case GreaterThan(JaccardSim(a, b), t) =>
        thresh(t).filter(_ >= 0d).map((a, b, _))
      case LessThanOrEqual(t, JaccardSim(a, b)) =>
        thresh(t).filter(_ > 0d).map((a, b, _))
      case LessThan(t, JaccardSim(a, b)) =>
        thresh(t).filter(_ >= 0d).map((a, b, _))
      case _ => None
    }
  }

  private def hasEquiKey(preds: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean = preds.exists {
    case EqualTo(a, b) =>
      (canEvaluate(a, left) && canEvaluate(b, right)) ||
        (canEvaluate(b, left) && canEvaluate(a, right))
    case EqualNullSafe(a, b) =>
      (canEvaluate(a, left) && canEvaluate(b, right)) ||
        (canEvaluate(b, left) && canEvaluate(a, right))
    case _ => false
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
          !hasEquiKey(splitConjunctivePredicates(cond), left, right) =>
      val sim = splitConjunctivePredicates(cond).iterator.flatMap { p =>
        simOf(p).flatMap { case (x, y, t) =>
          // orientation only affects which side explodes first; jaccard
          // itself is symmetric
          if (canEvaluate(x, left) && canEvaluate(y, right)) Some((x, y, t))
          else if (canEvaluate(y, left) && canEvaluate(x, right)) Some((y, x, t))
          else None
        }.filter { case (a, b, _) => a.deterministic && b.deterministic }
      }.take(1).toSeq.headOption

      sim match {
        case None => j
        case Some((la, rb, tLit)) =>
          val (lt, rt) = (toks(la), toks(rb))
          val lAttr = AttributeReference("__sim_tok_l", StringType)()
          val rAttr = AttributeReference("__sim_tok_r", StringType)()
          val genL = Generate(Explode(emit(lt)), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(lAttr),
            child = left)
          val genR = Generate(Explode(emit(rt)), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(rAttr),
            child = right)
          // J >= t implies t·|A| <= |B| and t·|B| <= |A| (|·| = distinct
          // non-null sizes): prunes size-mismatched candidates before the
          // per-pair intersect. Vacuous (0 <= 0) for the sentinel pairs.
          def dbl(e: Expression) = Cast(Size(e), DoubleType)
          val prune = And(
            GreaterThanOrEqual(dbl(rt), Multiply(dbl(lt), Literal(tLit))),
            GreaterThanOrEqual(dbl(lt), Multiply(dbl(rt), Literal(tLit))))
          val dedup = Or(IsNull(lAttr),
            EqualTo(lAttr, ArrayMin(ArrayIntersect(lt, rt))))
          val newCond = And(EqualNullSafe(lAttr, rAttr),
            And(prune, And(dedup, cond)))
          Project(j.output, Join(genL, genR, Inner, Some(newCond), hint))
      }
  }
}
