package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: turn a naive band (proximity) join into a bucketed
  * equi-join.
  *
  * A user writing the natural form
  *
  *   left.join(right, abs(l_ts - r_ts) <= tol)
  *
  * with no equi-join keys gets a BroadcastNestedLoopJoin / cartesian
  * product from Spark — O(|L|·|R|) comparisons, the canonical 100-TB
  * scale-killer. The scalable physical shape is the one
  * [[graft.operators.RangeJoin.banded]] builds by hand: quantize both
  * sides to floor(t / tol) buckets, fan the left side out to its bucket
  * ± 1, and hash-join on the bucket — every true pair lands in exactly
  * one of the three alignments, and the original band predicate stays as
  * the residual filter that trims bucket-edge false positives.
  *
  * This rule applies that rewrite automatically, the way a range-join
  * hint does in other engines, so the declarative form gets the scalable
  * plan without the caller knowing the trick:
  *
  *   Join(L, R, Inner, abs(lt - rt) <= tol && rest)
  *     ==>
  *   Project(origOutput,
  *     Join(Generate(explode([b(lt)-1, b(lt), b(lt)+1]) AS __band_bucket, L),
  *          Project(R.*, b(rt) AS __band_bucket_r, R),
  *          Inner, __band_bucket = __band_bucket_r && <original condition>))
  *
  * with b(t) = (t - pmod(t, tol)) DIV tol — exact integer FLOOR division
  * (Column `/` is DOUBLE division and loses bucket precision past 2^53;
  * DIV alone truncates toward zero and mis-buckets pre-epoch timestamps).
  *
  * Soundness: |lt - rt| <= tol implies floor(rt/tol) ∈ {floor(lt/tol)-1,
  * floor(lt/tol), floor(lt/tol)+1} (shifting by exactly tol shifts the
  * bucket by exactly 1, and floor is monotone), and the three exploded
  * bucket values are distinct, so every qualifying pair matches exactly
  * once. Null times produce null buckets, which the equi-join drops —
  * the same rows the original null band predicate dropped. The full
  * original condition is kept verbatim, so the rewrite can never widen
  * the result.
  *
  * Guards (fires only when it provably helps and stays exact):
  *   - inner join, resolved, with NO existing equi-join key (if one
  *     exists Spark already has a hash-join path, and the guard also
  *     makes the rewrite fixed-point safe — the rewritten join's bucket
  *     equality is an equi key);
  *   - both time expressions are deterministic integrals (int/long —
  *     exact bucket math), one evaluable on each side;
  *   - tolerance is a positive int/long literal.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def asPosLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType)   => Some(v).filter(_ > 0)
    case Literal(v: Int, IntegerType) => Some(v.toLong).filter(_ > 0)
    case _                            => None
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** abs(x - y) <= tol in either comparison orientation. */
  private def bandOf(p: Expression): Option[(Expression, Expression, Long)] =
    p match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), t) =>
        asPosLong(t).map((x, y, _))
      case GreaterThanOrEqual(t, Abs(Subtract(x, y, _), _)) =>
        asPosLong(t).map((x, y, _))
      case _ => None
    }

  private def bucket(t: Expression, tol: Long): Expression = {
    val tl = Literal(tol, LongType)
    val c = if (t.dataType == LongType) t else Cast(t, LongType)
    IntegralDivide(Subtract(c, Pmod(c, tl)), tl)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved &&
        !JoinRewriteGuards.hasEquiKey(splitConjunctivePredicates(cond), left, right) =>
      val band = splitConjunctivePredicates(cond).iterator.flatMap { p =>
        bandOf(p).flatMap { case (x, y, tol) =>
          // orient (lt from left, rt from right); subtraction order is
          // irrelevant under abs()
          if (canEvaluate(x, left) && canEvaluate(y, right)) Some((x, y, tol))
          else if (canEvaluate(y, left) && canEvaluate(x, right)) Some((y, x, tol))
          else None
        }.filter { case (lt, rt, _) =>
          integral(lt) && integral(rt) && lt.deterministic && rt.deterministic
        }
      }.take(1).toSeq.headOption

      band match {
        case None => j
        case Some((lt, rt, tol)) =>
          val lb = bucket(lt, tol)
          val buckets = CreateArray(Seq(
            Subtract(lb, Literal(1L)), lb, Add(lb, Literal(1L))))
          val bAttr = AttributeReference("__band_bucket", LongType)()
          val gen = Generate(Explode(buckets), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(bAttr),
            child = left)
          val rAlias = Alias(bucket(rt, tol), "__band_bucket_r")()
          val proj = Project(right.output :+ rAlias, right)
          val newJoin = Join(gen, proj, Inner,
            Some(And(EqualTo(bAttr, rAlias.toAttribute), cond)), hint)
          Project(j.output, newJoin)
      }
  }
}

/** Fixed-point-safety guard shared by the custom join rewrites
  * ([[BandJoinRewrite]], [[SimilarityJoinRewrite]]): a join that already
  * carries a cross-side equi key is hash-join-able as written (or is the
  * output of a previous application of one of these rules), so the
  * rewrites must leave it alone. One definition so a subtlety fix (e.g.
  * treating cast-wrapped equalities as keys) cannot drift between rules.
  */
private[functions] object JoinRewriteGuards extends PredicateHelper {
  def hasEquiKey(preds: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean = preds.exists {
    case EqualTo(a, b) =>
      (canEvaluate(a, left) && canEvaluate(b, right)) ||
        (canEvaluate(b, left) && canEvaluate(a, right))
    case EqualNullSafe(a, b) =>
      (canEvaluate(a, left) && canEvaluate(b, right)) ||
        (canEvaluate(b, left) && canEvaluate(a, right))
    case _ => false
  }
}
