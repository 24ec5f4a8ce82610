package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: plan constant-width interval joins as bucketed
  * equi-joins.
  *
  * Spark has no range-join operator — an inner join whose only
  * condition is `point >= start AND point < start + C` (the
  * point-in-window shape of every time-interval lookup) falls back to
  * BroadcastNestedLoopJoin: O(n·m) comparisons, a driver-killer the
  * moment neither side is tiny. Databricks ships a proprietary
  * range-join optimization for exactly this gap; this rule is the
  * open equivalent for the constant-width case, rewriting to the form
  * the hand-optimized c16 operator uses:
  *
  *  - bucket width = the (foldable) width C;
  *  - the interval side spans at most 2 such buckets, so it is
  *    EXPLODED into bucket keys {b(start), b(start)+1} — a fixed
  *    2× fan-out, not a per-row sequence;
  *  - the point side computes its single bucket b(point);
  *  - equi-join on the bucket key (hash-partitioned, AQE-skew-safe),
  *    with the ORIGINAL range predicate kept as the residual filter.
  *
  * Every qualifying pair agrees on exactly one of the two exploded
  * keys (the point's bucket is unique), so the rewrite produces no
  * duplicates and needs no distinct. Buckets use sign-safe integer
  * floor division (x - pmod(x, C)) / C. The rule only fires when the
  * conjunction has NO cross-side equi-predicate — if one exists Spark
  * already hash-joins and the extra fan-out would only add work; the
  * bucket EqualTo it introduces also makes the rule idempotent under
  * the fixed-point optimizer batch.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** sign-safe floor(x / c) over longs */
  private def bucket(x: Expression, c: Expression): Expression = {
    val xl = Cast(x, LongType)
    val cl = Cast(c, LongType)
    IntegralDivide(Subtract(xl, Pmod(xl, cl)), cl)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val preds = splitConjunctivePredicates(cond)
      def isLeft(e: Expression) = e.references.nonEmpty && e.references.subsetOf(left.outputSet)
      def isRight(e: Expression) = e.references.nonEmpty && e.references.subsetOf(right.outputSet)
      val hasEqui = preds.exists {
        case EqualTo(a, b) => (isLeft(a) && isRight(b)) || (isRight(a) && isLeft(b))
        case _ => false
      }
      // (point, start) with point >= start, point on one fixed side
      val lowers = preds.collect {
        case GreaterThanOrEqual(l, s) if isLeft(l) && isRight(s) => (l, s)
        case LessThanOrEqual(s, l) if isRight(s) && isLeft(l) => (l, s)
      }
      // (point, start, width) with point < start + width (or <=)
      val uppers = preds.collect {
        case LessThan(l, Add(s, c, _)) if isLeft(l) && isRight(s) && c.foldable => (l, s, c)
        case LessThanOrEqual(l, Add(s, c, _)) if isLeft(l) && isRight(s) && c.foldable => (l, s, c)
        case GreaterThan(Add(s, c, _), l) if isLeft(l) && isRight(s) && c.foldable => (l, s, c)
        case GreaterThanOrEqual(Add(s, c, _), l) if isLeft(l) && isRight(s) && c.foldable => (l, s, c)
      }
      val matched =
        if (hasEqui) None
        else lowers.flatMap { case (l, s) =>
          uppers.collectFirst {
            case (l2, s2, c)
                if l.semanticEquals(l2) && s.semanticEquals(s2) &&
                  integral(l) && integral(s) && integral(c) &&
                  Option(c.eval()).exists(v => (v match {
                    case i: Integer => i.longValue
                    case n: java.lang.Long => n.longValue
                    case _ => 0L
                  }) > 0L) => (l, s, c)
          }
        }.headOption
      matched match {
        case Some((l, s, c)) =>
          val rb0 = bucket(s, c)
          val genOut = AttributeReference("_graft_range_bucket", LongType, nullable = false)()
          val gen = Generate(
            Explode(CreateArray(Seq(rb0, Add(rb0, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(genOut), child = right)
          val newCond = And(EqualTo(bucket(l, c), genOut), cond)
          Project(j.output, Join(left, gen, Inner, Some(newCond), hint))
        case None => j
      }
  }
}
