package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

import graft.functions.IntersectCount

/** Optimizer rule: rewrite the interpreted higher-order pattern
  *
  *   size(filter(a, x -> array_contains(b, x)))
  *
  * into the codegen'd hash-probe [[IntersectCount]] — O(|a|+|b|)
  * instead of an O(|a|·|b|) interpreted lambda. Guarded to fire only
  * on string arrays and only when the contains-side does not itself
  * reference the lambda variable. Injected via GraftExtensions, so
  * any session with `spark.sql.extensions=graft.GraftExtensions`
  * plans the fast path without code changes.
  *
  * The rule is session-global, so it must preserve the original
  * pattern's semantics for ANY user input, not just our null-free
  * shingle arrays: null ELEMENTS never count (IntersectCount skips
  * them, matching filter dropping array_contains' NULL); a NULL
  * contains-side makes the lambda NULL everywhere, so the original
  * yields size(empty) = 0; a NULL filter-side yields size(NULL),
  * which is -1 or NULL depending on Size's legacySizeOfNull flag —
  * the flag is captured from the matched Size node, and the NULL
  * branches are only materialized when an input is actually nullable.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(
            ArrayFilter(arr,
              LambdaFunction(ArrayContains(other, v1: NamedLambdaVariable), Seq(v2: NamedLambdaVariable), _)),
            legacySizeOfNull)
          if v1.exprId == v2.exprId &&
            arr.dataType.isInstanceOf[ArrayType] &&
            arr.dataType.asInstanceOf[ArrayType].elementType == StringType &&
            other.dataType.isInstanceOf[ArrayType] &&
            other.dataType.asInstanceOf[ArrayType].elementType == StringType &&
            !other.exists { case v: NamedLambdaVariable => v.exprId == v1.exprId; case _ => false } =>
        val count = IntersectCount(arr, other)
        val whenOtherNull =
          if (other.nullable) If(IsNull(other), Literal(0), count) else count
        if (arr.nullable) {
          val sizeOfNull: Expression =
            if (legacySizeOfNull) Literal(-1) else Literal(null, IntegerType)
          If(IsNull(arr), sizeOfNull, whenOtherNull)
        } else whenOtherNull
    }
}
