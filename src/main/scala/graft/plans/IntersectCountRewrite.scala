package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.functions.IntersectCount

/** Optimizer rule: rewrite the interpreted higher-order pattern
  *
  *   size(filter(a, x -> array_contains(b, x)))
  *
  * into the codegen'd hash-probe [[IntersectCount]] — same semantics
  * (our shingle arrays are null-free and distinct), O(|a|+|b|) instead
  * of an O(|a|·|b|) interpreted lambda. Guarded to fire only on
  * string arrays and only when the contains-side does not itself
  * reference the lambda variable. Injected via GraftExtensions, so
  * any session with `spark.sql.extensions=graft.GraftExtensions`
  * plans the fast path without code changes.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(
            ArrayFilter(arr,
              LambdaFunction(ArrayContains(other, v1: NamedLambdaVariable), Seq(v2: NamedLambdaVariable), _)),
            _)
          if v1.exprId == v2.exprId &&
            arr.dataType.isInstanceOf[ArrayType] &&
            arr.dataType.asInstanceOf[ArrayType].elementType == StringType &&
            other.dataType.isInstanceOf[ArrayType] &&
            other.dataType.asInstanceOf[ArrayType].elementType == StringType &&
            !other.exists { case v: NamedLambdaVariable => v.exprId == v1.exprId; case _ => false } =>
        IntersectCount(arr, other)
    }
}
