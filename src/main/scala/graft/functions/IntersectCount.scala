package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native Catalyst expression: |{x ∈ a : x ∈ b}| for two
  * array<string> columns — the set-intersection count every
  * shingle-Jaccard verify computes.
  *
  * Why an Expression: the equivalent
  * `size(filter(a, x -> array_contains(b, x)))` runs as an
  * INTERPRETED higher-order lambda, O(|a|·|b|) with per-element
  * closure calls. doGenCode emits a hash-probe loop (build a set over
  * b once, probe each element of a) that stays inside whole-stage
  * codegen — O(|a|+|b|), no boxing of the loop itself.
  * [[graft.plans.IntersectCountRewrite]] rewrites the lambda pattern
  * to this expression automatically when GraftExtensions is enabled.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_intersect_count"

  // null ELEMENTS are skipped on both sides, mirroring the lambda
  // pattern this replaces: array_contains yields NULL for a null
  // element (or a missing element when b contains nulls), and filter
  // drops non-true rows — so null elements never count there either.
  // (UnsafeArrayData returns an empty string for a null slot, which
  // would otherwise spuriously match.)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val set = new java.util.HashSet[Any](y.numElements() * 2)
    var i = 0
    while (i < y.numElements()) {
      if (!y.isNullAt(i)) set.add(y.getUTF8String(i))
      i += 1
    }
    var c = 0
    i = 0
    while (i < x.numElements()) {
      if (!x.isNullAt(i) && set.contains(x.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val set = ctx.freshName("set")
      s"""
        java.util.HashSet $set = new java.util.HashSet($b.numElements() * 2);
        for (int $j = 0; $j < $b.numElements(); $j++) {
          if (!$b.isNullAt($j)) $set.add($b.getUTF8String($j));
        }
        int $c = 0;
        for (int $i = 0; $i < $a.numElements(); $i++) {
          if (!$a.isNullAt($i) && $set.contains($a.getUTF8String($i))) $c++;
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}
