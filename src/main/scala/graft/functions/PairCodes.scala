package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: all unordered pairs of set bits in a
  * vocabulary bitmask — `graft_pair_codes(mask)` returns the packed
  * codes (i << 6 | j) for every bit pair i < j set in `mask`. This is
  * the pair-generation kernel of the basket/co-occurrence family
  * (c74/c77/c81) once an order's item set is carried as ONE long
  * instead of a collected string set: the per-order aggregate becomes
  * a codegen'd `bit_or` (HashAggregate, map-side combining into a
  * single 8-byte buffer) where `collect_set` forced an interpreted
  * ObjectHashAggregate shuffling string sets — measured 24.3 → 7-9 s
  * on the 60M-lineitem basket pass. A higher-order `transform/filter`
  * lambda could emit the same pairs but evaluates interpreted
  * per-element (the q_nearest_poi lesson); this loop inlines into
  * whole-stage codegen. Decode with (code >> 6) and (code & 63). */
case class PairCodes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pair_codes"

  override def nullSafeEval(mask: Any): Any =
    new GenericArrayData(PairCodes.compute(mask.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = classOf[PairCodesHelper].getName
    val ref = ctx.addReferenceObj("paircodes", PairCodes.helper, helper)
    val arr = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, m =>
      s"${ev.value} = new $arr($ref.compute($m));")
  }

  override protected def withNewChildInternal(newChild: Expression): PairCodes =
    copy(child = newChild)
}

/** Java-callable helper so generated code invokes one method. */
class PairCodesHelper extends Serializable {
  def compute(mask: Long): Array[Int] = {
    val k = java.lang.Long.bitCount(mask)
    val out = new Array[Int](k * (k - 1) / 2)
    var n = 0
    var rest = mask
    while (rest != 0) {
      val i = java.lang.Long.numberOfTrailingZeros(rest)
      var hi = rest & (rest - 1) // bits above i
      while (hi != 0) {
        val j = java.lang.Long.numberOfTrailingZeros(hi)
        out(n) = (i << 6) | j
        n += 1
        hi &= hi - 1
      }
      rest &= rest - 1
    }
    out
  }
}

object PairCodes {
  val helper = new PairCodesHelper
  def compute(mask: Long): Array[Int] = helper.compute(mask)
}
