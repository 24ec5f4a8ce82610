package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: the Hilbert-curve distance of a tile
  * coordinate — `graft_hilbert(z, xt, yt)` maps (xt, yt) on the 2^z ×
  * 2^z grid to its 1-D position d ∈ [0, 4^z) along the Hilbert curve.
  * PMTiles clusters tile ids in exactly this order (tile_id =
  * zoom_offset(z) + hilbert_d(z, x, y)), and an OPTIMIZE-style
  * clustered rewrite on the Hilbert key gives strictly better spatial
  * locality than the Morton interleave (b18): the Hilbert curve has no
  * long jumps — consecutive d are ALWAYS grid-adjacent, so a
  * contiguous d-range is a compact blob, which is why PMTiles chose it
  * for range-request locality.
  *
  * Algorithm: the classic xy2d quadrant-rotation walk (public domain,
  * the standard formulation on the Hilbert-curve literature/Wikipedia)
  * — z iterations of shift/flip, fused into one codegen'd loop. The
  * DuckDB oracle runs the SAME recurrence as a recursive CTE carrying
  * (x, y, d, s) state per row — independent execution machinery, and
  * HilbertSpec proves the defining curve property independently of
  * both (bijectivity onto [0, 4^z) + every consecutive pair of d
  * values is grid-adjacent).
  */
case class HilbertD(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(IntegerType, LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(z: Any, x: Any, y: Any): Any =
    HilbertD.compute(z.asInstanceOf[Int], x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = classOf[HilbertHelper].getName
    val ref = ctx.addReferenceObj("hilbert", HilbertD.helper, helper)
    nullSafeCodeGen(ctx, ev, (z, x, y) => s"${ev.value} = $ref.compute($z, $x, $y);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): HilbertD =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Java-callable helper so generated code invokes one method. */
class HilbertHelper extends Serializable {
  def compute(z: Int, x0: Long, y0: Long): Long = {
    val n = 1L << z
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve is upright
      if (ry == 0) {
        if (rx == 1) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

object HilbertD {
  val helper = new HilbertHelper
  def compute(z: Int, x: Long, y: Long): Long = helper.compute(z, x, y)
}
