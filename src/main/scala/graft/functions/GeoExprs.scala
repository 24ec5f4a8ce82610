package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the precision-8 geohash of a quantized
  * coordinate pair — `graft_geohash8(xq, yq)` with xq ∈ [0, 2²⁰) the
  * equirectangular lon quantization and yq the lat one (b31's
  * convention). Semantics are EXACTLY b31's declarative form: the
  * 40-bit lon-first interleave (lon bits on odd positions, bit 39 =
  * lon MSB) rendered as 8 base-32 characters — but where the
  * expression-tree form evaluates 20 div/mod interleave terms plus 8
  * substring() calls per row (all codegen'd, yet ~28 expression
  * evaluations deep), this is ONE fused loop: 40 shift-and-or steps
  * and an 8-byte array write, inlined into whole-stage codegen.
  * Measured at sf0.1 the geohash projection drops ~3× (§5 round-13
  * note). The declarative formulation remains the ORACLE (DuckDB runs
  * the div/mod + substring form), so the fused loop is verified
  * bit-for-bit against the independent algebra on every row.
  */
case class Geohash8(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_geohash8"

  override def nullSafeEval(x: Any, y: Any): Any =
    Geohash8.compute(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = classOf[Geohash8Helper].getName
    val ref = ctx.addReferenceObj("geohash8", Geohash8.helper, helper)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $ref.compute($x, $y);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Geohash8 =
    copy(left = newLeft, right = newRight)
}

/** Java-callable helper so generated code invokes one method. */
class Geohash8Helper extends Serializable {
  private val b32 = "0123456789bcdefghjkmnpqrstuvwxyz".getBytes("US-ASCII")

  def compute(xq: Long, yq: Long): UTF8String = {
    var code = 0L
    var j = 0
    while (j < 20) {
      code |= ((xq >> j) & 1L) << (2 * j + 1)
      code |= ((yq >> j) & 1L) << (2 * j)
      j += 1
    }
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) {
      out(i) = b32(((code >>> (35 - 5 * i)) & 31L).toInt)
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

object Geohash8 {
  val helper = new Geohash8Helper
  def compute(xq: Long, yq: Long): UTF8String = helper.compute(xq, yq)
}
