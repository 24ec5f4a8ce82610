package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: the full 8-band hyperplane-LSH
  * signature of a 64-dim float embedding in ONE array traversal —
  * array<int> of 8 keys, one per band of 8 sign bits.
  *
  * Semantically identical to evaluating 64 graft_qdot sign tests
  * (bit t of band b is `Σ floor(v_i·2²⁰)·w_{b·8+t,i} > 0`, weights =
  * first byte of md5("j:i") − 128 — see [[HyperBand.weight]]), which
  * is exactly what the DuckDB oracle still computes relationally. The
  * 64 qdot calls each re-read the 64-element array and re-floor every
  * element: 4096 array reads + 4096 floors per row. Here each element
  * is read and quantized ONCE, then folded into all 64 accumulators
  * from a flat i-major weight table — same 4096 multiply-adds, 1/64th
  * of the array traffic. Quantized integer arithmetic keeps the dots
  * exact and order-insensitive, so the signature is bit-identical
  * across engines. Like [[SimHash64]], codegen delegates to a helper
  * via a reference object so the single virtual call keeps the
  * projection inside whole-stage codegen.
  */
case class HyperBand(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_hyperband"

  override def nullSafeEval(input: Any): Any =
    HyperBand.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = classOf[HyperBandHelper].getName
    val ref = ctx.addReferenceObj("hyperband", HyperBand.helper, helper)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperBand =
    copy(child = newChild)
}

/** Java-callable helper so generated code invokes one method. */
class HyperBandHelper extends Serializable {
  import HyperBand.{bandBits, bands, dims, planes}

  def compute(a: ArrayData): ArrayData = {
    val w = HyperBand.flatWeights // i-major: w(i*planes + j) = weight of plane j, dim i
    val acc = new Array[Long](planes)
    val n = math.min(a.numElements(), dims)
    var i = 0
    while (i < n) {
      val q = math.floor(a.getFloat(i).toDouble * 1048576.0).toLong
      val base = i * planes
      var j = 0
      while (j < planes) {
        acc(j) += q * w(base + j)
        j += 1
      }
      i += 1
    }
    val keys = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var k = 0
      var t = 0
      while (t < bandBits) {
        if (acc(b * bandBits + t) > 0) k |= 1 << t
        t += 1
      }
      keys(b) = k
      b += 1
    }
    new GenericArrayData(keys)
  }
}

object HyperBand {
  val bands = 8
  val bandBits = 8
  val planes: Int = bands * bandBits
  val dims = 64

  /** Canonical hyperplane weight: first byte of md5("j:i") − 128 —
    * engine-neutral and reproducible from the formula alone. */
  def weight(j: Int, i: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$i".getBytes("UTF-8"))
    (d(0) & 0xff) - 128
  }

  /** Flat i-major table: plane j's weight for dimension i at
    * index i·planes + j (contiguous inner loop over planes). */
  val flatWeights: Array[Int] = {
    val w = new Array[Int](dims * planes)
    var i = 0
    while (i < dims) {
      var j = 0
      while (j < planes) {
        w(i * planes + j) = weight(j, i)
        j += 1
      }
      i += 1
    }
    w
  }

  val helper = new HyperBandHelper
  def compute(a: ArrayData): ArrayData = helper.compute(a)
}
