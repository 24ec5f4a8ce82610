package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: exact-integer Douglas–Peucker polyline
  * simplification — `graft_dp(xs, ys, tol2)` returns
  * `array(kept_mask, n_kept, max_err2_e4)`:
  *  - `kept_mask`: bit i set ⟺ vertex i survives (endpoints always);
  *  - `n_kept`: popcount of the mask;
  *  - `max_err2_e4`: max over DROPPED vertices of
  *    floor(cross² · 10⁴ / len²) against the segment they were dropped
  *    from (the decision-time segment — the recursion's own error) —
  *    i.e. 10⁴ × the squared perpendicular distance.
  *
  * The SPLIT DECISION is division-free exact int64 (b35's discipline):
  * a vertex splits its segment iff cross² > tol² · len², where cross is
  * the 2×-area cross product of the vertex against the segment
  * endpoints — no IEEE, no epsilon, so the kept set is bit-identical
  * cross-engine. Argmax per segment compares cross² alone (one shared
  * denominator per segment), ties break to the SMALLEST index. The
  * error metric's single floor division happens only in the reporting,
  * after the decision, and floors identically in both engines
  * (non-negative operands).
  *
  * Why native: the recursion is data-dependent over a vertex list —
  * declarative SQL needs one unrolled BFS level per possible split.
  * The DuckDB oracle replays exactly that (bounded unrolled-chain
  * stages, same argmax/tie/strict-> rules); this kernel is the
  * map-only Spark half. Processing order does not affect the kept set
  * or the per-segment error accounting, so stack order here vs BFS
  * order in the oracle is immaterial.
  */
case class DpSimplify(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(
    ArrayType(LongType, containsNull = false),
    ArrayType(LongType, containsNull = false), LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_dp"

  override def nullSafeEval(xs: Any, ys: Any, tol2: Any): Any =
    DpSimplify.helper.compute(xs.asInstanceOf[ArrayData],
      ys.asInstanceOf[ArrayData], tol2.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = classOf[DpSimplifyHelper].getName
    val ref = ctx.addReferenceObj("dpsimplify", DpSimplify.helper, helper)
    nullSafeCodeGen(ctx, ev, (xs, ys, tol2) =>
      s"${ev.value} = $ref.compute($xs, $ys, $tol2);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): DpSimplify = copy(first = f, second = s, third = t)
}

/** Java-callable helper so generated code invokes one method. */
class DpSimplifyHelper extends Serializable {

  private def cross(xs: ArrayData, ys: ArrayData, lo: Int, hi: Int, i: Int): Long =
    (xs.getLong(hi) - xs.getLong(lo)) * (ys.getLong(i) - ys.getLong(lo)) -
      (ys.getLong(hi) - ys.getLong(lo)) * (xs.getLong(i) - xs.getLong(lo))

  def compute(xs: ArrayData, ys: ArrayData, tol2: Long): GenericArrayData = {
    val n = xs.numElements()
    var kept = 0L
    if (n > 0) kept |= 1L
    if (n > 1) kept |= 1L << (n - 1)
    var maxErr = 0L
    if (n > 2) {
      // explicit segment stack; depth ≤ n
      val stLo = new Array[Int](n + 2)
      val stHi = new Array[Int](n + 2)
      var sp = 0
      stLo(0) = 0; stHi(0) = n - 1; sp = 1
      while (sp > 0) {
        sp -= 1
        val lo = stLo(sp); val hi = stHi(sp)
        if (hi - lo >= 2) {
          // argmax cross² over interior vertices, tie → smallest index
          var best = -1
          var bestC2 = -1L
          var i = lo + 1
          while (i < hi) {
            val c = cross(xs, ys, lo, hi, i)
            val c2 = c * c
            if (c2 > bestC2) { best = i; bestC2 = c2 }
            i += 1
          }
          val dx = xs.getLong(hi) - xs.getLong(lo)
          val dy = ys.getLong(hi) - ys.getLong(lo)
          val len2 = dx * dx + dy * dy
          if (bestC2 > tol2 * len2) {
            kept |= 1L << best
            stLo(sp) = lo; stHi(sp) = best; sp += 1
            stLo(sp) = best; stHi(sp) = hi; sp += 1
          } else {
            // finalize: all interior dropped against THIS segment
            i = lo + 1
            while (i < hi) {
              val c = cross(xs, ys, lo, hi, i)
              val err = c * c * 10000L / len2
              if (err > maxErr) maxErr = err
              i += 1
            }
          }
        }
      }
    }
    new GenericArrayData(Array[Long](kept, java.lang.Long.bitCount(kept).toLong, maxErr))
  }
}

object DpSimplify {
  val helper = new DpSimplifyHelper
}
