package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: exact integer Sutherland–Hodgman clip of
  * a ring against an axis-aligned box —
  * `graft_clip(ring_xs, ring_ys, array(xlo, ylo, xhi, yhi))` returns
  * `array(n_vert, area2, xmin, ymin, xmax, ymax)` of the clipped ring
  * (NULL when the intersection is empty). The clip is the tile-boundary
  * geometry cut tippecanoe performs per tile (ref processing.py:216-402
  * delegates exactly this to tippecanoe's tiler); b3 only ASSIGNS
  * features to tiles — this produces the per-tile piece.
  *
  * Exactness invariant: when every input edge is horizontal, vertical,
  * or ±45° (|Δx| = |Δy|) and all coordinates + box bounds are integers,
  * every clip intersection lands ON the integer lattice, and the
  * property is preserved by each of the four half-plane passes (new
  * edges run along the clip line; surviving sub-edges keep their
  * slope). All arithmetic is then exact int64 — zero epsilon, zero
  * float drift cross-engine (the b24/b35 discipline). The generic
  * rational intersection formula is used with integer division, which
  * is exact under the invariant (divisor divides the product).
  *
  * Why native: Sutherland–Hodgman is a 4-pass loop over a variable-
  * length vertex list — declarative SQL would need 4 explode+window
  * stages (4 shuffles per clip at scale); this kernel is one small
  * codegen'd call that keeps the piece computation map-only. The
  * DuckDB oracle executes the SAME emission rules as an unrolled
  * 4-stage lag/lead SQL pipeline — independent machinery — and
  * GeoInvariantsSpec pins kernel ≡ hand-computed pieces on planted
  * corner probes (4-tile-spanning, fully-inside, edge-touching).
  */
case class ClipBox(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(
    ArrayType(LongType, containsNull = false),
    ArrayType(LongType, containsNull = false),
    ArrayType(LongType, containsNull = false))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_clip"

  override def nullSafeEval(xs: Any, ys: Any, box: Any): Any =
    ClipBox.helper.compute(xs.asInstanceOf[ArrayData],
      ys.asInstanceOf[ArrayData], box.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = classOf[ClipBoxHelper].getName
    val ref = ctx.addReferenceObj("clipbox", ClipBox.helper, helper)
    nullSafeCodeGen(ctx, ev, (xs, ys, box) => s"""
      ${ev.value} = $ref.compute($xs, $ys, $box);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): ClipBox = copy(first = f, second = s, third = t)
}

/** Java-callable helper so generated code invokes one method. */
class ClipBoxHelper extends Serializable {

  /** One half-plane pass. `axis` 0 = clip on x, 1 = clip on y;
    * `keepGE` true = keep side ≥ bound, false = keep ≤ bound.
    * Emission rules are EXACTLY the oracle SQL's: per edge S→E
    * (S = predecessor, ring implicitly closed), emit the intersection
    * when insides differ, then emit E when E is inside. */
  private def pass(xs: Array[Long], ys: Array[Long], n: Int,
      axis: Int, keepGE: Boolean, bound: Long,
      ox: Array[Long], oy: Array[Long]): Int = {
    var m = 0
    var i = 0
    while (i < n) {
      val j = if (i == 0) n - 1 else i - 1 // S = predecessor of E
      val ex = xs(i); val ey = ys(i)
      val sx = xs(j); val sy = ys(j)
      val eVal = if (axis == 0) ex else ey
      val sVal = if (axis == 0) sx else sy
      val eIn = if (keepGE) eVal >= bound else eVal <= bound
      val sIn = if (keepGE) sVal >= bound else sVal <= bound
      if (eIn != sIn) {
        // exact under the axis-aligned/±45° edge invariant
        if (axis == 0) {
          ox(m) = bound
          oy(m) = sy + (ey - sy) * (bound - sx) / (ex - sx)
        } else {
          ox(m) = sx + (ex - sx) * (bound - sy) / (ey - sy)
          oy(m) = bound
        }
        m += 1
      }
      if (eIn) { ox(m) = ex; oy(m) = ey; m += 1 }
      i += 1
    }
    m
  }

  /** Full 4-pass clip; returns null for an empty intersection, else
    * [n_vert, |2A|, xmin, ymin, xmax, ymax]. Zero-area output rings
    * (edge-touching contact) return area2 = 0 — callers filter. */
  def compute(xsIn: ArrayData, ysIn: ArrayData, box: ArrayData): GenericArrayData = {
    val n0 = xsIn.numElements()
    // a convex ring gains ≤1 vertex per pass (n0+4 final), but each
    // pass's raw emission is ≤2× its input ring — size for the
    // worst case so a future non-convex caller can't overrun
    val cap = 16 * n0 + 16
    var ax = new Array[Long](cap); var ay = new Array[Long](cap)
    var bx = new Array[Long](cap); var by = new Array[Long](cap)
    var i = 0
    while (i < n0) { ax(i) = xsIn.getLong(i); ay(i) = ysIn.getLong(i); i += 1 }
    val xlo = box.getLong(0); val ylo = box.getLong(1)
    val xhi = box.getLong(2); val yhi = box.getLong(3)
    var n = n0
    n = pass(ax, ay, n, 0, keepGE = true, xlo, bx, by)
    if (n == 0) return null
    n = pass(bx, by, n, 0, keepGE = false, xhi, ax, ay)
    if (n == 0) return null
    n = pass(ax, ay, n, 1, keepGE = true, ylo, bx, by)
    if (n == 0) return null
    n = pass(bx, by, n, 1, keepGE = false, yhi, ax, ay)
    if (n == 0) return null
    // shoelace + bbox over the final ring (in ax/ay)
    var area2 = 0L
    var xmin = Long.MaxValue; var ymin = Long.MaxValue
    var xmax = Long.MinValue; var ymax = Long.MinValue
    i = 0
    while (i < n) {
      val j = if (i + 1 == n) 0 else i + 1
      area2 += ax(i) * ay(j) - ax(j) * ay(i)
      if (ax(i) < xmin) xmin = ax(i)
      if (ay(i) < ymin) ymin = ay(i)
      if (ax(i) > xmax) xmax = ax(i)
      if (ay(i) > ymax) ymax = ay(i)
      i += 1
    }
    if (area2 < 0) area2 = -area2
    new GenericArrayData(Array[Long](n.toLong, area2, xmin, ymin, xmax, ymax))
  }
}

object ClipBox {
  val helper = new ClipBoxHelper
}
