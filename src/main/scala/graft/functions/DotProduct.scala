package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expression: dot product of two array<float> columns
  * accumulated in double, left-to-right (bit-identical to the DuckDB
  * oracle's sequential list_sum fold).
  *
  * Why an Expression and not a lambda/UDF: Spark's higher-order array
  * functions are interpreted per element, and a fully unrolled 64-term
  * sum exceeds codegen method limits — both fall off the fast path.
  * doGenCode emits a tight primitive loop that stays inside
  * whole-stage codegen, no boxing, no per-element virtual calls.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // (return type inferred — AbstractDataType is private[sql] in Spark 4)
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Quantized integer dot product: Σ floor(v_i · 2²⁰) · w_i in Long,
  * for an array<float> vector against an array<int> weight vector.
  *
  * Used for LSH hyperplane SIGN tests (Dedup d5): quantizing each
  * float to a 2²⁰-grid integer makes the dot EXACT integer
  * arithmetic — order-insensitive and bit-identical across engines —
  * so the DuckDB oracle can compute the same signature with a plain
  * relational SUM instead of mirroring a float fold order. float →
  * double is exact, ·2²⁰ is exact (24-bit mantissa), floor is exact:
  * no rounding-mode subtleties anywhere.
  */
case class QuantDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_qdot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += math.floor(x.getFloat(i).toDouble * 1048576.0).toLong * y.getInt(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $s = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $s += (long) java.lang.Math.floor((double) $a.getFloat($i) * 1048576.0) * $b.getInt($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QuantDot =
    copy(left = newLeft, right = newRight)
}

/** Quantized squared L2 distance: Σ (floor(v_i · 2²⁰) − c_i)² in Long,
  * for an array<float> vector against an array<long> center (usually a
  * literal — e28's chosen centers ride the plan as array literals).
  *
  * Same exactness argument as [[QuantDot]] (float→double exact, ·2²⁰
  * exact, floor exact ⇒ pure int64 arithmetic, order-insensitive,
  * bit-identical to the oracle's relational restatement). Why native:
  * the declarative form — transform to quantize, zip_with to diff,
  * aggregate to fold — is interpreted per element; at 100× vectors the
  * fold dominated e28's wall clock (12.3 s → the kernel keeps the whole
  * distance inside whole-stage codegen). The spec pins kernel ≡ the
  * declarative template on planted probes (the graft_geohash8
  * discipline). */
case class QuantDist2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_qdist2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = math.floor(x.getFloat(i).toDouble * 1048576.0).toLong - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $s = 0L;
        for (int $i = 0; $i < $n; $i++) {
          long $d = (long) java.lang.Math.floor((double) $a.getFloat($i) * 1048576.0) - $b.getLong($i);
          $s += $d * $d;
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QuantDist2 =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Register graft-native expressions and rules on an EXISTING
    * session (idempotent) — the runtime fallback for sessions built
    * without `spark.sql.extensions=graft.GraftExtensions`. */
  def register(spark: SparkSession): Unit = {
    // fast idempotence: operators call this defensively from query
    // builders, so skip the 12 createOrReplace calls (and their
    // "replaced a previously registered function" warn spam) once the
    // session has the graft surface; graft_geohash8 is the sentinel
    // (last name registered below, and also present when the session
    // was built with GraftExtensions)
    // sentinel = the newest-registered function: adding a function and
    // forgetting to bump this would silently skip it in any session
    // that registered the older set first
    if (spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_qdist2")))
      return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_qdot", exprs => QuantDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_intersect_count", exprs => IntersectCount(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingle3", exprs => Shingle3(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hyperband", exprs => HyperBand(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sid60", exprs => Sid60(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingle_sids", exprs => ShingleSids(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_posting_records", exprs => PostingRecords(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_window_sids", exprs => WindowSids(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_capped_list", exprs => CappedList(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_mg_topk", exprs => MisraGries(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv", exprs => Kmv(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_repstats", exprs => RepStats(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_geohash8", exprs => Geohash8(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hilbert", exprs => HilbertD(exprs(0), exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pair_codes", exprs => PairCodes(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ray_cross", exprs => RayCrossings(exprs(0), exprs(1), exprs(2), exprs(3)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_clip", exprs => ClipBox(exprs(0), exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dp", exprs => DpSimplify(exprs(0), exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_reproject", exprs => Reproject(exprs(0), exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk_min", exprs => TopKMin(exprs(0), exprs(1)), "built-in")
    // graft_qdist2 is the registration sentinel (newest function) —
    // keep it LAST here and mirrored in GraftExtensions
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_qdist2", exprs => QuantDist2(exprs(0), exprs(1)), "built-in")
    if (!spark.experimental.extraOptimizations.contains(graft.plans.IntersectCountRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.IntersectCountRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeJoinRewrite
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsofJoinStrategy
  }
}
