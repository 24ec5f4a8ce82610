package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftPlanBridge
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.Tables
import graft.plans.AsofJoin

/** Public API + query entry for the FIRST-CLASS as-of join operator
  * (graft.plans.AsofJoin / AsofJoinExec) — the full custom-operator
  * ladder: LogicalPlan node, planner Strategy, physical SparkPlan.
  * Where the composable c21 formulation pays a union + window, the
  * physical operator is a per-partition zipper: both sides
  * hash-clustered on the key and sorted by (key, time), one O(n+m)
  * merge pass with a single buffered row of state.
  */
object Asof {

  /** As-of (backward, inner) join: for each left row the LATEST right
    * row with equal key and right time ≤ left time. Key/time columns
    * must be LongType. `rightTiebreak` names columns that order right
    * rows sharing (key, time) — the GREATEST tiebreak tuple wins,
    * replacing the per-(key, time) pre-aggregation callers otherwise
    * need for determinism (the dedup rides the operator's own sort
    * instead of paying an extra exchange + hash-agg). */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTiebreak: Seq[String] = Nil): DataFrame = {
    val lp = GraftPlanBridge.analyzed(left)
    val rp = GraftPlanBridge.analyzed(right)
    def attr(p: LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    GraftPlanBridge.ofRows(left.sparkSession,
      AsofJoin(lp, rp, attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTime), attr(rp, rightTime),
        rightTiebreak.map(attr(rp, _))))
  }

  /** c22 — the c21 as-of query through the NATIVE operator: identical
    * semantics and oracle (DuckDB ASOF JOIN), but planned as
    * AsofJoinExec — two exchanges, two sorts, one codegen'd zipper
    * pass; no union, no window state, and no right-side
    * pre-aggregation either: the max-orderkey-per-(customer, day)
    * dedup the c21 plan pays a shuffle + hash-agg for is folded into
    * the zipper's sort via the tiebreak ordering. */
  def qAsofNative(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.events(spark, dir)
    val o = Tables(spark, dir, "orders")
    val ev = e.filter(col("event_type") === "purchase")
      .select((col("user_id") + 1).as("k"),
        expr("unix_millis(ts) div 86400000").as("t"), col("event_id"))
    val od = o.select(col("o_custkey").as("rk"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("rt"),
        col("o_orderkey"), col("o_totalprice"))
    asofJoin(ev, od, "k", "rk", "t", "rt",
        rightTiebreak = Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("k"), col("t").as("event_day"),
        col("rt").as("order_day"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_native" -> (qAsofNative _))

  /** Same result contract as c21 ⇒ same oracle. */
  val oracles: Map[String, String] = Map(
    "q_asof_native" -> Analytics.qAsofJoinSql)
}
