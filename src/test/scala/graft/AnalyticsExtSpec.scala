package graft

import org.apache.spark.sql.functions._
import graft.operators.AnalyticsExt

/** c30-c37 — the remaining TPC-H shapes. Oracle gating runs
  * driver-side (dev/check.py locally); these specs pin the PLAN
  * properties each shape exists to exercise plus engine-side result
  * invariants.
  */
class AnalyticsExtSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("c34 q19: OR-of-ANDs decomposes into per-side pushed disjunctions") {
    val df = AnalyticsExt.q19Disjunctive(spark, sfDir)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // Catalyst must weaken the mixed OR into a part-only disjunction
    // (brand/size) and a lineitem-only disjunction (quantity bounds)
    // and push BOTH to the scans — at 100 TB this is what keeps the
    // probe side from reading every row.
    val pushed = "PushedFilters: \\[.*".r.findAllIn(formatted).toList
    assert(pushed.exists(f => f.contains("p_brand") && f.contains("Or(")),
      s"part scan lost its disjunctive pushdown:\n$formatted")
    assert(pushed.exists(f => f.contains("l_quantity") && f.contains("Or(")),
      s"lineitem scan lost its disjunctive pushdown:\n$formatted")
    assert(!plan(df).contains("CartesianProduct"))
    val rev = df.collect()(0).getDouble(0)
    assert(rev > 0, s"empty revenue: $rev")
  }

  test("c37 multi-distinct plans ONE scan through an Expand") {
    val df = AnalyticsExt.qMultiDistinct(spark, sfDir)
    val p = plan(df)
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"multi-distinct must not re-scan per distinct set:\n$p")
    assert(p.contains("Expand"), s"expected the Expand-based multi-distinct plan:\n$p")
    // invariant: distinct pairs can't be fewer than either single key,
    // nor exceed their product or the row count
    df.collect().foreach { r =>
      val (parts, supps, pairs, n) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pairs >= math.max(parts, supps) && pairs <= parts * supps && pairs <= n,
        s"inconsistent distinct counts: $r")
    }
  }

  test("c36 window suite: one Window node, one shuffle, exact rank math") {
    val df = AnalyticsExt.qWindowSuite(spark, sfDir)
    val p = plan(df)
    assert("\\bWindow\\b".r.findAllIn(p).size == 1,
      s"all four functions must share ONE window:\n$p")
    val rows = df.filter(col("c_nationkey") === 0)
      .orderBy(col("pr")).collect()
    val n = rows.length
    assert(n > 1)
    // percent_rank over a total order is (i)/(n-1), cume_dist (i+1)/n
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDouble(3) == i.toDouble / (n - 1), s"pr off at $i: $r")
      assert(r.getDouble(4) == (i + 1).toDouble / n, s"cd off at $i: $r")
    }
    // first row of the partition has no predecessor
    assert(rows.head.isNullAt(5))
  }

  test("c35 q2: argmin rejoin is exact and bounded") {
    val df = AnalyticsExt.q2MinCost(spark, sfDir)
    assert(plan(df).contains("TakeOrderedAndProject"), s"top-100 not bounded:\n${plan(df)}")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every emitted cost IS the min over the same candidate universe
    // (p_size=15 parts x EUROPE suppliers), recomputed directly
    val euSupp = Tables(spark, sfDir, "supplier")
      .join(Tables(spark, sfDir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(Tables(spark, sfDir, "region").filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val parts15 = Tables(spark, sfDir, "part").filter(col("p_size") === 15)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val mins = Tables(spark, sfDir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice").collect()
      .filter(r => parts15.contains(r.getLong(0)) && euSupp.contains(r.getLong(1)))
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getDouble(2)).min }
    rows.foreach { r =>
      assert(r.getDouble(1) == mins(r.getLong(0)),
        s"row not at its part's candidate min: $r")
    }
  }

  test("c31 q13: outer join keeps zero-order customers in the distribution") {
    val df = AnalyticsExt.q13CustDist(spark, sfDir)
    val rows = df.collect()
    val totalCustomers = Tables(spark, sfDir, "customer").count()
    // the distribution must partition ALL customers — the outer join's
    // entire point (an inner join would silently drop the 0 bucket)
    assert(rows.map(_.getLong(1)).sum == totalCustomers)
    // the 0 bucket must equal the directly-counted no-order customers
    // (an inner join would silently drop them from the distribution)
    val withOrders = Tables(spark, sfDir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey")).distinct()
      .join(Tables(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    val zeroBucket = rows.find(_.getLong(0) == 0L).map(_.getLong(1)).getOrElse(0L)
    assert(zeroBucket == totalCustomers - withOrders,
      s"0-order bucket $zeroBucket != ${totalCustomers - withOrders}")
  }

  test("c32 q7: only the two directional nation pairs survive") {
    val pairs = AnalyticsExt.q7Volume(spark, sfDir)
      .select("supp_nation", "cust_nation").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_3", "NATION_7"), ("NATION_7", "NATION_3"))),
      s"unexpected pairs: $pairs")
    assert(pairs.nonEmpty)
  }

  test("c33 q8: market share is a valid fraction per year") {
    val rows = AnalyticsExt.q8MktShare(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getDouble(1)
      assert(s >= 0.0 && s <= 1.0, s"share out of range: $r")
    }
  }

  test("c30 q17: cross-multiplied predicate equals the 0.2*avg semantics") {
    // recompute naively (collect per-part avg, filter, sum) and compare
    val p = Tables(spark, sfDir, "part")
      .filter(col("p_brand") === "Brand#23" && col("p_type") === "SMALL")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val li = Tables(spark, sfDir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .collect().filter(r => p.contains(r.getLong(0)))
    // model the predicate the way the engine states it (qty*5*cnt <
    // sum on exact decimals) — numerically identical to qty < 0.2*avg
    // but immune to IEEE boundary flips on ties
    val st = li.groupBy(_.getLong(0)).map { case (k, rs) =>
      k -> (rs.map(r => BigDecimal(r.getDouble(1))).sum, rs.length)
    }
    val want = li.filter { r =>
      val (sumQty, cnt) = st(r.getLong(0))
      BigDecimal(r.getDouble(1)) * 5 * cnt < sumQty
    }
      .map(r => BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble / 7.0
    val got = AnalyticsExt.q17SmallQty(spark, sfDir).collect()(0)
    if (want == 0.0) assert(got.isNullAt(0))
    else assert(math.abs(got.getDouble(0) - want) < 1e-6 * math.max(1.0, want.abs),
      s"got ${got.getDouble(0)} want $want")
  }

  test("c44 SCD2: one shuffle, contiguous non-overlapping versions, one current row per user") {
    val df = AnalyticsExt.qScd2Dim(spark, sfDir)
    // both windows + the change filter share ONE user_id hash exchange
    // (the only other exchange is the final presentation orderBy)
    val p = plan(df)
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"SCD2 must build on a single dimension-key shuffle:\n$p")
    val rows = df.collect()
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      // versions are dense from 1
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length),
        s"user $u versions not dense")
      // intervals chain exactly: valid_to(v) == valid_from(v+1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(4) && a.getLong(4) == b.getLong(3),
            s"user $u: interval break between v${a.getInt(1)} and v${b.getInt(1)}")
          // change detection: consecutive versions differ in attr
          assert(a.getInt(2) != b.getInt(2),
            s"user $u: no-op change survived collapse")
        case _ => ()
      }
      // exactly the last version is current (null valid_to)
      assert(sorted.count(r => r.getBoolean(5)) == 1 && sorted.last.getBoolean(5),
        s"user $u: is_current violated")
    }
  }

  test("c45 funnel: both frames + the agg ride one user shuffle; stages are monotone") {
    val df = AnalyticsExt.qFunnel(spark, sfDir)
    val p = plan(df)
    // two Window nodes (strictly-before view frame, strictly-before
    // qualifying-click frame) but only ONE hash exchange — the
    // per-user agg reuses the window partitioning too
    assert("Window".r.findAllIn(p).size >= 2, s"expected two window passes:\n$p")
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"funnel must not re-shuffle between frames/agg:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stage = r.getInt(1)
      val t = (2 to 4).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))
      // stage k ⇒ t1..tk present and ordered strictly by construction
      assert(t.take(stage).forall(_.isDefined), s"stage $stage missing ts: $r")
      assert(t.drop(stage).forall(_.isEmpty), s"stage $stage extra ts: $r")
      val ts = t.flatten
      assert(ts == ts.sorted, s"funnel timestamps out of order: $r")
      // strictly-before semantics: a later stage's ts is strictly
      // after the earlier stage's EARLIEST qualifying ts
      ts.sliding(2).foreach { case Seq(a, b) => assert(b > a, s"non-strict funnel: $r"); case _ => () }
    }
    // counts can only shrink down the funnel
    val n = (1 to 3).map(k => rows.count(_.getInt(1) >= k))
    assert(n == n.sorted.reverse, s"funnel counts not monotone: $n")
  }

  test("c46 bloom join: literal-bitmap prefilter at the fact scan, result exact") {
    val df = AnalyticsExt.qBloomJoin(spark, sfDir)
    val p = plan(df)
    // the membership test is a map-side Filter (bit math over the
    // constant-folded 1024-long literal) — NOT a join; the only join
    // is the exact broadcast finisher
    assert(p.contains("BroadcastHashJoin"), s"exact finisher missing:\n$p")
    assert("(?i)shiftright".r.findAllIn(p).size >= 2,
      s"bloom bit test not in the plan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    // exactness for ANY bloom quality: equals the plain join
    val dim = Tables(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 9000)
      .select("c_custkey")
    val want = Tables(spark, sfDir, "orders")
      .join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey").collect().toSeq
    val got = df.collect().toSeq
    assert(got == want, s"bloom-pruned join diverged: got ${got.length} want ${want.length}")
  }
}
