package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** b46 tile-cap drop, b47 nearest-overview sampling, b48 COG validate,
  * d23 LSH band planner — semantics + the graft_topk_min kernel. */
class GeoRasterSpec extends SparkTestBase {

  // ---------------------------------------------------------------
  // graft_topk_min kernel
  // ---------------------------------------------------------------

  test("graft_topk_min equals sort-take across many groups (seeded, multi-partition merge path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(20000)((rnd.nextInt(37), rnd.nextLong().abs % 1000000L))
    // 8 partitions >> 4 groups per partition forces real partial-merge
    val df = rows.toDF("g", "v").repartition(8)
    val got = df.groupBy("g")
      .agg(expr("graft_topk_min(v, 25)").as("arr"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).sorted.take(25)
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (g, exp) =>
      assert(got(g) == exp, s"group $g: got ${got(g)} want $exp")
    }
  }

  test("graft_topk_min: group smaller than k returns the whole group sorted") {
    import spark.implicits._
    val df = Seq((1, 5L), (1, 3L), (1, 9L)).toDF("g", "v")
    val arr = df.groupBy("g").agg(expr("graft_topk_min(v, 100)").as("a"))
      .collect()(0).getSeq[Long](1)
    assert(arr == Seq(3L, 5L, 9L))
  }

  test("graft_topk_min: duplicate values are retained, not deduped") {
    import spark.implicits._
    val df = Seq.fill(10)((1, 4L)).toDF("g", "v")
    val arr = df.groupBy("g").agg(expr("graft_topk_min(v, 3)").as("a"))
      .collect()(0).getSeq[Long](1)
    assert(arr == Seq(4L, 4L, 4L))
  }

  // ---------------------------------------------------------------
  // b46 q_tile_drop
  // ---------------------------------------------------------------

  test("b46 tile drop: kept = min(features, 100), checksum matches the window-rank reference") {
    val out = operators.GeoRaster.qTileDrop(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val features = r.getAs[Long]("features")
      val kept = r.getAs[Long]("kept")
      val dropped = r.getAs[Long]("dropped")
      assert(kept == math.min(features, 100L), s"tile (${r.get(0)},${r.get(1)})")
      assert(dropped == features - kept)
    }
    // independent reference: the textbook window formulation
    val ref = operators.GeoOps.tiled(spark, sfDir, 6)
      .withColumn("dk", expr("event_id * 2654435761 % 1048573"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("xt", "yt").orderBy("dk", "event_id")))
      .filter(col("rn") <= 100)
      .groupBy("xt", "yt").agg(sum("event_id").as("want"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("want")).toMap
    rows.foreach { r =>
      val k = (r.getAs[Int]("xt"), r.getAs[Int]("yt"))
      assert(r.getAs[Long]("kept_checksum") == ref(k), s"tile $k checksum")
    }
  }

  test("b46 plan: one events scan, no window sort — the cap is an ordinary bounded agg") {
    val p = operators.GeoRaster.qTileDrop(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"one scan, saw $scans:\n$p")
    assert(!p.contains("Window"), s"no window operator — the heap agg replaces it:\n$p")
    assert(p.contains("graft_topk_min"), s"the native kernel must carry the cap:\n$p")
  }

  // ---------------------------------------------------------------
  // b49 q_tile_budget
  // ---------------------------------------------------------------

  test("b49 tile budget: survivors are the maximal byte-budget prefix of the drop order") {
    val rows = operators.GeoRaster.qTileBudget(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // independent reference: window cumsum formulation
    val ref = operators.GeoOps.tiled(spark, sfDir, 6)
      .withColumn("dk", expr("event_id * 2654435761 % 1048573"))
      .withColumn("bytes", expr("event_id * 48271 % 451 + 50"))
      .withColumn("cb", sum("bytes").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("xt", "yt").orderBy("dk", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cb") <= 20000L)
      .groupBy("xt", "yt")
      .agg(count(lit(1)).as("kept"), sum("bytes").as("kept_bytes"),
        sum("event_id").as("cs"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getAs[Long]("kept"), r.getAs[Long]("kept_bytes"), r.getAs[Long]("cs"))).toMap
    rows.foreach { r =>
      val k = (r.getAs[Int]("xt"), r.getAs[Int]("yt"))
      val (kept, kb, cs) = ref(k)
      assert(r.getAs[Long]("kept") == kept, s"tile $k kept")
      assert(r.getAs[Long]("kept_bytes") == kb && kb <= 20000L, s"tile $k bytes")
      assert(r.getAs[Long]("kept_checksum") == cs, s"tile $k checksum")
      assert(r.getAs[Boolean]("budget_hit") ==
        (r.getAs[Long]("total_bytes") > 20000L), s"tile $k flag")
    }
  }

  // ---------------------------------------------------------------
  // b47 q_overview_sample
  // ---------------------------------------------------------------

  test("b47 nearest sampling: level-k rows equal the independent congruence filter; levels nest nothing") {
    val out = operators.GeoRaster.qOverviewSample(spark, sfDir)
      .collect().map(r => r.getAs[Int]("level") ->
        (r.getAs[Long]("n_features"), r.getAs[Long]("checksum"))).toMap
    val base = operators.GeoOps.tiled(spark, sfDir, 12).select("event_id", "xt", "yt")
    (1 to 4).foreach { k =>
      val f = 1L << k
      val half = f / 2
      val want = base.filter(col("xt") % f === half && col("yt") % f === half)
        .agg(count(lit(1)), coalesce(sum("event_id"), lit(0L))).collect()(0)
      val (n, cs) = out.getOrElse(k, (0L, 0L))
      assert(n == want.getLong(0), s"level $k count")
      assert(cs == want.getLong(1), s"level $k checksum")
    }
    // the sampled lattices of distinct levels are DISJOINT (x ≡ 2^(k-1)
    // mod 2^k pins bit k-1 as the lowest set bit) — so feature counts
    // drop roughly 4x per level on a uniform field
    val n1 = out(1)._1.toDouble
    val n2 = out(2)._1.toDouble
    assert(n2 < n1, "level 2 samples fewer source pixels than level 1")
  }

  // ---------------------------------------------------------------
  // b52 q_overview_average
  // ---------------------------------------------------------------

  test("b52 average overview: every feature lands in exactly one parent cell; means are floor-exact") {
    val rows = operators.GeoRaster.qOverviewAverage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = operators.GeoOps.tiled(spark, sfDir, 12).count()
    assert(rows.map(_.getAs[Long]("n_features")).sum == total,
      "the 2x2 footprints partition the feature set")
    rows.foreach { r =>
      val (n, s, a) = (r.getAs[Long]("n_features"),
        r.getAs[Long]("sum_milli"), r.getAs[Long]("avg_milli"))
      assert(a == Math.floorDiv(s, n), s"cell (${r.get(0)},${r.get(1)})")
      val (px, py) = (r.getAs[Int]("px"), r.getAs[Int]("py"))
      assert(px >= 0 && px < 2048 && py >= 0 && py < 2048)
    }
  }

  // ---------------------------------------------------------------
  // b48 q_cog_validate
  // ---------------------------------------------------------------

  test("b48 validate: fault classes map to the modeled rio-cogeo verdicts") {
    val rows = operators.GeoRaster.qCogValidate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = r.getAs[Long]("p_partkey")
      val valid = r.getAs[Boolean]("is_valid")
      val msg = r.getAs[String]("message")
      val w = (key * 7919L) % 20000L + 256L
      val h = (key * 104729L) % 20000L + 256L
      if (key % 13 == 0) {
        assert(!valid && msg == "The file is not tiled", s"part $key")
      } else if (key % 11 == 0 && math.max(w, h) > 512) {
        assert(!valid && msg == "The file does not have overviews", s"part $key")
      } else if (key % 11 == 1 && r.getAs[Int]("expected_overviews") > 1) {
        // expected == 1 means the stop-one-short fault leaves 0 levels
        // on a ≤512px image — legitimately valid (no overviews needed)
        assert(!valid && msg == "Overview levels are insufficient", s"part $key")
      } else if (key % 11 > 1 && key % 13 > 0) {
        assert(valid && msg.isEmpty, s"part $key should be clean")
      }
      // warnings never flip validity
      if (key % 13 == 1 && key % 11 > 1) {
        assert(r.getAs[Int]("n_warnings") == 1 && valid, s"part $key: 128-block is warn-only")
      }
    }
  }

  test("b48 plan: map-only — no shuffle, no join over the catalog") {
    val p = operators.GeoRaster.qCogValidate(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"no join:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"only the final ORDER BY may shuffle, saw $exchanges:\n$p")
  }

  test("b49/b51 plans: one scan, zero Window operators — the heap agg carries both") {
    Seq(
      ("b49", operators.GeoRaster.qTileBudget(spark, sfDir)),
      ("b51", operators.GeoRaster.qTilestatsAttrs(spark, sfDir))
    ).foreach { case (id, df) =>
      val p = df.queryExecution.executedPlan.toString
      val scans = "FileScan parquet".r.findAllIn(p).size
      assert(scans == 1, s"$id: one scan, saw $scans:\n$p")
      assert(!p.contains("Window"), s"$id: no window operator:\n$p")
      assert(p.contains("graft_topk_min"), s"$id: the native kernel must carry the cut:\n$p")
    }
  }

  // ---------------------------------------------------------------
  // b51 q_tilestats_attrs
  // ---------------------------------------------------------------

  test("b51 tilestats attributes: sample = 10 smallest distinct, counts cover the layer") {
    val rows = operators.GeoRaster.qTilestatsAttrs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val e = Tables.events(spark, sfDir)
    rows.foreach { r =>
      val (layer, attr) = (r.getString(0), r.getString(1))
      val vals = e.filter(col("event_type") === layer)
        .select(if (attr == "user_id") col("user_id")
                else expr("CAST(floor(value) AS BIGINT)"))
        .collect().map(_.getLong(0))
      assert(r.getAs[Long]("n") == vals.length, s"$layer/$attr n")
      val distinct = vals.distinct.sorted
      assert(r.getAs[Long]("n_distinct") == distinct.length.toLong)
      assert(r.getAs[Long]("vmin") == distinct.head)
      assert(r.getAs[Long]("vmax") == distinct.last)
      assert(r.getAs[String]("sample") ==
        distinct.take(10).mkString(","), s"$layer/$attr sample")
    }
  }

  // ---------------------------------------------------------------
  // b50 q_fgb_index
  // ---------------------------------------------------------------

  test("b50 FGB index: packed-tree node chain equals the independent recursion; curve extent sane") {
    // independent reference for the packed Hilbert R-tree size
    def nodes(n: Long): Long = {
      var total = n
      var level = n
      while (level > 1) { level = (level + 15) / 16; total += level }
      total
    }
    val rows = operators.GeoGeom.qFgbIndex(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("n_nodes") == nodes(n), s"layer ${r.get(1)} chain")
      assert(r.getAs[Long]("index_bytes") == nodes(n) * 40L)
      val (hmin, hmax) = (r.getAs[Long]("hmin"), r.getAs[Long]("hmax"))
      assert(hmin >= 0L && hmax < (1L << 24) && hmin <= hmax, s"curve extent [$hmin,$hmax]")
    }
    // spot-check the chain at the awkward boundaries
    Seq(1L, 2L, 16L, 17L, 256L, 257L).foreach { n =>
      val direct = nodes(n)
      assert(direct >= n && (n > 1 || direct == 1), s"n=$n -> $direct")
    }
  }

  // ---------------------------------------------------------------
  // d23 q_lsh_tune
  // ---------------------------------------------------------------

  test("d24 b-bit minhash: identical docs match all bits, estimator stays in range") {
    val rows = operators.Dedup.qDedupBbit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (j, nm, est) = (r.getAs[Double]("jaccard"),
        r.getAs[Int]("n_match"), r.getAs[Long]("est_micro"))
      assert(nm >= 0 && nm <= 8)
      assert(est >= 0L && est <= 1000000L)
      // exact duplicates share every minhash chunk, hence every bit
      if (j == 1.0) assert(nm == 8, s"${r.get(0)}-${r.get(1)}: identical pair lost a bit")
      // the estimator is a deterministic function of n_match
      assert(est == math.max(nm.toLong * 2000000L / 8L - 1000000L, 0L))
    }
    // signal check: high-jaccard pairs out-match low-jaccard pairs on average
    val (hi, lo) = rows.partition(_.getAs[Double]("jaccard") >= 0.6)
    if (hi.nonEmpty && lo.nonEmpty) {
      def avg(rs: Array[org.apache.spark.sql.Row]) =
        rs.map(_.getAs[Int]("n_match").toDouble).sum / rs.length
      assert(avg(hi) >= avg(lo), "b-bit matches must correlate with true similarity")
    }
  }

  test("d23 LSH planner: 8 factorizations of 128, midpoint right-shifts with r, extremes lose") {
    val rows = operators.Dedup.qLshTune(spark, sfDir).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getAs[Int]("r") * r.getAs[Int]("b") == 128)
    }
    val byR = rows.map(r => r.getAs[Int]("r") ->
      (r.getAs[Int]("midpoint_j"), r.getAs[Long]("cost_micro"))).sortBy(_._1)
    // steeper rows per band ⇒ the capture curve shifts right: midpoint
    // strictly increases along the r ladder until it saturates past the
    // grid (j=40 is the "beyond s=0.975" sentinel — r=64 and r=128 both
    // midpoint above the grid's reach, closed form s* ≈ 0.981/0.995)
    byR.sliding(2).foreach { case Array((r1, (m1, _)), (r2, (m2, _))) =>
      assert(if (m1 < 40) m1 < m2 else m2 == 40,
        s"midpoint must right-shift: r=$r1 j=$m1 vs r=$r2 j=$m2")
    }
    // both degenerate configs (one giant band / 128 singleton bands)
    // must cost more than the tuned middle
    val costs = byR.map(_._2._2)
    val minCost = costs.min
    assert(costs.head > minCost, "r=1 (b=128) over-captures — worst-in-class fp mass")
    assert(costs.last > minCost, "r=128 (b=1) under-captures — worst-in-class fn mass")
    // the planner's winner brackets d2's production threshold t=0.8:
    // its midpoint sits inside the grid's t neighborhood
    val best = byR.minBy(_._2._2)
    assert(best._2._1 >= 24 && best._2._1 <= 40,
      s"winner midpoint ${best._2._1} should sit near j=32 (s=0.8)")
  }
}
