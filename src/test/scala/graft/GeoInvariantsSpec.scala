package graft

import org.apache.spark.sql.functions._

/** Geometric invariants of the tiling math on seeded random points —
  * properties the oracle can't express (it only checks equality, not
  * geometry): every point's assigned tile must geographically contain
  * it, and parent tiles must contain their children.
  */
class GeoInvariantsSpec extends SparkTestBase {

  private val z = 6
  private val n = 1 << z

  test("assigned tile contains the point (10k seeded random coords)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(10000)((rnd.nextDouble() * 359.99 - 180.0,
      rnd.nextDouble() * 170.0 - 85.0)).toDF("lon", "lat")
    val tiledDf = pts
      .withColumn("xt", least(floor((col("lon") + 180.0) / 360.0 * n), lit(n - 1)).cast("int"))
      .withColumn("yt", greatest(least(
        floor((lit(1.0) - log(tan(radians(col("lat"))) + lit(1.0) / cos(radians(col("lat")))) / math.Pi) / 2.0 * n),
        lit(n - 1)), lit(0)).cast("int"))
      .withColumn("west", col("xt").cast("double") / n * 360.0 - 180.0)
      .withColumn("east", (col("xt") + 1).cast("double") / n * 360.0 - 180.0)
    def latOf(y: org.apache.spark.sql.Column) = {
      val a = lit(math.Pi) * (lit(1.0) - lit(2.0) * y / n)
      degrees(atan((exp(a) - exp(-a)) / 2.0))
    }
    val checked = tiledDf
      .withColumn("north", latOf(col("yt").cast("double")))
      .withColumn("south", latOf((col("yt") + 1).cast("double")))
      .withColumn("lon_ok", col("lon") >= col("west") && col("lon") < col("east"))
      .withColumn("lat_ok", col("lat") <= col("north") && col("lat") > col("south"))
    val bad = checked.filter(!col("lon_ok") || !col("lat_ok")).count()
    assert(bad == 0, s"$bad points escaped their tile")
  }

  test("parent tile at z-1 is the child's coordinates shifted right") {
    import spark.implicits._
    val tiles = (0 until n).flatMap(x => Seq((x, x / 2))).toDF("xt", "parent_expected")
    val got = tiles.withColumn("parent", (col("xt") / 2).cast("int"))
      .filter(col("parent") =!= col("parent_expected")).count()
    assert(got == 0)
  }

  test("b25: shoelace area equals the parallelogram closed form; centroid sits at the center") {
    val rows = operators.GeoOps.qPolygonMetrics(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getLong(0)
      val (au, bu) = (k % 7 + 5, k % 5 + 3)
      // shear-invariant closed form: 2A = 8·au·bu, scaled to µdeg²
      assert(r.getLong(1) == 8L * au * bu * 1000000000000L,
        s"poly $k area2 ${r.getLong(1)}")
      assert(r.getLong(1) > 0, "generator quads must be CCW")
      // a sheared parallelogram never overfills its bbox; unsheared
      // ones fill it exactly
      val fill = r.getDouble(3)
      assert(fill > 0 && fill <= 1.0, s"poly $k fill $fill")
      if (k % 9 - 4 == 0) assert(fill == 1.0, s"unsheared poly $k fill $fill")
      // point symmetry ⇒ polygon centroid = generator center
      assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0,
        s"poly $k centroid offset (${r.getDouble(4)}, ${r.getDouble(5)})")
    }
  }

  test("b26: the two-candidate hex assignment achieves the GLOBAL nearest-center distance") {
    // The query only ever compares two candidate centers (one per
    // lattice). The geometric claim behind that shortcut: those two
    // candidates always include a globally nearest center. Brute-force
    // the 4×4 center neighborhood of both lattices per point and
    // assert the query's chosen center is never beaten (ties allowed —
    // the deterministic tie RULE is the oracle's job, the geometry is
    // this spec's).
    val sx = 20000L; val sy = 34640L
    val rows = operators.GeoOps.qHexBin(spark, sfDir).collect()
    val events = Tables(spark, sfDir, "events").select("event_id").collect().map(_.getLong(0))
    assert(rows.map(_.getLong(2)).sum == events.length, "hex counts must partition the points")
    var worst = 0L
    events.foreach { id =>
      val x = id * 2654435761L % 360000L
      val y = id * 1327217873L % 170000L
      def d2(cx: Long, cy: Long) = (x - cx) * (x - cx) + (y - cy) * (y - cy)
      // the query's two candidates
      val dA = d2(((x + sx / 2) / sx) * sx, ((y + sy / 2) / sy) * sy)
      val dB = d2((x / sx) * sx + sx / 2, (y / sy) * sy + sy / 2)
      val chosen = math.min(dA, dB)
      val best = (for (i <- -1L to 2L; j <- -1L to 2L; off <- Seq(0L, 1L)) yield
        d2((x / sx + i) * sx + off * sx / 2, (y / sy + j) * sy + off * sy / 2)).min
      assert(chosen == best, s"event $id: candidate distance $chosen, true nearest $best")
      worst = math.max(worst, chosen)
    }
    // sanity: the partition is non-degenerate (points spread across
    // many hexes, max point-to-center distance below one hex diameter)
    assert(rows.length > 20 && worst < (sx * sx + sy * sy))
  }
}
