package graft

/** r16 (VERDICT r15 #4) — pins c87 `q_survival`'s hazard grid with a
  * DATA-MARGIN argument instead of bare libm faith. The hazard is
  * `round(ln(n)·10⁶) AS BIGINT` for n in the realized risk sets
  * ({n_risk} ∪ {max(n_risk − deaths, 1)} over death-time rows) — the
  * only transcendental in the repo feeding a hashed integer SUM. It
  * is exact across engines iff every realized `ln(n)·10⁶` sits far
  * enough from a half-integer that a cross-libm skew (≤ a few ulps of
  * ln(n) ≈ 1e-10 in micro-units) cannot flip the round. This spec
  * asserts the realized minimum distance stays above a 1e-3 safety
  * floor — six orders above worst-case skew — at EVERY scale the
  * driver touches (sf0.001 tests, sf0.01 correctness gate, sf0.1
  * bench), and re-derives each value under BOTH JVM libms
  * (Math.log = platform-optimized, StrictMath.log = fdlibm reference
  * — the two ends of the implementation spread) demanding identical
  * rounded micro-nats. A regenerated events table that lands a risk
  * count near a half-boundary fails HERE, one round before it would
  * fail in the driver's hash. QuantizationAuditSpec's transcendental
  * sweep names this spec as the margin evidence for c87's sites.
  */
class HazardMarginSpec extends SparkTestBase {

  private val SafetyFloorMicro = 1e-3

  private def marginOf(x: Double): Double = {
    // distance of x to the nearest half-integer (the round() cliff)
    val f = x - math.floor(x)
    math.abs(f - 0.5)
  }

  test("c87: realized ln inputs clear the half-integer cliff under both libms, all driver scales") {
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1").filter(d => new java.io.File(d).exists())
    assert(dirs.nonEmpty, "no testdata scales present")
    dirs.foreach { dir =>
      val rows = operators.AnalyticsTs.qSurvival(spark, dir).collect()
      assert(rows.nonEmpty, s"$dir: survival table empty")
      val lnInputs = rows.flatMap { r =>
        val nRisk = r.getAs[Long]("n_risk")
        val d = r.getAs[Long]("deaths")
        Seq(nRisk, math.max(nRisk - d, 1L))
      }.distinct.sorted
      val worst = lnInputs.map { n =>
        val xFast = math.log(n.toDouble) * 1e6
        val xRef = StrictMath.log(n.toDouble) * 1e6
        assert(math.round(xFast) == math.round(xRef),
          s"$dir: libms disagree on round(ln($n)*1e6): $xFast vs $xRef")
        (n, math.min(marginOf(xFast), marginOf(xRef)))
      }.minBy(_._2)
      assert(worst._2 > SafetyFloorMicro,
        s"$dir: ln(${worst._1})*1e6 sits ${worst._2} micro from a " +
          s"half-integer (floor $SafetyFloorMicro) — the c87 hazard grid " +
          "is one libm ulp from a driver hash flip; restate the hazard " +
          "exactly or re-plant the corpus")
    }
  }
}
