package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

/** e16 — the integer power iteration must converge to the true top
  * principal component: gated against an unconstrained double-precision
  * power method on the same gramian.
  */
class PcaSpec extends SparkTestBase {

  test("e16 integer power iteration aligns with the double-precision top eigenvector") {
    val vecs = Tables(spark, sfDir, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = Pca.dim
    // the same quantization the operator applies
    val g = Array.ofDim[Double](d * d)
    vecs.foreach { v =>
      val q = v.map(x => math.round(
        new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
          .doubleValue * 1e6).toDouble)
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { g(i * d + j) += q(i) * q(j); j += 1 }
        i += 1
      }
    }
    var w = Array.fill(d)(1.0)
    (1 to 200).foreach { _ =>
      val u = Array.tabulate(d) { i =>
        (0 until d).map(j => g(i * d + j) * w(j)).sum
      }
      val n = math.sqrt(u.map(x => x * x).sum)
      w = u.map(_ / n)
    }
    val got = Pca.qPcaPower(spark, sfDir).orderBy("dim")
      .collect().map(_.getLong(1).toDouble)
    val dot = got.zip(w).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) /
      (math.sqrt(got.map(x => x * x).sum) * math.sqrt(w.map(x => x * x).sum))
    assert(cos > 0.999, s"integer iteration misaligned: |cos| = $cos")
  }

  test("e16 power iteration recovers a known dominant axis exactly") {
    // diag-dominant 3x3 toy gramian: top eigenvector is e1-aligned
    val d = 3
    val g = Array[Long](
      1000000000L, 0L, 0L,
      0L, 1000000L, 0L,
      0L, 0L, 1000L)
    val w = Pca.powerIterate(g, d, 8)
    // rescale truncation keeps the dominant axis within 1e-5 of full
    // scale and crushes the others to zero
    assert(w(0) > 990000L && w(1) == 0L && w(2) == 0L, w.toSeq.toString)
  }
}
