package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** d13 containment dedup — must catch the short-doc-quoted-in-long-doc
  * case that Jaccard structurally misses, and agree with direct
  * shingle-set arithmetic on the real corpus.
  */
class ContainmentSpec extends SparkTestBase {

  test("d13: catches a planted full-quote pair that d4's Jaccard threshold misses") {
    // doc 1 = 20 unique tokens; doc 2 = doc 1 verbatim + 200 more
    // unique tokens. Containment(1→2) = 1.0; Jaccard ≈ 18/218 < 0.2.
    val words1 = (0 until 20).map(i => s"alpha$i")
    val extra = (0 until 200).map(i => s"omega$i")
    val t1 = words1.mkString(" ")
    val t2 = (words1 ++ extra).mkString(" ")
    // decoys so posting lists/df caps see variety
    val decoys = (3L to 12L).map(i =>
      (i, (0 until 30).map(j => s"decoy${i}x$j").mkString(" ")))
    val rows = Seq((1L, t1), (2L, t2)) ++ decoys
    val dir = java.nio.file.Files.createTempDirectory("contain").toString
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val cont = Dedup.qDedupContainment(spark, dir).collect()
    assert(cont.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getDouble(5) >= 0.99), s"planted containment pair missed: ${cont.toSeq}")
    // d4 must NOT report it — that is the point of d13
    val jac = Dedup.qNgramJaccard(spark, dir).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      s"planted pair unexpectedly has Jaccard >= 0.2: ${jac.toSeq}")
  }

  test("d13: survivors verify against direct shingle-set arithmetic on the corpus") {
    val got = Dedup.qDedupContainment(spark, sfDir).collect()
    assert(got.nonEmpty, "corpus has near-dups; containment found none")
    // recompute each survivor's containment from raw shingle sets
    // (df-capped universe, like the query defines)
    val sh = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), expr("graft_shingle3(split(text, ' '))").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val df = sh.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val kept = sh.view.mapValues(_.filter(s => df(s) <= 50)).toMap
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val inter = (kept(a) intersect kept(b)).size
      val minN = math.min(kept(a).size, kept(b).size)
      assert(r.getLong(2) == inter, s"shared mismatch for ($a,$b): $r")
      assert(inter * 10 >= minN * 8, s"sub-threshold survivor ($a,$b): $r")
      val cont = BigDecimal(inter.toDouble / minN)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - cont) < 1e-9, s"ratio mismatch ($a,$b): $r")
    }
  }

  test("c47 percentiles: equals a type-7 reference recompute; selection stays bucket-bounded") {
    val df = graft.operators.AnalyticsExt.qPercentiles(spark, sfDir)
    val got = df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val raw = Tables(spark, sfDir, "orders")
      .select("o_orderpriority", "o_totalprice", "o_orderkey").collect()
      .groupBy(_.getString(0))
    raw.foreach { case (g, rows) =>
      val v = rows.sortBy(r => (r.getDouble(1), r.getLong(2)))
        .map(r => Math.round(r.getDouble(1) * 100)) // cents
      def q(k: Int): Double = {
        val h = (v.length - 1) * k
        val lo = v(h / 4); val hi = v(h / 4 + (if (h % 4 > 0) 1 else 0))
        (lo * (4 - h % 4) + hi * (h % 4)).toDouble / 400
      }
      val (n, p25, p50, p75) = got(g)
      assert(n == v.length.toLong)
      assert(p25 == q(1) && p50 == q(2) && p75 == q(3),
        s"group $g: got ($p25,$p50,$p75) want (${q(1)},${q(2)},${q(3)})")
      assert(p25 <= p50 && p50 <= p75)
    }
    // the row-selection window runs per (group, BUCKET) — never a
    // whole-group sort of the fact table
    val p = df.queryExecution.executedPlan.toString
    val winSpecs = "windowspecdefinition\\(o_orderpriority#\\d+, b#".r
    assert(winSpecs.findFirstIn(p).isDefined,
      s"selection window must partition by (group, bucket):\n$p")
  }
}
