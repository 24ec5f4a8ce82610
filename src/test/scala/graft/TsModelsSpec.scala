package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnalyticsTs, TextModels}

/** c48-c50 (gap fill / retention / Markov) and f25/f26 (NB quality
  * classifier / DSIR): each distributed pipeline is matched against an
  * independent in-memory reference fold, and the model ops are
  * additionally proven to LEARN on planted separable corpora (the real
  * synthetic corpus has weak lang signal — chance-level accuracy there
  * is the data's property, not the operator's).
  */
class TsModelsSpec extends SparkTestBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def roundHalfUp(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue

  private def ticketOf(docId: Long): Int = {
    val h = md5hex(docId.toString)
    h.take(4).foldLeft(0)((a, c) => a * 16 + "0123456789abcdef".indexOf(c))
  }

  private lazy val events: Seq[(Long, Long, Long, String, Double)] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"), col("event_id"),
        col("event_type"), col("value"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  test("c48 gap fill matches the in-memory reference fold") {
    val views = events.filter(_._4 == "view")
      .map { case (u, ts, id, _, v) => (u, ts / 86400000L, ts, id, roundHalfUp(v * 100)) }
    val closing = views.groupBy(e => (e._1, e._2)).map { case ((u, d), es) =>
      (u, d) -> es.maxBy(e => (e._3, e._4))._5
    }
    val expected = views.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val d0 = es.map(_._2).min
      val d1 = es.map(_._2).max
      var lastV: Option[Long] = None
      var lastD: Option[Long] = None
      (d0 to d1).map { d =>
        val obs = closing.get((u, d))
        if (obs.isDefined) { lastV = obs; lastD = Some(d) }
        (u, d, lastV.get, if (obs.isDefined) 1 else 0, d - lastD.get)
      }
    }.sortBy(r => (r._1, r._2))
    val got = AnalyticsTs.qGapFill(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    assert(got == expected)
  }

  test("c48 gap fill: the fill windows reuse the grid join's user exchange") {
    val plan = AnalyticsTs.qGapFill(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the join line splits the tree: everything ABOVE it (the two
    // forward-fill windows + final sort) must add no hash exchange —
    // they ride the user_id partitioning the join already has.
    val joinAt = plan.linesIterator.indexWhere(l => l.contains("Join"))
    assert(joinAt > 0, s"no join found:\n$plan")
    val above = plan.linesIterator.take(joinAt).mkString("\n")
    assert(!above.contains("Exchange hashpartitioning"),
      s"forward-fill re-shuffles above the grid join:\n$plan")
  }

  test("c49 retention cohorts match the in-memory reference") {
    val act = events.map(e => (e._1, e._2 / 86400000L)).distinct
    val cohort = act.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val sizes = cohort.groupBy(_._2).map { case (d, us) => d -> us.size.toLong }
    val cells = act.groupBy(a => (cohort(a._1), a._2 - cohort(a._1)))
      .map { case (k, as) => k -> as.size.toLong }
    val expected = cells.toSeq.map { case ((cd, off), n) =>
      (cd, off, n, sizes(cd), n.toDouble / sizes(cd))
    }.sortBy(r => (r._1, r._2))
    val got = AnalyticsTs.qRetentionCohorts(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got == expected)
    // day-0 cell: every cohort member is active on its cohort day
    got.filter(_._2 == 0L).foreach { r => assert(r._3 == r._4) }
  }

  test("c50 Markov transitions match the in-memory reference") {
    val pairs = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3)).map(_._4)
      sorted.zip(sorted.drop(1))
    }
    val cnt = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val totals = cnt.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val expected = cnt.toSeq.map { case ((f, t), n) =>
      (f, t, n, totals(f), n.toDouble / totals(f))
    }.sortBy(r => (r._1, r._2))
    val got = AnalyticsTs.qNextEventMarkov(spark, sfDir).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got == expected)
    // each row of the matrix sums to ~1
    got.groupBy(_._1).values.foreach { rs =>
      assert(math.abs(rs.map(_._5).sum - 1.0) < 1e-9)
    }
  }

  test("c53 time-weighted average matches the in-memory reference") {
    val views = events.filter(_._4 == "view")
      .map { case (u, ts, id, _, v) => (u, ts, id, roundHalfUp(v * 100)) }
    val expected = views.groupBy(_._1).toSeq.map { case (u, vs) =>
      val s = vs.sortBy(e => (e._2, e._3))
      val span = s.last._2 - s.head._2
      val twa =
        if (span == 0) s.last._4.toDouble / 100
        else {
          val num = s.zip(s.drop(1)).map { case (a, b) => a._4 * (b._2 - a._2) }.sum
          num.toDouble / span / 100
        }
      (u, s.size.toLong, span, twa)
    }.sortBy(_._1)
    val got = AnalyticsTs.qTimeWeightedAvg(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got == expected)
    // a held high reading outweighs a blip: sanity on the semantics
    got.foreach { r => assert(!r._4.isNaN && r._4 >= 0) }
  }

  test("c56 per-entity trend matches the in-memory least-squares reference") {
    val views = events.filter(_._4 == "view")
      .map { case (u, ts, id, _, v) => (u, ts, roundHalfUp(v * 100)) }
    val expected = views.groupBy(_._1).toSeq.map { case (u, vs) =>
      val t0 = vs.map(_._2).min
      val xy = vs.map(e => ((e._2 - t0) / 1000L, e._3))
      val n = xy.size.toLong
      val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
      val sxy = xy.map(e => e._1 * e._2).sum
      val sxx = xy.map(e => e._1 * e._1).sum
      val syy = xy.map(e => e._2 * e._2).sum
      val covN = n * sxy - sx * sy
      val varxN = n * sxx - sx * sx
      val varyN = n * syy - sy * sy
      val slope = if (varxN > 0) Some(covN.toDouble / varxN) else None
      val icept = slope.map(s => sy.toDouble / n - s * (sx.toDouble / n))
      val r = if (varxN > 0 && varyN > 0)
        Some(covN.toDouble / math.sqrt(varxN.toDouble * varyN.toDouble)) else None
      (u, n, slope, icept, r)
    }.sortBy(_._1)
    val got = AnalyticsTs.qTrend(spark, sfDir).collect().toSeq.map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      (r.getLong(0), r.getLong(1), opt(2), opt(3), opt(4))
    }
    assert(got == expected)
    got.flatMap(_._5).foreach(r => assert(r >= -1.0 && r <= 1.0))
  }

  private lazy val docs: Seq[(Long, String, String)] =
    Tables(spark, sfDir, "documents").select("doc_id", "text", "lang")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("f25 NB classifier scores match the in-memory reference exactly") {
    val train = docs.filter(_._1 % 5 != 0)
    val toks = (t: String) => t.split(" ").filter(_.nonEmpty).toSeq
    var cp = Map.empty[String, Long].withDefaultValue(0L)
    var cn = Map.empty[String, Long].withDefaultValue(0L)
    var dp = 0L; var dn = 0L
    train.foreach { case (_, t, l) =>
      if (l == "en") { dp += 1; toks(t).foreach(x => cp += x -> (cp(x) + 1)) }
      else { dn += 1; toks(t).foreach(x => cn += x -> (cn(x) + 1)) }
    }
    val vocab = cp.keySet ++ cn.keySet
    val (np, nn, v) = (cp.values.sum, cn.values.sum, vocab.size.toLong)
    def w(tok: String): Long =
      if (vocab(tok))
        roundHalfUp((math.log((cp(tok) + 1) / (np + v).toDouble)
          - math.log((cn(tok) + 1) / (nn + v).toDouble)) * 1e6)
      else roundHalfUp((math.log(1.0 / (np + v)) - math.log(1.0 / (nn + v))) * 1e6)
    val prior = roundHalfUp(math.log(dp / dn.toDouble) * 1e6)
    val expected = docs.filter(_._1 % 5 == 0).map { case (id, t, l) =>
      val ts = toks(t)
      val s = ts.map(w).sum + prior
      (id, ts.size.toLong, ts.count(x => !vocab(x)).toLong, s, s > 0, l == "en")
    }.sortBy(_._1)
    val got = TextModels.qQualityClassifier(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5)))
    assert(got == expected)
  }

  test("f25 NB classifier learns a separable planted corpus") {
    import spark.implicits._
    // class A speaks {red, blue}, class B speaks {cat, dog}; a few
    // shared tokens keep the vocab overlapping.
    val train = (0 until 40).map { i =>
      val pos = i % 2
      val t = if (pos == 1) "red blue red shared" else "cat dog dog shared"
      (i.toLong, t, pos.toLong)
    }.toDF("doc_id", "text", "pos")
    val score = Seq(
      (100L, "red blue shared", true), (101L, "blue red red", true),
      (102L, "dog cat shared", false), (103L, "cat cat dog", false),
      (104L, "red blue unknowntoken", true)
    ).toDF("doc_id", "text", "actual")
    val got = TextModels.nbClassify(train, score).collect()
    assert(got.length == 5)
    got.foreach { r => assert(r.getBoolean(4) == r.getBoolean(5),
      s"misclassified doc ${r.getLong(0)}") }
  }

  test("f26 DSIR selection matches the in-memory reference exactly") {
    val bucket = (tok: String) => {
      val h = md5hex(tok)
      "0123456789abcdef".indexOf(h(0)) * 16 + "0123456789abcdef".indexOf(h(1))
    }
    val toks = (t: String) => t.split(" ").filter(_.nonEmpty).toSeq
    var ct = Map.empty[Int, Long].withDefaultValue(0L)
    var cpp = Map.empty[Int, Long].withDefaultValue(0L)
    docs.foreach { case (_, t, l) =>
      val bs = toks(t).map(bucket)
      if (l == "en") bs.foreach(b => ct += b -> (ct(b) + 1))
      else bs.foreach(b => cpp += b -> (cpp(b) + 1))
    }
    val (nt, npool) = (ct.values.sum, cpp.values.sum)
    def lam(b: Int): Long =
      roundHalfUp((math.log((ct(b) + 1) / (nt + 256).toDouble)
        - math.log((cpp(b) + 1) / (npool + 256).toDouble)) * 1e6)
    val pool = docs.filter(_._3 != "en")
    val scored = pool.map { case (id, t, l) =>
      val bs = toks(t).map(bucket)
      val wm = bs.map(lam).sum
      val g = roundHalfUp(-math.log(-math.log((ticketOf(id) + 1) / 65537.0)) * 1e6)
      (id, l, bs.size.toLong, wm, wm + g)
    }
    val expected = scored.sortBy(r => (-r._5, r._1)).take(50)
    val got = TextModels.qDsir(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got == expected)
    assert(!got.exists(_._2 == "en"))
    // the selection is importance-biased: selected docs look more like
    // the target LM than the pool average
    val poolMean = scored.map(_._4.toDouble).sum / scored.size
    val selMean = got.map(_._4.toDouble).sum / got.size
    assert(selMean > poolMean,
      s"selected mean weight $selMean not above pool mean $poolMean")
  }

  test("f26 DSIR prefers pool docs distributed like the target") {
    import spark.implicits._
    // target speaks {alpha, beta}; pool group X mimics it, group Y is
    // a different distribution entirely.
    val target = (0 until 30).map(i => (1000L + i, "t", s"alpha beta alpha", 1L))
    val likeTarget = (0 until 20).map(i => (2000L + i, "x", "alpha beta beta", 0L))
    val unlikeTarget = (0 until 20).map(i => (3000L + i, "y", "gamma delta gamma", 0L))
    val d = (target ++ likeTarget ++ unlikeTarget)
      .toDF("doc_id", "lang", "text", "is_t")
    val got = TextModels.dsirSelect(d, 10).collect()
    assert(got.length == 10)
    val xs = got.count(_.getString(1) == "x")
    assert(xs >= 8, s"expected the target-like group to dominate, got $xs/10")
  }

  test("c57 median/MAD anomaly detection matches the in-memory reference fold") {
    val views = events.filter(_._4 == "view")
      .map { case (u, _, id, _, v) => (u, id, roundHalfUp(v * 100)) }
    def lowerMedianBy(xs: Seq[(Long, Long)]): Long = {
      // xs = (sortValue, event_id); lower median = rank (n+1)/2 under
      // the total (value, event_id) order — exactly the query's rule
      val sorted = xs.sortBy(identity)
      sorted(((sorted.size + 1) / 2) - 1)._1
    }
    val expected = views.groupBy(_._1).toSeq.map { case (u, es) =>
      val med = lowerMedianBy(es.map(e => (e._3, e._2)))
      val devs = es.map(e => (math.abs(e._3 - med), e._2))
      val mad = lowerMedianBy(devs)
      val anom = devs.map(_._1).filter(_ > 3 * mad)
      (u, es.size.toLong, med, mad, anom.size.toLong,
        if (anom.isEmpty) None else Some(anom.max))
    }.sortBy(_._1)
    val got = AnalyticsTs.qAnomaly(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got == expected)
    // the corpus must actually exercise the rule: some user flags
    assert(expected.map(_._5).sum > 0, "no anomalies anywhere — vacuous corpus")
  }

  test("c58 last-touch attribution matches the in-memory reference fold") {
    val ks = Tables.events(spark, sfDir)
      .selectExpr("event_id", "CAST(get_json_object(props, '$.k') AS INT) AS k")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def channelOf(k: Int) = (k % 4) match {
      case 0 => "organic"; case 1 => "email"; case 2 => "social"; case _ => "ads"
    }
    val expected = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ordered = es.sortBy(e => (e._2, e._3))
      var lastClick: Option[(String, Long)] = None
      ordered.flatMap { case (_, ts, id, typ, v) =>
        val out = if (typ == "purchase") {
          val ch = lastClick match {
            case Some((c, cts)) if ts - cts <= 7L * 86400000L => c
            case _ => "direct"
          }
          Some((ch, roundHalfUp(v * 100)))
        } else None
        if (typ == "click") lastClick = Some((channelOf(ks(id)), ts))
        out
      }
    }.groupBy(_._1).map { case (c, g) => (c, g.length.toLong, g.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val got = AnalyticsTs.qAttribution(spark, sfDir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got == expected)
    // both the window rule and the fallback must actually fire
    assert(expected.exists(_._1 == "direct") && expected.exists(_._1 != "direct"),
      "corpus exercises only one attribution path — vacuous")
  }

  test("c59 rolling active users match the in-memory 7-day-window reference") {
    val activity = events.map { case (u, ts, _, _, _) => (u, ts / 86400000L) }.distinct
    val maxd = activity.map(_._2).max
    val expected = activity.flatMap { case (u, d) => (d to math.min(d + 6, maxd)).map(wd => (u, wd)) }
      .distinct.groupBy(_._2).toSeq.map { case (wd, g) =>
        val dau = activity.count(_._2 == wd).toLong
        (wd, dau, g.length.toLong)
      }.sortBy(_._1)
    val got = AnalyticsTs.qRollingActive(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == expected)
    assert(expected.forall { case (_, dau, mau) => mau >= dau },
      "a rolling window can never hold fewer users than its last day")
  }

  test("c61 CUSUM: the windowed closed form equals Page's recursion exactly") {
    val views = events.filter(_._4 == "view")
      .map { case (u, ts, id, _, v) => (u, ts, id, roundHalfUp(v * 100)) }
    def lowerMedian(xs: Seq[(Long, Long)]): Long = {
      val s = xs.sortBy(identity); s(((s.size + 1) / 2) - 1)._1
    }
    val expected = views.groupBy(_._1).toSeq.map { case (u, es) =>
      val med = lowerMedian(es.map(e => (e._4, e._3)))
      var s = 0L
      var maxS = 0L; var nOver = 0L; var firstAlarm: Option[Long] = None
      es.sortBy(e => (e._2, e._3)).foreach { e =>
        s = math.max(0L, s + (e._4 - med - 50L)) // Page's recursion
        maxS = math.max(maxS, s)
        if (s > 20000L) { nOver += 1; if (firstAlarm.isEmpty) firstAlarm = Some(e._2) }
      }
      (u, es.size.toLong, med, maxS, nOver, firstAlarm)
    }.sortBy(_._1)
    val got = AnalyticsTs.qCusum(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got == expected)
    // the corpus must exercise both regimes
    assert(expected.exists(_._5 > 0) && expected.exists(_._5 == 0),
      "corpus never (or always) alarms — vacuous")
  }

  test("f29 temperature mix upweights the tail and respects the budget") {
    val rows = operators.TextOps.qLangMix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(rows.length >= 2)
    assert(rows.map(_._4).sum <= 1000000L, "budget allocation must not exceed the budget")
    // α = 1/2 flattens RATIOS, not absolute shares: ordering by tokens
    // is preserved, and any pair's sampling ratio is the square root
    // of its token ratio — so the tail:head ratio strictly improves
    val byTok = rows.sortBy(_._2)
    assert(byTok.map(_._1).toSeq == rows.sortBy(_._3).map(_._1).toSeq,
      "temperature resampling must preserve the language ordering")
    val (tail, head) = (byTok.head, byTok.last)
    if (tail._2 < head._2) {
      val rawRatio = tail._2.toDouble / head._2
      val rateRatio = tail._3 / head._3
      assert(rateRatio > rawRatio + 1e-9 &&
          math.abs(rateRatio - math.sqrt(rawRatio)) < 1e-3,
        s"tail:head went $rawRatio -> $rateRatio, want ≈ sqrt = ${math.sqrt(rawRatio)}")
    }
  }
}
