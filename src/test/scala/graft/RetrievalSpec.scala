package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Retrieval}

/** f22 hybrid RRF, f23 weighted sampling, e15 nDCG — engine-side
  * invariants + plan properties; oracle gating runs driver-side.
  */
class RetrievalSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("f22 RRF: integer fusion scores recompute from the ranks; both-run docs dominate") {
    val df = Retrieval.qHybridRrf(spark, sfDir)
    // each run's top-k cut must be a bounded TakeOrderedAndProject,
    // not a global sort of the corpus
    assert("TakeOrderedAndProject".r.findAllIn(plan(df)).size >= 2,
      s"run cuts must be bounded top-k:\n${plan(df)}")
    val rows = df.collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val lex = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val den = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(lex.isDefined || den.isDefined, s"fused doc in neither run: $r")
      val want = lex.map(k => 1000000000L / (60 + k)).getOrElse(0L) +
        den.map(k => 1000000000L / (60 + k)).getOrElse(0L)
      assert(r.getLong(3) == want, s"rrf_micro mismatch: $r want $want")
    }
    // scores are presented descending
    val s = rows.map(_.getLong(3)).toSeq
    assert(s == s.sorted.reverse)
    // a doc present in BOTH runs beats any doc whose best evidence is
    // a single run at equal-or-worse ranks — the point of fusion
    val both = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = rows.filter(r => r.isNullAt(1) || r.isNullAt(2))
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_.getLong(3)).min > 0 &&
        both.map(_.getLong(3)).max >= single.map(_.getLong(3)).max,
        "fusion failed to privilege cross-run agreement")
  }

  test("f23 weighted sample: E-S priorities exact, per-stratum k, reproducible") {
    val df = Retrieval.qWeightedSample(spark, sfDir)
    val rows = df.collect()
    // per-lang: exactly min(25, |lang|) rows, ranks dense from 1
    val byLang = rows.groupBy(_.getString(0))
    val langN = Tables(spark, sfDir, "documents").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (l, rs) =>
      assert(rs.length == math.min(25L, langN(l)), s"lang $l wrong k")
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
    }
    // priorities recompute exactly from the doc_id ticket + weight
    rows.foreach { r =>
      val docId = r.getLong(2); val w = r.getLong(3)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      val t = Integer.parseInt(hex, 16)
      val negln = Math.round(-Math.log((t + 1) / 65536.0) * 1e6)
      val want = Math.floorDiv(negln * 1000000000L, w)
      assert(r.getLong(4) == want, s"priority mismatch for doc $docId: $r want $want")
    }
    // reproducible: a second evaluation admits the identical sample
    val again = Retrieval.qWeightedSample(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // the selection is one lang-keyed shuffle with a group-limit cut,
    // map-only before it
    val p = plan(df)
    assert(p.contains("WindowGroupLimit"),
      s"per-stratum top-k must plan as WindowGroupLimit:\n$p")
  }

  test("f23 weighted sample: weight actually biases admission toward longer docs") {
    // per lang, compare mean n_chars of the sample vs the stratum
    // mean: with w = n_chars the E-S inclusion probability increases
    // in w, so the sampled mean should exceed the stratum mean for
    // most strata (allow one inversion — k=25 of ~80 is noisy)
    val sample = Retrieval.qWeightedSample(spark, sfDir)
      .groupBy("lang").agg(avg(col("n_chars")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val corpus = Tables(spark, sfDir, "documents")
      .groupBy("lang").agg(avg(col("n_chars")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val wins = corpus.keys.count(l => sample(l) > corpus(l))
    assert(wins >= corpus.size - 1,
      s"length-weighting shows no bias: sample=$sample corpus=$corpus")
  }

  test("e15 nDCG: discounts monotone, bounds hold, value matches a hand recompute") {
    // literal discount table: strictly decreasing, disc(1)=1e6
    val d = Retrieval.discMicro
    assert(d.head == 1000000L && d == d.sorted.reverse && d.distinct == d)
    val row = Retrieval.qNdcgEval(spark, sfDir).collect()(0)
    val (nRanked, nHits, dcg, idcg, ndcg) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getDouble(4))
    assert(nRanked <= 10 && nHits <= nRanked)
    assert(dcg >= 0 && dcg <= idcg, s"DCG out of bounds: $row")
    assert(ndcg >= 0.0 && ndcg <= 1.0)
    // recompute from the two runs directly
    val e = Tables(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val brute = e.crossJoin(broadcast(q))
      .select(col("vec_id"), expr(Ann.cosineSpark("embedding", "qv")).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0))
    val rel = brute.zipWithIndex.map { case (v, i) => v -> (10L - i) }.toMap
    val bucketed = e.withColumn("bucket", expr(Ann.bucketSpark))
    val qb = bucketed.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("bucket").as("qbucket"))
    val lsh = bucketed.join(broadcast(qb), col("bucket") === col("qbucket"))
      .select(col("vec_id"), expr(Ann.cosineSpark("embedding", "qv")).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0))
    val wantDcg = lsh.zipWithIndex.map { case (v, i) =>
      rel.getOrElse(v, 0L) * d(i)
    }.sum
    assert(dcg == wantDcg, s"DCG recompute mismatch: got $dcg want $wantDcg")
    // LSH finds the query itself (cos 1.0 at pos 1, rel 10) — nDCG
    // can't be zero on this corpus
    assert(nHits >= 1 && ndcg > 0.0)
  }
}
