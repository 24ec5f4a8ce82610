package graft

import graft.operators.CorpusClean
import org.apache.spark.sql.functions._

/** f46 Gopher rules / f47 C4 filters / d25 paragraph dedup. */
class CorpusCleanSpec extends SparkTestBase {

  test("f46 gopher rules: closed-form line counts match a rendered replay") {
    val rows = CorpusClean.qGopherRules(spark, sfDir).collect()
    assert(rows.length > 0)
    // replay the modular template literally per doc and compare counts
    rows.take(50).foreach { r =>
      val (docId, nLines) = (r.getAs[Long]("doc_id"), r.getAs[Long]("n_lines"))
      val mb = 1 + docId % 9
      val me = 3 + docId % 9
      val bullets = (0L until nLines).count(i => (docId * 31 + i) % mb == 0)
      val ell = (0L until nLines).count(i => (docId * 37 + i) % me == 2)
      assert(r.getAs[Long]("bullet_lines") == bullets, s"doc $docId bullets")
      assert(r.getAs[Long]("ellipsis_lines") == ell, s"doc $docId ellipsis")
    }
  }

  test("f46 gopher rules: every verdict is consistent with its stats") {
    CorpusClean.qGopherRules(spark, sfDir).collect().foreach { r =>
      val n = r.getAs[Long]("n_words")
      assert(r.getAs[Boolean]("r_wordcount") == (n >= 50 && n <= 100000))
      val pass = r.getAs[Boolean]("pass")
      val ff = r.getAs[String]("first_fail")
      assert(pass == (ff == "none"))
      // all-bullet docs (mb = 1) with >=10 lines must trip the 90% cap
      if (1 + r.getAs[Long]("doc_id") % 9 == 1 && r.getAs[Long]("n_lines") >= 10)
        assert(!r.getAs[Boolean]("r_bullet"))
    }
    // the corpus must exercise more than one failure class
    val fails = CorpusClean.qGopherRules(spark, sfDir)
      .groupBy("first_fail").count().collect().map(_.getString(0)).toSet
    assert(fails.contains("none") && fails.size >= 3, s"degenerate corpus: $fails")
  }

  test("f47 c4 filters: kept accounting is internally consistent") {
    val rows = CorpusClean.qC4Filters(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_lines") + r.getAs[Long]("dropped_lines")
        == r.getAs[Long]("n_lines"))
      assert(r.getAs[Long]("kept_words") >= 0)
      if (r.getAs[Boolean]("doc_kept")) {
        assert(r.getAs[Long]("kept_lines") >= 3)
        assert(!r.getAs[Boolean]("has_lorem"))
      }
      // every kept line carries >=5 words and >=9 rendered chars
      if (r.getAs[Long]("kept_lines") > 0)
        assert(r.getAs[Long]("kept_chars") > r.getAs[Long]("kept_words"))
    }
    // both drop reasons must fire somewhere
    assert(rows.exists(r => r.getAs[Boolean]("has_lorem")))
    assert(rows.exists(r => r.getAs[Long]("dropped_lines") > 0))
    assert(rows.exists(r => !r.getAs[Boolean]("doc_kept")))
  }

  test("d25 paragraph dedup: keep-first is corpus-wide and exactly-once") {
    val rows = CorpusClean.qDedupParagraph(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_para") + r.getAs[Long]("dropped_para")
        == r.getAs[Long]("n_para"))
    }
    // the planted boilerplate class guarantees cross-doc duplicates
    assert(rows.map(_.getAs[Long]("dropped_para")).sum > 0)
    // each of the three boilerplate variants is kept exactly once
    // corpus-wide: total kept = distinct paragraph keys
    val totalKept = rows.map(_.getAs[Long]("kept_para")).sum
    val distinctKeys = {
      import spark.implicits._
      val d = Tables(spark, sfDir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"),
          expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_words"))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, (n_words + 15) div 16 - 1), idx ->
               CASE WHEN (doc_id * 7 + idx) % 13 = 0
                 THEN concat('boilerplate footer v', CAST(idx % 3 AS STRING))
                 ELSE array_join(slice(w, CAST(idx * 16 + 1 AS INT), 16), ' ') END)"""))
          .as("content"))
      d.select("content").distinct().count()
    }
    assert(totalKept == distinctKeys)
  }

  test("f48 ccnet buckets: per-language terciles cover all docs, head<=middle<=tail") {
    val rows = CorpusClean.qCcnetBuckets(spark, sfDir).collect()
    val langs = rows.map(_.getAs[String]("lang")).toSet
    assert(langs.size >= 3)
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs == Tables(spark, sfDir, "documents").count())
    langs.foreach { l =>
      val byBucket = rows.filter(_.getAs[String]("lang") == l)
        .map(r => r.getAs[String]("bucket") ->
          (r.getAs[Long]("ce_lo"), r.getAs[Long]("ce_hi"), r.getAs[Long]("n_docs"))).toMap
      // every language splits into all three buckets
      assert(byBucket.keySet == Set("head", "middle", "tail"), s"$l: ${byBucket.keySet}")
      // value ranges are disjoint and ordered head < middle < tail
      assert(byBucket("head")._2 < byBucket("middle")._1, s"$l head/middle overlap")
      assert(byBucket("middle")._2 < byBucket("tail")._1, s"$l middle/tail overlap")
      // tercile balance: head holds >= 1/4 and <= 1/2 of the language's
      // docs (value-threshold semantics round at boundaries, never wildly)
      val n = byBucket.values.map(_._3).sum
      val h = byBucket("head")._3
      assert(4 * h >= n && 2 * h <= n + 2, s"$l head share $h/$n")
    }
  }

  test("d26 cross-source matrix: pairs ordered, overlap replayed for one pair") {
    import org.apache.spark.sql.functions._
    val rows = CorpusClean.qDedupCrossSource(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 190) // C(20,2)
    rows.foreach { r =>
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      assert(r.getAs[Long]("shared_keys") >= 1)
      val ppm = r.getAs[Long]("overlap_ppm")
      assert(ppm > 0 && ppm < 1000000L)
    }
    // brute replay of one pair's shared-key count off the shared builder
    val (sa, sb) = (rows.head.getAs[String]("src_a"), rows.head.getAs[String]("src_b"))
    val d = Tables(spark, sfDir, "documents")
    def keys(src: String): Set[String] =
      CorpusClean.paragraphOccurrences(
        d.filter(col("source") === src).select(col("doc_id"), col("text")))
        .select("h").collect().map(_.getString(0)).toSet
    val shared = (keys(sa) intersect keys(sb)).size.toLong
    assert(rows.head.getAs[Long]("shared_keys") == shared)
  }

  test("d27 split leakage: group scheme never leaks same-source, naive does") {
    val rows = CorpusClean.qSplitLeakage(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 4) // (scheme, split) pairs that exist
    rows.foreach { r =>
      assert(r.getAs[Long]("leaked_para") <= r.getAs[Long]("n_para"))
      assert(r.getAs[Long]("leaked_keys") <= r.getAs[Long]("leaked_para"))
      assert(r.getAs[Long]("leaked_same_src") <= r.getAs[Long]("leaked_para"))
      // the group split's guarantee, measured: zero same-source leakage
      if (r.getAs[String]("scheme") == "group")
        assert(r.getAs[Long]("leaked_same_src") == 0L, r.toString)
    }
    // the naive doc-hash split DOES leak same-source boilerplate
    assert(rows.filter(_.getAs[String]("scheme") == "naive")
      .map(_.getAs[Long]("leaked_same_src")).sum > 0)
    // boilerplate leaks under both schemes (cross-source)
    assert(rows.forall(_.getAs[Long]("leaked_para") > 0))
  }

  test("f49 data card: per-source rollup agrees with the family verdicts") {
    val cards = CorpusClean.qDataCard(spark, sfDir).collect()
    assert(cards.length >= 10)
    assert(cards.map(_.getAs[Long]("docs")).sum
      == Tables(spark, sfDir, "documents").count())
    cards.foreach { r =>
      Seq("gopher_pass_ppm", "c4_keep_ppm", "para_dup_ppm").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0 && v <= 1000000L, s"$c=$v")
      }
      assert(r.getAs[Long]("langs") >= 1)
    }
    // replay one source's gopher pass rate from the registered operator
    import org.apache.spark.sql.functions._
    val src = cards.head.getAs[String]("source")
    val docsOfSrc = Tables(spark, sfDir, "documents")
      .filter(col("source") === src).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val passes = CorpusClean.qGopherRules(spark, sfDir).collect()
      .filter(r => docsOfSrc.contains(r.getAs[Long]("doc_id")))
      .count(_.getAs[Boolean]("pass"))
    assert(cards.head.getAs[Long]("gopher_pass_ppm")
      == passes.toLong * 1000000L / docsOfSrc.size)
  }

  test("cntMod closed form equals brute force across the parameter lattice") {
    // evaluate the EXACT expression string the operator uses, in one plan
    import spark.implicits._
    val cases = for {
      a <- 0L to 40L; m <- 1L to 12L; r <- 0L until m; n <- Seq(0L, 1L, 2L, 5L, 17L, 40L)
    } yield (a, r, m, n)
    val got = cases.toDF("a", "r", "m", "n")
      .selectExpr("a", "r", "m", "n",
        s"${operators.CorpusClean.cntMod("a", "r", "m", "n")} AS cnt")
      .collect()
    got.foreach { row =>
      val (a, r, m, n) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      val brute = (0L until n).count(i => (a + i) % m == r)
      assert(row.getAs[Long]("cnt") == brute, s"a=$a r=$r m=$m n=$n")
    }
  }

  test("f46/f47 are map-only: no exchange before the output sort") {
    Seq(CorpusClean.qGopherRules(spark, sfDir), CorpusClean.qC4Filters(spark, sfDir))
      .foreach { df =>
        val plan = df.queryExecution.optimizedPlan.toString()
        assert(!plan.contains("Join"), "unexpected join")
        val physical = df.queryExecution.executedPlan.toString()
        // exactly the one exchange the global output sort needs
        val exchanges = "Exchange".r.findAllIn(physical).length
        assert(exchanges <= 2, s"too many exchanges:\n$physical")
        assert(!physical.contains("Generate"), "unexpected explode")
      }
  }
}
