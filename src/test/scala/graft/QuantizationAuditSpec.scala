package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tripwire for the round()-on-derived-double class that made e27
  * `q_kmeans_converge` driver-red for two consecutive rounds while
  * staying bit-identical on local re-runs: `round(<double division of
  * an aggregate>)` RE-QUANTIZED to a DECIMAL grid and fed back into
  * arithmetic. DuckDB's round/CAST-to-decimal on doubles is
  * version-sensitive at half boundaries where Spark's BigDecimal
  * HALF_UP is not — one ulp of divergence in a re-consumed centroid
  * lands in every downstream sum. The house rule: derived-value
  * quantization must be integer micro-units with a positive-shifted
  * floor division (e21/e29's discipline; e27 since round 15);
  * `round(...)` on a derived double is allowed ONLY as a final
  * PRESENTATION column (kept DOUBLE, never cast back to DECIMAL) —
  * those are the seven matches this scan leaves alone (f27 novelty,
  * d9 recall, e11 means, e17 mean, e15 ndcg). Before the round-15 fix
  * this spec named Ann.scala's two `CAST(round(CAST(SUM(qv) AS
  * DOUBLE) / COUNT(*), 6) AS DECIMAL(8,6))` centroid sites. */
class QuantizationAuditSpec extends AnyFunSuite {

  private def scalaSources(root: java.io.File): Seq[java.io.File] = {
    val (dirs, files) =
      Option(root.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
        .partition(_.isDirectory)
    files.filter(_.getName.endsWith(".scala")) ++ dirs.flatMap(scalaSources)
  }

  test("no chain re-quantizes a rounded derived aggregate to a decimal grid") {
    val rx = """round\s*\(\s*CAST\s*\(\s*(SUM|AVG|COUNT)""".r
    val offenders = for {
      f <- scalaSources(new java.io.File("src/main/scala"))
      src = {
        val raw = new String(
          java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        raw.replaceAll("\\s+", " ")
      }
      m <- rx.findAllMatchIn(src)
      // a presentation round ends `…, 6) AS <alias>` and stays DOUBLE;
      // the banned class re-casts the rounded value to a decimal grid
      // within the same expression (the window covers the longest
      // legitimate round call plus its cast)
      tail = src.substring(m.start, math.min(src.length, m.start + 170))
      if tail.contains("AS DECIMAL")
    } yield s"${f.getPath}: ${tail.take(100)}…"
    assert(offenders.isEmpty,
      s"derived-double re-quantization (the e27 driver-red class) — restate " +
        s"in integer micro-units with a positive-shifted floor division:\n" +
        offenders.mkString("\n"))
  }

  /** r16 (VERDICT r15 #4): the sibling class the first regex cannot
    * see — a TRANSCENDENTAL (`ln`/`sqrt`/`exp`/`pow`) rounded into a
    * hashed BIGINT (`CAST(round(ln(…)·1e6) AS BIGINT)`, c87's hazard
    * shape). These ride cross-engine LIBM agreement: safe only while
    * the realized arguments keep the rounded value far from a
    * half-integer (a ~1e-9-micro libm skew flips the hash exactly
    * like e27). The existing sites are the micro-nat family (f31's
    * ln-of-exact-integer convention, whose small-integer/ratio
    * arguments sit generically ~0.5 from half-boundaries) and c87's
    * hazard — the only one feeding a hashed integer SUM, now pinned
    * by HazardMarginSpec's realized-data margins. The per-file counts
    * below are the whitelist: a NEW transcendental-to-BIGINT site
    * anywhere (or an addition to a whitelisted file) trips this test
    * until its margin argument is recorded here or spec'd like c87. */
  test("no NEW transcendental-to-BIGINT feed outside the margin-argued whitelist") {
    val rx = """round\s*\(\s*-?\s*(ln|log2|log10|log|sqrt|exp|pow)\s*\(""".r
    val allowed = Map( // file -> audited site count (Spark + oracle SQL)
      "AnalyticsExt.scala" -> 8, // c83 elasticity / c81 basket-sig micro-nat lns of exact integer sums
      "AnalyticsTs.scala" -> 12, // c76 entropy, c66 ab_test, c57 anomaly + c87 hazard (HazardMarginSpec)
      "CorpusClean.scala" -> 2, // f48 ccnet LM-score micro-nats (ln of integer-count ratio)
      "Retrieval.scala" -> 2, // f23 weighted-sample Gumbel keys (ln of md5-ticket ratio)
      "TextModels.scala" -> 6, // f25/f26 naive-Bayes/DSIR log-odds (ln of integer-count ratios)
      "TextOps.scala" -> 21) // f11 bm25, f18 perplexity, f20 tfidf, f31 pmi, f39 temperature (micro-nat family)
    val counts = (for {
      f <- scalaSources(new java.io.File("src/main/scala"))
      src = {
        val raw = new String(
          java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        raw.replaceAll("\\s+", " ")
      }
      m <- rx.findAllMatchIn(src)
      tail = src.substring(m.start, math.min(src.length, m.start + 220))
      if tail.contains("AS BIGINT")
    } yield f.getName).groupBy(identity).view.mapValues(_.size).toMap
    val drift = (counts.keySet ++ allowed.keySet).toSeq.sorted.flatMap { f =>
      val (got, want) = (counts.getOrElse(f, 0), allowed.getOrElse(f, 0))
      if (got > want) Some(s"$f: $got transcendental-to-BIGINT sites, whitelist $want")
      else None
    }
    assert(drift.isEmpty,
      "new round(<transcendental>)->BIGINT feed (c87's libm-agreement class) — " +
        "add a data-margin spec (HazardMarginSpec's shape) or restate exactly, " +
        "then record the site here:\n" + drift.mkString("\n"))
  }
}
