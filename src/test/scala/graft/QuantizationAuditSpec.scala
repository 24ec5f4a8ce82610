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
}
