package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2 F/D — the published pretraining corpus-cleaning recipes the
  * text family was still missing, each over `documents`:
  *
  *  - f46 `q_gopher_rules`: the Gopher quality-filter rule suite
  *    (Rae et al. 2021, Appendix A — the public rule set C4's
  *    successors standardized on): word-count bounds, mean word
  *    length 3–10, symbol-to-word ratio, bullet-line and
  *    ellipsis-line caps, alphabetic-word fraction, stopword
  *    requirement. Per doc: every rule verdict + the first failing
  *    rule in published precedence.
  *  - f47 `q_c4_filters`: C4's line-level cleaning (Raffel et al.
  *    2020 §2.2): keep lines ending in terminal punctuation (an
  *    ellipsis is not terminal), ≥5 words, no `javascript`; drop
  *    whole docs with a lorem-ipsum marker or <3 surviving lines.
  *  - d25 `q_dedup_paragraph`: CCNet-style cross-corpus paragraph
  *    dedup (Wenzek et al. 2020): hash every paragraph, keep only
  *    the first occurrence corpus-wide (min (doc_id, idx)), report
  *    per-doc survival.
  *
  * The driver corpus is clean space-joined words, so document
  * STRUCTURE (lines, bullets, ellipses, boilerplate paragraphs) is
  * synthesized deterministically from (doc_id, ordinal) — the same
  * modular template stated identically in both engines (the Synth
  * discipline): line length `L = 8 + doc_id % 5` words; line i is a
  * bullet iff `(doc_id·31 + i) % (1 + doc_id % 9) = 0` (the mod-1
  * class makes all-bullet docs exist, so the 90 % cap genuinely
  * fires); the ending class `e = (doc_id·37 + i) % (3 + doc_id % 9)`
  * renders `…` when e=2 and no terminal punctuation when e=1 (mod-3
  * docs are ellipsis-heavy, so the 30 % cap fires); `javascript` is
  * injected when `(doc_id·13 + i) % 17 = 5`; paragraph idx is
  * boilerplate iff `(doc_id·7 + idx) % 13 = 0` (the cross-doc
  * duplicate surface — ~12 % of paragraphs collide corpus-wide).
  *
  * Scale shapes: f46 counts bullet/ellipsis lines in CLOSED FORM
  * (the count of `i < n` with `(a + i) % m = r` is one div — zero
  * per-line loops, zero Generate: the whole rule suite is map-only
  * scalar math per doc). f47 renders lines in one in-row
  * higher-order transform (bounded by lines-per-doc, no explode, no
  * shuffle before the output sort). d25 is the one genuine shuffle
  * op: explode paragraphs → ONE hash-keyed exchange (a min-window
  * over the 16-hex paragraph key — shuffling 16 bytes + one packed
  * long per paragraph) → one doc-keyed agg; at 100 TB the dedup
  * relation is the paragraph stream itself, which no engine can
  * avoid materializing once.
  *
  * Reference anchor: the reference ingests user uploads wholesale
  * (ingest.py's per-file pipeline has no content filtering); these
  * are the corpus-hygiene counterparts a training-data lake adds on
  * top — kept to public recipes (Gopher/C4/CCNet) exactly so the
  * oracle can replay them.
  */
object CorpusClean {

  // ------------------------------------------------------------------
  // shared modular render template (both engines state these literally)
  // ------------------------------------------------------------------
  // L  = words per line            = 8 + doc_id % 5
  // mb = bullet modulus            = 1 + doc_id % 9   (bullet iff (doc_id*31+i) % mb = 0)
  // me = ending modulus            = 3 + doc_id % 9   (e = (doc_id*37+i) % me: 2 → '...', 1 → '', else '.')
  // js injected iff (doc_id*13+i) % 17 = 5
  // paragraph boilerplate iff (doc_id*7+idx) % 13 = 0

  /** closed-form count of i in [0, n) with (a + i) % m = r (m, r
    * non-negative integer expressions; a any non-negative integer
    * expression). First hit i0 = ((r - a % m) + m) % m, then every m. */
  private def cntMod(a: String, r: String, m: String, n: String): String =
    s"CASE WHEN ((($r) - ($a) % ($m)) + ($m)) % ($m) < ($n)" +
      s" THEN (($n) - 1 - ((($r) - ($a) % ($m)) + ($m)) % ($m)) div ($m) + 1 ELSE 0 END"

  private def cntModDuck(a: String, r: String, m: String, n: String): String =
    s"CASE WHEN ((($r) - ($a) % ($m)) + ($m)) % ($m) < ($n)" +
      s" THEN (($n) - 1 - ((($r) - ($a) % ($m)) + ($m)) % ($m)) // ($m) + 1 ELSE 0 END"

  private val stopSet = Seq("the", "a", "of", "and", "to")

  // ------------------------------------------------------------------
  // f46 — Gopher quality-filter rule suite
  // ------------------------------------------------------------------

  /** f46 — `q_gopher_rules`: the Gopher repetition-free quality rules
    * per document, with the first failing rule in published
    * precedence. Entirely map-only: the line-structure counts are
    * closed-form modular arithmetic (no render, no explode), the word
    * stats are one pass over the token array. */
  def qGopherRules(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.fanout(
      Tables(spark, dir, "documents").select(col("doc_id"), col("text")))
    val stopHits = stopSet
      .map(w => s"CAST(array_contains(split(text, ' '), '$w') AS BIGINT)")
      .mkString(" + ")
    d.withColumn("n_words", expr("CAST(size(split(text, ' ')) AS BIGINT)"))
      .withColumn("chars_ns", expr("CAST(length(replace(text, ' ', '')) AS BIGINT)"))
      .withColumn("l_len", expr("CAST(8 + doc_id % 5 AS BIGINT)"))
      .withColumn("mb", expr("CAST(1 + doc_id % 9 AS BIGINT)"))
      .withColumn("me", expr("CAST(3 + doc_id % 9 AS BIGINT)"))
      .withColumn("alpha_words",
        expr("CAST(size(filter(split(text, ' '), w -> w rlike '[a-z]')) AS BIGINT)"))
      .withColumn("stop_hits", expr(stopHits))
      .withColumn("n_lines", expr("(n_words + l_len - 1) div l_len"))
      .withColumn("bullet_lines",
        expr(cntMod("doc_id * 31", "0", "mb", "n_lines")))
      .withColumn("ellipsis_lines",
        expr(cntMod("doc_id * 37", "2", "me", "n_lines")))
      .withColumn("r_wordcount", expr("n_words >= 50 AND n_words <= 100000"))
      .withColumn("r_meanlen", expr("3 * n_words <= chars_ns AND chars_ns <= 10 * n_words"))
      .withColumn("r_symbol", expr("10 * ellipsis_lines <= n_words"))
      .withColumn("r_bullet", expr("10 * bullet_lines <= 9 * n_lines"))
      .withColumn("r_ellipsis", expr("10 * ellipsis_lines <= 3 * n_lines"))
      .withColumn("r_alpha", expr("5 * alpha_words >= 4 * n_words"))
      .withColumn("r_stop", expr("stop_hits >= 2"))
      .withColumn("pass",
        expr("r_wordcount AND r_meanlen AND r_symbol AND r_bullet AND r_ellipsis AND r_alpha AND r_stop"))
      .withColumn("first_fail", expr(
        """CASE WHEN NOT r_wordcount THEN 'wordcount' WHEN NOT r_meanlen THEN 'meanlen'
                WHEN NOT r_symbol THEN 'symbol' WHEN NOT r_bullet THEN 'bullet'
                WHEN NOT r_ellipsis THEN 'ellipsis' WHEN NOT r_alpha THEN 'alpha'
                WHEN NOT r_stop THEN 'stop' ELSE 'none' END"""))
      .select("doc_id", "n_words", "n_lines", "bullet_lines", "ellipsis_lines",
        "stop_hits", "alpha_words", "r_wordcount", "r_meanlen", "r_symbol",
        "r_bullet", "r_ellipsis", "r_alpha", "r_stop", "pass", "first_fail")
      .orderBy("doc_id")
  }

  val qGopherRulesSql: String = {
    val stopHits = stopSet
      .map(w => s"CAST(list_contains(string_split(text, ' '), '$w') AS BIGINT)")
      .mkString(" + ")
    s"""WITH base AS (
        SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
          CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars_ns,
          CAST(8 + doc_id % 5 AS BIGINT) AS l_len,
          CAST(1 + doc_id % 9 AS BIGINT) AS mb,
          CAST(3 + doc_id % 9 AS BIGINT) AS me,
          CAST(len(list_filter(string_split(text, ' '), w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS alpha_words,
          ($stopHits) AS stop_hits
        FROM documents),
      dims AS (SELECT *, (n_words + l_len - 1) // l_len AS n_lines FROM base),
      cnt AS (
        SELECT *,
          ${cntModDuck("doc_id * 31", "0", "mb", "n_lines")} AS bullet_lines,
          ${cntModDuck("doc_id * 37", "2", "me", "n_lines")} AS ellipsis_lines
        FROM dims),
      r AS (
        SELECT *,
          n_words >= 50 AND n_words <= 100000 AS r_wordcount,
          3 * n_words <= chars_ns AND chars_ns <= 10 * n_words AS r_meanlen,
          10 * ellipsis_lines <= n_words AS r_symbol,
          10 * bullet_lines <= 9 * n_lines AS r_bullet,
          10 * ellipsis_lines <= 3 * n_lines AS r_ellipsis,
          5 * alpha_words >= 4 * n_words AS r_alpha,
          stop_hits >= 2 AS r_stop
        FROM cnt)
      SELECT doc_id, n_words, n_lines, bullet_lines, ellipsis_lines, stop_hits,
        alpha_words, r_wordcount, r_meanlen, r_symbol, r_bullet, r_ellipsis,
        r_alpha, r_stop,
        r_wordcount AND r_meanlen AND r_symbol AND r_bullet AND r_ellipsis AND r_alpha AND r_stop AS pass,
        CASE WHEN NOT r_wordcount THEN 'wordcount' WHEN NOT r_meanlen THEN 'meanlen'
             WHEN NOT r_symbol THEN 'symbol' WHEN NOT r_bullet THEN 'bullet'
             WHEN NOT r_ellipsis THEN 'ellipsis' WHEN NOT r_alpha THEN 'alpha'
             WHEN NOT r_stop THEN 'stop' ELSE 'none' END AS first_fail
      FROM r ORDER BY doc_id"""
  }

  // ------------------------------------------------------------------
  // f47 — C4 line-level cleaning
  // ------------------------------------------------------------------

  /** f47 — `q_c4_filters`: render each document's lines under the
    * shared modular template, keep lines C4-style (terminal '.', not
    * an ellipsis, ≥5 words, no `javascript`), then the doc-level
    * policy (≥3 surviving lines, no lorem-ipsum marker). One in-row
    * transform per doc — no explode, no shuffle before the sort. */
  def qC4Filters(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.fanout(
      Tables(spark, dir, "documents").select(col("doc_id"), col("text")))
    d.withColumn("w", expr("split(text, ' ')"))
      .withColumn("n_words", expr("CAST(size(w) AS BIGINT)"))
      .withColumn("l_len", expr("CAST(8 + doc_id % 5 AS BIGINT)"))
      .withColumn("mb", expr("CAST(1 + doc_id % 9 AS BIGINT)"))
      .withColumn("me", expr("CAST(3 + doc_id % 9 AS BIGINT)"))
      .withColumn("n_lines", expr("(n_words + l_len - 1) div l_len"))
      .withColumn("ls", expr(
        """transform(sequence(0, n_lines - 1), i -> named_struct(
             'lw', IF(i < n_lines - 1, l_len, n_words - i * l_len),
             'line', concat(
               IF((doc_id * 31 + i) % mb = 0, '- ', ''),
               array_join(slice(w, CAST(i * l_len + 1 AS INT), CAST(l_len AS INT)), ' '),
               IF((doc_id * 13 + i) % 17 = 5, ' javascript', ''),
               CASE (doc_id * 37 + i) % me WHEN 2 THEN '...' WHEN 1 THEN '' ELSE '.' END)))"""))
      .withColumn("kept", expr(
        """filter(ls, s -> right(s.line, 1) = '.' AND right(s.line, 3) <> '...'
             AND NOT contains(s.line, 'javascript') AND s.lw >= 5)"""))
      .select(col("doc_id"), col("n_lines"),
        expr("CAST(size(kept) AS BIGINT)").as("kept_lines"),
        expr("n_lines - CAST(size(kept) AS BIGINT)").as("dropped_lines"),
        expr("aggregate(kept, 0L, (acc, s) -> acc + s.lw)").as("kept_words"),
        expr("aggregate(kept, 0L, (acc, s) -> acc + length(s.line))").as("kept_chars"),
        expr("doc_id % 23 = 7").as("has_lorem"),
        expr("CAST(size(kept) AS BIGINT) >= 3 AND NOT (doc_id % 23 = 7)").as("doc_kept"))
      .orderBy("doc_id")
  }

  val qC4FiltersSql: String =
    """WITH base AS (
        SELECT doc_id,
          string_split(text, ' ') AS w,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
          CAST(8 + doc_id % 5 AS BIGINT) AS l_len,
          CAST(1 + doc_id % 9 AS BIGINT) AS mb,
          CAST(3 + doc_id % 9 AS BIGINT) AS me
        FROM documents),
      dims AS (SELECT *, (n_words + l_len - 1) // l_len AS n_lines FROM base),
      rend AS (
        SELECT doc_id, n_lines,
          list_transform(generate_series(0, n_lines - 1), i -> struct_pack(
            lw := CASE WHEN i < n_lines - 1 THEN l_len ELSE n_words - i * l_len END,
            line := (CASE WHEN (doc_id * 31 + i) % mb = 0 THEN '- ' ELSE '' END)
              || array_to_string(list_slice(w, i * l_len + 1, i * l_len + l_len), ' ')
              || (CASE WHEN (doc_id * 13 + i) % 17 = 5 THEN ' javascript' ELSE '' END)
              || (CASE (doc_id * 37 + i) % me WHEN 2 THEN '...' WHEN 1 THEN '' ELSE '.' END)))
          AS ls
        FROM dims),
      k AS (
        SELECT doc_id, n_lines,
          list_filter(ls, s -> right(s.line, 1) = '.' AND right(s.line, 3) <> '...'
            AND NOT contains(s.line, 'javascript') AND s.lw >= 5) AS kept
        FROM rend)
      SELECT doc_id, n_lines,
        CAST(len(kept) AS BIGINT) AS kept_lines,
        n_lines - CAST(len(kept) AS BIGINT) AS dropped_lines,
        CAST(coalesce(list_sum(list_transform(kept, s -> s.lw)), 0) AS BIGINT) AS kept_words,
        CAST(coalesce(list_sum(list_transform(kept, s -> length(s.line))), 0) AS BIGINT) AS kept_chars,
        doc_id % 23 = 7 AS has_lorem,
        CAST(len(kept) AS BIGINT) >= 3 AND NOT (doc_id % 23 = 7) AS doc_kept
      FROM k ORDER BY doc_id"""

  // ------------------------------------------------------------------
  // d25 — cross-corpus paragraph dedup (CCNet)
  // ------------------------------------------------------------------

  /** d25 — `q_dedup_paragraph`: corpus-wide keep-first paragraph
    * dedup. Paragraphs are 16-word windows of the token stream, with
    * the modular boilerplate class planted as the cross-doc duplicate
    * surface (real corpora dedup FOOTERS — the planted class is that
    * footer). Keep-first = min (doc_id, idx) per paragraph key,
    * packed into one long so the min-window needs no struct compare.
    *
    * Plan: explode paragraphs → ONE hash-partitioned exchange (the
    * min window over the 16-hex key; the shuffle rows are (16-hex,
    * packed long, word count) — paragraph TEXT never shuffles) → one
    * doc-keyed agg. The keep-first rule needs every occurrence of a
    * key in one place; one exchange is the floor for that. */
  def qDedupParagraph(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.fanout(
      Tables(spark, dir, "documents").select(col("doc_id"), col("text")))
    val paras = d
      .withColumn("w", expr("split(text, ' ')"))
      .withColumn("n_words", expr("CAST(size(w) AS BIGINT)"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, (n_words + 15) div 16 - 1), idx -> named_struct(
             'idx', idx,
             'content', CASE WHEN (doc_id * 7 + idx) % 13 = 0
               THEN concat('boilerplate footer v', CAST(idx % 3 AS STRING))
               ELSE array_join(slice(w, CAST(idx * 16 + 1 AS INT), 16), ' ') END))"""))
        .as("p"))
      .select(col("doc_id"),
        expr("substr(md5(p.content), 1, 16)").as("h"),
        expr("CAST(size(split(p.content, ' ')) AS BIGINT)").as("pw"),
        expr("doc_id * 65536 + p.idx").as("packed"))
    paras
      .withColumn("mn", min(col("packed")).over(Window.partitionBy("h")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_para"),
        sum(expr("CAST(packed = mn AS BIGINT)")).as("kept_para"),
        sum(expr("CAST(packed <> mn AS BIGINT)")).as("dropped_para"),
        sum(expr("IF(packed = mn, pw, 0L)")).as("kept_words"))
      .orderBy("doc_id")
  }

  val qDedupParagraphSql: String =
    """WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS w,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        FROM documents),
      p AS (
        SELECT doc_id, unnest(generate_series(0, (n_words + 15) // 16 - 1)) AS idx, w
        FROM base),
      c AS (
        SELECT doc_id, idx,
          CASE WHEN (doc_id * 7 + idx) % 13 = 0
               THEN 'boilerplate footer v' || CAST(idx % 3 AS VARCHAR)
               ELSE array_to_string(list_slice(w, idx * 16 + 1, idx * 16 + 16), ' ') END AS content
        FROM p),
      h AS (
        SELECT doc_id,
          substr(md5(content), 1, 16) AS h,
          CAST(len(string_split(content, ' ')) AS BIGINT) AS pw,
          doc_id * 65536 + idx AS packed
        FROM c),
      k AS (SELECT *, min(packed) OVER (PARTITION BY h) AS mn FROM h)
      SELECT doc_id,
        count(*) AS n_para,
        CAST(sum(CASE WHEN packed = mn THEN 1 ELSE 0 END) AS BIGINT) AS kept_para,
        CAST(sum(CASE WHEN packed = mn THEN 0 ELSE 1 END) AS BIGINT) AS dropped_para,
        CAST(sum(CASE WHEN packed = mn THEN pw ELSE 0 END) AS BIGINT) AS kept_words
      FROM k GROUP BY doc_id ORDER BY doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_gopher_rules" -> (qGopherRules _),
    "q_c4_filters" -> (qC4Filters _),
    "q_dedup_paragraph" -> (qDedupParagraph _))

  val oracles: Map[String, String] = Map(
    "q_gopher_rules" -> qGopherRulesSql,
    "q_c4_filters" -> qC4FiltersSql,
    "q_dedup_paragraph" -> qDedupParagraphSql)
}
