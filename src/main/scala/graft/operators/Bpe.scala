package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2 F (continued) — BPE tokenizer training (f24): the map-reduce
  * shape behind every production tokenizer (Sennrich et al. 2016 —
  * learn merges from corpus pair statistics). The 100 TB contract is
  * the classic one: pair counting runs over the DISTINCT-WORD table
  * weighted by word frequency (cost ∝ vocabulary, not corpus — the
  * corpus is scanned once ever, at word-count time), each merge step
  * is one bounded aggregation, and the driver holds only the argmax
  * pair per step (control-only loop, d6/e11's pattern).
  */
object Bpe {

  /** distinct words of the corpus with frequencies — the ONLY pass
    * over the raw text; everything downstream works on this
    * vocabulary-sized table. */
  private def wordFreq(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("f"))

  // f24 — one BPE pair-count step on the initial character alphabet:
  // adjacent-symbol pair frequencies weighted by word frequency, the
  // statistic whose argmax IS the next merge rule. Map-only explode
  // over i∈[1, len), then ONE pair-keyed aggregation (map-side
  // combined; pair cardinality ≤ |alphabet|² keys). Top-20 presented
  // with a total (cnt DESC, a, b) order so the merge choice is
  // deterministic cross-engine.
  def qBpeStep(spark: SparkSession, dir: String): DataFrame = {
    val wf = wordFreq(spark, dir)
    wf.select(col("w"), col("f"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substr(w, i, 1)").as("a"),
        expr("substr(w, i + 1, 1)").as("b"), col("f"))
      .groupBy("a", "b").agg(sum(col("f")).as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(20)
  }

  val qBpeStepSql: String =
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      wf AS (SELECT w, COUNT(*) AS f FROM toks WHERE length(w) >= 2 GROUP BY w),
      pairs AS (SELECT substr(w, CAST(i AS INT), 1) AS a, substr(w, CAST(i AS INT) + 1, 1) AS b, f
        FROM wf, unnest(generate_series(1, length(w) - 1)) AS t(i)),
      pc AS (SELECT a, b, CAST(SUM(f) AS BIGINT) AS cnt FROM pairs GROUP BY a, b)
      SELECT a, b, cnt FROM pc ORDER BY cnt DESC, a, b LIMIT 20"""

  /** The full training loop: learn `nMerges` merge rules. State lives
    * distributed as (symbol-array, freq) rows; each iteration is
    *   (1) one pair-count aggregation,
    *   (2) a 1-ROW collect of the argmax pair (ties broken (a, b)
    *       lexicographically — same total order as qBpeStep),
    *   (3) a map-only greedy left-to-right merge fold (higher-order
    *       `aggregate`, no UDF) applying the rule to every word.
    * Only the winning pair ever reaches the driver; the symbol table
    * never does. localCheckpoint every 8 steps cuts the growing
    * lineage (e11's trainCentroids discipline). Returns the learned
    * rules in order.
    */
  def trainBpe(spark: SparkSession, dir: String, nMerges: Int): Seq[(String, String)] = {
    var words = wordFreq(spark, dir)
      .select(expr("split(w, '')").as("syms"), col("f"))
      .localCheckpoint()
    val rules = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    while (step < nMerges) {
      val top = words
        .select(col("syms"), col("f"),
          explode(sequence(lit(1), size(col("syms")) - 1)).as("i"))
        .select(expr("element_at(syms, i)").as("a"),
          expr("element_at(syms, i + 1)").as("b"), col("f"))
        .groupBy("a", "b").agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) { step = nMerges }
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        rules += ((a, b))
        // greedy left-to-right merge: exactly the BPE apply rule —
        // a fresh merge output never re-pairs with the symbol before
        // it in the same pass
        val esc = (s: String) => s.replace("\\", "\\\\").replace("'", "\\'")
        val merged = expr(
          s"""aggregate(syms, CAST(array() AS array<string>), (acc, x) ->
              CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '${esc(a)}' AND x = '${esc(b)}'
                   THEN concat(slice(acc, 1, size(acc) - 1), array('${esc(a + b)}'))
                   ELSE concat(acc, array(x)) END)""")
        val next = words.select(merged.as("syms"), col("f"))
        words = (if ((step + 1) % 8 == 0) next.localCheckpoint() else next)
        step += 1
      }
    }
    rules.toSeq
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_step" -> (qBpeStep _))

  val oracles: Map[String, String] = Map(
    "q_bpe_step" -> qBpeStepSql)
}
