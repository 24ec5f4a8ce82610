package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe
import scala.collection.mutable

/** f24 BPE tokenizer training — the distributed trainer must learn
  * the exact merge sequence an in-memory reference implementation
  * learns from the same word-frequency table.
  */
class BpeSpec extends SparkTestBase {

  /** reference BPE trainer (Sennrich-style, greedy left-to-right
    * apply, ties broken (a, b) lexicographically). */
  private def refTrain(wf: Map[String, Long], n: Int): Seq[(String, String)] = {
    var words: Map[Vector[String], Long] =
      wf.toSeq.map { case (w, f) => w.map(_.toString).toVector -> f }
        .groupMapReduce(_._1)(_._2)(_ + _)
    var rules = Vector.empty[(String, String)]
    var done = false
    for (_ <- 0 until n if !done) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) done = true
      else {
        val (pair, _) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        rules :+= pair
        words = words.toSeq.map { case (syms, f) =>
          val out = mutable.ArrayBuffer.empty[String]
          for (x <- syms) {
            if (out.nonEmpty && out.last == pair._1 && x == pair._2)
              out(out.length - 1) = pair._1 + pair._2
            else out += x
          }
          (out.toVector, f)
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    rules
  }

  private lazy val wordFreq: Map[String, Long] =
    Tables(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("f24 step: the argmax pair of q_bpe_step is the reference's first merge") {
    val top = Bpe.qBpeStep(spark, sfDir).collect()
    assert(top.length == 20)
    // counts presented in total (cnt DESC, a, b) order
    val keys = top.map(r => (-r.getLong(2), r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted, "q_bpe_step order not total")
    val want = refTrain(wordFreq, 1).head
    assert((top(0).getString(0), top(0).getString(1)) == want,
      s"first merge mismatch: got ${top(0)} want $want")
    // recompute the top count from the reference table
    val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for ((w, f) <- wordFreq; i <- 0 until w.length - 1)
      counts((w(i).toString, w(i + 1).toString)) += f
    assert(top(0).getLong(2) == counts(want), s"count mismatch for $want")
  }

  test("f24 loop: 8 distributed merges equal the reference merge sequence") {
    val got = Bpe.trainBpe(spark, sfDir, 8)
    val want = refTrain(wordFreq, 8)
    assert(got == want, s"merge sequences diverge:\n got $got\nwant $want")
    // multi-char symbols must have emerged by merge 8 (rules build on
    // earlier rules — the loop is genuinely iterative, not 8
    // independent char-pair argmaxes)
    assert(got.exists { case (a, b) => a.length > 1 || b.length > 1 },
      s"no composed merge in $got — the state never advanced")
  }

  test("f41 encode: tokens concatenate back to the word, and merges genuinely compress") {
    val rows = Bpe.qBpeEncode(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var merged = 0L
    rows.foreach { r =>
      val (w, f, enc, nTok, nChars) = (r.getString(0), r.getLong(1),
        r.getString(2), r.getLong(3), r.getLong(4))
      // lossless: stripping the token wrappers recovers the word
      assert(enc.replace("<", "").replace(">", "") == w,
        s"encoding of '$w' lost characters: $enc")
      assert(nTok >= 1 && nTok <= nChars, s"'$w': $nTok tokens for $nChars chars")
      if (nTok < nChars) merged += f
    }
    // the 8 learned rules must actually fire on the corpus head —
    // weighted by frequency, most of the mass encodes shorter than
    // its character count
    val tot = rows.map(_.getLong(1)).sum
    assert(merged * 2 > tot, s"merges barely fire: $merged of $tot")
  }

  test("f45 fertility: every word costs >= 1 token, merges pull fertility under chars-per-word") {
    val rows = operators.Bpe.qTokenizerFertility(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var words = 0L; var bpe = 0L
    rows.foreach { r =>
      val (n, t, c) = (r.getAs[Long]("n_words"), r.getAs[Long]("bpe_tokens"),
        r.getAs[Long]("n_chars"))
      words += n; bpe += t
      assert(r.getAs[Long]("fertility_micro") >= 1000000L,
        s"${r.getString(0)}: a word cannot encode below one token")
      assert(t <= c, s"${r.getString(0)}: tokens cannot exceed characters")
      assert(r.getAs[Long]("fertility_micro") == t * 1000000L / n)
    }
    // corpus-level: the learned merges compress — mean fertility sits
    // strictly under the character count per word
    assert(bpe < rows.map(_.getAs[Long]("n_chars")).sum,
      "corpus-wide the tokenizer must beat character-level encoding")
    assert(words > 0 && bpe >= words)
  }
}
