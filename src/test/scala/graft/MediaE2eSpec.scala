package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Media

/** g11 — the composed media ingest path must agree with its gated
  * components: the dedup verdicts it emits are exactly g8's pairs
  * (hashes come out of the SAME decode pass — decode once), batch
  * packing respects g5's byte budget, and the planted re-upload
  * stream is fully flagged.
  */
class MediaE2eSpec extends SparkTestBase {

  private lazy val rows = Media.qMediaE2e(spark, sfDir).collect()

  test("planted byte-copies and pixel nudges are flagged, originals kept") {
    val byId = rows.map(r => r.getLong(0) ->
      (r.getBoolean(5), if (r.isNullAt(6)) -1L else r.getLong(6))).toMap
    val variants = byId.keys.filter(_ >= Media.PhashVariantOffset)
    assert(variants.nonEmpty, "no re-upload stream — vacuous")
    variants.foreach { v =>
      val (isDup, dupOf) = byId(v)
      assert(isDup && dupOf == v - Media.PhashVariantOffset,
        s"re-upload $v not attributed to its source")
    }
    // an original whose copy arrived later is NOT the dup — the
    // earliest occurrence is the keeper
    val originals = byId.keys.filter(_ < Media.PhashVariantOffset)
    assert(originals.forall(id => !byId(id)._1),
      "an original was flagged as the duplicate of its own re-upload")
  }

  test("verdict pairs equal g8's pair set (decode-once composition loses nothing)") {
    val e2ePairs = rows.filter(_.getBoolean(5))
      .map(r => (r.getLong(6), r.getLong(0))).toSet
    // g8 hashes the ENTIRE corpus (its scenario treats every doc as an
    // image); g11 routes first — restrict parity to pairs whose BOTH
    // endpoints entered the routed pipeline
    val imageIds = Tables(spark, sfDir, "documents")
      .filter(ascii(substring(col("text"), 1, 1)).between(97, 104))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    def routed(x: Long): Boolean =
      imageIds(if (x >= Media.PhashVariantOffset) x - Media.PhashVariantOffset else x)
    val g8Pairs = Media.qPhashDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => routed(a) && routed(b) }.toSet
    // g8 emits ALL pairs; the verdict keeps each image's EARLIEST
    // match — so every verdict pair must be a g8 pair, and every g8
    // doc_b must be flagged
    assert(e2ePairs.subsetOf(g8Pairs),
      s"verdicts invented pairs: ${e2ePairs -- g8Pairs}")
    assert(g8Pairs.map(_._2).forall(b => e2ePairs.exists(_._2 == b)),
      "a g8 duplicate escaped the composed verdict")
  }

  test("g12: the audit flags EXACTLY the planted stale-catalog rows, nothing else") {
    import org.apache.spark.sql.functions.col
    val flagged = graft.multimodal.Media.qMediaAudit(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toList
    val planted = Tables(spark, sfDir, "documents")
      .filter(col("doc_id") % 13 === 0).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toList
    assert(flagged.map(_._1) == planted,
      s"flag set ${flagged.map(_._1)} != planted $planted")
    // the flagged mismatch is the declared-width off-by-one, and the
    // actual decode equals the un-corrupted formula
    flagged.foreach { case (_, declW, actW) =>
      assert(declW == actW + 1, s"expected the +1 plant, got $declW vs $actW")
    }
  }

  test("g11b: the decode-free plan twin matches g11's decoded output row for row") {
    // the twin predicts batch provenance AND the decode contract; g11
    // runs the real codec — every prediction must hold on every row
    val plan = graft.multimodal.Media.qMediaE2ePlan(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getInt(4), r.getInt(6), r.getInt(7))).toMap
    val e2e = rows.map(r =>
      r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(plan.keySet == e2e.keySet, "twin and g11 must cover the same arrivals")
    e2e.foreach { case (id, (bid, items, w, h)) =>
      val (pBid, pItems, pW, pH) = plan(id)
      assert(pBid == bid && pItems == items,
        s"doc $id: plan batch ($pBid, $pItems) != decoded path ($bid, $items)")
      assert(pW == w && pH == h,
        s"doc $id: decode produced ${w}x$h, the format contract says ${pW}x$pH")
    }
  }

  test("batch packing respects the byte budget contract and covers every arrival") {
    // same contract as g5/g6: per-batch payload bytes stay within
    // budget unless the batch is a single oversized item
    val n = rows.length
    val distinctIds = rows.map(_.getLong(0)).distinct.length
    assert(n == distinctIds, "an arrival was decoded twice or lost")
    val batchItems = rows.map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(batchItems.values.forall(_ >= 1))
    assert(rows.map(_.getLong(1)).distinct.length == batchItems.size)
  }
}
