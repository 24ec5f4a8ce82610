package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Media

/** g10 — the constellation matcher must recover every planted clip at
  * exactly its time offset with exactly its chain count, and every
  * reported pair must actually share audio content (no hash-collision
  * phantoms at this corpus size).
  */
class AudioFpSpec extends SparkTestBase {

  test("g10 recovers planted clips at dt=5 and duplicate content at dt=0") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), md5(col("text")).as("ck"),
        (col("n_chars") % 50 + 10).cast("int").as("nf"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val rows = Media.qAudioFingerprint(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))

    // every planted clip long enough to clear the threshold is found,
    // at exactly its offset, with exactly its chain count
    docs.foreach { case (id, (_, nf)) =>
      if (id % 7 == 0 && nf - 9 >= 6) {
        val hit = rows.filter(r => r._1 == id && r._2 == id + Media.AudioClipOffset)
        assert(hit.length == 1, s"clip of doc $id not matched: ${hit.toSeq}")
        assert(hit.head._3 == 5 && hit.head._4 == (nf - 9).toLong,
          s"clip of doc $id: got dt=${hit.head._3} n=${hit.head._4}, want (5, ${nf - 9})")
      }
    }

    // no phantoms: every reported pair shares a content key
    def ckOf(id: Long): String =
      docs(if (id >= Media.AudioClipOffset) id - Media.AudioClipOffset else id)._1
    rows.foreach { case (a, b, dt, n) =>
      assert(ckOf(a) == ckOf(b), s"pair ($a, $b) matched without shared content")
    }

    // genuine duplicate texts (same ck, both originals) land at dt = 0
    // with the full chain count
    val dupPairs = docs.toSeq.groupBy(_._2._1).values.filter(_.size > 1)
    dupPairs.foreach { ds =>
      val sorted = ds.sortBy(_._1)
      sorted.combinations(2).foreach { case Seq((a, (_, nfa)), (b, (_, nfb))) =>
        if (math.min(nfa, nfb) - 4 >= 6) {
          val hit = rows.filter(r => r._1 == a && r._2 == b && r._3 == 0)
          assert(hit.length == 1, s"duplicate pair ($a, $b) not matched at dt=0")
        }
      }
    }
  }
}
