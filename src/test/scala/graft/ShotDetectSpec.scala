package graft

import graft.multimodal.Media

/** g9 — shot-boundary detection must recover the planted scene
  * structure exactly: every ShotSceneLen-th frame opens a shot, within
  * a shot the detector stays silent, and shot ids run densely.
  */
class ShotDetectSpec extends SparkTestBase {

  test("g9 recovers the planted shot structure exactly") {
    val rows = Media.qShotDetect(spark, sfDir).collect()
    assert(rows.nonEmpty, "no video frames produced")
    val byVid = rows.groupBy(_.getLong(0))
    assert(byVid.size > 10, s"too few videos: ${byVid.size}")
    byVid.foreach { case (id, fr) =>
      val frames = fr.head.getInt(2)
      assert(fr.length == frames, s"video $id frame count")
      fr.sortBy(_.getInt(1)).foreach { r =>
        val f = r.getInt(1)
        val expectBoundary = f > 0 && f % Media.ShotSceneLen == 0
        assert(r.getBoolean(4) == expectBoundary,
          s"video $id frame $f: boundary=${r.getBoolean(4)} hamming=${r.get(3)}")
        assert(r.getLong(5) == f / Media.ShotSceneLen,
          s"video $id frame $f shot_id ${r.getLong(5)}")
        // margin, not just thresholds: within-shot stills hash
        // identically, cuts land at or above the line
        if (f > 0) {
          val h = r.getInt(3)
          if (expectBoundary) assert(h >= 8, s"weak cut at $id/$f: $h")
          else assert(h == 0, s"noisy shot interior at $id/$f: $h")
        }
      }
    }
  }
}
