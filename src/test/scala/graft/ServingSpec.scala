package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.operators.Serving

/** Persisted-index serving (e12/d10): build-once/serve-many semantics,
  * result parity with the rebuild-every-time twins (also hash-gated by
  * the shared oracles), and staleness safety — a changed corpus must
  * never be served from the old index.
  */
class ServingSpec extends SparkTestBase {

  test("served results equal the rebuild twins exactly") {
    val ann = Serving.qAnnIvfPqIndexed(spark, sfDir).collect().toSeq
    val annTwin = operators.Ann.qAnnIvfPq(spark, sfDir).collect().toSeq
    assert(ann == annTwin, "served IVFPQ diverged from e9")
    val ded = Serving.qDedupServed(spark, sfDir).collect().toSeq
    val dedTwin = operators.Dedup.qDedupIncremental(spark, sfDir).collect().toSeq
    assert(ded == dedTwin, "served dedup diverged from d8")
    val fil = Serving.qAnnFilteredIndexed(spark, sfDir).collect().toSeq
    val filTwin = operators.Ann.qAnnFilteredIvf(spark, sfDir).collect().toSeq
    assert(fil == filTwin, "filtered serving diverged from e8")
  }

  test("d28 x d10: the index bands with the planner's (r,b); the served screen equals d28's cross pair set") {
    import org.apache.spark.sql.functions.col
    // 1. the tuned choice IS the shipped config — planner and index
    //    can no longer drift (they band through one implementation)
    assert(operators.Dedup.tunedBanding(spark) == (2, 4),
      "verify-weighted argmin must land on d2's shipped (2,4)")
    // 2. d28's corpus-wide tuned pair set, restricted to (batch doc,
    //    standing doc) pairs, must be exactly what the served screen
    //    finds against the persisted index (same banding, same verify
    //    threshold — the amortization claim: the warm screen answers
    //    with the tuned pair graph, never rebuilding it)
    val isBatch = (id: Long) => id % 10 == 7
    val cross = operators.Dedup.qDedupTuned(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .flatMap { case (a, b) =>
        if (isBatch(a) && !isBatch(b)) Some(a -> b)
        else if (isBatch(b) && !isBatch(a)) Some(b -> a)
        else None
      }
    val expectNear = cross.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    assert(expectNear.nonEmpty, "corpus must exercise cross near-dups")
    val served = Serving.qDedupServed(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("verdict"),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
    served.foreach {
      case (d, "drop_near", m) =>
        assert(expectNear.get(d).contains(m.get),
          s"doc $d: served near ${m} != tuned pair-set min ${expectNear.get(d)}")
      case (d, "keep", _) =>
        assert(!expectNear.contains(d),
          s"doc $d kept but the tuned pair set has a cross pair ${expectNear.get(d)}")
      case _ => () // drop_exact: the exact key masks the near channel
    }
  }

  test("daily cycle: absorbed keepers are caught as exact dups on re-screen, idempotently") {
    // own index copy — absorbing into the shared fingerprint-keyed dir
    // would break the d10 oracle's corpus-minus-batch expectation
    val ix = Files.createTempDirectory("graft_absorb_ix").toString
    Serving.buildDedupIndex(spark, sfDir, ix)
    val screen1 = Serving.qDedupServedAt(spark, sfDir, ix).collect()
    val keepers = screen1.filter(_.getString(1) == "keep").map(_.getLong(0)).toSet
    assert(keepers.nonEmpty, "screen found no novel docs — absorb test is vacuous")
    // absorb today's keepers; tomorrow the SAME batch re-uploads and
    // every absorbed doc must now hit an exact self-match in the index
    Serving.absorbBatch(spark, sfDir, ix, batchId = 1L)
    def rescreen(): Map[Long, (String, Long)] =
      Serving.qDedupServedAt(spark, sfDir, ix).collect()
        .map(r => r.getLong(0) -> (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
        .toMap
    val screen2 = rescreen()
    keepers.foreach { id =>
      assert(screen2(id) == ("drop_exact", id),
        s"absorbed keeper $id not caught on re-screen: ${screen2(id)}")
    }
    // docs that were dups on day one keep their original verdicts
    screen1.filter(_.getString(1) != "keep").foreach { r =>
      assert(screen2(r.getLong(0))._1 == r.getString(1),
        s"day-one verdict changed for ${r.getLong(0)}")
    }
    // a RETRIED absorb of the same batch id replaces itself: same
    // index row count, same re-screen result (i4's idempotence)
    val rowsBefore = spark.read.parquet(s"$ix/keys").count()
    Serving.absorbBatch(spark, sfDir, ix, batchId = 1L)
    assert(spark.read.parquet(s"$ix/keys").count() == rowsBefore,
      "retried absorb duplicated index signatures")
    assert(rescreen() == screen2, "retried absorb changed the screen result")
  }

  test("e22 cycle: an absorbed vector becomes servable from its router-assigned cell, idempotently") {
    import org.apache.spark.sql.functions.col
    // standing-only index (vec_id % 10 != 7 — the batch is NOT built
    // in); own copy so the shared fingerprint-keyed dir stays pristine
    val ix = Files.createTempDirectory("graft_ann_absorb_ix").toString
    val standing = Tables(spark, sfDir, "embeddings").filter(col("vec_id") % 10 =!= 7)
    Serving.buildAnnIndex(standing, ix)
    val e = Tables(spark, sfDir, "embeddings")
    // query = vector 7's own embedding (7 % 10 == 7 ⇒ in the batch):
    // before absorb it is unfindable — the index has never seen it
    val before = Serving.qAnnIvfPqIndexedAt(spark, e, ix, queryVecId = 7L)
      .collect().map(_.getLong(0)).toSet
    assert(!before.contains(7L), "vector 7 served before it was absorbed")
    // absorb the batch; serving with the delta must now return vec 7
    // as the exact match (cos_sim 1.0 ranks it into the rerank set)
    Serving.absorbAnnBatch(spark, sfDir, ix, batchId = 1L)
    val delta = s"$ix/cells_delta/batch_id=1"
    val after = Serving.qAnnIvfPqIndexedAt(spark, e, ix, queryVecId = 7L,
      deltaDirs = Seq(delta)).collect()
    assert(after.count(_.getLong(0) == 7L) == 1,
      s"absorbed vector 7 not served exactly once: ${after.map(_.getLong(0)).toSeq}")
    val self = after.find(_.getLong(0) == 7L).get
    assert(math.abs(self.getDouble(2) - 1.0) < 1e-6,
      s"self-match cosine should be 1.0, got ${self.getDouble(2)}")
    // the absorbed assignment equals the router's probe decision for
    // the same vector — the cell a near-7 query probes IS 7's cell
    // (qAnnAbsorb's argmax rule, persisted-centroid flavor)
    // idempotence: a retried absorb replaces its batch partition
    val rowsBefore = spark.read.parquet(delta).count()
    Serving.absorbAnnBatch(spark, sfDir, ix, batchId = 1L)
    assert(spark.read.parquet(delta).count() == rowsBefore,
      "retried absorb duplicated cell rows")
    val again = Serving.qAnnIvfPqIndexedAt(spark, e, ix, queryVecId = 7L,
      deltaDirs = Seq(delta)).collect()
    assert(again.toSeq.map(_.toSeq) == after.toSeq.map(_.toSeq),
      "retried absorb changed the served result")

    // e23: tombstoning every absorbed vector makes the serve result
    // EXACTLY the pre-absorb answer — deletes are visible next query,
    // no index file rewritten
    val absorbed = spark.read.parquet(delta).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    Serving.tombstoneAnnBatch(spark, ix, absorbed, batchId = 1L)
    val tomb = s"$ix/tombstones/batch_id=1"
    val erased = Serving.qAnnIvfPqIndexedAt(spark, e, ix, queryVecId = 7L,
      deltaDirs = Seq(delta), tombstoneDirs = Seq(tomb)).collect()
    val beforeRows = Serving.qAnnIvfPqIndexedAt(spark, e, ix, queryVecId = 7L)
      .collect()
    assert(erased.toSeq.map(_.toSeq) == beforeRows.toSeq.map(_.toSeq),
      "tombstoned delta must serve exactly the pre-absorb answer")
    // and a partial delete: tombstone ONLY vec 7 — the rest of the
    // batch keeps serving
    Serving.tombstoneAnnBatch(spark, ix, Seq(7L), batchId = 2L)
    val partial = Serving.qAnnIvfPqIndexedAt(spark, e, ix, queryVecId = 7L,
      deltaDirs = Seq(delta), tombstoneDirs = Seq(s"$ix/tombstones/batch_id=2"))
      .collect().map(_.getLong(0)).toSet
    assert(!partial.contains(7L), "tombstoned vector still served")
  }

  test("e30: cell GC — dirty cell rewritten, clean cell byte-stable, tombstones consolidate, serve unchanged") {
    import org.apache.spark.sql.functions.col
    val ix = Files.createTempDirectory("graft_ann_gc_ix").toString
    val e = Tables(spark, sfDir, "embeddings")
    Serving.buildAnnIndex(e, ix)
    // victim cell = the most populated label; query = its min vec
    val byLabel = spark.read.parquet(s"$ix/cells")
      .groupBy("label").count().collect()
      .map(r => (r.get(0).asInstanceOf[Number].longValue, r.getLong(1)))
      .sortBy(-_._2)
    val dirty = byLabel.head._1
    val clean = byLabel(1)._1
    val dirtyVecs = spark.read.parquet(s"$ix/cells/label=$dirty")
      .select("vec_id").collect().map(_.getLong(0)).sorted
    val qv = dirtyVecs.head
    // tombstone 30% of the dirty cell (> the 20% threshold), sparing
    // the query vector; plus ONE vector of the clean cell (below)
    val doomed = dirtyVecs.tail.take(math.max(1, (dirtyVecs.length * 3) / 10)).toSeq
    val cleanVec = spark.read.parquet(s"$ix/cells/label=$clean")
      .select("vec_id").collect().map(_.getLong(0)).min
    Serving.tombstoneAnnBatch(spark, ix, doomed, batchId = 1L)
    Serving.tombstoneAnnBatch(spark, ix, Seq(cleanVec), batchId = 2L)
    val tombs = Seq(s"$ix/tombstones/batch_id=1", s"$ix/tombstones/batch_id=2")
    val before = Serving.qAnnIvfPqIndexedAt(spark, e, ix, queryVecId = qv,
      tombstoneDirs = tombs).collect().map(_.toSeq).toSeq

    val (rewritten, remainder) = Serving.gcAnnCells(spark, ix, tombs, gcBatchId = 9L)
    assert(rewritten == Seq(dirty.toInt), s"expected only cell $dirty rewritten, got $rewritten")
    assert(remainder == 1L, "only the clean cell's tombstone must remain")
    // physical: the dirty partition no longer holds the doomed ids;
    // the clean partition still physically holds its tombstoned id
    val dirtyNow = spark.read.parquet(s"$ix/cells/label=$dirty")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(doomed.forall(!dirtyNow.contains(_)), "doomed ids survived the rewrite")
    assert(dirtyNow.contains(qv))
    val cleanNow = spark.read.parquet(s"$ix/cells/label=$clean")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(cleanNow.contains(cleanVec), "under-threshold cell must stay untouched")
    // the applied batches are gone, the remainder batch exists
    val fs = new org.apache.hadoop.fs.Path(ix)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(tombs.forall(t => !fs.exists(new org.apache.hadoop.fs.Path(t))))
    val rem = spark.read.parquet(s"$ix/tombstones/batch_id=9")
      .collect().map(_.getLong(0)).toSeq
    assert(rem == Seq(cleanVec))
    // end-to-end: serving with ONLY the remainder equals the pre-GC answer
    val after = Serving.qAnnIvfPqIndexedAt(spark, e, ix, queryVecId = qv,
      tombstoneDirs = Seq(s"$ix/tombstones/batch_id=9")).collect().map(_.toSeq).toSeq
    assert(after == before, "GC changed the served result")
  }

  test("e30: GC swap is recoverable — every crash window repairs to the full cell; the tombstone bound is structural (r15 ADVICE)") {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val ix = Files.createTempDirectory("graft_ann_gc_repair").toString
    val e = Tables(spark, sfDir, "embeddings")
    Serving.buildAnnIndex(e, ix)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(ix).getFileSystem(conf)
    val l = spark.read.parquet(s"$ix/cells").select("label").distinct()
      .collect().map(_.get(0).asInstanceOf[Number].intValue).min
    val live = new Path(s"$ix/cells/label=$l")
    val tmp = new Path(s"$ix/cells/.gc_label_$l.tmp")
    val aside = new Path(s"$ix/cells/.gc_label_$l.old")
    def vecs(): Set[Long] = spark.read.parquet(live.toString)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val whole = vecs()

    // window 1: crashed after the tmp write, live never touched —
    // repair drops the stale tmp, reconstructs nothing
    FileUtil.copy(fs, live, fs, tmp, false, conf)
    assert(Serving.repairAnnCells(spark, ix) == Seq.empty)
    assert(!fs.exists(tmp) && vecs() == whole)

    // window 2: crashed between the aside move and the promote (the
    // exact window the old delete->rename lost the cell in) — repair
    // promotes the complete tmp and finishes the GC
    FileUtil.copy(fs, live, fs, tmp, false, conf)
    assert(fs.rename(live, aside))
    assert(Serving.repairAnnCells(spark, ix) == Seq(l))
    assert(vecs() == whole && !fs.exists(tmp) && !fs.exists(aside))

    // window 3: live missing with only the aside (tmp lost) — the
    // aside IS the cell, restore it
    assert(fs.rename(live, aside))
    assert(Serving.repairAnnCells(spark, ix) == Seq(l))
    assert(vecs() == whole && !fs.exists(aside))

    // window 4: crashed after the promote, before dropping the aside
    FileUtil.copy(fs, live, fs, aside, false, conf)
    assert(Serving.repairAnnCells(spark, ix) == Seq.empty)
    assert(vecs() == whole && !fs.exists(aside))

    // repair is idempotent on a clean index
    assert(Serving.repairAnnCells(spark, ix) == Seq.empty)

    // the broadcast-size bound is a GATE, not prose: an over-bound
    // consolidated tombstone set refuses BEFORE touching anything
    val ids = whole.toSeq.sorted.take(2)
    Serving.tombstoneAnnBatch(spark, ix, ids, batchId = 7L)
    val tdir = s"$ix/tombstones/batch_id=7"
    intercept[IllegalArgumentException] {
      Serving.gcAnnCells(spark, ix, Seq(tdir), gcBatchId = 99L,
        maxTombstones = 1L)
    }
    assert(fs.exists(new Path(tdir)), "refused GC must not consume its input")
    assert(vecs() == whole, "refused GC must not rewrite cells")

    // self-heal: a predecessor's interrupted swap finishes at the
    // NEXT GC entry, before any accounting reads the cells
    assert(fs.rename(live, aside))
    Serving.gcAnnCells(spark, ix, Seq(tdir), gcBatchId = 100L)
    assert(fs.exists(live) && !fs.exists(aside),
      "gcAnnCells must repair an interrupted predecessor before reading")
  }

  test("index builds once and is reused; a changed corpus gets a fresh index") {
    // copy the corpus so we can mutate it without touching testdata
    val work = Files.createTempDirectory("graft_serving_corpus")
    Seq("embeddings", "documents").foreach { t =>
      Files.copy(Paths.get(sfDir, s"$t.parquet"), work.resolve(s"$t.parquet"),
        StandardCopyOption.COPY_ATTRIBUTES)
    }
    val dir = work.toString
    val ix1 = Serving.annIndexDir(spark, dir)
    assert(Files.exists(Paths.get(ix1, "_GRAFT_INDEX_READY")))
    val mtime1 = Files.getLastModifiedTime(Paths.get(ix1, "_GRAFT_INDEX_READY"))
    // second call: same fingerprint, no rebuild (marker untouched)
    assert(Serving.annIndexDir(spark, dir) == ix1)
    assert(Files.getLastModifiedTime(Paths.get(ix1, "_GRAFT_INDEX_READY")) == mtime1)
    // "new ingest overwrote the corpus": same path, different bytes ⇒
    // different fingerprint ⇒ a DIFFERENT index dir is built — the
    // stale one can never serve the new corpus
    val f = work.resolve("embeddings.parquet")
    Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(f).toMillis + 60000))
    val ix2 = Serving.annIndexDir(spark, dir)
    assert(ix2 != ix1, "changed corpus must not reuse the old index dir")
  }

  test("i10 x e12: index cutover is one snapshot commit; pinned versions keep serving the old build") {
    import org.apache.spark.sql.functions._
    val emb = Tables(spark, sfDir, "embeddings")
    val pub = Files.createTempDirectory("graft_ix_pub").toString
    val bRoot = Files.createTempDirectory("graft_ix_builds").toString

    // v1: index over the full corpus
    val v1 = Serving.publishAnnIndex(spark, emb, pub, s"$bRoot/build-a")
    assert(v1 == 1L)
    val servedA = Serving.qAnnIvfPqIndexedAt(spark, emb,
      Serving.servedIndexDir(spark, pub), queryVecId = 0L).collect().toSeq
    val top1 = servedA.head.getLong(0)
    assert(top1 != 0L)

    // the nightly rebuild: corpus lost its current top hit; the new
    // index lands in its own dir and goes live in ONE commit
    val emb2 = emb.filter(col("vec_id") =!= top1)
    val v2 = Serving.publishAnnIndex(spark, emb2, pub, s"$bRoot/build-b")
    assert(v2 == 2L)
    assert(Serving.servedIndexDir(spark, pub) == s"$bRoot/build-b")
    val servedB = Serving.qAnnIvfPqIndexedAt(spark, emb2,
      Serving.servedIndexDir(spark, pub), queryVecId = 0L).collect().toSeq
    assert(!servedB.exists(_.getLong(0) == top1),
      "the rebuilt index still serves the removed vector")

    // time travel: pinning v1 serves the OLD build byte-identically —
    // rollback is a version pin, not a re-deploy
    val pinned = Serving.qAnnIvfPqIndexedAt(spark, emb,
      Serving.servedIndexDir(spark, pub, Some(1L)), queryVecId = 0L).collect().toSeq
    assert(pinned == servedA, "pinned v1 diverged from the original serve")

    // an abandoned build never published is invisible to resolution
    Serving.buildAnnIndex(emb, s"$bRoot/build-orphan")
    assert(Serving.servedIndexDir(spark, pub) == s"$bRoot/build-b")
  }
}
