package graft

import graft.dev.GenVecs
import graft.operators.Ann

/** e11's Lloyd step iterated to convergence (Ann.trainCentroids) — the
  * training loop that produces the IVF cells e3/e9's `label` column
  * stands in for. Gates: convergence on a clustered corpus, inertia
  * strictly below the untrained seeds (Lloyd's monotonicity made
  * observable), and cell-probed recall@5 IMPROVING once the cells come
  * from training instead of raw seed vectors.
  */
class TrainingSpec extends SparkTestBase {

  /** Cell assignment for a centroid set, collected — spec-side serving
    * input (cells + centroids are what e3/e9-style probes search;
    * recall eval runs locally over them). Lives in the TEST tree
    * because the per-vector collect is corpus-proportional: the main
    * tree stays free of unbounded `.collect()`s. */
  private def cellsFor(vecs: org.apache.spark.sql.DataFrame,
      cents: Map[Int, IndexedSeq[Double]]): Map[Long, Int] =
    Ann.assignTo(Ann.quantized(vecs), Ann.seedsDF(vecs.sparkSession, cents))
      .select("vec_id", "seed_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("Lloyd loop converges; trained cells beat untrained seeds on inertia and recall") {
    // k < true cluster count (10): cell boundaries must fall BETWEEN
    // clusters for whole-cluster recall, which raw seed positions get
    // wrong and converged centroids get right — the regime where
    // training visibly pays (k == clusters saturates recall for both)
    val k = 4
    val vecs = GenVecs.synthesize(spark, 1000, 0.7).localCheckpoint(true)
    val (trained, iters, shift) = Ann.trainCentroids(vecs, k, maxIters = 15, tol = 1e-3)
    assert(shift <= 1e-3 && iters < 15, s"did not converge: iters=$iters shift=$shift")

    // untrained baseline = the deterministic init (vectors 0..k-1),
    // quantized the same way the trainer quantizes
    val emb: Map[Long, Array[Float]] = vecs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val untrained: Map[Int, IndexedSeq[Double]] = (0 until k).map { s =>
      s -> emb(s.toLong).map(x => math.rint(x.toDouble * 1e6) / 1e6).toIndexedSeq
    }.toMap

    // Lloyd never increases inertia; on a clustered corpus training
    // must beat raw seed positions by a wide margin
    val i0 = Ann.inertia(vecs, untrained)
    val iT = Ann.inertia(vecs, trained)
    assert(iT < i0 * 0.9, s"inertia did not improve: $i0 -> $iT")

    // recall@5 of the e3/e9 serving shape (probe nearest centroid,
    // search only that cell) — evaluated locally over the collected
    // corpus; the Spark side under test is the training + assignment
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, d) => acc + a(d).toDouble * b(d).toDouble)
    def top5(q: Long, members: Iterable[Long]): Seq[Long] =
      members.toSeq.map(v => (cos(emb(q), emb(v)), v))
        .sortBy(t => (-t._1, t._2)).take(5).map(_._2)
    def recallFor(cells: Map[Long, Int], cents: Map[Int, IndexedSeq[Double]]): Double = {
      val byCell = cells.groupBy(_._2).map { case (c, m) => c -> m.keys }
      val queries = (0 until 20).map(j => (j * 47 + 13).toLong)
      val rs = queries.map { q =>
        val exact = top5(q, emb.keys)
        val qv = emb(q).map(_.toDouble)
        val probe = cents.toSeq.map { case (s, cv) =>
          (cv.indices.foldLeft(0.0) { (acc, d) =>
            val diff = qv(d) - cv(d); acc + diff * diff }, s)
        }.min._2
        val got = top5(q, byCell.getOrElse(probe, Nil))
        exact.count(got.contains).toDouble / 5
      }
      rs.sum / rs.size
    }
    val cellsT = cellsFor(vecs, trained)
    val cellsU = cellsFor(vecs, untrained)
    val rT = recallFor(cellsT, trained)
    val rU = recallFor(cellsU, untrained)
    assert(rT > rU, s"trained recall $rT must beat untrained $rU")
    assert(rT >= 0.8, s"trained recall@5 too low: $rT")

    // ---- the SERVING composition: trained cells through the REAL
    // persisted IVFPQ path (build index with each cell assignment,
    // serve per query, recall@10 vs local exact top-10) ----
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def indexFor(cells: Map[Long, Int]): String = {
      val ix = java.nio.file.Files.createTempDirectory("graft_trained_ix").toString
      val cellsDF = cells.toSeq.toDF("vec_id", "cell")
      val relabeled = vecs.drop("label").join(cellsDF, "vec_id")
        .select(col("vec_id"), col("cell").as("label"), col("embedding"))
      operators.Serving.buildAnnIndex(relabeled, ix)
      ix
    }
    def top10Exact(q: Long): Set[Long] =
      emb.keys.toSeq.map(v => (cos(emb(q), emb(v)), v))
        .sortBy(t => (-t._1, t._2)).take(10).map(_._2).toSet
    def servedRecall(ix: String): Double = {
      val queries = Seq(13L, 107L, 251L, 389L, 521L, 653L, 787L, 919L)
      val rs = queries.map { q =>
        // rerank deep (the production recall knob) then take the exact
        // top-10 — recall now measures CELL quality, not the 4-anchor
        // ADC's coarseness, which is identical for both indexes
        val got = operators.Serving
          .qAnnIvfPqIndexedAt(spark, vecs, ix, q, rerankDepth = 100)
          .orderBy(col("cos_sim").desc, col("vec_id")).limit(10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (got intersect top10Exact(q)).size.toDouble / 10
      }
      rs.sum / rs.size
    }
    val servedT = servedRecall(indexFor(cellsT))
    val servedU = servedRecall(indexFor(cellsU))
    assert(servedT > servedU,
      s"served recall@10: trained $servedT must beat untrained $servedU")
  }

  test("e25: rebalance executor — slivers absorbed, hot cells split non-trivially, balance strictly improves") {
    import org.apache.spark.sql.functions.col
    val plan = graft.operators.Ann.qAnnRebalance(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(plan.values.exists(_._2 == "split") && plan.values.exists(_._2 == "merge"),
      "the drifted map must exercise both actions")
    val out = graft.operators.Ann.rebalanceExecute(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nVecs = Tables(spark, sfDir, "embeddings").count()
    assert(out.length == nVecs, "every vector must land")
    assert(out.map(_._1).distinct.length == out.length, "each exactly once")
    out.foreach { case (_, old, nu) =>
      plan(old)._2 match {
        case "merge" => assert(nu == plan(old)._3 * 2, s"merge cell $old must forward to its target")
        case "keep"  => assert(nu == old * 2)
        case "split" => assert(nu == old * 2 || nu == old * 2 + 1)
      }
    }
    // each split half non-empty
    val byNew = out.groupBy(_._3).map { case (c, vs) => c -> vs.length.toLong }
    plan.collect { case (c, (_, "split", _)) => c }.foreach { c =>
      assert(byNew.getOrElse(2 * c, 0L) > 0 && byNew.getOrElse(2 * c + 1, 0L) > 0,
        s"split cell $c must produce two non-empty halves")
    }
    // balance strictly improves: max cell share drops
    val beforeMax = plan.values.map(_._1).max
    val afterMax = byNew.values.max
    assert(afterMax < beforeMax,
      s"max cell population must drop: $beforeMax -> $afterMax")
    // no slivers left at the old threshold: merged mass landed on targets
    assert(byNew.size < plan.size + plan.count(_._2._2 == "split"),
      "cell count must shrink vs split-only (merges absorbed)")
  }

  test("e17: trained PQ codebooks cut every subspace's quantization error vs raw anchors") {
    // clustered corpus: the regime where codebook training pays (the
    // sf0.001 embeddings are near-uniform — both codebooks land at
    // statistically flat recall there)
    val vecs = GenVecs.synthesize(spark, 600, 0.7)
      .select("vec_id", "embedding").localCheckpoint(true)
    val trained = Ann.trainPqCodebooks(vecs, maxIters = 12)
    val emb: Map[Long, Array[Float]] = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // e6's untrained codebook: the sub-vectors of vec 1..4
    def anchorBook(j: Int): Map[Int, IndexedSeq[Double]] =
      (0 until 4).map { c =>
        c -> (0 until 8).map(d =>
          math.rint(emb((c + 1).toLong)(j * 8 + d).toDouble * 1e6) / 1e6).toIndexedSeq
      }.toMap
    (0 until 8).foreach { j =>
      val subv = vecs.selectExpr("vec_id", s"slice(embedding, ${j * 8 + 1}, 8) AS embedding")
      val iA = Ann.inertia(subv, anchorBook(j))
      val iT = Ann.inertia(subv, trained(j))
      assert(iT < iA, s"subspace $j: trained inertia $iT !< anchors $iA")
    }
    // end-to-end, the e9 serving shape: ADC shortlist (depth 30) →
    // exact rerank → recall@10. A better codebook means a better
    // SHORTLIST — that is what PQ training buys in production.
    def code(v: Array[Float], book: Int => Map[Int, IndexedSeq[Double]]): IndexedSeq[Int] =
      (0 until 8).map { j =>
        book(j).minBy { case (c, w) =>
          ((0 until 8).map(d => math.pow(v(j * 8 + d) - w(d), 2)).sum, c)
        }._1
      }
    def adc(q: Array[Float], codes: IndexedSeq[Int], book: Int => Map[Int, IndexedSeq[Double]]): Double =
      (0 until 8).map(j => (0 until 8).map(d => q(j * 8 + d) * book(j)(codes(j))(d)).sum).sum
    def cosL(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, d) => acc + a(d).toDouble * b(d).toDouble)
    def recall(book: Int => Map[Int, IndexedSeq[Double]]): Double = {
      val coded = emb.map { case (id, v) => id -> code(v, book) }
      val rs = (0L until 20L).map { q =>
        val exact = emb.keys.toSeq.sortBy(v => (-cosL(emb(q), emb(v)), v)).take(10).toSet
        val short = emb.keys.toSeq.sortBy(v => (-adc(emb(q), coded(v), book), v)).take(30)
        val got = short.sortBy(v => (-cosL(emb(q), emb(v)), v)).take(10).toSet
        (exact & got).size / 10.0
      }
      rs.sum / rs.size
    }
    val rT = recall(trained)
    val rA = recall(anchorBook)
    assert(rT >= rA, s"shortlist recall@10: trained $rT regressed vs anchors $rA")
    assert(rT > 0.5, s"trained shortlist recall implausibly low: $rT")
  }

  test("e27 kmeans converge: Lloyd inertia never increases at the FULL (30,12) grid, coverage holds each round") {
    val rows = operators.Ann.qKmeansConvergeFull(spark, sfDir)
      .orderBy("iteration", "seed_id").collect()
    val byIter = rows.groupBy(_.getInt(0))
    assert(byIter.keySet == Set(1, 2))
    val total = Tables(spark, sfDir, "embeddings").count()
    byIter.foreach { case (it, rs) =>
      assert(rs.map(_.getLong(2)).sum == total, s"round $it must assign every vector")
    }
    def inertia(it: Int): BigDecimal =
      byIter(it).map(r => BigDecimal(r.getDecimal(3))).sum
    assert(inertia(2) <= inertia(1),
      s"Lloyd descent violated: ${inertia(1)} -> ${inertia(2)}")
    // and the step genuinely moved: round 2 is not a no-op copy
    assert(inertia(2) < inertia(1), "re-centering should strictly improve on this data")

    // the SHIPPED presentation (r16: BIGINT micro-units) is exactly
    // floor(full-grid inertia * 1e6), row for row — the full decimal
    // stays pinned here while the driver hashes only the
    // engine-proof micro grid
    val shipped = operators.Ann.qKmeansConverge(spark, sfDir).collect()
    assert(shipped.map(_.schema.fieldNames.toList).distinct.toList ==
      List(List("iteration", "seed_id", "n_assigned", "inertia_micro")))
    shipped.zip(rows).foreach { case (s, f) =>
      assert((s.getInt(0), s.getInt(1), s.getLong(2)) ==
        (f.getInt(0), f.getInt(1), f.getLong(2)))
      val full = BigDecimal(f.getDecimal(3))
      assert(BigDecimal(s.getLong(3)) ==
        (full * BigDecimal(1000000)).setScale(0, BigDecimal.RoundingMode.FLOOR),
        s"micro presentation must be floor(full*1e6): $s vs $full")
    }
  }

  test("e27 probe: stage fingerprints agree with the headline chain; integer columns are self-consistent") {
    val probe = operators.Ann.qKmeansProbe(spark, sfDir)
      .orderBy("iteration", "seed_id").collect()
    val head = operators.Ann.qKmeansConvergeFull(spark, sfDir)
      .orderBy("iteration", "seed_id").collect()
    assert(probe.length == head.length)
    probe.zip(head).foreach { case (p, h) =>
      // keys, assignment cardinality, and the micro inertia grid line
      // up with the headline chain — the probe is a twin, not a fork.
      // The full (30,12) grid is pinned HERE against the headline
      // chain's decimal (r17: the probe's deliberately-red
      // inertia_full output column was dropped once its r16 diagnosis
      // was banked; the engine-side full-precision pin lives on).
      assert((p.getInt(0), p.getInt(1)) == (h.getInt(0), h.getInt(1)))
      assert(p.getAs[Long]("n_assigned") == h.getLong(2))
      val full = BigDecimal(h.getDecimal(3))
      assert(BigDecimal(p.getAs[Long]("inertia_micro")) ==
        (full * BigDecimal(1000000)).setScale(0, BigDecimal.RoundingMode.FLOOR))
      // assign_ck decomposes as 4*sum(vec_id) + n*seed: consistent
      // with n_assigned and the seed key (mod-4 residue check)
      val ck = p.getAs[Long]("assign_ck")
      val n = p.getAs[Long]("n_assigned")
      assert(((ck - n * p.getInt(1)) % 4) == 0,
        s"assign_ck must be 4*sum(vec_id) + n*seed: $p")
    }
    // per-round totals: every vector assigned exactly once means the
    // checksum totals differ between rounds only through seed terms
    val total = Tables(spark, sfDir, "embeddings").count()
    probe.groupBy(_.getInt(0)).foreach { case (it, rs) =>
      assert(rs.map(_.getAs[Long]("n_assigned")).sum == total,
        s"round $it probe coverage")
    }
  }
}
