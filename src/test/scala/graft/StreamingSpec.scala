package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.streaming.IngestStream
import graft.streaming.IngestStream.{IngestEvent, IngestState, StageUpdate}

class StreamingSpec extends SparkTestBase {

  private def runBatches(batches: Seq[Seq[IngestEvent]]): Seq[StageUpdate] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngestEvent]
    val query = IngestStream.stageStateMachine(input.toDS(), GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("updates")
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      spark.table("updates").as[StageUpdate].collect().toSeq
    } finally query.stop()
  }

  test("h1: stage machine walks downloaded → processing → processed") {
    val url = "https://acct/u/raw/a.gpkg"
    val out = runBatches(Seq(
      Seq(IngestEvent(url, "u1", "downloaded", 30, 1000L)),
      Seq(IngestEvent(url, "u1", "processing", 65, 2000L)),
      Seq(IngestEvent(url, "u1", "processed", 0, 3000L))))
    assert(out.map(_.stage) == Seq("downloaded", "processing", "processed"))
    assert(out.last.progress == 100, "terminal stage forces progress=100")
  }

  test("h1: late lower-stage events never regress the asset") {
    val url = "https://acct/u/raw/b.tif"
    val out = runBatches(Seq(
      Seq(IngestEvent(url, "u1", "processing", 65, 2000L)),
      Seq(IngestEvent(url, "u1", "downloaded", 30, 1500L)))) // late arrival
    assert(out.map(_.stage) == Seq("processing"))
  }

  test("h1: progress is monotonic within a stage") {
    val url = "https://acct/u/raw/c.nc"
    val out = runBatches(Seq(
      Seq(IngestEvent(url, "u1", "processing", 65, 1000L)),
      Seq(IngestEvent(url, "u1", "processing", 40, 2000L)))) // lower progress
    assert(out.map(_.progress) == Seq(65), s"got $out")
  }

  test("h1: cancel completes the ingest; state is freed so a re-upload restarts") {
    val url = "https://acct/u/raw/d.zip"
    val out = runBatches(Seq(
      Seq(IngestEvent(url, "u1", "processing", 50, 1000L)),
      Seq(IngestEvent(url, "u1", "Cancelled", 0, 2000L)),
      Seq(IngestEvent(url, "u1", "processing", 80, 3000L)))) // re-upload
    // terminal stage frees state (bounded memory at 100 TB); the third
    // event is a NEW ingest, mirroring the reference's re-upload flow
    assert(out.map(_.stage) == Seq("processing", "Cancelled", "processing"))
    assert(out(1).progress == 100)
    assert(out(2).progress == 80)
  }

  test("h1: hard timeout cancels the ingest and clears state (ref INGEST_TIMEOUT)") {
    import org.apache.spark.sql.streaming.TestGroupState
    val st = TestGroupState.create[IngestState](
      org.apache.spark.api.java.Optional.of(IngestState("u", "u1", "processing", 42, 1000L)),
      GroupStateTimeout.ProcessingTimeTimeout, 10000L,
      org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = true)
    val out = IngestStream.updateState("u", Iterator.empty, st).toSeq
    assert(out.map(u => (u.stage, u.progress)) == Seq(("Cancelled", 100)))
    assert(st.isRemoved, "timed-out state must be freed")
  }

  test("h1: event-time timeout cancels a stuck ingest once the watermark passes INGEST_TIMEOUT") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h = 3600 * 1000L
    val input = MemoryStream[IngestEvent]
    val query = IngestStream.stageStateMachineEventTime(input.toDS(), "1 minute")
      .writeStream.format("memory").queryName("et_updates")
      .outputMode(OutputMode.Append()).start()
    try {
      // an ingest that stalls at processing/42 (ts well past the
      // initial watermark of 0 — a ts==watermark row is dropped late)
      input.addData(Seq(IngestEvent("stuck", "u1", "processing", 42, 10 * h)))
      query.processAllAvailable()
      // a healthy asset 4h later drives the watermark past stuck's
      // lastUpdate + 1h horizon; the engine's no-data batch after the
      // watermark advance fires the timeout
      input.addData(Seq(IngestEvent("live", "u2", "downloaded", 10, 14 * h)))
      query.processAllAvailable()
      input.addData(Seq(IngestEvent("live", "u2", "processing", 50, 14 * h + 1000L)))
      query.processAllAvailable()
      val out = spark.table("et_updates").as[StageUpdate].collect().toSeq
      val stuck = out.filter(_.url == "stuck")
      assert(stuck.map(u => (u.stage, u.progress)) ==
        Seq(("processing", 42), ("Cancelled", 100)), out.mkString(";"))
      // timed-out state was freed: a re-upload restarts from scratch
      input.addData(Seq(IngestEvent("stuck", "u1", "downloaded", 5, 14 * h + 2000L)))
      query.processAllAvailable()
      val again = spark.table("et_updates").as[StageUpdate].collect()
        .filter(u => u.url == "stuck" && u.stage == "downloaded")
      assert(again.nonEmpty, "re-upload after timeout must restart the state machine")
    } finally query.stop()
  }

  test("h1: batch/stream parity — final state equals batch latest-stage on monotonic input") {
    // the oracle-gated batch op (a6 q_stage_latest) and the stream
    // state machine must agree wherever their semantics overlap:
    // monotonic per-asset event sequences
    val events = (0 until 20).flatMap { u =>
      val url = s"https://acct/u$u/raw/f$u.gpkg"
      Seq(
        IngestEvent(url, s"u$u", "downloaded", 30, 1000L + u),
        IngestEvent(url, s"u$u", "processing", 30 + u, 2000L + u),
        IngestEvent(url, s"u$u", "processed", 0, 3000L + u))
    }
    val out = runBatches(Seq(events))
    val finalByUrl = out.groupBy(_.url).map { case (url, us) => url -> us.last }
    assert(finalByUrl.size == 20)
    finalByUrl.values.foreach { u =>
      assert(u.stage == "processed", s"batch latest is 'processed', stream gave ${u.stage}")
      assert(u.progress == 100)
    }
  }

  test("h1: state machine survives kill + restart from checkpoint (state and offsets)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h = 3600 * 1000L
    val url = "https://acct/u1/raw/r.gpkg"
    // the interrupted run: batch 1 → STOP → restart from the same
    // checkpoint → batches 2-3. The same MemoryStream instance feeds
    // both queries (it retains its data; the checkpoint's committed
    // offset tells the restarted query where to resume).
    val ckpt = java.nio.file.Files.createTempDirectory("graft_h1_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_h1_out").toString
    val input = MemoryStream[IngestEvent]
    // file sink (the memory sink refuses checkpoint recovery): Append
    // parquet is the recoverable production shape, and its exactly-once
    // batch tracking also proves no batch replays across the restart
    def start() =
      IngestStream.stageStateMachineEventTime(input.toDS(), "1 minute")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
    def landed(): Seq[(String, Int)] = {
      import org.apache.spark.sql.functions.col
      spark.read.parquet(out).orderBy(col("lastUpdateMs"))
        .as[StageUpdate].collect().toSeq.map(u => (u.stage, u.progress))
    }
    val q1 = start()
    try {
      input.addData(Seq(IngestEvent(url, "u1", "processing", 65, 10 * h)))
      q1.processAllAvailable()
    } finally q1.stop() // kill mid-stream; state + offsets live in ckpt
    assert(landed() == Seq(("processing", 65)))
    val q2 = start()
    try {
      // a late lower-stage event: ONLY restored state can reject it —
      // a fresh state machine would accept and emit it
      input.addData(Seq(IngestEvent(url, "u1", "downloaded", 30, 10 * h + 1000L)))
      q2.processAllAvailable()
      input.addData(Seq(IngestEvent(url, "u1", "processed", 0, 10 * h + 2000L)))
      q2.processAllAvailable()
    } finally q2.stop()
    // batch 1 not replayed (offset + sink-log recovery), the regression
    // suppressed (restored state REMEMBERS processing/65), the terminal
    // stage landed once — and the total equals the uninterrupted run
    val combined = landed()
    val uninterrupted = runBatches(Seq(
      Seq(IngestEvent(url, "u1", "processing", 65, 10 * h)),
      Seq(IngestEvent(url, "u1", "downloaded", 30, 10 * h + 1000L)),
      Seq(IngestEvent(url, "u1", "processed", 0, 10 * h + 2000L))))
    assert(combined == uninterrupted.map(u => (u.stage, u.progress)),
      s"restart diverged from the uninterrupted run: $combined vs $uninterrupted")
    assert(combined == Seq(("processing", 65), ("processed", 100)), combined.toString)
  }

  test("h3: stream-stream cancel join matches url within the timeout interval") {
    import spark.implicits._
    import graft.streaming.IngestStream.CancelMsg
    implicit val sqlCtx = spark.sqlContext
    val ingests = MemoryStream[IngestEvent]
    val cancels = MemoryStream[CancelMsg]
    val query = IngestStream.cancelJoin(ingests.toDS(), cancels.toDS())
      .writeStream.format("memory").queryName("cancel_matches")
      .outputMode(OutputMode.Append()).start()
    try {
      val h = 3600 * 1000L
      ingests.addData(
        IngestEvent("https://acct/u1/raw/a.gpkg", "u1", "processing", 50, 10 * h),
        IngestEvent("https://acct/u2/raw/b.tif", "u2", "processing", 40, 10 * h))
      query.processAllAvailable()
      cancels.addData(
        CancelMsg("https://acct/u1/raw/a.gpkg", 10 * h + 60000L), // in window → match
        CancelMsg("https://acct/u2/raw/b.tif", 12 * h),           // > 1h later → no match
        CancelMsg("https://acct/u3/raw/c.nc", 10 * h + 1))        // unknown url → no match
      query.processAllAvailable()
      val rows = spark.table("cancel_matches").collect()
      assert(rows.map(_.getAs[String]("url")).toSeq == Seq("https://acct/u1/raw/a.gpkg"),
        rows.mkString(";"))
    } finally query.stop()
  }

  test("h4: mapGroupsWithState session summary accumulates across batches") {
    import spark.implicits._
    import graft.streaming.IngestStream.UserSession
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngestEvent]
    val query = IngestStream.userSessions(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        IngestEvent("u1/a", "u1", "downloaded", 30, 1000L),
        IngestEvent("u1/a", "u1", "processing", 60, 2000L))
      query.processAllAvailable()
      input.addData(IngestEvent("u1/b", "u1", "processing", 70, 5000L))
      query.processAllAvailable()
      val last = spark.table("sessions").as[UserSession].collect().maxBy(_.nEvents)
      assert(last == UserSession("u1", 3, 1000L, 5000L))
    } finally query.stop()
  }

  test("h5: streaming dedup drops re-delivered content keys within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val query = IngestStream.streamingDedup(
        input.toDF().toDF("contentKey", "eventTimeMs"))
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(("k1", 1000L), ("k1", 2000L), ("k2", 3000L))
      query.processAllAvailable()
      input.addData(("k1", 60000L), ("k3", 61000L)) // k1 re-delivered in-watermark
      query.processAllAvailable()
      val keys = spark.table("deduped").collect().map(_.getAs[String]("contentKey"))
      assert(keys.sorted.toSeq == Seq("k1", "k2", "k3"), keys.mkString(","))
    } finally query.stop()
  }

  test("h22: the streaming URL guard admits one spelling per canonical resource") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val query = IngestStream.streamingUrlGuard(
        input.toDF().toDF("raw", "eventTimeMs"))
      .writeStream.format("memory").queryName("url_guard")
      .outputMode(OutputMode.Append()).start()
    val u = "https://acct.blob.core.windows.net/userdata/user7/raw/file_0.gpkg"
    try {
      // four spellings of ONE resource across two micro-batches + one
      // genuinely different resource
      input.addData((u, 1000L), (u + "/", 2000L))
      query.processAllAvailable()
      input.addData(("HTTPS" + u.substring(5) + "#sec2", 3000L),
        (u + "?utm_source=email&id=3", 4000L),
        (u + "?id=9", 5000L))
      query.processAllAvailable()
      val got = spark.table("url_guard").collect()
        .map(r => (r.getString(0), r.getString(1)))
      // canon groups: u (3 spellings -> first raw admitted), u?id=3
      // (the tracking-param variant canonicalizes onto the clean
      // param form), u?id=9 (distinct resource)
      assert(got.length == 3, got.mkString("; "))
      val byCanon = got.toMap
      assert(byCanon(u) == u, "first spelling must be the admitted one")
      assert(byCanon(u + "?id=3") == u + "?utm_source=email&id=3",
        "tracking variant must be admitted under its canonical key")
      assert(byCanon.contains(u + "?id=9"))
    } finally query.stop()
  }

  test("h1 on RocksDB: the state machine runs unchanged on the production state store") {
    // local tests default to the in-memory HDFS-backed store; a 100 TB
    // stream keys state by asset url and MUST run on RocksDB (state
    // larger than executor heap, incremental checkpoints). Prove the
    // stateful operators are store-agnostic: same state machine, same
    // output, RocksDB provider actually engaged.
    import spark.implicits._
    import graft.streaming.IngestStream.IngestEvent
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[IngestEvent]
    val query = IngestStream.stageStateMachine(input.toDS(), GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("rocksdb_stages")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        IngestEvent("u1/a.tif", "u1", "downloaded", 30, 1000L),
        IngestEvent("u1/a.tif", "u1", "processing", 60, 2000L))
      query.processAllAvailable()
      input.addData(IngestEvent("u1/a.tif", "u1", "processed", 100, 3000L))
      query.processAllAvailable()
      val stages = spark.table("rocksdb_stages").collect()
        .map(_.getAs[String]("stage")).toSeq
      assert(stages == Seq("downloaded", "processing", "processed"), stages.mkString(","))
      // the provider must actually be RocksDB, not silently defaulted
      val p = query.lastProgress.stateOperators
      assert(p.nonEmpty && p(0).customMetrics.containsKey("rocksdbFilesCopied"),
        s"RocksDB store not engaged: ${if (p.isEmpty) "no state ops" else p(0).customMetrics}")
    } finally {
      query.stop()
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("h8: streaming heavy hitters keep frequent users in bounded sharded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngestEvent]
    val cap = 8
    val query = IngestStream.frequentUsers(input.toDS(), cap = cap, nShards = 4)
      .writeStream.format("memory").queryName("freq_users")
      .outputMode(OutputMode.Update()).start()
    try {
      def ev(user: String, i: Int) = IngestEvent(s"u$i", user, "processing", 10, i * 1000L)
      // batch 1: heavy "alice" among distinct noise users
      input.addData((0 until 60).map(i =>
        if (i % 3 == 0) ev("alice", i) else ev(s"noise_a$i", i)): _*)
      query.processAllAvailable()
      // batch 2: "bob" becomes heavy too — state must ACCUMULATE
      input.addData((60 until 120).map(i =>
        if (i % 3 == 0) ev("bob", i) else if (i % 3 == 1) ev("alice", i)
        else ev(s"noise_b$i", i)): _*)
      query.processAllAvailable()
      // latest sketch per shard (Update mode re-emits touched shards)
      val latest = spark.table("freq_users").collect()
        .groupBy(_.getAs[Int]("shard"))
        .map { case (_, rows) => rows.maxBy(_.getAs[Long]("n")) }.toSeq
      val merged = latest.flatMap(_.getAs[Map[String, Long]]("counts")).toMap
      // both heavy users survive across batches (alice 40, bob 20 —
      // state must ACCUMULATE across batches for alice's 20+20); the
      // per-shard MG slack is shard_n/(cap+1)
      val truth = Map("alice" -> 40L, "bob" -> 20L)
      assert(merged.contains("alice") && merged.contains("bob"),
        s"lost a heavy user: ${merged.keys.toSeq.sorted}")
      val total = latest.map(_.getAs[Long]("n")).sum
      assert(total == 120L, s"event count diverged: $total")
      truth.foreach { case (u, c) =>
        assert(merged(u) <= c, s"MG overestimated $u: ${merged(u)} > $c") }
      latest.foreach { r =>
        val m = r.getAs[Map[String, Long]]("counts")
        assert(m.size <= cap, s"shard state exceeded cap: ${m.size}")
        val slack = r.getAs[Long]("n") / (cap + 1)
        truth.foreach { case (u, c) =>
          if (m.contains(u))
            assert(c - m(u) <= slack,
              s"$u underestimated past the shard bound: ${m(u)} vs $c")
        }
      }
    } finally query.stop()
  }

  test("h6: session windows close on the 30-minute gap once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngestEvent]
    val query = IngestStream.sessionWindows(input.toDS().toDF())
      .writeStream.format("memory").queryName("sessions_w")
      .outputMode(OutputMode.Append()).start()
    try {
      val min = 60 * 1000L
      // two bursts 40 min apart → two sessions for u1
      input.addData(
        IngestEvent("a", "u1", "processing", 10, 0L),
        IngestEvent("a", "u1", "processing", 20, 10 * min),
        IngestEvent("a", "u1", "processing", 30, 50 * min))
      query.processAllAvailable()
      // far-future event advances the watermark past both sessions
      input.addData(IngestEvent("b", "u2", "processing", 10, 600 * min))
      query.processAllAvailable()
      val rows = spark.table("sessions_w")
        .where("user = 'u1'").collect()
        .map(r => (r.getAs[Long]("n_events"),
          r.getAs[java.sql.Timestamp]("session_start").getTime))
        .sortBy(_._2)
      assert(rows.toSeq == Seq((2L, 0L), (1L, 50 * min)), rows.mkString(";"))
    } finally query.stop()
  }

  test("h7: foreachBatch lands the stream in the partitioned datasets layout") {
    import spark.implicits._
    import graft.sources.DatasetsSink
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val input = MemoryStream[IngestEvent]
    // the production write path: each micro-batch appended through the
    // same partitioned-layout sink batch jobs use
    val query = input.toDS().toDF()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.withColumn("user_id", org.apache.spark.sql.functions.col("user"))
          .write.mode("append").partitionBy("user_id").parquet(out)
      }
      .start()
    try {
      input.addData(
        IngestEvent("a", "u1", "downloaded", 30, 1000L),
        IngestEvent("b", "u2", "downloaded", 30, 2000L))
      query.processAllAvailable()
      input.addData(IngestEvent("c", "u1", "processing", 60, 3000L))
      query.processAllAvailable()
      val back = spark.read.parquet(out)
      assert(back.count() == 3)
      // partition pruning serves the per-user read, as in DatasetsSink
      val one = back.where("user_id = 'u1'")
      assert(one.count() == 2)
      assert(one.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(user_id"))
      assert(new java.io.File(out).listFiles.exists(_.getName == "user_id=u1"))
    } finally query.stop()
  }

  test("h14: auto-compaction maintenance keeps old batch partitions compact while the stream runs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_maintained").toString
    val input = MemoryStream[Int]
    // scatter each micro-batch into many small files so the sweep has
    // real work; horizon 2 keeps the newest two batches untouched
    val sink = graft.sources.DatasetsSink.maintainedBatchSink(
      out, horizon = 2, targetBytes = 64L * 1024 * 1024,
      sortCols = Seq("value"), bloomCols = Seq()) _
    val query = input.toDS().toDF()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        sink(b.repartition(6), id)
      }
      .start()
    try {
      (0 until 4).foreach { b =>
        input.addData(b * 100 until b * 100 + 12: _*)
        query.processAllAvailable()
      }
      def files(b: Int): Int = new java.io.File(s"$out/batch_id=$b")
        .listFiles.count(_.getName.endsWith(".parquet"))
      // batches 0/1 are beyond the horizon at batch 3 → compacted to 1
      // file; batches 2/3 are inside the horizon → still scattered
      assert(files(0) == 1 && files(1) == 1,
        s"old partitions should be compacted, got ${files(0)}/${files(1)}")
      assert(files(2) > 1 && files(3) > 1,
        "in-horizon partitions must not be compacted yet")
      val back = spark.read.parquet(out)
      assert(back.count() == 48 && back.select("value").distinct().count() == 48)
      // a late REPLAY of an already-compacted batch overwrites its own
      // partition and stays exactly-once — compaction never changed the
      // replay unit
      sink((0 until 12).toDF("value").repartition(6), 0L)
      val after = spark.read.parquet(out)
      assert(after.count() == 48, "replay after compaction must replace, not append")
      assert(after.where("batch_id = 0").count() == 12)
    } finally query.stop()
  }

  test("i1: graft-queue streams micro-batches through the h1 state machine into the partitioned sink") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_queue_stream").toString
    // the reference's continuous receiver loop (ingest.py:41), end to
    // end on Spark: queue connector → parse → stage state machine →
    // partitioned datasets layout, rate-limited per trigger
    val msgs = spark.readStream.format("graft-queue")
      .option("numMessages", 300)
      .option("numPartitions", 4)
      .option("maxMessagesPerTrigger", 100)
      .load()
    val events = msgs.select(
        col("blob_url").as("url"),
        regexp_extract(col("blob_url"), "/userdata/([^/]+)/", 1).as("user"),
        lit("queued").as("stage"),
        lit(0).as("progress"),
        col("event_id").as("eventTimeMs"))
      .as[IngestEvent]
    val updates = IngestStream.stageStateMachine(events, GroupStateTimeout.NoTimeout)
    val query = updates.toDF()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.withColumn("user_id", col("user"))
          .write.mode("append").partitionBy("user_id").parquet(out)
      }
      .start()
    try {
      query.processAllAvailable()
      // admission control: 300 messages at 100/trigger = 3 data batches
      val dataBatches = query.recentProgress.filter(_.numInputRows > 0)
      assert(dataBatches.length == 3, dataBatches.map(_.numInputRows).mkString(","))
      assert(dataBatches.forall(_.numInputRows == 100))
      // every message produced exactly one state-machine update in the sink
      val back = spark.read.parquet(out)
      assert(back.count() == 300)
      assert(back.select("url").distinct().count() == 300)
      assert(back.select("stage").distinct().collect().map(_.getString(0)).toSeq == Seq("queued"))
      // per-user partition pruning serves the read, as in DatasetsSink
      assert(new java.io.File(out).listFiles.exists(_.getName.startsWith("user_id=")))
    } finally query.stop()
  }

  test("i1: Trigger.AvailableNow drains the queue backlog in rate-limited batches and stops") {
    import org.apache.spark.sql.streaming.Trigger
    val out = java.nio.file.Files.createTempDirectory("graft_queue_avail").toString
    val query = spark.readStream.format("graft-queue")
      .option("numMessages", 250)
      .option("numPartitions", 4)
      .option("maxMessagesPerTrigger", 100)
      .load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out)
      }
      .start()
    // AvailableNow must terminate on its own once the backlog drains
    assert(query.awaitTermination(120000L), "AvailableNow query did not stop")
    val batches = query.recentProgress.filter(_.numInputRows > 0).map(_.numInputRows)
    assert(batches.toSeq == Seq(100L, 100L, 50L), batches.mkString(","))
    assert(spark.read.parquet(out).count() == 250)
  }

  test("i1: queue stream restarts from the checkpointed offset — no loss, no replay") {
    import org.apache.spark.sql.streaming.Trigger
    val out = java.nio.file.Files.createTempDirectory("graft_queue_ckpt_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_queue_ckpt").toString
    def run(numMessages: Int): Unit = {
      val q = spark.readStream.format("graft-queue")
        .option("numMessages", numMessages)
        .option("numPartitions", 4)
        .option("maxMessagesPerTrigger", 60)
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        .start()
      assert(q.awaitTermination(120000L))
      q.stop()
    }
    // first run drains the 120-message backlog; the "queue" then grows
    // to 200 and the restarted query must resume at offset 120 —
    // deserializeOffset + commit are the recovery surface
    run(120)
    assert(spark.read.parquet(out).count() == 120)
    run(200)
    val back = spark.read.parquet(out)
    assert(back.count() == 200, "restart must deliver exactly the 80 new messages")
    assert(back.select("event_id").distinct().count() == 200, "no message replayed")
  }

  test("h2: windowed counts aggregate per stage (batch twin checked by oracle)") {
    import spark.implicits._
    val df = Seq(
      IngestEvent("u", "u1", "processing", 10, 0L),
      IngestEvent("u", "u1", "processing", 20, 60 * 60 * 1000L),
      IngestEvent("u", "u1", "processed", 100, 60 * 60 * 1000L + 1)).toDF()
    val out = IngestStream.windowedCounts(df).collect()
    assert(out.map(_.getAs[Long]("n")).sum == 3)
    assert(out.length == 3, out.mkString(";"))
  }

  test("h10: streaming as-of answers probes with the latest update, one state row per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import IngestStream.{AsofMatch, KeyedElem}
    def upd(k: Long, t: Long, id: Long, p: Double) = KeyedElem(k, t, 0, id, p, -1L)
    def probe(k: Long, t: Long, pid: Long) = KeyedElem(k, t, 1, -1L, 0.0, pid)

    val input = MemoryStream[KeyedElem]
    val q = IngestStream.streamingAsof(input.toDS())
      .writeStream.format("memory").queryName("h10_asof")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: out-of-order WITHIN the batch (probe listed before the
      // update it must see), same-time tie (update applies first)
      input.addData(Seq(
        probe(1L, 10L, 100L), upd(1L, 5L, 50L, 0.5), upd(1L, 10L, 51L, 0.7),
        probe(2L, 3L, 200L), // no update for k=2 yet: unanswered
        upd(3L, 1L, 70L, 0.1)))
      q.processAllAvailable()
      // batch 2: probes answered from STATE carried across batches;
      // many updates for k=3 still collapse to one state row
      input.addData(Seq(
        probe(3L, 2L, 300L),
        upd(3L, 3L, 71L, 0.2), upd(3L, 4L, 72L, 0.3), upd(3L, 5L, 73L, 0.4),
        probe(3L, 9L, 301L),
        probe(1L, 99L, 101L)))
      q.processAllAvailable()

      val out = spark.table("h10_asof").as[AsofMatch].collect()
        .map(m => m.probeId -> ((m.updateId, m.payload))).toMap
      assert(out == Map(
        100L -> ((51L, 0.7)),  // same-time update wins the tie
        300L -> ((70L, 0.1)),  // carried across batches
        301L -> ((73L, 0.4)),  // latest of the in-batch run
        101L -> ((51L, 0.7))), // state survives idle batches
        s"got $out")
      // probe 200 had no update at-or-before its time: no row
      assert(!out.contains(200L))
      // the state is ONE row per key WITH updates (k=1, k=3) — not one
      // per update, and probe-only keys (k=2) hold no state at all
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 2L, s"expected 2 state rows, got $stateRows")
    } finally q.stop()
  }

  test("h31: streaming reprojection dispatch — kernel-exact, stateless, dead-letters no-authority") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.IngestStream.FeatureIn
    val feats = Seq(
      FeatureIn(1L, 4326, isSame = false, 12.3456789, 47.1, 1000L),
      FeatureIn(2L, 3857, isSame = false, -122.41, 37.77, 2000L),
      FeatureIn(3L, 32633, isSame = false, 15.9, 48.2, 3000L),
      FeatureIn(4L, 2249, isSame = false, -71.06, 42.36, 4000L),
      FeatureIn(5L, -1, isSame = true, 3.3, 4.4, 5000L),
      FeatureIn(6L, -1, isSame = false, 9.9, 8.8, 6000L))
    // batch twin on the SAME rows — the stream stage must be row-for-row
    // identical (same kernel, same routing CASEs)
    val want = IngestStream.reprojectStream(feats.toDF())
      .collect().map(r => r.getLong(0) -> r).toMap
    val input = MemoryStream[FeatureIn]
    val q = IngestStream.reprojectStream(input.toDF())
      .writeStream.format("memory").queryName("h31_reproj")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(feats)
      q.processAllAvailable()
      val out = spark.table("h31_reproj").collect()
      assert(out.length == feats.length)
      out.foreach { r =>
        val w = want(r.getLong(0))
        assert(r.toSeq == w.toSeq, s"stream/batch divergence for feature ${r.getLong(0)}")
      }
      val byId = out.map(r => r.getLong(0) -> r).toMap
      // passthrough keeps (rounded) coords; transforms land within 1e-6
      // of the source (these are roundtrip chains); dead-letter is NULL
      assert(byId(1L).getDouble(4) == 12.3456789)
      assert(math.abs(byId(2L).getDouble(4) - (-122.41)) < 1e-6)
      assert(math.abs(byId(3L).getDouble(5) - 48.2) < 1e-6)
      assert(math.abs(byId(4L).getDouble(4) - (-71.06)) < 1e-6)
      assert(byId(3L).getString(3) == "tm_krueger")
      assert(byId(5L).getString(3) == "is_same_passthrough" && byId(5L).getDouble(4) == 3.3)
      assert(byId(6L).getString(3) == "failed_no_authority" && byId(6L).isNullAt(4) && byId(6L).isNullAt(5))
      // stateless: months of uptime accumulate nothing
      assert(q.lastProgress.stateOperators.isEmpty,
        s"the reprojection stage must not create state: ${q.lastProgress}")
    } finally q.stop()
  }

  test("h9: stream-static enrichment is stateless, broadcast, and never drops events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val profile = Seq(("u1", "ALICE", "EUROPE"), ("u2", "BOB", "ASIA"))
      .toDF("user", "display_name", "region")

    // the join shape itself (same plan batch or stream): broadcast,
    // no shuffle of the event side
    val batchTwin = IngestStream.enrichWithProfile(
      Seq(IngestEvent("url1", "u1", "processing", 50, 0L)).toDF(), profile)
    val physical = batchTwin.queryExecution.executedPlan.toString()
    assert(physical.contains("BroadcastHashJoin"), physical)

    val input = MemoryStream[IngestEvent]
    val q = IngestStream.enrichWithProfile(input.toDF(), profile)
      .writeStream.format("memory").queryName("h9_enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Seq(
        IngestEvent("url1", "u1", "downloaded", 30, 1000L),
        IngestEvent("url2", "u2", "processing", 65, 2000L),
        IngestEvent("url3", "u_unknown", "downloaded", 30, 3000L)))
      q.processAllAvailable()
      val out = spark.table("h9_enriched").collect()
      assert(out.length == 3, "left join must pass unmatched users through")
      val byUser = out.map(r => r.getAs[String]("user") -> r.getAs[String]("region")).toMap
      assert(byUser("u1") == "EUROPE" && byUser("u2") == "ASIA")
      assert(byUser("u_unknown") == null)
      // stateless: months of uptime accumulate nothing
      assert(q.lastProgress.stateOperators.isEmpty,
        s"stream-static join must not create state: ${q.lastProgress}")
    } finally q.stop()
  }

  test("h11: streaming near-dup guard pairs re-uploads in-window, once per pair") {
    import spark.implicits._
    import graft.streaming.IngestStream.HashedImage
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[HashedImage]
    val q = IngestStream.nearDupGuard(input.toDS())
      .writeStream.format("memory").queryName("h11_pairs")
      .outputMode(OutputMode.Append()).start()
    try {
      val h = 3600 * 1000L
      input.addData(
        HashedImage(1L, 10, 20, 30, 40, 10 * h),          // original
        HashedImage(2L, 10, 20, 30, 40, 10 * h + 300000), // exact re-upload → hamming 0
        HashedImage(3L, 10, 20, 30, 41, 10 * h + 600000), // 1-bit edit → hamming 1 to both
        HashedImage(4L, 999, 888, 777, 666, 10 * h + 1))  // unrelated
      q.processAllAvailable()
      input.addData(HashedImage(5L, 10, 20, 30, 40, 13 * h)) // same image, 3h later → outside window
      q.processAllAvailable()
      val rows = spark.table("h11_pairs").collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("hamming")))
      // (1,3) shares 3 equal chunks ⇒ 3 block hits; the chained
      // dropDuplicatesWithinWatermark must emit it ONCE
      assert(rows.length == rows.map(p => (p._1, p._2)).distinct.length,
        s"pair emitted more than once: ${rows.toSeq}")
      assert(rows.toSet == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)),
        s"got ${rows.toSeq}")
      // the late doc 5 never pairs: outside the 1h bound
      assert(!rows.exists(p => p._1 == 5L || p._2 == 5L))
    } finally q.stop()
  }
}
