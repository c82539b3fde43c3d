package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Maintenance, Multimodal}
import graft.streaming.StreamOps

/** StreamOps (tagging, token folding, windowed aggs, dead-letter,
  * fan-out), Maintenance idioms, and the multimodal plumbing.
  */
class StreamMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("tagEvents prefixes the event type (ST2)") {
    val df  = Seq(("a", "tool:pre")).toDF("session_id", "event")
    val out = StreamOps.tagEvents(df, "hook:").select("event").as[String].collect()
    assert(out.toSeq == Seq("hook:tool:pre"))
  }

  test("foldTokens assembles per-message content in seq order (ST5/A8)") {
    val tokens = Seq(
      ("m1", 2L, "world"), ("m1", 1L, "hello "), ("m2", 1L, "x"),
    ).toDF("message_id", "seq", "token")
    val out = StreamOps.foldTokens(tokens).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out("m1") == ("hello world", 2L))
    assert(out("m2") == ("x", 1L))
  }

  test("incremental near-dup probe runs on a stream: stream-static, zero state") {
    // The daily-ingest near-dup probe as a LIVE stream: arriving docs are
    // banded statelessly and stream-static-joined against the persisted
    // corpus index. The emitted dup-candidate set must equal the batch
    // x27_fast flags — same engine answer whether the batch arrives as a
    // file or as a stream.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").select("doc_id", "text")
    val corpusBands = Dedup.fastBandTable(docs.filter("doc_id % 2 = 0")).localCheckpoint()
    val arriving = docs.filter("doc_id % 2 <> 0").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Long, String)]
    val query = Dedup
      .incrementalNeardupStream(input.toDF().toDF("doc_id", "text"), corpusBands)
      .writeStream.format("memory").queryName("neardup_probe")
      .outputMode(OutputMode.Append).start()
    try {
      // two micro-batches: per-row banding means batch boundaries can't
      // change the answer
      val (first, second) = arriving.splitAt(arriving.length / 2)
      input.addData(first: _*)
      query.processAllAvailable()
      input.addData(second: _*)
      query.processAllAvailable()
      val streamed = spark.table("neardup_probe").collect().map(_.getLong(0)).toSet
      val expected = Dedup.x27_fast_incremental.run(spark, sf0001).collect()
        .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
      assert(streamed == expected)
      // and the plan really is stateless: no state store operator ran
      assert(query.lastProgress.stateOperators.isEmpty)
    } finally query.stop()
  }

  test("dedupWithinWatermark: in-batch + cross-batch dups dropped, expired keys re-admit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val deduped = StreamOps.dedupWithinWatermark(
      input.toDF().toDF("ts", "content_hash"), "ts", "10 seconds", Seq("content_hash"))
    val query = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    def emitted(): Seq[(Long, String)] = spark.table("dedup_stream")
      .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1))).toSeq
    try {
      // batch 1: an in-batch duplicate of A collapses
      input.addData(ts(1) -> "A", ts(1) -> "A", ts(2) -> "B")
      query.processAllAvailable()
      assert(emitted().sorted == Seq(1L -> "A", 2L -> "B"))
      // batch 2: A re-sent inside the watermark window -> dropped
      input.addData(ts(3) -> "A")
      query.processAllAvailable()
      assert(emitted().count(_._2 == "A") == 1)
      // batch 3 advances the watermark far past A's state...
      input.addData(ts(100) -> "C")
      query.processAllAvailable()
      // ...so batch 4's A is a NEW key again (state was evicted — bounded
      // by ingest rate x watermark, not corpus size)
      input.addData(ts(120) -> "A")
      query.processAllAvailable()
      assert(emitted().count(_._2 == "A") == 2)
      assert(emitted().length == 4)
    } finally query.stop()
  }

  test("windowedCounts over the batch events table matches a manual bucket count") {
    val events = graft.Tables(spark, sf0001).events
    val out = StreamOps.windowedCounts(events, "1 day", "1 day", "1 hour")
    val manual = events
      .groupBy((unix_millis(col("ts")) / 86400000L).cast("long").as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(out.agg(sum("n")).first().getLong(0) == events.count())
    assert(out.count() == manual.count())
  }

  test("windowedCounts works on a streaming frame with watermark (ST6 shape)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df    = input.toDF().toDF("ts", "event_type")
    val q = StreamOps.windowedCounts(df, "1 hour", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_out").outputMode("append").start()
    try {
      input.addData(
        (java.sql.Timestamp.valueOf("2026-01-01 10:05:00"), "click"),
        (java.sql.Timestamp.valueOf("2026-01-01 10:20:00"), "click"),
        (java.sql.Timestamp.valueOf("2026-01-01 12:00:00"), "view")) // advances watermark past 10-11h
      q.processAllAvailable()
      input.addData((java.sql.Timestamp.valueOf("2026-01-01 13:00:00"), "view"))
      q.processAllAvailable()
      val rows = spark.table("win_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(rows.contains((java.sql.Timestamp.valueOf("2026-01-01 10:00:00").getTime, "click", 2L)))
    } finally q.stop()
  }

  test("stream-stream pre/post join correlates within tolerance and computes duration (J3/ST8)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val pre  = MemoryStream[(String, String, java.sql.Timestamp)]
    val post = MemoryStream[(String, String, java.sql.Timestamp)]
    val joined = StreamOps.prePostStreamJoin(
      pre.toDF().toDF("name", "group_id", "ts"),
      post.toDF().toDF("name", "group_id", "ts"),
      watermark = "10 seconds", toleranceSeconds = 60)
    val q = joined.writeStream.format("memory").queryName("prepost_out").outputMode("append").start()
    try {
      pre.addData(("Read", "pg-1", ts("2026-01-01 10:00:00")), ("Run", "pg-2", ts("2026-01-01 10:00:10")))
      post.addData(
        ("Read", "pg-1", ts("2026-01-01 10:00:03")),  // match, 3s
        ("Run", "pg-2", ts("2026-01-01 10:05:00")),   // outside 60s tolerance
        ("Ghost", "pg-9", ts("2026-01-01 10:00:05"))) // no matching pre
      q.processAllAvailable()
      val rows = spark.table("prepost_out").collect()
        .map(r => (r.getString(0), r.getLong(r.fieldIndex("duration_ms"))))
      assert(rows.toSeq == Seq(("Read", 3000L)))
    } finally q.stop()
  }

  test("date-partitioned events: time-range scan prunes partitions (100TB layout)") {
    val dir    = Files.createTempDirectory("events-part").toString + "/t"
    val events = graft.Tables(spark, sf0001).events
    graft.sources.EventLog.writeDatePartitioned(events, dir)
    val scan = spark.read.parquet(dir)
      .filter(col("event_date") === "2024-01-05")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"), s"no partition filter:\n$plan")
    assert(scan.count() > 0)
    // pruned read returns exactly the day's rows
    val expected = events.filter(to_date(col("ts")) === "2024-01-05").count()
    assert(scan.count() == expected)
  }

  test("deadLetterSplit separates corrupt rows (ST8)") {
    val df = Seq(("ok", null), (null, "{broken")).toDF("event", "_corrupt_record")
    val (good, bad) = StreamOps.deadLetterSplit(df)
    assert(good.count() == 1 && bad.count() == 1)
    assert(!good.columns.contains("_corrupt_record"))
  }

  test("fan-out foreachBatch writes every micro-batch to all sinks (ST1)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Int]
    val dirA  = Files.createTempDirectory("fanA").toString + "/t"
    val dirB  = Files.createTempDirectory("fanB").toString + "/t"
    val ckpt  = Files.createTempDirectory("fanC").toString
    val q = StreamOps.fanOutForeachBatch(
      input.toDF(),
      Seq(b => b.write.mode("append").parquet(dirA), b => b.write.mode("append").parquet(dirB)),
      ckpt)
    try {
      input.addData(1, 2, 3)
      q.processAllAvailable()
      assert(spark.read.parquet(dirA).count() == 3)
      assert(spark.read.parquet(dirB).count() == 3)
    } finally q.stop()
  }

  test("keepaliveTicks stream starts and emits a tick (ST3)") {
    // Regression: rowsPerSecond was passed as a Double; the rate source
    // parses it with toLong, so every stream start threw
    // NumberFormatException before the fix.
    val q = StreamOps.keepaliveTicks(spark, intervalSeconds = 2)
      .writeStream.format("memory").queryName("keepalive_out").outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 20000
      while (spark.table("keepalive_out").isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      val rows = spark.table("keepalive_out").collect()
      assert(rows.nonEmpty, "no keepalive tick within 20s")
      assert(rows.head.getString(rows.head.fieldIndex("event")) == "keepalive")
    } finally q.stop()
  }

  test("maintenance: upsert replaces same-key rows and keeps the rest (M1)") {
    val base    = Seq((1, "old"), (2, "keep")).toDF("id", "v")
    val updates = Seq((1, "new"), (3, "ins")).toDF("id", "v")
    val out = Maintenance.upsert(base, updates, Seq("id"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out == Map(1 -> "new", 2 -> "keep", 3 -> "ins"))
  }

  test("maintenance: deleteLastPerGroup pops the transcript tail (M8)") {
    val df = Seq(("s", 1, "a"), ("s", 2, "b"), ("t", 1, "x")).toDF("sid", "n", "v")
    val out = Maintenance.deleteLastPerGroup(df, "sid", Seq(col("n")))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(out == Set(("s", 1))) // t's only row popped, s keeps first
  }

  test("maintenance: compact rewrites a path to the target file count") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    (1 to 4).foreach(i => Seq(i).toDF("x").write.mode("append").parquet(dir))
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet")) >= 4)
    Maintenance.compact(spark, dir, 1)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet")) == 1)
    assert(spark.read.parquet(dir).count() == 4)
  }

  test("maintenance: a compaction crashed between set-aside and swap-in rolls back") {
    // the r10 hardening: the live dir was renamed to __compact_old and the
    // process died before the compacted copy renamed in — the table must
    // come back on the next compact, not stay vanished
    val dir = Files.createTempDirectory("compact-crash").toString + "/t"
    (1 to 3).foreach(i => Seq(i).toDF("x").write.mode("append").parquet(dir))
    val live = new java.io.File(dir)
    val bak  = new java.io.File(dir + "__compact_old")
    assert(live.renameTo(bak), "test setup: could not simulate the crash window")
    Maintenance.compact(spark, dir, 1)
    assert(spark.read.parquet(dir).count() == 3, "rows lost across the crash window")
    assert(!bak.exists(), "stale backup left behind")
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet")) == 1)
  }

  test("maintenance: compact serializes with merge on the shared lock") {
    // r10 ADVICE: an unlocked compact concurrent with a merge could
    // interleave directory renames on one table. compact now takes the
    // same _graft_merge_lock, fails loudly while it is held, honors the
    // takeover escape hatch, and leaves no lock behind on success.
    val dir = Files.createTempDirectory("compact-lock").toString + "/t"
    (1 to 3).foreach(i => Seq(i).toDF("x").write.mode("append").parquet(dir))
    val lock = new java.io.File(dir, "_graft_merge_lock")
    assert(lock.createNewFile(), "test setup: could not place the merge lock")
    intercept[IllegalStateException] { Maintenance.compact(spark, dir, 1) }
    assert(spark.read.parquet(dir).count() == 3, "failed compact must not touch the table")
    Maintenance.compact(spark, dir, 1, takeoverLock = true)
    assert(spark.read.parquet(dir).count() == 3)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet")) == 1)
    assert(!lock.exists(), "compact must release the lock it held")
  }

  test("multimodal: feature extraction is deterministic, schema-stable, null-safe") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image", "mem://a", Array.tabulate(512)(_.toByte), 16, 16, 0L),
      Multimodal.MediaRow(2L, "audio", "mem://b", Array[Byte](1, 2, 3), 0, 0, 1000L),
      Multimodal.MediaRow(3L, "video", "mem://c", null, 0, 0, 0L),
    ).toDS()
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.mean_intensity).toSeq == f2.map(_.mean_intensity).toSeq)
    assert(f1(0).frame_count == 2)                 // 512 bytes -> 2 "frames"
    assert(f1(0).feature.length == 16)
    assert(math.abs(f1(0).feature.sum - 1.0f) < 1e-5) // normalized histogram
    assert(f1(2).n_bytes == 0L && f1(2).mean_intensity == 0.0)
  }

  test("multimodal: metadata projection never reads the binary column") {
    val dir = Files.createTempDirectory("media").toString + "/t"
    Seq(Multimodal.MediaRow(1L, "image", "u", Array[Byte](1), 2, 2, 0L)).toDS()
      .write.parquet(dir)
    val plan = Multimodal.metadataOnly(spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("bytes"), s"binary column leaked into scan:\n$plan")
  }

  test("curation on ingest: redaction + verdict + split run unchanged on a stream") {
    // The per-document Curation decisions are pure column expressions, so
    // the batch-verified ops apply verbatim to readStream ingest — this is
    // the curate-as-you-land path (dedupWithinWatermark above is the
    // stateful stage of the same pipeline).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.operators.{Curation, TrainPrep}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val curated = input.toDF().toDF("doc_id", "text")
      .select(
        col("doc_id"),
        Curation.redactPii(col("text")).as("redacted"),
        Curation.qualityVerdict(col("text"), 2, 1000, 0.0, 100.0, 0.9).as("verdict"),
        Curation.assignSplit(col("doc_id")).as("split"))
    val query = curated.writeStream.format("memory").queryName("curated_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, "reach me at a@b.co today"), (2L, "x"))
      query.processAllAvailable()
      val rows = spark.table("curated_stream").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
      assert(rows(1L)._1 == "reach me at [EMAIL] today")
      assert(rows(1L)._2 == "ok" && rows(2L)._2 == "too_short")
      // split matches the batch-side hash decision exactly
      val batchSplit = Seq((1L, "x"), (2L, "x")).toDF("doc_id", "text")
        .select(col("doc_id"), Curation.assignSplit(col("doc_id")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows(1L)._3 == batchSplit(1L) && rows(2L)._3 == batchSplit(2L))
      assert(TrainPrep.redactPii("reach me at a@b.co today") == rows(1L)._1)
    } finally query.stop()
  }

  test("streamingZscore flags exactly what the batch x58 window flags (kappa parity)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.ZPoint
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Tables(spark, sf0001).events
    val pts = events
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("tsMs"), col("value"))
      // getDouble on a NULL silently yields 0.0 — the stream side would
      // score fabricated points the batch window drops. Current testdata
      // has no null values; if that ever changes this fails LOUDLY here
      // instead of producing an unreliable parity comparison.
      .collect()
      .map { r => assert(!r.isNullAt(3), s"null value in events at event_id=${r.getLong(1)}"); r }
      .map(r => ZPoint(r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(p => (p.tsMs, p.eventId)) // globally time-ordered arrival
    val input = MemoryStream[ZPoint]
    val query = graft.streaming.StreamOps
      .streamingZscore(input.toDS(), lookback = 20, threshold = 2.5)
      .writeStream.format("memory").queryName("z_stream")
      .outputMode(OutputMode.Append).start()
    try {
      // three micro-batches: the ring state must carry the frame across
      // batch boundaries for the answer to match the batch window
      pts.grouped(math.max(1, pts.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*)
        query.processAllAvailable()
      }
      val streamed = spark.table("z_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val batch = graft.operators.Analytics.rollingZscore(events, 20, 2.5)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(streamed.keySet === batch.keySet,
        s"flag sets differ: stream-only=${streamed.keySet -- batch.keySet} batch-only=${batch.keySet -- streamed.keySet}")
      val maxGap = streamed.map { case (k, z) => math.abs(z - batch(k)) }.max
      assert(maxGap <= 1e-4, s"z values diverged by $maxGap") // same 4dp contract
      // state really is bounded: one ring per user, never a row backlog
      val stateRows = query.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows <= events.select("user_id").distinct().count())
    } finally query.stop()
  }

  test("streamingZscore drops and counts late rows instead of corrupting the baseline") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.ZPoint
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lateAcc = spark.sparkContext.longAccumulator("zscore_late_dropped")
    // a flat baseline, then a stray from BEFORE it (batch 2), then a spike:
    // if the stray were folded, the baseline's stddev would inflate and the
    // spike's z would change; dropping it keeps parity with in-order ingest
    val base  = (1 to 10).map(i => ZPoint(7L, i.toLong, i * 1000L, 100.0 + (i % 3)))
    val stray = ZPoint(7L, 99L, 500L, 5000.0) // tsMs before every applied row
    val dup   = ZPoint(7L, 10L, 10000L, 100.0 + (10 % 3)) // exact duplicate of last
    val spike = ZPoint(7L, 11L, 11000L, 200.0)
    val input = MemoryStream[ZPoint]
    val query = graft.streaming.StreamOps
      .streamingZscore(input.toDS(), lookback = 20, threshold = 2.5, Some(lateAcc))
      .writeStream.format("memory").queryName("z_late")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(base: _*); query.processAllAvailable()
      input.addData(stray, dup, spike); query.processAllAvailable()
      val flags = spark.table("z_late").collect()
        .map(r => r.getLong(1) -> r.getDouble(2)).toMap
      assert(lateAcc.value == 2L, s"expected stray+dup counted, got ${lateAcc.value}")
      assert(!flags.contains(99L), "the late stray must never be scored")
      // the spike's z matches what a fully in-order run computes (stray and
      // dup never touched the ring)
      val inOrderAcc = spark.sparkContext.longAccumulator("zscore_late_dropped_ctl")
      val ctl = MemoryStream[ZPoint]
      val q2 = graft.streaming.StreamOps
        .streamingZscore(ctl.toDS(), lookback = 20, threshold = 2.5, Some(inOrderAcc))
        .writeStream.format("memory").queryName("z_late_ctl")
        .outputMode(OutputMode.Append).start()
      try {
        ctl.addData(base :+ spike: _*); q2.processAllAvailable()
        val ctlFlags = spark.table("z_late_ctl").collect()
          .map(r => r.getLong(1) -> r.getDouble(2)).toMap
        assert(inOrderAcc.value == 0L)
        assert(flags == ctlFlags, s"late ingest changed the answer: $flags vs $ctlFlags")
      } finally q2.stop()
    } finally query.stop()
  }

  test("driftMonitor: per-batch PSI against a frozen reference, no streaming state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bucketOf = least(greatest(floor(col("value") / 10).cast("long"), lit(0L)), lit(9L))
    // reference: uniform over 0-99 -> 100 rows per bucket
    val ref = (0 until 1000).map(i => (i % 100).toDouble).toDF("value")
      .select(bucketOf.as("bucket")).groupBy("bucket").agg(count(lit(1)).as("n_ref"))
      .localCheckpoint()
    val out = Files.createTempDirectory("drift-out").toString + "/psi"
    val cp  = Files.createTempDirectory("drift-cp").toString
    val input = MemoryStream[Double]
    val query = StreamOps.driftMonitor(
      input.toDF().toDF("value"), ref, bucketOf, nBuckets = 10, out, cp)
    try {
      input.addData((0 until 500).map(i => (i % 100).toDouble): _*) // same shape
      query.processAllAvailable()
      input.addData((0 until 500).map(i => (i % 30).toDouble): _*)  // collapsed range
      query.processAllAvailable()
      // batch_id is now a PARTITION column (idempotent-replay sink writes
      // each batch's row into its own batch_id=<id> dir with overwrite)
      val psi = spark.read.parquet(out)
        .select(col("batch_id").cast("long"), col("psi"))
        .collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(psi(0L) < 0.01, s"matching batch drifted: ${psi(0L)}")
      assert(psi(1L) > 0.2, s"collapsed batch not flagged: ${psi(1L)}")
      assert(query.lastProgress.stateOperators.isEmpty) // truly stateless
    } finally query.stop()
  }

  test("j3_stream_replay: micro-batch stream-stream join equals the batch range join row for row") {
    // The registry row's contract, pinned at sf0.001: the same event feed
    // through 4 forced micro-batches (views surviving state-store round
    // trips to meet later purchases) produces exactly the batch j3 table
    // over the replay's deterministic user slice (user_id % 5 = 2 — the
    // r13 instrument-cost cap, mirrored in the row's oracle).
    val t = graft.Tables(spark, sf0001)
    val streamed = graft.operators.TimeWindows.j3_stream_replay.run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = graft.operators.TimeWindows.j3_prepost_correlate.run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .filter(_._1 % 5 == 2)
    assert(streamed.nonEmpty, "fixture must contain view->purchase correlations")
    assert(streamed == batch)
  }

  test("prePostStreamJoin carryCols rides the pre event id through the join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val pre  = MemoryStream[(String, String, Long, java.sql.Timestamp)]
    val post = MemoryStream[(String, String, java.sql.Timestamp)]
    val joined = StreamOps.prePostStreamJoin(
      pre.toDF().toDF("name", "group_id", "pre_id", "ts"),
      post.toDF().toDF("name", "group_id", "ts"),
      watermark = "10 seconds", toleranceSeconds = 60,
      carryCols = Seq("pre_id"))
    val q = joined.writeStream.format("memory").queryName("prepost_carry_out")
      .outputMode("append").start()
    try {
      pre.addData(("Read", "pg-1", 77L, ts("2026-01-01 10:00:00")))
      post.addData(("Read", "pg-1", ts("2026-01-01 10:00:03")))
      q.processAllAvailable()
      val rows = spark.table("prepost_carry_out").collect()
        .map(r => (r.getString(0), r.getLong(r.fieldIndex("pre_id")),
          r.getLong(r.fieldIndex("duration_ms"))))
      assert(rows.toSeq == Seq(("Read", 77L, 3000L)))
    } finally q.stop()
  }
}
