package graft

import graft.model.RawEvent
import graft.streaming.TraceSessionizer
import graft.streaming.TraceSessionizer.{assemble, parseTimestampMs, truncate}

/** Golden tests for the W1 turn state machine, one per edge case called out
  * in SURVEY §7.4 / FIXTURES B1 (reference: trace_aggregator.py:56-211).
  */
class TraceSessionizerSpec extends SparkSpec {

  private var line = 0L
  private def ev(event: String, data: String, ts: String = "2025-12-17T20:21:22.794+00:00", sid: String = "s1") = {
    line += 1
    RawEvent(sid, ts, event, data, line)
  }

  private def t(sec: Int) = f"2025-12-17T20:21:$sec%02d.000+00:00"

  test("timestamp parse: ISO with tz, naive-as-UTC, malformed -> 0") {
    assert(parseTimestampMs("2025-12-17T20:21:22.794+00:00") == 1766002882794L)
    assert(parseTimestampMs("2025-12-17T20:21:22.794") == 1766002882794L)
    assert(parseTimestampMs("2025-12-17T22:21:22.794+02:00") == 1766002882794L)
    assert(parseTimestampMs("not-a-date") == 0L)
    assert(parseTimestampMs("") == 0L)
  }

  test("truncate: exact boundary untouched, over-boundary marked") {
    assert(truncate("a" * 1000) == "a" * 1000)
    assert(truncate("a" * 1001) == "a" * 1000 + "... (truncated)")
  }

  test("basic turn: prompt -> tool pre/post -> thinking -> end") {
    val turns = assemble(Iterator(
      ev("prompt:submit", """{"prompt":"hello"}""", t(1)),
      ev("tool:pre", """{"tool_name":"Read","tool_input":{"path":"x"},"parallel_group_id":"pg-1"}""", t(2)),
      ev("tool:post", """{"tool_name":"Read","parallel_group_id":"pg-1","result":{"success":true,"output":"content"}}""", t(5)),
      ev("thinking:delta", """{"delta":"hmm"}""", t(6)),
      ev("session:end", "{}", t(9)),
    ))
    assert(turns.size == 1)
    val turn = turns.head
    assert(turn.userMessage == "hello")
    assert(turn.status == "completed")
    assert(turn.endTime.contains(parseTimestampMs(t(9))))
    assert(turn.tools.size == 1)
    val tool = turn.tools.head
    assert(tool.name == "Read" && tool.status == "completed")
    assert(tool.result.contains("content"))
    assert(tool.duration.contains(3000.0))
    assert(turn.thinking.map(_.content) == Seq("hmm"))
  }

  test("unclosed turn at EOF is emitted as active with no endTime") {
    val turns = assemble(Iterator(
      ev("prompt:submit", """{"prompt":"p1"}""", t(1)),
      ev("thinking:delta", """{"delta":"d"}""", t(2)),
    ))
    assert(turns.size == 1)
    assert(turns.head.status == "active")
    assert(turns.head.endTime.isEmpty)
  }

  test("second prompt:submit force-completes the open turn without endTime") {
    val turns = assemble(Iterator(
      ev("prompt:submit", """{"prompt":"p1"}""", t(1)),
      ev("prompt:submit", """{"prompt":"p2"}""", t(5)),
      ev("session:end", "{}", t(9)),
    ))
    assert(turns.size == 2)
    assert(turns(0).userMessage == "p1" && turns(0).status == "completed" && turns(0).endTime.isEmpty)
    assert(turns(1).userMessage == "p2" && turns(1).status == "completed" &&
      turns(1).endTime.contains(parseTimestampMs(t(9))))
  }

  test("tool:post without matching pre is dropped") {
    val turns = assemble(Iterator(
      ev("prompt:submit", """{"prompt":"p"}""", t(1)),
      ev("tool:post", """{"tool_name":"Ghost","parallel_group_id":"pg-9","result":"x"}""", t(2)),
      ev("session:end", "{}", t(3)),
    ))
    assert(turns.head.tools.isEmpty)
  }

  test("error-shaped result sets error + status=error; message extracted from dict") {
    val turns = assemble(Iterator(
      ev("prompt:submit", """{"prompt":"p"}""", t(1)),
      ev("tool:pre", """{"tool_name":"Run","parallel_group_id":"pg-1"}""", t(2)),
      ev("tool:post", """{"tool_name":"Run","parallel_group_id":"pg-1","result":{"success":false,"error":{"message":"boom"}}}""", t(3)),
    ))
    val tool = turns.head.tools.head
    assert(tool.status == "error")
    assert(tool.error.contains("boom"))
    assert(tool.result.isEmpty)
  }

  test("sub-agent task tool captures agent name + child session id") {
    val turns = assemble(Iterator(
      ev("prompt:submit", """{"prompt":"p"}""", t(1)),
      ev("tool:pre", """{"tool_name":"Task","tool_input":{"agent":"helper"},"parallel_group_id":"pg-1"}""", t(2)),
      ev("tool:post", """{"tool_name":"Task","parallel_group_id":"pg-1","result":{"success":true,"output":{"session_id":"s1-00_helper"}}}""", t(3)),
    ))
    val tool = turns.head.tools.head
    assert(tool.isSubAgent)
    assert(tool.subAgentName.contains("helper"))
    assert(tool.childSessionId.contains("s1-00_helper"))
  }

  test("results over 1000 chars are truncated with marker") {
    val big = "x" * 1200
    val turns = assemble(Iterator(
      ev("prompt:submit", """{"prompt":"p"}""", t(1)),
      ev("tool:pre", """{"tool_name":"Read","parallel_group_id":"pg-1"}""", t(2)),
      ev("tool:post", s"""{"tool_name":"Read","parallel_group_id":"pg-1","result":{"success":true,"output":"$big"}}""", t(3)),
    ))
    val r = turns.head.tools.head.result.get
    assert(r.length == 1000 + "... (truncated)".length)
    assert(r.endsWith("... (truncated)"))
  }

  test("parallel tools: post matches FIRST open tool with same name+group") {
    val turns = assemble(Iterator(
      ev("prompt:submit", """{"prompt":"p"}""", t(1)),
      ev("tool:pre", """{"tool_name":"Read","parallel_group_id":"pg"}""", t(2)),
      ev("tool:pre", """{"tool_name":"Read","parallel_group_id":"pg"}""", t(3)),
      ev("tool:post", """{"tool_name":"Read","parallel_group_id":"pg","result":"first"}""", t(4)),
      ev("tool:post", """{"tool_name":"Read","parallel_group_id":"pg","result":"second"}""", t(5)),
    ))
    val tools = turns.head.tools
    assert(tools(0).result.contains("first"))
    assert(tools(1).result.contains("second"))
    assert(tools(0).duration.contains(2000.0))
    assert(tools(1).duration.contains(2000.0))
  }

  test("events before the first prompt:submit are dropped") {
    val turns = assemble(Iterator(
      ev("tool:pre", """{"tool_name":"Early","parallel_group_id":"pg"}""", t(1)),
      ev("thinking:delta", """{"delta":"orphan"}""", t(2)),
      ev("prompt:submit", """{"prompt":"p"}""", t(3)),
    ))
    assert(turns.size == 1)
    assert(turns.head.tools.isEmpty && turns.head.thinking.isEmpty)
  }

  test("scalar (non-dict) result stored as string") {
    val turns = assemble(Iterator(
      ev("prompt:submit", """{"prompt":"p"}""", t(1)),
      ev("tool:pre", """{"tool_name":"R","parallel_group_id":"pg"}""", t(2)),
      ev("tool:post", """{"tool_name":"R","parallel_group_id":"pg","result":"plain"}""", t(3)),
    ))
    assert(turns.head.tools.head.result.contains("plain"))
  }

  test("batch aggregate groups by session and processes in FILE order (lineNo alone)") {
    import spark.implicits._
    // two sessions interleaved, rows deliberately out of order
    val events = Seq(
      RawEvent("b", t(1), "prompt:submit", """{"prompt":"pb"}""", 10),
      RawEvent("a", t(2), "session:end", "{}", 2),
      RawEvent("a", t(1), "prompt:submit", """{"prompt":"pa"}""", 1),
      RawEvent("b", t(3), "thinking:delta", """{"delta":"d"}""", 11),
    ).toDS()
    val turns = TraceSessionizer.aggregate(events).collect().sortBy(_.sessionId)
    assert(turns.length == 2)
    assert(turns(0).sessionId == "a" && turns(0).status == "completed")
    assert(turns(1).sessionId == "b" && turns(1).status == "active" &&
      turns(1).thinking.map(_.content) == Seq("d"))
  }

  test("malformed timestamps do NOT hoist events: file order wins over parsed ts") {
    import spark.implicits._
    // the reference reads the session's JSONL line by line; a malformed
    // timestamp (parsed as 0) in the middle must stay in the middle. A
    // ts-primary sort would move the bad-ts thinking event before the
    // prompt and drop it (no open turn) — the regression ADVICE flagged.
    val events = Seq(
      RawEvent("s", t(5), "prompt:submit", """{"prompt":"p"}""", 1),
      RawEvent("s", "not-a-timestamp", "thinking:delta", """{"delta":"kept"}""", 2),
      RawEvent("s", t(6), "session:end", "{}", 3),
    ).toDS()
    val turns = TraceSessionizer.aggregate(events).collect()
    assert(turns.length == 1)
    assert(turns.head.status == "completed")
    assert(turns.head.thinking.map(_.content) == Seq("kept"))
    assert(turns.head.thinking.head.timestamp == 0L) // malformed -> 0, position preserved
  }

  test("streaming idle timeout flushes the open turn as active and evicts state (M4)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[RawEvent]
    // long tombstone TTL: this test asserts numbering survives eviction, so
    // the tombstone must outlive the test's resume (see the companion test
    // for the TTL-expiry path)
    val query = TraceSessionizer.aggregateStream(
        input.toDS(), idleTimeoutMs = Some(1L), tombstoneTtlMs = Some(600000L))
      .writeStream.format("memory").queryName("turns_idle").outputMode(OutputMode.Append).start()
    // NOTE: processAllAvailable can block indefinitely once processing-time
    // timeouts are armed (timeout batches keep the query "busy"), so this
    // test polls the sink with a deadline instead. Determinism (the r7
    // flake): an armed processing-time timeout only fires when a
    // micro-batch RUNS, and under a loaded suite the scheduler may not get
    // around to a no-data batch inside any fixed window. So each poll
    // iteration injects a wake tick for a throwaway session — every tick
    // forces a data batch, and every batch evaluates armed timeouts, so
    // the idle session's 1 ms timeout fires on the first forced batch
    // rather than whenever a no-data batch happens to be scheduled.
    var wakeLine = 1000L
    def awaitIdleFlush(deadlineMs: Long): Option[graft.model.TraceTurn] = {
      val end = System.currentTimeMillis() + deadlineMs
      var found: Option[graft.model.TraceTurn] = None
      while (found.isEmpty && System.currentTimeMillis() < end) {
        wakeLine += 1
        input.addData(RawEvent("wake", t(20), "thinking:delta", """{"delta":"w"}""", wakeLine))
        found = spark.table("turns_idle").as[graft.model.TraceTurn]
          .collect().find(_.sessionId == "idle")
        if (found.isEmpty) Thread.sleep(200)
      }
      found
    }
    try {
      input.addData(RawEvent("idle", t(1), "prompt:submit", """{"prompt":"p"}""", 1))
      val flushed = awaitIdleFlush(30000)
      assert(flushed.isDefined, "idle turn never flushed by the state timeout")
      assert(flushed.get.status == "active") // surfaced in-progress, per EOF semantics
      assert(flushed.get.id == "idle:t0")
      // eviction leaves a tombstone carrying nextIndex: a session that
      // resumes after the flush continues turn numbering at t1 — ids never
      // collide with already-emitted turns (the ADVICE regression)
      input.addData(
        RawEvent("idle", t(10), "prompt:submit", """{"prompt":"p2"}""", 2),
        RawEvent("idle", t(11), "session:end", "{}", 3))
      val end = System.currentTimeMillis() + 30000
      var resumed: Option[graft.model.TraceTurn] = None
      while (resumed.isEmpty && System.currentTimeMillis() < end) {
        resumed = spark.table("turns_idle").as[graft.model.TraceTurn]
          .collect().find(tr => tr.sessionId == "idle" && tr.status == "completed")
        if (resumed.isEmpty) Thread.sleep(200)
      }
      assert(resumed.isDefined, "resumed session's turn never emitted")
      assert(resumed.get.id == "idle:t1", s"turn numbering restarted: ${resumed.get.id}")
    } finally query.stop()
  }

  test("streaming completed-turn state gets the tombstone grace window (no id reuse)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[RawEvent]
    // A session whose last turn COMPLETED (open=None via the event branch,
    // nextIndex=1) must survive its FIRST idle expiry as a tombstone — the
    // ADVICE regression removed such state immediately, so a resume after
    // one idle window reused id `done:t0` for a brand-new turn.
    val query = TraceSessionizer.aggregateStream(
        input.toDS(), idleTimeoutMs = Some(1L), tombstoneTtlMs = Some(600000L))
      .writeStream.format("memory").queryName("turns_done").outputMode(OutputMode.Append).start()
    def awaitTurn(p: graft.model.TraceTurn => Boolean, deadlineMs: Long): Option[graft.model.TraceTurn] = {
      val end = System.currentTimeMillis() + deadlineMs
      var found: Option[graft.model.TraceTurn] = None
      while (found.isEmpty && System.currentTimeMillis() < end) {
        found = spark.table("turns_done").as[graft.model.TraceTurn].collect().find(p)
        if (found.isEmpty) Thread.sleep(200)
      }
      found
    }
    try {
      input.addData(
        RawEvent("done", t(1), "prompt:submit", """{"prompt":"p"}""", 1),
        RawEvent("done", t(2), "session:end", "{}", 2))
      val first = awaitTurn(tr => tr.sessionId == "done" && tr.id == "done:t0", 30000)
      assert(first.isDefined && first.get.status == "completed")
      // let the 1ms idle timeout expire while the session is quiet; the
      // completed-turn state must convert to a tombstone, not vanish.
      // Wait for OBSERVED expiry rather than a blind sleep (a sleep passes
      // vacuously if no empty micro-batch fires the timeout): a zero-input
      // batch whose state operator updated or removed rows can only be the
      // processing-time timeout firing on the quiet session.
      val expiryDeadline = System.currentTimeMillis() + 30000
      def expiryObserved: Boolean = query.recentProgress.exists { p =>
        p.numInputRows == 0 && p.stateOperators.nonEmpty &&
          (p.stateOperators(0).numRowsUpdated > 0 || p.stateOperators(0).numRowsRemoved > 0)
      }
      while (!expiryObserved && System.currentTimeMillis() < expiryDeadline) Thread.sleep(100)
      assert(expiryObserved, "idle timeout never fired during the quiet window")
      input.addData(
        RawEvent("done", t(10), "prompt:submit", """{"prompt":"p2"}""", 3),
        RawEvent("done", t(11), "session:end", "{}", 4))
      val resumed = awaitTurn(tr => tr.sessionId == "done" && tr.id != "done:t0", 30000)
      assert(resumed.isDefined, "resumed turn never emitted (or reused id done:t0)")
      assert(resumed.get.id == "done:t1", s"turn numbering restarted: ${resumed.get.id}")
    } finally query.stop()
  }

  test("streaming tombstone TTL drops evicted state; late resume restarts numbering") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[RawEvent]
    // 1ms tombstone TTL: the second (quiet) expiry removes state, so a
    // session resuming after BOTH windows restarts at t0 — the bounded-state
    // trade documented on aggregateStream (the ADVICE state-leak regression).
    val query = TraceSessionizer.aggregateStream(
        input.toDS(), idleTimeoutMs = Some(1L), tombstoneTtlMs = Some(1L))
      .writeStream.format("memory").queryName("turns_ttl").outputMode(OutputMode.Append).start()
    def awaitTurn(p: graft.model.TraceTurn => Boolean, deadlineMs: Long): Option[graft.model.TraceTurn] = {
      val end = System.currentTimeMillis() + deadlineMs
      var found: Option[graft.model.TraceTurn] = None
      while (found.isEmpty && System.currentTimeMillis() < end) {
        found = spark.table("turns_ttl").as[graft.model.TraceTurn].collect().find(p)
        if (found.isEmpty) Thread.sleep(200)
      }
      found
    }
    try {
      input.addData(RawEvent("late", t(1), "prompt:submit", """{"prompt":"p"}""", 1))
      val flushed = awaitTurn(tr => tr.sessionId == "late" && tr.status == "active", 30000)
      assert(flushed.isDefined, "idle turn never flushed by the state timeout")
      assert(flushed.get.id == "late:t0")
      // give the 1ms tombstone TTL ample batches to fire its second expiry
      Thread.sleep(3000)
      input.addData(
        RawEvent("late", t(10), "prompt:submit", """{"prompt":"p2"}""", 2),
        RawEvent("late", t(11), "session:end", "{}", 3))
      val resumed = awaitTurn(tr => tr.sessionId == "late" && tr.status == "completed", 30000)
      assert(resumed.isDefined, "resumed session's turn never emitted")
      assert(resumed.get.id == "late:t0", s"tombstone should have been dropped: ${resumed.get.id}")
    } finally query.stop()
  }

  test("streaming aggregate emits completed turns across micro-batches, keeps open state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input  = MemoryStream[RawEvent]
    val query = TraceSessionizer.aggregateStream(input.toDS())
      .writeStream.format("memory").queryName("turns_out").outputMode(OutputMode.Append).start()
    try {
      // batch 1: open a turn + a tool; nothing completes
      input.addData(
        RawEvent("s", t(1), "prompt:submit", """{"prompt":"p1"}""", 1),
        RawEvent("s", t(2), "tool:pre", """{"tool_name":"R","parallel_group_id":"pg"}""", 2))
      query.processAllAvailable()
      assert(spark.table("turns_out").count() == 0)
      // batch 2: close the tool and the turn -> one completed turn emitted
      input.addData(
        RawEvent("s", t(3), "tool:post", """{"tool_name":"R","parallel_group_id":"pg","result":"ok"}""", 3),
        RawEvent("s", t(4), "session:end", "{}", 4))
      query.processAllAvailable()
      val out = spark.table("turns_out").as[graft.model.TraceTurn].collect()
      assert(out.length == 1)
      assert(out.head.status == "completed")
      assert(out.head.tools.head.result.contains("ok"))
      assert(out.head.tools.head.duration.contains(1000.0)) // state carried across batches
    } finally query.stop()
  }

  test("x105 SFT examples: session-grain split, completed-only, token arithmetic from the flat turn surface") {
    import graft.operators.TraceQueries
    val ex = TraceQueries.x105_sft_examples.run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getString(4)))
    assert(ex.nonEmpty)
    // leakage-safe deal: every turn of a session carries the SAME split
    ex.groupBy(_._1).foreach { case (sid, rows) =>
      assert(rows.map(_._5).distinct.length == 1, s"session $sid straddles splits")
    }
    // deal shares are the 8/1/1 hash-deal at SESSION grain
    val bySplit = ex.map(r => (r._1, r._5)).distinct.groupBy(_._2).view.mapValues(_.size)
    assert(bySplit.getOrElse("train", 0) > bySplit.getOrElse("val", 0))
    assert(bySplit.getOrElse("train", 0) > bySplit.getOrElse("test", 0))
    // completed-only, one example per completed turn, cross-checked
    // against the flat oracle surface; and the whitespace-token count is
    // exactly 1 + (n_think-1)+ + (n_tools-1)+ because spaces exist ONLY
    // inside the two segment joins
    val flat = TraceQueries.st6_trace_turns.run(spark, sf0001).collect()
      .filter(_.getString(3) == "completed")
      .groupBy(r => (r.getString(0), r.getLong(1)))
    assert(ex.length == flat.size)
    ex.foreach { case (sid, idx, _, nTokens, _) =>
      val rows    = flat((sid, idx))
      val nThink  = rows.head.getLong(7)
      val nTools  = rows.map(_.getLong(8)).max // tool_pos 0 when no tools
      val expect  = 1 + math.max(nThink - 1, 0) + math.max(nTools - 1, 0)
      assert(nTokens == expect, s"turn $sid:$idx tokens $nTokens != $expect")
    }
  }
}
