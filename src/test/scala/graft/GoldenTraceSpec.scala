package graft

import graft.sources.EventLog
import graft.streaming.TraceSessionizer

/** Capstone integration golden test: the complete FIXTURES.md B1 variant
  * matrix in one reference-shaped events.jsonl, driven through the real
  * pipeline (file -> EventLog.readJsonl -> TraceSessionizer.aggregate) and
  * asserted structurally.
  */
class GoldenTraceSpec extends SparkSpec {

  private lazy val turns = {
    val path = getClass.getResource("/golden_events.jsonl").getPath
    TraceSessionizer.aggregate(EventLog.readJsonl(spark, path))(spark)
      .collect().sortBy(t => (t.sessionId, t.startTime))
  }

  test("session g1 assembles 3 turns; g2 assembles 1") {
    assert(turns.count(_.sessionId == "g1") == 3)
    assert(turns.count(_.sessionId == "g2") == 1)
  }

  test("turn 1: tools matched, sub-agent captured, orphan post dropped, error routed") {
    val t1 = turns.filter(_.sessionId == "g1")(0)
    assert(t1.userMessage == "first question")
    assert(t1.status == "completed" && t1.endTime.isDefined)
    assert(t1.tools.map(_.name) == Seq("Read", "Task", "Run")) // Ghost dropped
    val read = t1.tools(0)
    assert(read.result.contains("file contents") && read.duration.contains(2000.0))
    val task = t1.tools(1)
    assert(task.isSubAgent && task.subAgentName.contains("helper"))
    assert(task.childSessionId.contains("g1-00_helper"))
    val run = t1.tools(2)
    assert(run.status == "error" && run.error.contains("command failed") && run.result.isEmpty)
    assert(t1.thinking.map(_.content) == Seq("considering"))
  }

  test("turn 2 force-closed by turn 3's prompt; turn 3 active at EOF") {
    val g1 = turns.filter(_.sessionId == "g1")
    val t2 = g1(1)
    assert(t2.userMessage == "second question")
    assert(t2.status == "completed" && t2.endTime.isEmpty) // force-close, no end event
    val t3 = g1(2)
    assert(t3.userMessage == "impatient third")
    assert(t3.status == "active" && t3.endTime.isEmpty) // EOF flush
    assert(t3.thinking.map(_.content) == Seq("still open at EOF"))
  }

  test("malformed + blank lines skipped without disturbing surrounding turns") {
    // 17 raw lines, 2 unusable; all 15 valid events accounted for across turns
    val g1 = turns.filter(_.sessionId == "g1")
    assert(g1.map(t => t.tools.size + t.thinking.size).sum == 5) // 3 tools + 2 thinking
  }
}
