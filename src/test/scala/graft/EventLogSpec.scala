package graft

import java.nio.file.Files

import graft.sources.EventLog
import graft.streaming.TraceSessionizer

/** S1 error-tolerant JSONL source: blank + malformed lines skipped,
  * line order preserved, end-to-end into the sessionizer (the reference's
  * execution-trace read path).
  */
class EventLogSpec extends SparkSpec {

  test("malformed and blank lines are skipped; valid lines keep file order") {
    withTempDir("graft-events") { dir =>
    val file = new java.io.File(dir.toFile, "events.jsonl")
    val lines = Seq(
      """{"ts":"2025-12-17T20:21:01+00:00","lvl":"INFO","event":"prompt:submit","data":{"prompt":"hi"},"session_id":"s1"}""",
      "",
      """{this is not json""",
      """{"ts":"2025-12-17T20:21:02+00:00","lvl":"INFO","event":"thinking:delta","data":{"delta":"d1"},"session_id":"s1"}""",
      """{"ts":"2025-12-17T20:21:03+00:00","lvl":"INFO","event":"session:end","data":{},"session_id":"s1"}""",
    )
    Files.write(file.toPath, String.join("\n", lines: _*).getBytes)

    val events = EventLog.readJsonl(spark, file.getAbsolutePath)
    val rows   = events.collect().sortBy(_.lineNo)
    assert(rows.length == 3) // blank + malformed dropped
    assert(rows.map(_.event).toSeq == Seq("prompt:submit", "thinking:delta", "session:end"))

    val turns = TraceSessionizer.aggregate(events)(spark).collect()
    assert(turns.length == 1)
    assert(turns.head.status == "completed")
    assert(turns.head.thinking.map(_.content) == Seq("d1"))
    }
  }

  test("session id fallback stamps rows lacking session_id") {
    withTempDir("graft-events2") { dir =>
      val file = new java.io.File(dir.toFile, "events.jsonl")
      Files.write(file.toPath,
        """{"ts":"2025-12-17T20:21:01+00:00","event":"prompt:submit","data":{"prompt":"x"}}""".getBytes)
      val rows = EventLog.readJsonl(spark, file.getAbsolutePath, sessionIdFallback = "sX").collect()
      assert(rows.head.sessionId == "sX")
    }
  }

  test("permissive schema'd read captures corrupt lines in _corrupt_record") {
    import org.apache.spark.sql.types._
    withTempDir("graft-events3") { dir =>
    val file = new java.io.File(dir.toFile, "events.jsonl")
    Files.write(file.toPath, "{\"event\":\"ok\"}\n{broken\n".getBytes)
    val schema = StructType(Seq(StructField("event", StringType)))
    val df     = EventLog.readJsonlPermissive(spark, file.getAbsolutePath, schema)
    val rows   = df.collect()
    assert(rows.count(_.isNullAt(1)) == 1) // good row
    assert(rows.count(!_.isNullAt(1)) == 1) // corrupt row captured, not fatal
    }
  }

  test("append + overwrite sinks round-trip") {
    import spark.implicits._
    withTempDir("graft-sink") { dir =>
      val out = dir.toString + "/t"
      EventLog.appendParquet(Seq((1, "a")).toDF("id", "v"), out)
      EventLog.appendParquet(Seq((2, "b")).toDF("id", "v"), out)
      assert(spark.read.parquet(out).count() == 2)
      EventLog.overwriteParquet(Seq((9, "z")).toDF("id", "v"), out)
      assert(spark.read.parquet(out).as[(Int, String)].collect().toSeq == Seq((9, "z")))
    }
  }
}
