package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.model.RawEvent
import graft.streaming.{StreamOps, TraceSessionizer}

/** The two stateful streaming paths re-run under the RocksDB state store.
  *
  * Why this matters at scale: the default HDFSBackedStateStoreProvider
  * keeps every key's state on the executor HEAP — at 100 TB ingest the
  * dedup key set (ingest rate x watermark) and the open-session map become
  * the memory bound of the whole stream. RocksDBStateStoreProvider spills
  * state to local disk with an off-heap block cache, which is the standard
  * production setting for large stateful streams. These specs prove both
  * paths are provider-agnostic (same emissions, same eviction semantics),
  * so the SCALE.md config swap is a one-line conf, not a code change.
  */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Evidence that the RUNNING query actually instantiated the RocksDB
    * provider (not just that the conf was set): RocksDB's StateStore
    * implementation reports provider-specific custom metrics
    * (rocksdbGet/Put latencies, memory usage, …) in every
    * StateOperatorProgress; the default HDFS-backed store reports none of
    * those keys.
    */
  private def assertRocksDbInUse(query: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    import scala.jdk.CollectionConverters._
    val ops = query.lastProgress.stateOperators
    assert(ops.nonEmpty, "no state operator reported progress")
    val keys = ops.flatMap(_.customMetrics.keySet().asScala).toSeq
    assert(keys.exists(_.toLowerCase.contains("rocksdb")),
      s"state operator custom metrics carry no rocksdb evidence: $keys")
  }

  /** Run `body` with the RocksDB provider set, restoring the prior value
    * (the provider is read at query START, so setting it around the start
    * call is sufficient and keeps the other specs on the default).
    */
  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderConf)
    spark.conf.set(ProviderConf, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderConf, v)
      case None    => spark.conf.unset(ProviderConf)
    }
  }

  test("dedupWithinWatermark under RocksDB: same drop/re-admit semantics as the default store") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(java.sql.Timestamp, String)]
      def ts(s: Long) = new java.sql.Timestamp(s * 1000)
      val deduped = StreamOps.dedupWithinWatermark(
        input.toDF().toDF("ts", "content_hash"), "ts", "10 seconds", Seq("content_hash"))
      val query = deduped.writeStream.format("memory").queryName("dedup_rocks")
        .outputMode(OutputMode.Append).start()
      def emitted(): Seq[(Long, String)] = spark.table("dedup_rocks")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1))).toSeq
      try {
        input.addData(ts(1) -> "A", ts(1) -> "A", ts(2) -> "B")
        query.processAllAvailable()
        // the state store provider actually in use must be RocksDB —
        // judged from the query's own runtime metrics, not the conf
        assertRocksDbInUse(query)
        assert(emitted().sorted == Seq(1L -> "A", 2L -> "B"))
        input.addData(ts(3) -> "A") // duplicate inside the watermark -> dropped
        query.processAllAvailable()
        assert(emitted().count(_._2 == "A") == 1)
        input.addData(ts(100) -> "C") // advance watermark, evict A's state
        query.processAllAvailable()
        input.addData(ts(120) -> "A") // re-admitted: state was evicted from RocksDB too
        query.processAllAvailable()
        assert(emitted().count(_._2 == "A") == 2)
        assert(emitted().length == 4)
      } finally query.stop()
    }
  }

  test("trace sessionizer under RocksDB: cross-batch state carried, completed turn emitted") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(sec: Int) = f"2025-12-17T20:21:$sec%02d.000+00:00"
    withRocksDb {
      val input = MemoryStream[RawEvent]
      val query = TraceSessionizer.aggregateStream(input.toDS())
        .writeStream.format("memory").queryName("turns_rocks")
        .outputMode(OutputMode.Append).start()
      try {
        input.addData(
          RawEvent("s", t(1), "prompt:submit", """{"prompt":"p1"}""", 1),
          RawEvent("s", t(2), "tool:pre", """{"tool_name":"R","parallel_group_id":"pg"}""", 2))
        query.processAllAvailable()
        assertRocksDbInUse(query)
        assert(spark.table("turns_rocks").count() == 0) // turn still open in state
        input.addData(
          RawEvent("s", t(3), "tool:post", """{"tool_name":"R","parallel_group_id":"pg","result":"ok"}""", 3),
          RawEvent("s", t(4), "session:end", "{}", 4))
        query.processAllAvailable()
        val out = spark.table("turns_rocks").as[graft.model.TraceTurn].collect()
        assert(out.length == 1)
        assert(out.head.status == "completed")
        assert(out.head.tools.head.result.contains("ok"))
        // the tool's duration spans batches: open-state survived a RocksDB
        // checkpoint/restore cycle between micro-batches
        assert(out.head.tools.head.duration.contains(1000.0))
      } finally query.stop()
    }
  }

  test("streaming z-score under RocksDB: ring state crosses batches, flags match batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.ZPoint
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // user 1's spike arrives in a LATER batch than its baseline window —
    // the flag can only be right if the ring survived the store
    val base  = (1 to 24).map(i => ZPoint(1L, i.toLong, 1000L * i, 10.0 + (i % 3)))
    val spike = Seq(ZPoint(1L, 25L, 25000L, 500.0), ZPoint(1L, 26L, 26000L, 10.0))
    withRocksDb {
      val input = MemoryStream[ZPoint]
      val query = StreamOps.streamingZscore(input.toDS(), lookback = 20, threshold = 2.5)
        .writeStream.format("memory").queryName("z_rocks")
        .outputMode(OutputMode.Append).start()
      try {
        input.addData(base: _*)
        query.processAllAvailable()
        input.addData(spike: _*)
        query.processAllAvailable()
        assertRocksDbInUse(query)
        val flagged = spark.table("z_rocks").collect().map(_.getLong(1)).toSet
        assert(flagged.contains(25L), s"cross-batch spike not flagged: $flagged")
        assert(!flagged.contains(26L), "post-spike normal value wrongly flagged")
      } finally query.stop()
    }
  }
}
