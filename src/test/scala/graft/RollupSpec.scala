package graft

import org.apache.spark.sql.functions._
import graft.operators.Rollup

/** Pins the two rollup contracts the driver oracle cannot fully see:
  *   - the incremental path (base partials + batch partials, merged) is
  *     BIT-EXACT against a from-scratch aggregate over raw events, however
  *     the input is split — the mergeability invariant x36 rides on;
  *   - the HLL twin's estimate stays inside a stated envelope of the exact
  *     distinct count (x39 is rows-only in CORRECTNESS, so the tolerance
  *     lives here).
  */
class RollupSpec extends SparkSpec {

  private def events = Tables(spark, sf0001).events
    .select(col("ts"), col("event_type"), col("user_id"), col("value"))
    .withColumn("ms", unix_millis(col("ts")))

  test("incremental partials merge lands exactly on the from-scratch rollup") {
    val e = events
    // split at the median-ish ms AND at a lopsided 10/90 point: exactness
    // must not depend on where the batch boundary falls
    val cuts = Seq(1706140800000L, 1704067200000L)
    val direct = Rollup.mergeRollup(Rollup.dailyPartials(e))
      .orderBy("event_type").collect().toSeq
    cuts.foreach { cut =>
      val merged = Rollup.mergeRollup(
        Rollup.dailyPartials(e.filter(col("ms") < cut))
          .unionByName(Rollup.dailyPartials(e.filter(col("ms") >= cut))))
        .orderBy("event_type").collect().toSeq
      assert(merged == direct, s"split at $cut diverged from from-scratch rollup")
    }
  }

  test("streaming-appended partials merge to the exact from-scratch rollup (zero state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = events.select("ts", "event_type", "user_id", "value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
    val input = MemoryStream[(java.sql.Timestamp, String, Long, Double)]
    val dir = java.nio.file.Files.createTempDirectory("rollup-partials").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rollup-ckpt").toString
    val q = Rollup.streamingPartials(
      input.toDS().toDF("ts", "event_type", "user_id", "value"),
      s"$dir/partials", ckpt)
    try {
      // three uneven micro-batches, including a batch that re-touches
      // earlier days (duplicate grain rows across appends must collapse)
      val (a, rest) = rows.splitAt(rows.size / 4)
      val (b, c)    = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { chunk => input.addData(chunk); q.processAllAvailable() }
      assert(q.lastProgress == null || q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0), "streaming state is not zero")
      val streamed = Rollup.mergeRollup(spark.read.parquet(s"$dir/partials"))
        .orderBy("event_type").collect().toSeq
      val direct = Rollup.mergeRollup(Rollup.dailyPartials(events))
        .orderBy("event_type").collect().toSeq
      assert(streamed == direct, "streamed partials diverged from from-scratch rollup")
    } finally q.stop()
  }

  test("HLL rollup estimate stays within 5% of exact per-type user counts (lgK=14)") {
    val e = events
    val exact = e.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cut = 1706140800000L
    val est = Rollup.mergeSketchRollup(
      Rollup.sketchPartials(e.filter(col("ms") < cut))
        .unionByName(Rollup.sketchPartials(e.filter(col("ms") >= cut))))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (tpe, n) =>
      val rel = math.abs(est(tpe) - n) / math.max(n.toDouble, 1.0)
      assert(rel <= 0.05, s"$tpe: estimate ${est(tpe)} vs exact $n (rel err $rel)")
    }
  }
}
