package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** x51/x52: funnel semantics pinned against an independent chained-join
  * rendering, monotonicity, and cohort cell conservation.
  */
class AnalyticsSpec extends SparkSpec {

  import spark.implicits._

  private def events = Tables(spark, sf0001).events

  /** The oracle's formulation, independently in Spark: stage k = min ts of
    * stage-k events strictly after the user's stage-(k-1) time.
    */
  private def chainedJoinFunnel(e: DataFrame, stages: Seq[String]): Seq[Long] = {
    var cur = e.where(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("ts").as("t"))
    val counts = Seq.newBuilder[Long]
    counts += cur.count()
    stages.tail.foreach { s =>
      cur = e.where(col("event_type") === s).as("e")
        .join(cur.as("c"), col("e.user_id") === col("c.user_id"))
        .where(col("e.ts") > col("c.t"))
        .groupBy(col("e.user_id").as("user_id")).agg(min("ts").as("t"))
      counts += cur.count()
    }
    counts.result()
  }

  test("funnel equals the chained-join rendering and is monotone") {
    val stages = Seq("view", "click", "purchase")
    val got = Analytics.funnel(events, stages)
      .select("n_users").as[Long].collect()
    assert(got.toSeq === chainedJoinFunnel(events, stages))
    assert(got.sliding(2).forall(p => p(0) >= p(1)), s"not monotone: ${got.toSeq}")
    // order invariance: a different stage sequence still monotone + bounded
    val alt = Analytics.funnel(events, Seq("signup", "purchase"))
      .select("n_users").as[Long].collect()
    assert(alt.length === 2 && alt(0) >= alt(1))
  }

  test("cohort retention: offset-0 cell covers every user exactly once per cohort") {
    val cells = Analytics.cohortRetention(events, maxOffsetWeeks = 52)
    // every user is active in their own first week -> sum of offset-0
    // cells equals the distinct user count
    val week0 = cells.where(col("week_offset") === 0)
      .agg(sum("n_users")).as[Long].head()
    assert(week0 === events.select("user_id").distinct().count())
    // no negative offsets, counts never exceed the cohort's size
    assert(cells.where(col("week_offset") < 0).isEmpty)
    val overflow = cells.as("c")
      .join(cells.where(col("week_offset") === 0).as("z"), Seq("cohort_week"))
      .where(col("c.n_users") > col("z.n_users"))
    assert(overflow.isEmpty)
  }

  test("rolling z-score: a planted spike is flagged, steady series are not") {
    import java.sql.Timestamp
    // user 1: constant-ish values then one spike; user 2: strictly steady
    val rows = ((1 to 30).map { i =>
      val v = if (i == 25) 500.0 else 10.0 + (i % 3) // spike at event 25
      (1L, i.toLong, new Timestamp(1700000000000L + i * 60000L), v, "e")
    } ++ (1 to 30).map { i =>
      (2L, (100 + i).toLong, new Timestamp(1700000000000L + i * 60000L), 10.0 + (i % 3), "e")
    }).toDF("user_id", "event_id", "ts", "value", "event_type")
    val flagged = Analytics.rollingZscore(rows, lookback = 20, threshold = 2.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(flagged.contains((1L, 25L)), s"spike not flagged: ${flagged.toSeq}")
    assert(!flagged.exists(_._1 == 2L), s"steady user flagged: ${flagged.toSeq}")
    // the window never includes the current row: first 2 events of any
    // user can't be flagged (cnt >= 2 needs two PRECEDING rows)
    assert(!flagged.exists { case (_, e) => e == 1L || e == 2L || e == 101L || e == 102L })
  }

  test("twap: interval-weighted, constant series exact, last event dropped") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val rows = Seq(
      // user 1: 10.0 held 90s, then 20.0 held 10s -> (10*90+20*10)/100 = 11.0
      (1L, 1L, t(0), 10.0, "e"), (1L, 2L, t(90), 20.0, "e"), (1L, 3L, t(100), 999.0, "e"),
      // user 2: constant 7.5 over irregular gaps -> exactly 7.5
      (2L, 4L, t(0), 7.5, "e"), (2L, 5L, t(13), 7.5, "e"), (2L, 6L, t(999), 7.5, "e"),
      // user 3: single event -> no interval, absent from output
      (3L, 7L, t(0), 42.0, "e"),
    ).toDF("user_id", "event_id", "ts", "value", "event_type")
    val got = Analytics.twap(rows).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got(1L) === ((11.0, 2L)))
    assert(got(2L) === ((7.5, 2L)))
    assert(!got.contains(3L))
    // plain mean would be wrong for user 1: (10+20)/2 = 15, not 11 —
    // the value held 9x longer dominates, which is the operator's point
  }
}
