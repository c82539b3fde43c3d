package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Q

/** Window functions & sessionization (SURVEY.md §2.5) over the `events`
  * table. Every window partitions by `user_id` — the natural distribution
  * key — so at 100 TB each window computes inside one shuffle partition and
  * never needs a global sort. `event_id` is the deterministic tiebreaker for
  * equal timestamps everywhere (SURVEY §7.4 "ordering ties").
  *
  * Timestamps cross the oracle boundary as epoch milliseconds
  * (`unix_millis` / DuckDB `epoch_ms`): the parquet column is
  * nanosecond-precision and the engines truncate differently beyond micros.
  */
object WindowOps {

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)
  private val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))

  val w1_turn_sessionize = Q(
    "w1_turn_sessionize",
    """SELECT user_id, turn_id, count(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT user_id, value,
      |         CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS turn_id
      |  FROM events)
      |GROUP BY user_id, turn_id ORDER BY user_id, turn_id""".stripMargin,
  ) { t =>
    // SURVEY W1 (batch form): event-delimited sessionization — the
    // trace_aggregator turn state machine (trace_aggregator.py:56-211)
    // expressed as a running delimiter count. 'signup' plays prompt:submit:
    // each occurrence opens a new turn; turn 0 is the pre-first-delimiter
    // prefix (reference would drop it; kept here as an explicit group).
    val turnId = sum(when(col("event_type") === "signup", 1).otherwise(0))
      .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    t.events
      .withColumn("turn_id", turnId)
      .groupBy("user_id", "turn_id")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy("user_id", "turn_id")
  }

  val w2_gap_sessionize = Q(
    "w2_gap_sessionize",
    """SELECT user_id, session_id, count(*) AS n_events,
      |       min(ms) AS start_ms, max(ms) AS end_ms
      |FROM (
      |  SELECT user_id, ms,
      |         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM (
      |    SELECT user_id, event_id, CAST(epoch_ms(ts) AS BIGINT) AS ms,
      |           CASE WHEN CAST(epoch_ms(ts) AS BIGINT)
      |                     - lag(CAST(epoch_ms(ts) AS BIGINT))
      |                       OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
      |                     > 1800000
      |                OR lag(CAST(epoch_ms(ts) AS BIGINT))
      |                     OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) IS NULL
      |                THEN 1 ELSE 0 END AS is_new
      |    FROM events))
      |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
  ) { t =>
    // Gap-based sessionization (30-min inactivity), the idiomatic-Spark
    // counterpart of W1 per SURVEY §2.9's note. Classic lag -> flag ->
    // running-sum pattern; one shuffle on user_id serves all three windows.
    val wms   = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
    val isNew = when(
      (col("ms") - lag(col("ms"), 1).over(wms) > 1800000L) ||
        lag(col("ms"), 1).over(wms).isNull,
      1).otherwise(0)
    t.events
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
      .withColumn("is_new", isNew)
      .withColumn(
        "session_id",
        sum(col("is_new")).over(wms.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min(col("ms")).as("start_ms"), max(col("ms")).as("end_ms"))
      .orderBy("user_id", "session_id")
  }

  val w3_tail_n = Q(
    "w3_tail_n",
    """SELECT user_id, event_id, event_type FROM (
      |  SELECT user_id, event_id, event_type,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn <= 3
      |ORDER BY user_id, event_id""".stripMargin,
  ) { t =>
    // SURVEY W3: tail-N — last 3 messages per session (manager.py:343-345),
    // re-sorted ascending for presentation.
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    t.events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("user_id", "event_id", "event_type")
      .orderBy("user_id", "event_id")
  }

  val w5_latest_per_user = Q(
    "w5_latest_per_user",
    """SELECT user_id, event_id, event_type FROM (
      |  SELECT user_id, event_id, event_type,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
  ) { t =>
    // SURVEY W5: latest-run-per-key (automations/manager.py:353-357).
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    t.events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type")
      .orderBy("user_id")
  }

  val w6_running_sum = Q(
    "w6_running_sum",
    """SELECT user_id, event_id,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2)))
      |              OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events ORDER BY user_id, event_id""".stripMargin,
  ) { t =>
    // SURVEY A8/W-frame: running fold over the stream (messages.py:222-226)
    // as a rowsBetween cumulative sum. Decimal accumulator: every prefix sum
    // is exact, so each row's double is engine-identical.
    t.events
      .select(
        col("user_id"),
        col("event_id"),
        sum(col("value").cast(DecimalType(18, 2)))
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType)
          .as("running_value"))
      .orderBy("user_id", "event_id")
  }

  val w7_lag_delta = Q(
    "w7_lag_delta",
    """SELECT user_id, event_id, delta_ms FROM (
      |  SELECT user_id, event_id,
      |         CAST(epoch_ms(ts) AS BIGINT)
      |           - lag(CAST(epoch_ms(ts) AS BIGINT))
      |             OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS delta_ms
      |  FROM events) WHERE delta_ms IS NOT NULL
      |ORDER BY user_id, event_id""".stripMargin,
  ) { t =>
    // SURVEY W2: per-element duration = this_ts - prev_ts
    // (trace_aggregator.py:152-155) via lag.
    val wms = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
    t.events
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
      .withColumn("delta_ms", col("ms") - lag(col("ms"), 1).over(wms))
      .filter(col("delta_ms").isNotNull)
      .select("user_id", "event_id", "delta_ms")
      .orderBy("user_id", "event_id")
  }

  val w8_rank_in_group = Q(
    "w8_rank_in_group",
    """SELECT c_nationkey, c_custkey, c_acctbal, rnk FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |         dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk
      |  FROM customer) WHERE rnk <= 3
      |ORDER BY c_nationkey, rnk, c_custkey""".stripMargin,
  ) { t =>
    // Ranking extension (SURVEY §2.5 note): top-3 account balances per
    // nation. dense_rank over the raw double is safe — both engines rank
    // identical IEEE values identically.
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc)
    t.customer
      .withColumn("rnk", dense_rank().over(w))
      .filter(col("rnk") <= 3)
      .select("c_nationkey", "c_custkey", "c_acctbal", "rnk")
      .orderBy("c_nationkey", "rnk", "c_custkey")
  }

  val w9_range_window = Q(
    "w9_range_window",
    """SELECT user_id, event_id,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2)))
      |              OVER (PARTITION BY user_id ORDER BY ms
      |                    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
      |FROM (SELECT user_id, event_id, CAST(epoch_ms(ts) AS BIGINT) AS ms, value FROM events)
      |ORDER BY user_id, event_id""".stripMargin,
  ) { t =>
    // SURVEY §2.5 extension: a VALUE-range frame (trailing 1-hour sum per
    // user) — physically a RangeFrame, not the RowsFrame of w6: the frame
    // boundary is ms-3600000, so all rows at equal ms share one frame and
    // the result needs NO tiebreaker to be deterministic. The trailing-
    // window rate metric every event pipeline ships.
    val w = Window.partitionBy("user_id").orderBy(col("ms"))
      .rangeBetween(-3600000L, Window.currentRow)
    t.events
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"), col("value"))
      .withColumn("hour_sum", sum(col("value").cast(DecimalType(18, 2))).over(w).cast(DoubleType))
      .select("user_id", "event_id", "hour_sum")
      .orderBy("user_id", "event_id")
  }

  val all: Seq[Q] = Seq(
    w1_turn_sessionize, w2_gap_sessionize, w3_tail_n, w5_latest_per_user,
    w6_running_sum, w7_lag_delta, w8_rank_in_group, w9_range_window,
  )
}
