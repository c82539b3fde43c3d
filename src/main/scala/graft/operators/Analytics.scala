package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q

/** Behavioral analytics over the event stream — the product-analytics
  * verbs (funnels, cohort retention) every event lakehouse serves, each
  * shaped as at most two keyed shuffles regardless of corpus size.
  *
  * Reference anchor: the event log these run over is S1's JSONL stream
  * (amplifierd/amplifierd/routers/sessions.py:1306-1326 read path); the
  * reference surfaces raw event lists and leaves analytics to the caller —
  * these are the batch renderings a warehouse adds on top.
  */
object Analytics {

  /** Strict-sequence funnel: stage k counts users whose earliest
    * qualifying stage-k event follows their earliest qualifying
    * stage-(k-1) event (strictly later ts). One shuffle on user_id: both
    * chained "earliest qualifying prior event" columns are running mins
    * over the SAME (user, ts-ordered) window, so Catalyst plans one
    * Exchange + one Sort and evaluates the two Window operators back to
    * back; the per-user reduction is then an ordinary aggregate on the
    * already-partitioned rows.
    *
    * The rows-frame tiebreak is event_id, and stage strictness is
    * "a qualifying prior event exists on an earlier row"; with (user, ts)
    * unique (asserted on the testdata, every sf) row order IS ts order
    * and the window rendering is exactly the oracle's `ts >` join chain.
    *
    * Why not 3 chained groupBy+join passes: same answers, but 3 shuffles
    * and two join builds; why not collect_list + fold: a hot user's event
    * list has no size bound at 100 TB, running mins keep state O(1).
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least 2 stages")
    val before = Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)

    // qual(k) = this row's ts if it's a stage-k event preceded by a
    // qualifying stage-(k-1) chain; built left to right, each level one
    // running-min over `before` of the previous level's column.
    val base = events.select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val withQuals = stages.zipWithIndex.foldLeft((base, Option.empty[String])) {
      case ((df, prevQual), (stage, i)) =>
        val qual = s"__q$i"
        val qualified = prevQual match {
          case None       => when(col("event_type") === stage, col("ts"))
          case Some(prev) =>
            when(col("event_type") === stage && min(col(prev)).over(before).isNotNull, col("ts"))
        }
        (df.withColumn(qual, qualified), Some(qual))
    }._1

    val perUser = withQuals
      .groupBy("user_id")
      .agg(
        stages.indices.map(i => min(col(s"__q$i")).as(s"t$i")).head,
        stages.indices.map(i => min(col(s"__q$i")).as(s"t$i")).tail: _*)
    perUser
      .agg(
        stages.indices.map(i => sum(when(col(s"t$i").isNotNull, 1L).otherwise(0L))
          .as(s"s$i")).head,
        stages.indices.map(i => sum(when(col(s"t$i").isNotNull, 1L).otherwise(0L))
          .as(s"s$i")).tail: _*)
      .unpivot(Array.empty[Column],
        stages.indices.map(i => col(s"s$i")).toArray, "stage_idx", "n_users")
      .select(
        concat(expr("substring(stage_idx, 2)").cast("int") + 1, lit("_"),
          element_at(typedLit(stages), expr("substring(stage_idx, 2)").cast("int") + 1))
          .as("stage"),
        col("n_users"))
      .orderBy("stage")
  }

  /** Weekly cohort retention: cohort = ISO week of the user's first event
    * (any type), activity = distinct (user, week), cell (cohort_week,
    * week_offset) counts the cohort's users active that week. Two keyed
    * shuffles — user grain (first-event min + the distinct), then the
    * cohort-cell aggregate whose key space is weeks × offsets, constant
    * in the corpus.
    */
  def cohortRetention(events: DataFrame, maxOffsetWeeks: Int): DataFrame = {
    val firstWeek = events
      .groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
    val activeWeeks = events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    activeWeeks
      .join(firstWeek, Seq("user_id"))
      .withColumn("week_offset", (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .where(col("week_offset") <= maxOffsetWeeks)
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users")) // (user, week) is distinct already
      .orderBy("cohort_week", "week_offset")
  }

  val x51_funnel = Q(
    "x51_funnel",
    """WITH u AS (
      |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t0
      |  FROM events GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN u USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > u.t0 GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY e.user_id)
      |SELECT '1_view' AS stage, CAST(count(t0) AS BIGINT) AS n_users FROM u
      |UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
      |UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p
      |ORDER BY stage""".stripMargin,
  ) { t =>
    // view -> click -> purchase, strictly ordered per user; the oracle
    // renders the same funnel as the chained `ts >` join form.
    funnel(t.events, Seq("view", "click", "purchase"))
  }

  val x52_cohort_retention = Q(
    "x52_cohort_retention",
    """WITH f AS (
      |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      |  FROM events GROUP BY user_id),
      |a AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      |  FROM events)
      |SELECT CAST(f.cohort_week AS VARCHAR) AS cohort_week,
      |       CAST(date_diff('day', f.cohort_week, a.week) // 7 AS INT) AS week_offset,
      |       count(*) AS n_users
      |FROM a JOIN f USING (user_id)
      |WHERE date_diff('day', f.cohort_week, a.week) // 7 <= 8
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,
  ) { t =>
    cohortRetention(t.events, maxOffsetWeeks = 8)
      .withColumn("cohort_week", col("cohort_week").cast("string"))
  }

  /** First-order Markov transition counts over the per-user event
    * sequence: one lag window on the (user, ts)-ordered stream (the same
    * single Exchange + Sort shape as the funnel), then an aggregate on
    * the constant (prev, next) key space (|types|+1 squared). `_start`
    * marks each user's entry event, so row counts conserve: sum(n) =
    * total events.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", coalesce(lag("event_type", 1).over(w), lit("_start")))
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "event_type")
  }

  val x54_transition_matrix = Q(
    "x54_transition_matrix",
    """WITH s AS (
      |  SELECT event_type,
      |         coalesce(lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id),
      |                  '_start') AS prev_type
      |  FROM events)
      |SELECT prev_type, event_type, count(*) AS n
      |FROM s GROUP BY prev_type, event_type ORDER BY prev_type, event_type""".stripMargin,
  ) { t =>
    transitionMatrix(t.events)
  }

  /** Rolling z-score anomaly detection: each event's value scored against
    * the mean/stddev of its user's `lookback` PRECEDING events (never the
    * current row — a self-including window would let the anomaly dilute
    * its own baseline). Same single (user, ts)-ordered Exchange + Sort as
    * the funnel/lag queries: both window aggregates share one frame, so
    * Catalyst evaluates them in one Window operator pass with O(lookback)
    * state per open partition — no per-user history materialized.
    *
    * Cross-engine determinism: mu/sd are floating sums whose accumulation
    * order differs between engines (Spark re-folds the frame, DuckDB uses
    * segment trees), so z is rounded to 4dp BEFORE the threshold compare
    * on both sides — a ~1e-12 relative float divergence cannot flip a
    * 5e-5-granular comparison unless the true z sits exactly on the
    * threshold (measure-zero for continuous values). The `cnt >= 2` guard
    * is load-bearing: stddev_samp of a 1-row frame is NULL in DuckDB but
    * NaN in Spark — both filtered, but only the count guard does it
    * identically.
    */
  def rollingZscore(events: DataFrame, lookback: Int, threshold: Double): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-lookback, -1)
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("mu", avg("value").over(w))
      .withColumn("sd", stddev_samp("value").over(w))
      .withColumn("cnt", count("value").over(w))
      .withColumn("z", round((col("value") - col("mu")) / col("sd"), 4))
      .where(col("cnt") >= 2 && col("sd") > 0 && abs(col("z")) > threshold)
      .select("user_id", "event_id", "z")
      .orderBy("user_id", "event_id")
  }

  val x58_rolling_zscore = Q(
    "x58_rolling_zscore",
    """WITH w AS (
      |  SELECT user_id, event_id, value,
      |    avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS mu,
      |    stddev_samp(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS sd,
      |    count(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS cnt
      |  FROM events)
      |SELECT user_id, event_id, round((value - mu) / sd, 4) AS z
      |FROM w WHERE cnt >= 2 AND sd > 0 AND abs(round((value - mu) / sd, 4)) > 2.5
      |ORDER BY user_id, event_id""".stripMargin,
  ) { t =>
    rollingZscore(t.events, lookback = 20, threshold = 2.5)
  }

  /** Time-weighted average per key — the metric that makes irregular
    * event streams comparable (a value held for an hour weighs 3600x one
    * held a second; the plain mean pretends they're equal). Each value is
    * weighted by its holding interval (lead(ts) - ts); the last event has
    * no interval and drops out (standard TWAP convention).
    *
    * Exactness under 32-way aggregation: weights are integer MICROSECONDS
    * and values integer CENTS, both summed in DECIMAL — order-independent
    * like a12/x62 — with one double division at the end. Same single
    * (user, ts) Exchange+Sort as the other event analytics; the lead
    * window and the aggregate share it.
    */
  def twap(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("value"), col("ts"), col("event_id"))
      .withColumn("nxt", lead("ts", 1).over(w))
      .where(col("nxt").isNotNull)
      .select(
        col("user_id"),
        round(col("value") * 100).cast(DecimalType(18, 0)).as("cents"),
        (unix_micros(col("nxt")) - unix_micros(col("ts"))).cast(DecimalType(18, 0)).as("dt_us"))
      .groupBy("user_id")
      .agg(
        round(sum(col("cents") * col("dt_us")).cast(DoubleType) / 100.0 /
          sum(col("dt_us")).cast(DoubleType), 6).as("twap"),
        count(lit(1)).as("n_intervals"))
      .orderBy("user_id")
  }

  val x63_twap = Q(
    "x63_twap",
    """WITH d AS (
      |  SELECT user_id, value, ts,
      |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      |  FROM events),
      |w AS (
      |  SELECT user_id, CAST(round(value * 100) AS HUGEINT) AS cents,
      |         epoch_us(nxt) - epoch_us(ts) AS dt_us
      |  FROM d WHERE nxt IS NOT NULL)
      |SELECT user_id,
      |       round(CAST(sum(cents * dt_us) AS DOUBLE) / 100.0 / CAST(sum(dt_us) AS DOUBLE), 6) AS twap,
      |       CAST(count(*) AS BIGINT) AS n_intervals
      |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,
  ) { t =>
    twap(t.events)
  }

  /** Wide-table pivot — the report-shaping verb (one row per entity, one
    * column per category). The category list is EXPLICIT: open-ended
    * `pivot(col)` first runs a distinct-scan job to discover values and
    * caps at spark.sql.pivotMaxValues — a silent extra pass and a silent
    * failure mode at 100 TB; a declared list keeps the whole pivot ONE
    * hash aggregate with |keys| x |categories| cells and no discovery
    * scan. Unknown categories are deliberately dropped by the contract
    * (they'd be unnamable columns); count cells for absent pairs are 0
    * via the count aggregate, and the value sums stay in DECIMAL cents
    * (the DSUM discipline, per pivot cell).
    */
  def pivotCounts(events: DataFrame, types: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    events
      .groupBy("user_id")
      .pivot("event_type", types)
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .na.fill(0L, types.map(t => s"${t}_n"))
      .orderBy("user_id")
  }

  val x65_pivot = Q(
    "x65_pivot",
    """SELECT user_id,
      |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click_n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS click_total,
      |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase_n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_total,
      |  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view_n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'view') AS DOUBLE) AS view_total
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
  ) { t =>
    // The oracle is the portable rendering of the same plan: conditional
    // aggregation — which is exactly what Catalyst lowers the explicit
    // pivot to (PivotFirst never appears with a literal value list and a
    // single groupBy pass).
    pivotCounts(t.events, Seq("click", "purchase", "view"))
  }

  val all: Seq[Q] = Seq(x51_funnel, x52_cohort_retention, x54_transition_matrix,
    x58_rolling_zscore, x63_twap, x65_pivot)
}
