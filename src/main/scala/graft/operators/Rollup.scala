package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Q

/** Materialized-aggregate maintenance — the lakehouse rollup pattern: keep
  * a small PARTIALS table at (day, group, user) grain, append each day's
  * partials as the batch lands, and answer the corpus-wide rollup from the
  * partials alone. The 100 TB raw event log is read exactly once (the day
  * it lands); every refresh after that aggregates the partials table,
  * which is smaller by the per-day dedup factor on its grain.
  *
  * Reference anchor: the session metrics counters
  * (amplifier_library/sessions/manager.py:286-291 — message_count and
  * token_usage incremented per appended message) are rebuilt by rescanning
  * every session's JSONL on demand; a9_metrics_recompute reproduces that
  * semantics, this module is the scale rendering — same answers,
  * incremental cost.
  *
  * Design rules the accumulators follow:
  *   - Every partial is MERGEABLE by an associative exact operation
  *     (count/sum: +, min/max: min/max). Double sums are NOT exact under
  *     re-association, so money/value sums accumulate integer cents
  *     (same envelope as a12, Extras.scala) — the merged rollup is
  *     bit-identical to a from-scratch recompute, which is what makes the
  *     incremental path auditable at all.
  *   - COUNT(DISTINCT user) is not mergeable from counts, but IS mergeable
  *     from per-day distinct rows: the (day, group, user) grain carries the
  *     dedup, so the refresh counts distinct users over partials without
  *     ever touching raw events. The approximate twin ([[x39_hll_rollup]])
  *     replaces the user grain with a constant-size HLL sketch per
  *     (day, group) — the partials table stops growing with the user count
  *     and merges by sketch union, at bounded relative error.
  */
object Rollup {

  /** One day's partials at (event_date, event_type, user_id) grain.
    * Map-side combinable group-by; `value` accumulates in integer cents
    * (exact; see a12's overflow envelope — sum_cents wraps only past
    * ~9e14 rows at max |value| 100.00).
    */
  def dailyPartials(events: DataFrame): DataFrame =
    events
      .withColumn("event_date", to_date(col("ts")))
      .groupBy("event_date", "event_type", "user_id")
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"),
        min("value").as("min_v"),
        max("value").as("max_v"))

  /** The corpus-wide rollup from partials alone: one aggregate over the
    * partials table. n_users is exact because the input grain already
    * deduplicates (day, type, user).
    */
  def mergeRollup(partials: DataFrame): DataFrame =
    partials
      .groupBy("event_type")
      .agg(
        sum("n").as("n_events"),
        sum("sum_cents").as("sum_cents"),
        min("min_v").as("min_v"),
        max("max_v").as("max_v"),
        countDistinct("user_id").as("n_users"))

  /** Sketch partials at (event_date, event_type) grain: constant-size HLL
    * of the day's users per type. Merges by `hll_union_agg` — the refresh
    * cost is O(#days x #types) regardless of user cardinality.
    */
  def sketchPartials(events: DataFrame, lgK: Int = 14): DataFrame =
    events
      .withColumn("event_date", to_date(col("ts")))
      .groupBy("event_date", "event_type")
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("user_sketch"))

  def mergeSketchRollup(sketchParts: DataFrame): DataFrame =
    sketchParts
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("user_sketch"), lit(false)))
        .as("est_users"))

  /** Same cutoff as x35: 2024-01-25, engine-neutral ms literal — the
    * pre-cutoff 80% plays the long-lived base, the post-cutoff 20% the
    * daily batch whose partials get appended.
    */
  private val CutoffMs = 1706140800000L

  val x36_incremental_agg = Q(
    "x36_incremental_agg",
    """SELECT event_type,
      |       count(*) AS n_events,
      |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |       min(value) AS min_v,
      |       max(value) AS max_v,
      |       count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  ) { t =>
    // The incremental refresh must land EXACTLY where a from-scratch scan
    // lands: the oracle recomputes the rollup over ALL raw events, while
    // Spark builds base partials from pre-cutoff history, batch partials
    // from the post-cutoff 20% (the appended day), and merges partials
    // only — same equivalence discipline as x27/x29/x35. The raw table is
    // never re-read by the refresh; at 100 TB that is the whole point.
    val e = t.events.select(col("ts"), col("event_type"), col("user_id"), col("value"))
      .withColumn("ms", unix_millis(col("ts")))
    val base  = dailyPartials(e.filter(col("ms") < CutoffMs))
    val batch = dailyPartials(e.filter(col("ms") >= CutoffMs))
    mergeRollup(base.unionByName(batch)).orderBy("event_type")
  }

  /** Rows-only by nature (DuckDB's approx_count_distinct is a different
    * sketch family — estimates cannot hash-match). The estimate-vs-exact
    * envelope is spec-pinned instead (RollupSpec): lgK=14 keeps relative
    * error ~1% at this cardinality.
    */
  val x39_hll_rollup = Q.noOracle("x39_hll_rollup") { t =>
    val e = t.events.select(col("ts"), col("event_type"), col("user_id"), col("value"))
      .withColumn("ms", unix_millis(col("ts")))
    val base  = sketchPartials(e.filter(col("ms") < CutoffMs))
    val batch = sketchPartials(e.filter(col("ms") >= CutoffMs))
    mergeSketchRollup(base.unionByName(batch))
      .withColumn("est_users", round(col("est_users")).cast("long"))
      .orderBy("event_type")
  }

  /** Fixed-bin histogram partials — the MERGEABLE percentile accumulator
    * (the third leg of the rollup family: counts/sums merge exactly (x36),
    * distinct merges via HLL (x39), and percentiles — famously NOT
    * mergeable as percentiles — merge as bin counts). Bounds are FROZEN
    * at layout creation (same discipline as the z-layout's clampScale):
    * out-of-range values clamp into the edge bins, so later batches never
    * shift the grid. Bin assignment is exact arithmetic both engines
    * replay bit-for-bit.
    */
  def histBin(v: Column, lo: Double, width: Double, bins: Int): Column =
    least(greatest(floor((v - lo) / width).cast("long"), lit(0L)), lit(bins - 1L))

  def histPartials(events: DataFrame, lo: Double, width: Double, bins: Int): DataFrame =
    events
      .withColumn("event_date", to_date(col("ts")))
      .withColumn("bin", histBin(col("value"), lo, width, bins))
      .groupBy("event_date", "event_type", "bin")
      .agg(count(lit(1)).as("n"))

  /** Quantile estimates from merged histogram partials: per group, the
    * target bin is the first whose running count reaches q*total
    * (cum_prev < q*total <= cum — strict/inclusive so the pick is unique
    * even when the target lands exactly on a bin boundary), and the
    * estimate interpolates linearly inside it. Error is bounded by the
    * bin width — the knob the frozen grid trades against state size.
    * Output: (event_type, q, est), one row per group x quantile.
    */
  def histQuantiles(partials: DataFrame, lo: Double, width: Double,
                    qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = partials.groupBy("event_type", "bin").agg(sum("n").as("n"))
    val cum = h
      .withColumn("cum", sum("n").over(
        Window.partitionBy("event_type").orderBy("bin")))
      .withColumn("total", sum("n").over(Window.partitionBy("event_type")))
    cum
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .filter((col("cum") - col("n")) < col("q") * col("total") &&
        col("cum") >= col("q") * col("total"))
      .select(
        col("event_type"), col("q"),
        (lit(lo) + lit(width) *
          (col("bin") + (col("q") * col("total") - (col("cum") - col("n"))) / col("n")))
          .as("est"))
  }

  val x42_histogram_quantiles = Q(
    "x42_histogram_quantiles",
    """WITH p AS (
      |  SELECT event_type,
      |         LEAST(GREATEST(CAST(floor((value - 0.0) / 5.0) AS BIGINT), 0), 99) AS bin,
      |         count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |c AS (
      |  SELECT *, SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
      |         SUM(n) OVER (PARTITION BY event_type) AS total
      |  FROM p),
      |sel AS (
      |  SELECT c.event_type, t.q,
      |         0.0 + 5.0 * (bin + (t.q * total - (cum - n)) / n) AS est
      |  FROM c, (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.99 AS DOUBLE))) AS t(q)
      |  WHERE (cum - n) < t.q * total AND cum >= t.q * total)
      |SELECT event_type,
      |       max(CASE WHEN q = 0.5 THEN est END) AS p50_est,
      |       max(CASE WHEN q = 0.99 THEN est END) AS p99_est
      |FROM sel GROUP BY event_type ORDER BY event_type""".stripMargin,
  ) { t =>
    // Same incremental discipline as x36/x39: base partials from
    // pre-cutoff history, batch partials from the post-cutoff 20%, merged
    // by bin-count addition — the oracle recomputes the histogram over ALL
    // raw events and must land on the identical interpolated estimates
    // (grid frozen at [0, 500) x 100 bins; identical double expression
    // trees on both engines). RollupSpec pins the accuracy contract: every
    // estimate lies in the bin where the true data CDF crosses q*N (the
    // exact histogram guarantee), with the one-bin-width error bound
    // additionally asserted at the dense p50 — NOT at p99, where exact
    // percentiles interpolate between order statistics and a sparse tail
    // legitimately exceeds one bin of divergence.
    val e = t.events.select(col("ts"), col("event_type"), col("value"))
      .withColumn("ms", unix_millis(col("ts")))
    val base  = histPartials(e.filter(col("ms") < CutoffMs), 0.0, 5.0, 100)
    val batch = histPartials(e.filter(col("ms") >= CutoffMs), 0.0, 5.0, 100)
    histQuantiles(base.unionByName(batch), 0.0, 5.0, Seq(0.5, 0.99))
      .groupBy("event_type")
      .agg(
        max(when(col("q") === 0.5, col("est"))).as("p50_est"),
        max(when(col("q") === 0.99, col("est"))).as("p99_est"))
      .orderBy("event_type")
  }

  /** One micro-batch of the partials store, exposed for direct testing:
    * aggregate `batch` to its own partials and land them in the store's
    * `batch_id=<id>` partition with overwrite. Partition-per-batch (not a
    * flat append) makes the sink idempotent under replay: when Structured
    * Streaming re-runs a batch after a mid-write failure, the rewrite
    * replaces that batch's partition instead of appending a second copy —
    * a flat append would DOUBLE-COUNT the replayed batch in every later
    * [[mergeRollup]] (counts and sums re-aggregate by summation; they do
    * not collapse duplicates).
    *
    * FORMAT BREAK (r9): this store layout replaced the earlier flat-append
    * sink (loose parquet files with `batch_id` as a written long column).
    * The two layouts cannot coexist under one root — Spark's partition
    * discovery rejects mixed flat files and `batch_id=` dirs ("Conflicting
    * directory structures"), and `batch_id` changes from a data column to a
    * partition column for readers. Upgrading an existing store requires a
    * FRESH root (or a one-time migration moving the old flat files into a
    * `batch_id=-1` partition dir). The same break applies to the
    * driftMonitor PSI sink, which rides the identical partition-per-batch
    * discipline.
    */
  def foldPartialsBatch(batch: DataFrame, batchId: Long, partialsDir: String): Unit = {
    dailyPartials(batch).write.mode("overwrite")
      .parquet(partialsDir.stripSuffix("/") + s"/batch_id=$batchId")
    ()
  }

  /** Streaming maintenance of the partials store — the ingest-time half of
    * the x36 contract: each micro-batch aggregates to ITS OWN partials
    * (map-side combinable, batch-sized) and lands them in the store's
    * `batch_id=<id>` partition ([[foldPartialsBatch]] — idempotent under
    * batch replay); any later [[mergeRollup]] over the store lands exactly
    * where a from-scratch scan would, because partials merge associatively
    * across batches in the merge's re-aggregation. foreachBatch rather
    * than a streaming agg: the store is bounded by grain, not by stream
    * history, so there is no watermark/state question at all — zero
    * streaming state at any ingest volume, same discipline as the
    * stateless near-dup ingest probe. Small per-batch files are the
    * standard compaction concern (`Maintenance.compact`).
    */
  def streamingPartials(events: DataFrame, partialsDir: String,
                        checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldPartialsBatch(batch, batchId, partialsDir)
      }
      .start()

  val x46_heavy_hitters = Q(
    "x46_heavy_hitters",
    """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) || '|' || event_type AS item,
      |       count(*) AS est
      |FROM events
      |GROUP BY 1 ORDER BY est DESC, item""".stripMargin,
  ) { t =>
    // Frequent items — the fourth leg of the mergeable-summary family
    // (exact counts x36, HLL distinct x39, histogram quantiles x42,
    // Misra-Gries heavy hitters here). One pass, constant-size state per
    // partition, partials merge map-side under Spark's partial
    // aggregation exactly like any built-in agg. The oracle pins the
    // EXACT regime: the (day, type) domain is ~150 items at every sf,
    // far under the 2048 capacity, so no decrement ever fires and the
    // sketch returns true counts (FreqItemsSpec pins the t - n/(k+1)
    // error envelope and heavy-hitter completeness in the saturated
    // regime the oracle can't reach).
    import graft.plans.FreqItemsAgg.mg_freq
    t.events
      .select(concat(to_date(col("ts")).cast("string"), lit("|"), col("event_type")).as("item"))
      .agg(mg_freq(col("item"), 2048).as("m"))
      .select(explode(col("m")).as(Seq("item", "est")))
      .orderBy(desc("est"), col("item"))
  }

  val all: Seq[Q] = Seq(x36_incremental_agg, x39_hll_rollup, x42_histogram_quantiles, x46_heavy_hitters)
}
