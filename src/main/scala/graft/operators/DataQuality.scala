package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Q

/** Declarative data-quality gating (the "expectations" pattern: dbt tests /
  * Deequ checks / Delta constraints) — a rule is a named boolean Column;
  * the engine evaluates the whole rule set in ONE pass and serves three
  * views of the result:
  *
  *   - [[check]]: per-rule violation counts + the quarantine total — a
  *     map-side-only aggregate (every rule is a codegen'd sum(when(...)),
  *     one tiny exchange for the final merge). This is the cheap
  *     every-batch health signal at 100 TB: cost = one scan, no shuffle
  *     of data rows.
  *   - [[split]]: (pass, quarantine) row sets for the ingest gate — same
  *     predicate evaluated per row, no aggregation; the quarantine side
  *     carries `failed_rules` (the names of the rules the row broke) so
  *     triage never re-derives why a row was held.
  *
  * A rule violation is `NOT coalesce(rule, false)` — a NULL rule result
  * (null input to a comparison) counts as a violation, matching the
  * constraint-semantics a NOT NULL gate expects (SQL WHERE would silently
  * pass nulls through a negated predicate).
  */
object DataQuality {

  /** Per-rule violation counts in one aggregate pass; final row set is
    * one row per rule plus the `__quarantined` total (rows failing >= 1
    * rule). Output: (rule, n_fail) ordered by rule.
    */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val anyFail = rules
      .map { case (_, c) => !coalesce(c, lit(false)) }
      .reduce(_ || _)
    val aggs = rules.map { case (name, c) =>
      sum(when(!coalesce(c, lit(false)), 1L).otherwise(0L)).as(name)
    } :+ sum(when(anyFail, 1L).otherwise(0L)).as("__quarantined")
    df.agg(aggs.head, aggs.tail: _*)
      .unpivot(Array.empty[Column], (rules.map(_._1) :+ "__quarantined").map(col).toArray, "rule", "n_fail")
      .orderBy("rule")
  }

  /** The ingest gate: rows passing every rule vs rows held for triage
    * (with the failing rule names attached).
    */
  def split(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val failed = array(rules.map { case (name, c) =>
      when(!coalesce(c, lit(false)), lit(name))
    }: _*)
    val tagged = df.withColumn("failed_rules", filter(failed, _.isNotNull))
    (
      tagged.where(size(col("failed_rules")) === 0).drop("failed_rules"),
      tagged.where(size(col("failed_rules")) > 0),
    )
  }

  /** The x47 rule set over orders: two rules that real rows violate
    * (price cap, status domain), one date-bounds rule with a few
    * violations, and one that everything passes (the format rule — a
    * green rule must report 0, not vanish).
    */
  def orderRules: Seq[(String, Column)] = Seq(
    "price_below_cap"   -> (col("o_totalprice") > 0 && col("o_totalprice") <= 300000),
    "status_in_domain"  -> col("o_orderstatus").isin("O", "F"),
    "date_in_bounds"    -> (col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
      col("o_orderdate") < lit("2001-01-01").cast("timestamp")),
    "priority_format"   -> col("o_orderpriority").rlike("^[1-5]-"),
  )

  val x47_dq_check = Q(
    "x47_dq_check",
    """SELECT rule, n_fail FROM (
      |  SELECT 'price_below_cap' AS rule,
      |         CAST(count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0 AND o_totalprice <= 300000, false)) AS BIGINT) AS n_fail FROM orders
      |  UNION ALL
      |  SELECT 'status_in_domain',
      |         CAST(count(*) FILTER (WHERE NOT coalesce(o_orderstatus IN ('O','F'), false)) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'date_in_bounds',
      |         CAST(count(*) FILTER (WHERE NOT coalesce(o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '2001-01-01', false)) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'priority_format',
      |         CAST(count(*) FILTER (WHERE NOT coalesce(regexp_matches(o_orderpriority, '^[1-5]-'), false)) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT '__quarantined',
      |         CAST(count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0 AND o_totalprice <= 300000, false)
      |                OR NOT coalesce(o_orderstatus IN ('O','F'), false)
      |                OR NOT coalesce(o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '2001-01-01', false)
      |                OR NOT coalesce(regexp_matches(o_orderpriority, '^[1-5]-'), false)) AS BIGINT) FROM orders
      |) ORDER BY rule""".stripMargin,
  ) { t =>
    check(t.orders, orderRules)
  }

  /** Distribution-drift monitor (PSI — population stability index, the
    * standard model-monitoring drift score): bucket a metric identically
    * in a reference and a current population, then per bucket
    * contrib = (p - q) * ln(p / q) with half-count Laplace smoothing so
    * a bucket empty on one side contributes a large-but-finite score
    * instead of infinity. PSI = sum of contributions; > 0.2 is the
    * conventional "investigate" line.
    *
    * Shape at 100 TB: ONE scan — each row maps to (bucket, side) and a
    * conditional-sum aggregate on the constant bucket key space; the
    * totals both rates need are a second aggregate over the nBuckets
    * result rows joined back as a 1-row broadcast. No data-row shuffle,
    * no join between the populations (they never meet row-wise — only
    * their bucket histograms do).
    *
    * Cross-engine determinism: bucket counts are exact integers computed
    * by identical floor/least/greatest arithmetic; p and q then derive
    * from ints by identical IEEE ops, and the single ln/multiply chain is
    * rounded to 6dp (libm vs JVM log differ at most in the last ulp).
    */
  def psiByBucket(
      df: DataFrame,
      isRef: Column,
      bucket: Column,
      nBuckets: Int,
  ): DataFrame = {
    val counts = df
      .select(bucket.as("bucket"), isRef.as("is_ref"))
      .groupBy("bucket")
      .agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
    val totals = counts.agg(
      sum("n_ref").as("tot_ref"), sum("n_cur").as("tot_cur"))
    val p = (col("n_ref") + 0.5) / (col("tot_ref") + 0.5 * nBuckets)
    val q = (col("n_cur") + 0.5) / (col("tot_cur") + 0.5 * nBuckets)
    counts
      .crossJoin(broadcast(totals))
      .withColumn("psi_contrib", round((p - q) * log(p / q), 6))
      .select("bucket", "n_ref", "n_cur", "psi_contrib")
      .orderBy("bucket")
  }

  val x59_drift_psi = Q(
    "x59_drift_psi",
    """WITH b AS (
      |  SELECT least(greatest(CAST(floor(value / 50) AS BIGINT), 0), 9) AS bucket,
      |         event_id % 2 = 0 AS is_ref
      |  FROM events WHERE value IS NOT NULL),
      |c AS (
      |  SELECT bucket,
      |         CAST(count(*) FILTER (WHERE is_ref) AS BIGINT) AS n_ref,
      |         CAST(count(*) FILTER (WHERE NOT is_ref) AS BIGINT) AS n_cur
      |  FROM b GROUP BY bucket),
      |t AS (SELECT sum(n_ref) AS tot_ref, sum(n_cur) AS tot_cur FROM c)
      |SELECT bucket, n_ref, n_cur,
      |       round(((n_ref + 0.5) / (tot_ref + 5.0) - (n_cur + 0.5) / (tot_cur + 5.0))
      |             * ln(((n_ref + 0.5) / (tot_ref + 5.0)) / ((n_cur + 0.5) / (tot_cur + 5.0))), 6)
      |         AS psi_contrib
      |FROM c CROSS JOIN t ORDER BY bucket""".stripMargin,
  ) { t =>
    // Even event_ids are the "reference" population, odd the "current";
    // value bucketized into 10 fixed-width cells (the production pattern:
    // edges frozen from the reference window, out-of-range clamped to the
    // edge cells).
    psiByBucket(
      t.events.where(col("value").isNotNull),
      isRef = col("event_id") % 2 === 0,
      bucket = least(greatest(floor(col("value") / 50).cast("long"), lit(0L)), lit(9L)),
      nBuckets = 10)
  }

  val all: Seq[Q] = Seq(x47_dq_check, x59_drift_psi)
}
