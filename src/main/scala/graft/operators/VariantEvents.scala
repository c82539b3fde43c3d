package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** VARIANT event payloads — the reference's `dict[str, Any]` event data
  * (`amplifierd/amplifierd/models/trace.py:27`, field access
  * `services/trace_aggregator.py:94-96`) carried as Spark's binary VARIANT
  * type instead of a JSON string.
  *
  * Why this matters at 100 TB: the C11 path (`get_json_object` over a
  * string column) re-parses the full JSON text on EVERY access — k accesses
  * = k parses per row, pure per-row CPU tax. VARIANT parses ONCE at ingest
  * (`parse_json`), stores a binary encoding whose fields are O(log n)
  * seekable, and `variant_get` extracts typed values with no re-parse. With
  * `spark.sql.variant.writeShredding.enabled` the parquet writer further
  * shreds typed paths into real columns, and
  * `spark.sql.variant.pushVariantIntoScan` rewrites `variant_get` into
  * struct field reads AT THE SCAN — the extraction cost moves from
  * per-access to per-file, and column pruning/stats apply to paths.
  *
  * The payloads are heterogeneous by construction (four shapes keyed on
  * `event_id % 4`, mirroring how tool/message/lifecycle events carry
  * different `data` dicts), built deterministically from `events` columns
  * so DuckDB can replay every extraction from its own JSON reconstruction.
  */
object VariantEvents {

  /** Deterministic heterogeneous JSON payload per event — four shapes, all
    * values integer/string/bool functions of (event_id, props.k) so the
    * DuckDB oracle rebuilds byte-equal JSON. `k` appears in EVERY shape:
    * its extraction below is the exact C11 access path, rewritten.
    */
  private def payloadJson(kCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val k  = kCol.cast("string")
    val id = col("event_id").cast("string")
    when(col("event_id") % 4 === 0,
      concat(lit("""{"tool":{"name":"search","ms":"""), (kCol * 3).cast("string"),
        lit("""},"k":"""), k, lit(""","ok":true}""")))
      .when(col("event_id") % 4 === 1,
        concat(lit("""{"tool":{"name":"fetch","ms":"""), (kCol * 5).cast("string"),
          lit("""},"k":"""), k, lit(""","retries":"""), (kCol % 4).cast("string"), lit("}")))
      .when(col("event_id") % 4 === 2,
        concat(lit("""{"msg":"evt-"""), id, lit("""","tags":["a","b"],"k":"""), k, lit("}")))
      .otherwise(concat(lit("""{"k":"""), k, lit(""","ok":false}""")))
  }

  /** The ingest seam: parse each event's JSON payload ONCE into a VARIANT
    * `data` column. Everything downstream (storage, extraction, predicates)
    * touches only the binary encoding — never the string again.
    */
  def ingest(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("event_type"),
      parse_json(payloadJson(get_json_object(col("props"), "$.k").cast("long"))).as("data"))

  /** The string-path twin of [[ingest]] — same payloads kept as JSON
    * TEXT — and of [[toolRollup]] below: the A/B pair
    * `graft.tools.VariantScale` measures (every access re-parses the
    * full string through get_json_object vs one parse at ingest).
    */
  def ingestString(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("event_type"),
      payloadJson(get_json_object(col("props"), "$.k").cast("long")).as("data_json"))

  def toolRollupString(ingested: DataFrame): DataFrame =
    ingested
      .groupBy(
        coalesce(get_json_object(col("data_json"), "$.tool.name"), lit("none")).as("tool"))
      .agg(
        count(lit(1)).as("n"),
        sum(get_json_object(col("data_json"), "$.tool.ms").cast("long")).as("sum_ms"),
        sum(get_json_object(col("data_json"), "$.k").cast("long")).as("sum_k"),
        count(get_json_object(col("data_json"), "$.retries")).as("n_retried"),
        count(get_json_object(col("data_json"), "$.tags[0]")).as("n_tagged"),
        sum(when(get_json_object(col("data_json"), "$.ok") === "true", 1L)
          .otherwise(0L)).as("n_ok"))
      .orderBy("tool")

  /** The C11 access paths over VARIANT: two typed extractions (string
    * tool name, long ms / k), one existence predicate (retries present),
    * an array path, and a boolean — grouped per tool.
    */
  def toolRollup(ingested: DataFrame): DataFrame =
    ingested
      .groupBy(
        coalesce(variant_get(col("data"), "$.tool.name", "string"), lit("none")).as("tool"))
      .agg(
        count(lit(1)).as("n"),
        sum(variant_get(col("data"), "$.tool.ms", "long")).as("sum_ms"),
        sum(variant_get(col("data"), "$.k", "long")).as("sum_k"),
        count(variant_get(col("data"), "$.retries", "long")).as("n_retried"),
        count(variant_get(col("data"), "$.tags[0]", "string")).as("n_tagged"),
        sum(when(variant_get(col("data"), "$.ok", "boolean"), 1L).otherwise(0L)).as("n_ok"))
      .orderBy("tool")

  /** Set `confs`, run `body`, restore prior values — the variant
    * shredding/pushdown switches are session confs, and a registry query
    * must not leak session-state changes into its neighbors.
    */
  private def withConfs[A](spark: SparkSession, confs: (String, String)*)(body: => A): A = {
    val prior = confs.map { case (key, _) => key -> spark.conf.getOption(key) }
    confs.foreach { case (key, v) => spark.conf.set(key, v) }
    try body
    finally prior.foreach {
      case (key, Some(v)) => spark.conf.set(key, v)
      case (key, None)    => spark.conf.unset(key)
    }
  }

  /** Write the ingested frame (VARIANT column included) to parquet with
    * shredding enabled, and hand a reader of it — shredded-allowed, with
    * `variant_get` pushdown into the scan — to `body`. This is the
    * "parse once, store binary, extract at the scan" lifecycle a 100 TB
    * event pipeline runs; the temp dir stands in for the table location.
    */
  def withVariantTable[A](spark: SparkSession, ingested: DataFrame)
      (body: DataFrame => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-variant")
    try withConfs(spark,
      "spark.sql.variant.writeShredding.enabled" -> "true",
      "spark.sql.variant.inferShreddingSchema"   -> "true",
      "spark.sql.variant.allowReadingShredded"   -> "true",
      "spark.sql.variant.pushVariantIntoScan"    -> "true") {
      val dir = tmp.toString + "/events_v"
      ingested.write.mode("overwrite").parquet(dir)
      body(spark.read.parquet(dir))
    }
    finally graft.sources.AtomicFs.deleteRecursively(tmp)
  }

  /** c16: the C11 JSON access paths re-expressed over a stored VARIANT
    * column — parse_json once at ingest, parquet roundtrip (shredded), all
    * extraction via variant_get on the scan side. DuckDB replays the same
    * payload construction as JSON text and extracts with its JSON
    * functions; values agree because every payload field is a closed
    * integer/string/bool function of (event_id, props.k).
    */
  val c16_variant_events = Q(
    "c16_variant_events",
    """WITH src AS (
      |  SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events),
      |payload AS (
      |  SELECT CASE CAST(event_id % 4 AS INTEGER)
      |    WHEN 0 THEN '{"tool":{"name":"search","ms":' ||
      |      CAST(k * 3 AS VARCHAR) || '},"k":' || CAST(k AS VARCHAR) || ',"ok":true}'
      |    WHEN 1 THEN '{"tool":{"name":"fetch","ms":' ||
      |      CAST(k * 5 AS VARCHAR) || '},"k":' || CAST(k AS VARCHAR) ||
      |      ',"retries":' || CAST(k % 4 AS VARCHAR) || '}'
      |    WHEN 2 THEN '{"msg":"evt-' || CAST(event_id AS VARCHAR) ||
      |      '","tags":["a","b"],"k":' || CAST(k AS VARCHAR) || '}'
      |    ELSE '{"k":' || CAST(k AS VARCHAR) || ',"ok":false}'
      |  END AS data FROM src)
      |SELECT coalesce(json_extract_string(data, '$.tool.name'), 'none') AS tool,
      |       count(*) AS n,
      |       CAST(sum(CAST(json_extract(data, '$.tool.ms') AS BIGINT)) AS BIGINT) AS sum_ms,
      |       CAST(sum(CAST(json_extract(data, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       CAST(count(json_extract(data, '$.retries')) AS BIGINT) AS n_retried,
      |       CAST(count(json_extract_string(data, '$.tags[0]')) AS BIGINT) AS n_tagged,
      |       CAST(sum(CASE WHEN json_extract_string(data, '$.ok') = 'true'
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_ok
      |FROM payload GROUP BY tool ORDER BY tool""".stripMargin,
  ) { t =>
    withVariantTable(t.spark, ingest(t.events))(stored =>
      toolRollup(stored).localCheckpoint(true))
  }

  /** w10: W1's turn sessionization over the VARIANT-TYPED events table
    * itself — the r13 verdict's #7. `Tables.eventsVariant` parses `props`
    * once at ingest; the frame roundtrips through a shredded parquet
    * table, so the per-turn payload aggregate's `variant_get($.k)` is
    * rewritten into a struct column read AT THE SCAN (pushVariantIntoScan
    * — VariantSpec pins the plan shape). Same delimiter-count window as
    * w1; what changes is that NO string re-parse happens per event — at
    * 100 TB of trace events that is the difference between a CPU-bound
    * scan and an IO-bound one (VariantScale measured 3.0×). The oracle
    * replays the sessionization and extracts k from its own JSON string.
    */
  val w10_variant_turns = Q(
    "w10_variant_turns",
    """SELECT user_id, turn_id, count(*) AS n_events,
      |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM (
      |  SELECT user_id, props,
      |         CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS turn_id
      |  FROM events)
      |GROUP BY user_id, turn_id ORDER BY user_id, turn_id""".stripMargin,
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    withVariantTable(t.spark, t.eventsVariant) { ev =>
      val turnId = sum(when(col("event_type") === "signup", 1).otherwise(0))
        .over(Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
      ev
        // extract in the PROJECTION, not inside the aggregate:
        // pushVariantIntoScan collects variant_get from projections /
        // grouping keys / filters and rewrites them into shredded scan
        // columns; buried inside an agg function it would read the full
        // variant blob per row instead (VariantSpec pins this shape)
        .select(
          col("user_id"), col("ts"), col("event_id"), col("event_type"),
          variant_get(col("props"), "$.k", "long").as("k"))
        .withColumn("turn_id", turnId)
        .groupBy("user_id", "turn_id")
        .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"))
        .orderBy("user_id", "turn_id")
        .localCheckpoint(true)
    }
  }

  /** j8: J3's pre/post time-range correlation over the VARIANT-typed
    * events table — the r14 verdict's #3, threading VARIANT through the
    * trace family's join shape the way w10 threaded it through W1. The
    * payload is LOAD-BEARING here: each matched purchase contributes its
    * `$.k` to the per-view rollup, so the extraction sits on the join's
    * build side, not in a trailing projection. `Tables.eventsVariant`
    * parses `props` ONCE; after the shredded parquet roundtrip the
    * projection-level `variant_get($.k)` is rewritten into a struct
    * column read AT THE SCAN (pushVariantIntoScan — VariantSpec pins the
    * shape: no variant_get, no JSON parse in the executed plan). Same
    * equi-join + range-residual plan as j3 (never a nested loop); what
    * changes is that the reference's highest-traffic shape
    * (`trace_aggregator.py:56-211` re-parsing event `data` per access)
    * pays its payload-parse cost once at ingest. A/B: VariantScale's
    * j8-shaped pass measures string-reparse vs shredded scan (SCALE.md).
    */
  val j8_variant_prepost = Q(
    "j8_variant_prepost",
    """SELECT v.user_id, v.event_id AS view_id, count(*) AS n_purchases_within_1h,
      |       CAST(sum(p.k) AS BIGINT) AS sum_k
      |FROM (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events
      |      WHERE event_type = 'view') v
      |JOIN (SELECT user_id, epoch_ms(ts) AS ms,
      |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events WHERE event_type = 'purchase') p
      |  ON p.user_id = v.user_id AND p.ms > v.ms AND p.ms <= v.ms + 3600000
      |GROUP BY 1, 2 ORDER BY v.user_id, view_id""".stripMargin,
  ) { t =>
    withVariantTable(t.spark, t.eventsVariant) { ev =>
      val e = ev.select(
        col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"),
        // extraction in the projection (the w10 rule): pushVariantIntoScan
        // rewrites it into a shredded scan column; buried inside the agg it
        // would read the full variant blob per row
        variant_get(col("props"), "$.k", "long").as("k"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"), col("ms").as("vms"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ms").as("pms"), col("k"))
      views
        .join(purchases, Seq("user_id"))
        .filter(col("pms") > col("vms") && col("pms") <= col("vms") + 3600000L)
        .groupBy(col("user_id"), col("view_id"))
        .agg(count(lit(1)).as("n_purchases_within_1h"), sum(col("k")).as("sum_k"))
        .orderBy("user_id", "view_id")
        .localCheckpoint(true)
    }
  }

  /** f13: a FILTER whose predicate sits on a shredded VARIANT path — the
    * last scan-side placement after projection (w10), join build side
    * (j8), and aggregate feed (st6_variant_turns). `pushVariantIntoScan`
    * rewrites the predicate's `variant_get($.k)` into a struct column
    * read, so the filter runs on a typed column straight out of the
    * parquet reader — no per-row parse to DECIDE whether to keep a row,
    * which at 100 TB is the difference between a selective scan and a
    * full-decode-then-discard. The struct column is a real column to the
    * reader, so ordinary row-group statistics apply to it the way they
    * apply to any typed column (VariantSpec pins the plan: the filter
    * compares a scan output attribute, zero variant machinery).
    */
  val f13_variant_filter = Q(
    "f13_variant_filter",
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) BETWEEN 10 AND 200
      |  AND event_type <> 'error'
      |GROUP BY event_type ORDER BY event_type""".stripMargin,
  ) { t =>
    withVariantTable(t.spark, t.eventsVariant) { ev =>
      ev
        // the w10 rule again: extract in the projection so BOTH the
        // filter below and the aggregate read the rewritten struct
        // column — a variant_get buried inside agg() stays a per-row
        // blob decode even when the filter's copy is rewritten
        .select(col("event_type"), variant_get(col("props"), "$.k", "long").as("k"))
        .filter(col("k").between(10, 200) && col("event_type") =!= "error")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("event_type")
        .localCheckpoint(true)
    }
  }

  val all: Seq[Q] = Seq(c16_variant_events, w10_variant_turns, j8_variant_prepost,
    f13_variant_filter)
}
