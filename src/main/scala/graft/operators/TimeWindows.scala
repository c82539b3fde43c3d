package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Q
import graft.streaming.StreamOps

/** Time-bucketed aggregations over `events` (SURVEY §2.9 note: the
  * idiomatic-Spark expression of the reference's time-oriented views) plus
  * the J3 pre/post correlation shape as a batch range join.
  *
  * Window starts leave as epoch-ms longs; Spark's `window()` aligns starts
  * to epoch multiples of the slide, which the oracle reproduces with pure
  * integer math — engine-neutral by construction.
  */
object TimeWindows {

  val t1_tumbling_window = Q(
    "t1_tumbling_window",
    """SELECT (epoch_ms(ts) // 86400000) * 86400000 AS window_start_ms,
      |       event_type, count(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start_ms, event_type""".stripMargin,
  ) { t =>
    // Tumbling 1-day windows via window($"ts", "1 day") — partial agg
    // map-side, 6 groups/day cross the exchange. The oracle floors epoch-ms
    // to the day, exactly Spark's epoch-aligned window start.
    t.events
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_start_ms", "event_type")
  }

  val t2_sliding_window = Q(
    "t2_sliding_window",
    """SELECT window_start_ms, count(*) AS n FROM (
      |  SELECT (epoch_ms(ts) // 3600000) * 3600000 - k.k * 3600000 AS window_start_ms
      |  FROM events, (SELECT unnest([0, 1]) AS k) k
      |  WHERE epoch_ms(ts) >= (epoch_ms(ts) // 3600000) * 3600000 - k.k * 3600000
      |    AND epoch_ms(ts) <  (epoch_ms(ts) // 3600000) * 3600000 - k.k * 3600000 + 7200000)
      |GROUP BY 1 ORDER BY window_start_ms""".stripMargin,
  ) { t =>
    // Sliding 2h window, 1h slide: every event lands in 2 windows. Spark
    // explodes window() internally; the oracle explodes k∈{0,1} the same way.
    t.events
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("window_start_ms"), col("n"))
      .orderBy("window_start_ms")
  }

  val j3_prepost_correlate = Q(
    "j3_prepost_correlate",
    """SELECT v.user_id, v.event_id AS view_id, count(*) AS n_purchases_within_1h
      |FROM (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events WHERE event_type = 'view') v
      |JOIN (SELECT user_id, epoch_ms(ts) AS ms FROM events WHERE event_type = 'purchase') p
      |  ON p.user_id = v.user_id AND p.ms > v.ms AND p.ms <= v.ms + 3600000
      |GROUP BY 1, 2 ORDER BY v.user_id, view_id""".stripMargin,
  ) { t =>
    // SURVEY J3: tool:pre/tool:post correlation as its batch shape — an
    // equi-join on the entity key with a time-range residual. The equi part
    // keys the join (broadcast-hash at this sf, sort-merge at scale); the
    // range predicate stays a residual filter, so no nested-loop join
    // appears (plan-audited).
    val e = t.events.select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_millis(col("ts")).as("ms"))
    val views     = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ms").as("vms"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms").as("pms"))
    views
      .join(purchases, Seq("user_id"))
      .filter(col("pms") > col("vms") && col("pms") <= col("vms") + 3600000L)
      .groupBy(col("user_id"), col("view_id"))
      .agg(count(lit(1)).as("n_purchases_within_1h"))
      .orderBy("user_id", "view_id")
  }

  /** J3 as a driver-oracle'd STREAM-STREAM micro-batch replay (the st6
    * pattern applied to the join class): the same view/purchase event feed
    * is split on the global time order into 4 forced micro-batches and
    * driven through the LIVE watermarked stream-stream join
    * (`StreamOps.prePostStreamJoin` — two keyed state stores, range
    * condition, watermark eviction), so a view must survive up to 3
    * state-store round trips to meet its later-batch purchases and
    * reproduce the batch j3 answer. The memory-sink pairs are then counted
    * per view in batch and hash-compared against the SAME oracle SQL as
    * j3_prepost_correlate.
    *
    * Determinism: the feed is globally ts-ordered, so no row is ever late
    * (the watermark only advances between chunks) and eviction is safe by
    * construction — a view is evicted only when the watermark passed
    * vms+tolerance, and every future purchase has pms >= the chunk
    * boundary > that watermark + delay, so it could not have matched.
    * The driver-side collect is the replay harness, not the operator: a
    * production deployment points the same two DataFrames at Kafka topics
    * and the identical plan runs unbounded with state bounded by
    * (rate x (tolerance + watermark)).
    */
  val j3_stream_replay = Q.instrument(
    "j3_stream_replay",
    """SELECT v.user_id, v.event_id AS view_id, count(*) AS n_purchases_within_1h
      |FROM (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events
      |      WHERE event_type = 'view' AND user_id % 5 = 2) v
      |JOIN (SELECT user_id, epoch_ms(ts) AS ms FROM events
      |      WHERE event_type = 'purchase' AND user_id % 5 = 2) p
      |  ON p.user_id = v.user_id AND p.ms > v.ms AND p.ms <= v.ms + 3600000
      |GROUP BY 1, 2 ORDER BY v.user_id, view_id""".stripMargin,
  ) { t =>
    implicit val spark: org.apache.spark.sql.SparkSession = t.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // The replay is CAPPED to a deterministic 1/5 user slice (user_id % 5
    // = 2, mirrored in the oracle): the instrument exists to drive the
    // live stream-stream join through cross-batch state round trips under
    // a driver oracle, and a 20% slice of the time-ordered feed exercises
    // every one of those paths at a fifth of the feed/collect/sink cost —
    // the r12 verdict's instrument-cost ask. The UNCAPPED production join
    // is j3_prepost_correlate (batch) and StreamOps.prePostStreamJoin
    // itself, whose cost a deployment pays against Kafka, not a replay.
    val rows = t.events
      .filter(col("event_type").isin("view", "purchase") && col("user_id") % 5 === 2)
      .select(col("event_type"), col("user_id"), col("event_id"), col("ts"))
      .orderBy(col("ts"), col("event_id"))
      .as[(String, Long, Long, java.sql.Timestamp)].collect()
    val pre  = MemoryStream[(String, Long, Long, java.sql.Timestamp)]
    val post = MemoryStream[(String, Long, java.sql.Timestamp)]
    // State-partition sizing: a stream-stream join keeps FOUR state
    // stores per partition (keyToNumValues/keyWithIndex on both sides),
    // and the HDFS-backed provider writes one delta file per store per
    // partition per micro-batch — the replay's wall is those fsyncs, not
    // the data. 2 partitions × 4 stores × ~8 batches is plenty for the
    // ~300-user capped slice; a production deployment sizes partitions to
    // the key space, not to this replay.
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    val query =
      try StreamOps.prePostStreamJoin(
          pre.toDF().toDF("name", "group_id", "view_id", "ts")
            .select(col("name"), col("group_id"), col("ts"), col("view_id")),
          post.toDF().toDF("name", "group_id", "ts"),
          watermark = "2 hours", toleranceSeconds = 3600,
          carryCols = Seq("view_id"))
        .writeStream.format("memory").queryName("j3_replay_sink")
        .outputMode("append").start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try {
      rows.grouped(math.max(1, (rows.length + 3) / 4)).foreach { chunk =>
        val views     = chunk.collect { case ("view", u, id, ts) => ("e", u, id, ts) }
        val purchases = chunk.collect { case ("purchase", u, _, ts) => ("e", u, ts) }
        if (views.nonEmpty) pre.addData(views.toIndexedSeq)
        if (purchases.nonEmpty) post.addData(purchases.toIndexedSeq)
        query.processAllAvailable()
      }
    } finally query.stop()
    spark.table("j3_replay_sink")
      // the operator's contract is post_ts >= pre_ts; j3's is strictly >
      .filter(unix_millis(col("post_ts")) > unix_millis(col("pre_ts")))
      .groupBy(col("group_id"), col("view_id"))
      .agg(count(lit(1)).as("n_purchases_within_1h"))
      .select(col("group_id").as("user_id"), col("view_id"), col("n_purchases_within_1h"))
      .orderBy("user_id", "view_id")
  }

  val m3_retention_survivors = Q(
    "m3_retention_survivors",
    """SELECT o_orderkey FROM orders
      |WHERE NOT (o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |           AND o_orderstatus NOT IN ('P'))
      |ORDER BY o_orderkey""".stripMargin,
  ) { t =>
    // SURVEY M3: retention cleanup — DELETE WHERE expressed as the
    // survivor rewrite (age predicate F10 negated; protected status kept).
    t.orders
      .filter(!(col("o_orderdate") < lit("1996-01-01").cast(TimestampType) &&
        !col("o_orderstatus").isin("P")))
      .select("o_orderkey")
      .orderBy("o_orderkey")
  }

  val st5_token_fold = Q(
    "st5_token_fold",
    """SELECT user_id,
      |       string_agg(event_type, '' ORDER BY epoch_ms(ts), event_id) AS content,
      |       count(*) AS n_tokens
      |FROM events WHERE event_type IN ('click', 'view')
      |GROUP BY user_id ORDER BY user_id""".stripMargin,
  ) { t =>
    // SURVEY A8/ST5 batch shape: ordered fold of a token stream into one
    // string per key (messages.py:222-226). collect_list over sorted
    // structs keeps the fold order deterministic under parallelism.
    val e = t.events.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("event_id"), col("event_type"))
    e.groupBy("user_id")
      .agg(
        concat_ws("",
          array_sort(collect_list(struct(col("ms"), col("event_id"), col("event_type"))))
            .getField("event_type")).as("content"),
        count(lit(1)).as("n_tokens"))
      .orderBy("user_id")
  }

  val all: Seq[Q] = Seq(
    t1_tumbling_window, t2_sliding_window, j3_prepost_correlate,
    j3_stream_replay, m3_retention_survivors, st5_token_fold,
  )
}
