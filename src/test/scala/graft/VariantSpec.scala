package graft

import org.apache.spark.sql.functions._

import graft.operators.VariantEvents

/** c16: VARIANT event payloads — parse once at ingest, binary storage,
  * scan-side typed extraction.
  */
class VariantSpec extends SparkSpec {

  private def tables = Tables(spark, sf0001)

  test("variant rollup equals an independent string-JSON rendering of the same payloads") {
    val res = VariantEvents.c16_variant_events.run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // independent check: same shapes via the string path (get_json_object),
    // no variant machinery anywhere
    val k = get_json_object(col("props"), "$.k").cast("long")
    val data = when(col("event_id") % 4 === 0,
      concat(lit("""{"tool":{"name":"search","ms":"""), (k * 3).cast("string"),
        lit("""},"k":"""), k.cast("string"), lit(""","ok":true}""")))
      .when(col("event_id") % 4 === 1,
        concat(lit("""{"tool":{"name":"fetch","ms":"""), (k * 5).cast("string"),
          lit("""},"k":"""), k.cast("string"), lit(""","retries":"""),
          (k % 4).cast("string"), lit("}")))
      .when(col("event_id") % 4 === 2,
        concat(lit("""{"msg":"evt-"""), col("event_id").cast("string"),
          lit("""","tags":["a","b"],"k":"""), k.cast("string"), lit("}")))
      .otherwise(concat(lit("""{"k":"""), k.cast("string"), lit(""","ok":false}""")))
    val expect = tables.events.select(data.as("d"))
      .groupBy(coalesce(get_json_object(col("d"), "$.tool.name"), lit("none")).as("tool"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(res.keySet === Set("search", "fetch", "none"))
    assert(res === expect)
  }

  test("stored variant: extraction happens at the scan — no JSON re-parse in the executed plan") {
    val df = VariantEvents.withVariantTable(spark, VariantEvents.ingest(tables.events)) {
      stored =>
        val rollup = VariantEvents.toolRollup(stored)
        rollup.collect() // finalize adaptive plan
        (rollup.queryExecution.executedPlan.toString,
         rollup.collect().map(_.getString(0)).toSeq)
    }
    val (plan, tools) = df
    // the parse happened ONCE at ingest; the query-side plan must not
    // re-parse any JSON text
    assert(!plan.contains("parse_json"), s"query plan re-parses JSON:\n$plan")
    assert(!plan.contains("get_json_object"), s"query plan string-parses JSON:\n$plan")
    assert(!plan.contains("from_json"), s"query plan string-parses JSON:\n$plan")
    // pushVariantIntoScan replaced the variant column in the scan schema
    // with a struct of requested paths — the grouping key ($.tool.name)
    // arrives as a REAL string column out of the parquet reader, not a
    // per-row variant_get (observed: struct<data:struct<0:variant,1:string>>)
    assert(plan.contains("ReadSchema: struct<data:struct<"),
      s"variant_get not pushed into the scan:\n$plan")
    assert(tools.sorted === Seq("fetch", "none", "search"))
  }

  test("w10: the VARIANT-typed events table — scan-side $.k extraction, w1-consistent turns") {
    // plan shape: the k extraction must come out of the parquet reader as
    // a shredded struct column, with no JSON re-parse in the query plan
    val (plan, rows) = VariantEvents.withVariantTable(spark, tables.eventsVariant) { ev =>
      val q = ev
        .select(col("event_type"), variant_get(col("props"), "$.k", "long").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"))
      q.collect()
      (q.queryExecution.executedPlan.toString, q.collect())
    }
    assert(!plan.contains("parse_json"), s"query plan re-parses JSON:\n$plan")
    assert(!plan.contains("get_json_object"), s"query plan string-parses JSON:\n$plan")
    // scan-side extraction: the projection-level variant_get is REWRITTEN
    // into a shredded struct read — no variant_get survives in the
    // executed plan, and the scan schema carries the typed path
    assert(!plan.contains("variant_get"), s"variant_get not pushed into the scan:\n$plan")
    assert(plan.contains("props:struct<"), s"scan schema not shredded:\n$plan")
    assert(rows.nonEmpty)
    // semantics: w10's per-turn (n_events, sum_k) must agree with the
    // string-path reconstruction over the SAME raw table
    val w10 = VariantEvents.w10_variant_turns.run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val turnId = sum(when(col("event_type") === "signup", 1).otherwise(0))
      .over(org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow))
    val expect = tables.events
      .withColumn("turn_id", turnId)
      .groupBy("user_id", "turn_id")
      .agg(count(lit(1)).as("n_events"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(w10 === expect)
  }

  test("j8: pre/post join over the VARIANT table — scan-side k, no reparse, equals the string path") {
    // plan shape on the exact j8 projection: the purchase-side k must come
    // out of the parquet reader shredded, with no JSON machinery surviving
    val plan = VariantEvents.withVariantTable(spark, tables.eventsVariant) { ev =>
      val q = ev
        .select(col("user_id"), col("event_type"),
          variant_get(col("props"), "$.k", "long").as("k"))
        .filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(sum(col("k")).as("sum_k"))
      q.collect()
      q.queryExecution.executedPlan.toString
    }
    assert(!plan.contains("parse_json"), s"query plan re-parses JSON:\n$plan")
    assert(!plan.contains("get_json_object"), s"query plan string-parses JSON:\n$plan")
    assert(!plan.contains("variant_get"), s"variant_get not pushed into the scan:\n$plan")
    assert(plan.contains("props:struct<"), s"scan schema not shredded:\n$plan")
    // semantics: the registry row must agree with an independent
    // string-path (get_json_object) rendering of the same correlation
    val j8 = VariantEvents.j8_variant_prepost.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val e = tables.events.select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_millis(col("ts")).as("ms"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ms").as("vms"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms").as("pms"), col("k"))
    val expect = views.join(purchases, Seq("user_id"))
      .filter(col("pms") > col("vms") && col("pms") <= col("vms") + 3600000L)
      .groupBy("user_id", "view_id")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(j8.nonEmpty && j8 === expect)
  }

  test("f13: predicate on a shredded variant path — typed scan column in the filter, equals the string path") {
    val (plan, rows) = VariantEvents.withVariantTable(spark, tables.eventsVariant) { ev =>
      val q = ev
        .select(col("event_type"), variant_get(col("props"), "$.k", "long").as("k"))
        .filter(col("k").between(10, 200) && col("event_type") =!= "error")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      q.collect()
      (q.queryExecution.executedPlan.toString,
        q.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap)
    }
    // the predicate must compare a scan output attribute — no variant
    // machinery deciding row survival
    assert(!plan.contains("variant_get"), s"filter not rewritten to struct column:\n$plan")
    assert(!plan.contains("get_json_object") && !plan.contains("parse_json"),
      s"filter re-parses JSON:\n$plan")
    assert(plan.contains("props:struct<"), s"scan schema not shredded:\n$plan")
    // and the range predicate reaches the parquet reader as a PUSHED
    // filter on the shredded field — row-group statistics apply to a
    // variant path exactly as to any typed column
    assert(plan.contains("GreaterThanOrEqual(props."),
      s"range predicate not pushed to the parquet reader:\n$plan")
    val expect = tables.events
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").between(10, 200) && col("event_type") =!= "error")
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.nonEmpty && rows === expect)
  }

  test("st6: typed sessionizer feed off the shredded scan — parse-free plan, turn-for-turn equal to the Jackson path") {
    import graft.operators.TraceQueries
    import graft.streaming.TraceSessionizer
    val t = tables
    // plan shape: the typed projection the registry row feeds the state
    // machine must be pure struct reads out of the parquet scan — every
    // payload field the sessionizer touches, with no variant_get and no
    // JSON machinery surviving in the executed plan
    val (plan, typedTurns) = VariantEvents.withVariantTable(spark, TraceQueries.variantIngest(t)) { stored =>
      val typed = TraceQueries.typedTraceEvents(stored)(spark)
      typed.collect()
      (typed.queryExecution.executedPlan.toString,
        TraceQueries.flattenTurns(TraceSessionizer.aggregateTyped(typed)(spark)).collect())
    }
    assert(!plan.contains("parse_json"), s"query plan re-parses JSON:\n$plan")
    assert(!plan.contains("get_json_object"), s"query plan string-parses JSON:\n$plan")
    assert(!plan.contains("variant_get"), s"variant_get not pushed into the scan:\n$plan")
    assert(plan.contains("data:struct<"), s"scan schema not shredded:\n$plan")
    // path equality: one transition function (stepFields), two front-ends —
    // the typed rendering must reproduce the Jackson path's nested output
    // field for field on the same synthesized feed
    val stringTurns = TraceQueries.flattenTurns(
      TraceSessionizer.aggregate(TraceQueries.rawTraceEvents(t))(spark)).collect()
    assert(typedTurns.nonEmpty)
    assert(typedTurns.map(_.toSeq).toSet === stringTurns.map(_.toSeq).toSet)
  }
}
