package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.VariantEvents

/** A/B measurement behind c16's scale claim: the SAME heterogeneous event
  * payloads stored as a JSON string column (every access re-parses the
  * text via get_json_object) vs as a shredded VARIANT column (parse once
  * at ingest, variant_get per access, pushed into the scan). Both sides
  * are written to parquet once (untimed), then the identical 6-extraction
  * rollup runs repeatedly over each; the printed value is the median of 5.
  *
  * Usage: runMain graft.tools.VariantScale
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
  */
object VariantScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val events = Tables(spark, sfDir).events
    val copies = sys.env.getOrElse("SPARK_GRAFT_VARIANT_COPIES", "10").toInt
    // widen the event stream so extraction cost dominates scan startup
    val wide = (1 to copies).map(i =>
      events.withColumn("event_id",
        org.apache.spark.sql.functions.col("event_id") + i * 10000000L))
      .reduce(_ unionByName _)

    val tmp = java.nio.file.Files.createTempDirectory("graft-variantscale")
    try {
      val strDir = tmp.toString + "/str"
      VariantEvents.ingestString(wide).write.mode("overwrite").parquet(strDir)
      def medianOf5(mk: () => DataFrame): Double = {
        val walls = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          mk().collect()
          (System.nanoTime() - t0) / 1e9
        }
        walls.sorted.apply(2)
      }
      val strWall = medianOf5(() =>
        VariantEvents.toolRollupString(spark.read.parquet(strDir)))
      println(f"string re-parse rollup   $strWall%8.3f s (median of 5)")
      VariantEvents.withVariantTable(spark, VariantEvents.ingest(wide)) { stored =>
        val varWall = medianOf5(() => VariantEvents.toolRollup(stored))
        println(f"variant_get rollup       $varWall%8.3f s (median of 5)")
        println(f"speedup                  ${strWall / varWall}%8.2f x")
      }

      // j8-shaped A/B: the pre/post range join whose purchase side carries
      // $.k — the trace family's highest-traffic shape. Copies get disjoint
      // user_id ranges so widening scales the join's INPUT, not its
      // pair space.
      import org.apache.spark.sql.functions._
      val wideJoin = (1 to copies).map(i =>
        events
          .withColumn("event_id", col("event_id") + i * 10000000L)
          .withColumn("user_id", col("user_id") + i * 10000000L))
        .reduce(_ unionByName _)
        .select("user_id", "event_id", "event_type", "ts", "props")
      def prePost(e: DataFrame): DataFrame = {
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"), col("ms").as("vms"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ms").as("pms"), col("k"))
        views.join(purchases, Seq("user_id"))
          .filter(col("pms") > col("vms") && col("pms") <= col("vms") + 3600000L)
          .groupBy("user_id", "view_id")
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      }
      val strJoinDir = tmp.toString + "/strjoin"
      wideJoin.write.mode("overwrite").parquet(strJoinDir)
      val strJoinWall = medianOf5(() => prePost(
        spark.read.parquet(strJoinDir).select(
          col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("ms"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))))
      println(f"string re-parse prepost  $strJoinWall%8.3f s (median of 5)")
      VariantEvents.withVariantTable(spark,
        wideJoin.withColumn("props", parse_json(col("props")))) { stored =>
        val varJoinWall = medianOf5(() => prePost(
          stored.select(
            col("user_id"), col("event_id"), col("event_type"),
            unix_millis(col("ts")).as("ms"),
            variant_get(col("props"), "$.k", "long").as("k"))))
        println(f"variant_get prepost      $varJoinWall%8.3f s (median of 5)")
        println(f"prepost speedup          ${strJoinWall / varJoinWall}%8.2f x")
      }

      // st6-shaped A/B: the sessionizer feed itself. Both sides run the
      // SAME transition function (stepFields); what differs is where the
      // payload fields come from — per-event Jackson parse of the stored
      // JSON string (+ per-event timestamp parse) vs typed columns read
      // off the shredded scan with zero parses. Copies get disjoint
      // session ids so widening scales the session count, not turn width.
      import spark.implicits._
      val t = Tables(spark, sfDir)
      val strTraceDir = tmp.toString + "/strtrace"
      (1 to copies).map(i =>
        graft.operators.TraceQueries.rawTraceEvents(t).toDF()
          .withColumn("sessionId", concat(col("sessionId"), lit(s"-$i"))))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(strTraceDir)
      val strTraceWall = medianOf5(() =>
        graft.streaming.TraceSessionizer.aggregate(
          spark.read.parquet(strTraceDir).as[graft.model.RawEvent])(spark).toDF())
      println(f"string re-parse sessionize $strTraceWall%6.3f s (median of 5)")
      val varTraceWide = (1 to copies).map(i =>
        graft.operators.TraceQueries.variantIngest(t)
          .withColumn("sessionId", concat(col("sessionId"), lit(s"-$i"))))
        .reduce(_ unionByName _)
      VariantEvents.withVariantTable(spark, varTraceWide) { stored =>
        val varTraceWall = medianOf5(() =>
          graft.streaming.TraceSessionizer.aggregateTyped(
            graft.operators.TraceQueries.typedTraceEvents(stored)(spark))(spark).toDF())
        println(f"typed-scan sessionize    $varTraceWall%8.3f s (median of 5)")
        println(f"sessionize speedup       ${strTraceWall / varTraceWall}%8.2f x")
      }
    } finally graft.sources.AtomicFs.deleteRecursively(tmp)
    spark.stop()
  }
}
