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
    } finally graft.sources.AtomicFs.deleteRecursively(tmp)
    spark.stop()
  }
}
