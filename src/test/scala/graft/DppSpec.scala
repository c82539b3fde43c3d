package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.ScaleJoins

/** m17: dynamic partition pruning over a real date-partitioned layout.
  * The in-row require already fails the query if the DPP subquery is
  * absent; here we additionally pin (a) result equality against the same
  * aggregation computed WITHOUT the partitioned detour, and (b) that the
  * executed scan actually read fewer files than the layout holds (the
  * point of DPP — the plan string alone could lie about runtime effect).
  */
class DppSpec extends SparkSpec {

  private def tables = Tables(spark, sf0001)

  test("m17 equals the unpartitioned aggregation (partitioning is invisible)") {
    val res = ScaleJoins.m17_dpp_prune.run(spark, sf0001)

    val yr = tables.orders.select(
      year(col("o_orderdate")).cast("int").as("o_year"),
      col("o_orderpriority").as("priority"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("price"),
      col("o_totalprice"))
    val pmax = tables.orders.agg(max("o_totalprice")).head().getDouble(0)
    val top = yr.filter(col("o_totalprice") === lit(pmax)).select("o_year").distinct()
    val expected = yr.join(top, Seq("o_year"))
      .groupBy("o_year", "priority")
      .agg(count(lit(1)).as("n_orders"), sum("price").cast("double").as("revenue"))

    assert(res.count() === expected.count())
    assert(res.exceptAll(expected).isEmpty && expected.exceptAll(res).isEmpty)
  }

  test("the pruned scan reads only the surviving year's files") {
    // rebuild the same layout the operator uses, but keep it alive so the
    // executed plan's file-read metric is inspectable
    val tmp = java.nio.file.Files.createTempDirectory("graft-dpp-spec")
    try {
      val dir = tmp.toString + "/orders_by_year"
      tables.orders.withColumn("o_year", year(col("o_orderdate")))
        .write.partitionBy("o_year").mode("overwrite").parquet(dir)
      val fact = spark.read.parquet(dir)
      val pmax = tables.orders.agg(max("o_totalprice")).head().getDouble(0)
      val top = tables.orders
        .filter(col("o_totalprice") === lit(pmax))
        .select(year(col("o_orderdate")).as("o_year")).distinct()
      val joined = fact.join(broadcast(top), Seq("o_year"))
        .agg(count(lit(1)).as("n"))
      val pre = joined.queryExecution.executedPlan.toString
      assert(pre.contains("dynamicpruningexpression(") &&
        !pre.contains("dynamicpruningexpression(true)"), s"DPP absent:\n$pre")
      joined.collect()
      // after execution, the scan node's numFiles metric covers only the
      // matching o_year= partition — strictly fewer than the full layout
      // AQE wraps executed subtrees in QueryStageExec LEAVES — a plain
      // collect() never reaches the FileScan inside a finished stage
      def flatten(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        p +: (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            flatten(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            flatten(q.plan)
          case other => other.children.flatMap(flatten)
        })
      val scans = flatten(joined.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metadata.get("Location").forall(_.contains("orders_by_year")) => f
      }
      val allYears = fact.select("o_year").distinct().count()
      assert(allYears > 1, "layout degenerate: only one year partition")
      val total = spark.read.parquet(dir).inputFiles.length.toLong
      val partitionedScan = scans.find(_.metrics.contains("numFiles"))
      assert(partitionedScan.nonEmpty,
        s"no file scan found in:\n${joined.queryExecution.executedPlan}")
      partitionedScan.foreach { s =>
        val read = s.metrics("numFiles").value
        assert(read < total, s"DPP read $read of $total files — no skip")
      }
    } finally graft.sources.AtomicFs.deleteRecursively(tmp)
  }
}
