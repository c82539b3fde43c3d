package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: one place that builds a correctly-configured
  * session (UTC, AQE, 32-way local shuffle, nanos-timestamp events
  * readable, LAST_WIN map merges, custom SQL functions registered via
  * [[GraftExtensions]] — the same builders `spark.sql.extensions=
  * graft.GraftExtensions` injects cluster-wide) and registers the
  * test tables as SQL views so `spark.sql` round-trips the same queries
  * the oracle runs (SURVEY §7.1).
  */
object Graft {

  def session(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.registerAll(spark) // cosine_sim, int8_dot, simhash_agg, mg_freq
    spark
  }

  /** Register every test table as a temp view (events with its timestamp
    * already normalized), so `spark.sql("SELECT ... FROM lineitem")` works
    * against the same names the DuckDB oracle uses.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    val t = Tables(spark, dir)
    Seq(
      "region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
      "lineitem" -> t.lineitem, "events" -> t.events,
      "documents" -> t.documents, "embeddings" -> t.embeddings,
    ).foreach { case (name, df) => df.createOrReplaceTempView(name) }
  }
}
