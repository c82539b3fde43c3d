package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All tables are plain Parquet under `\$dir/<name>.parquet`. At 100 TB these
  * would be date-partitioned directories; the loader API is the single seam
  * where that changes (`spark.read.parquet(dir)` over a partitioned layout
  * picks up partition pruning automatically — nothing downstream changes).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) (which Spark 4 refuses to read as a
    * timestamp — only as nanos-since-epoch long under the legacy conf) and,
    * since the 2026-08-13 regeneration, plain TIMESTAMP(MICROS) with no UTC
    * adjustment (arrives as TIMESTAMP_NTZ). Branch on the parquet-resolved
    * type rather than assuming either: LongType → legacy nanos shim
    * (integer `div`, never double division — nanos exceed 2^53);
    * TIMESTAMP_NTZ → reinterpret the wall-clock as session-UTC
    * TimestampType (the session timezone is pinned to UTC everywhere);
    * TimestampType → already what consumers expect. Sub-microsecond
    * ordering under the nanos shim is recovered by the event_id tiebreaker
    * every consumer already uses.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t("events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported parquet type $other")
    }
  }

  /** The events table with `props` parsed ONCE into a VARIANT column — the
    * ingest-typed rendering of [[events]] (same type-branching reader
    * underneath). Downstream field access is `variant_get` on the binary
    * encoding instead of `get_json_object` re-parsing the string per
    * access; written through `VariantEvents.withVariantTable`, extraction
    * moves into the scan (shredded columns). c16 proves the type on a
    * derived frame; this is the seam the trace/window paths adopt it
    * through (w10_variant_turns).
    */
  def eventsVariant: DataFrame = {
    import org.apache.spark.sql.functions.{col, parse_json}
    events.withColumn("props", parse_json(col("props")))
  }
}

/** One verifiable query: a Spark plan plus (optionally) the equivalent ANSI
  * SQL the driver runs in DuckDB over the same parquet tables. Column names
  * must match exactly between the two (the driver sorts columns by name and
  * hash-compares values). Queries without an oracle get a rows-only check.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Correctness INSTRUMENT, not a production path: md5-bridge renderings
      * exist so DuckDB can oracle-check hash-family logic it cannot express
      * natively (xxhash64/HLL/sign-LSH). They deliberately trade speed for
      * cross-engine determinism (string md5 shingles vs fingerprint longs),
      * so Bench reports their time under `total_instruments`, separate from
      * the `total_production` headline a user's workload would see.
      */
    instrument: Boolean = false,
    /** Defining module (operator object name), stamped at registration by
      * SparkEntry so the generated registry inventory (COVERAGE_REGISTRY.md,
      * `tools.CoverageGen`) can name the code location without reflection.
      */
    module: String = "",
) {
  def inModule(m: String): Q = copy(module = m)
}

object Q {
  def apply(name: String, sql: String)(f: Tables => DataFrame): Q =
    Q(name, (s, d) => f(Tables(s, d)), Some(sql))
  def noOracle(name: String)(f: Tables => DataFrame): Q =
    Q(name, (s, d) => f(Tables(s, d)), None)

  /** Correctness-instrument constructor: marks the query at its DEFINITION
    * site (not via a name list in SparkEntry), so a rename cannot silently
    * drop a query out of the bench's instrument/production split. See the
    * `Q.instrument` field doc for what qualifies as an instrument.
    */
  def instrument(name: String, sql: String)(f: Tables => DataFrame): Q =
    Q(name, (s, d) => f(Tables(s, d)), Some(sql), instrument = true)
}
