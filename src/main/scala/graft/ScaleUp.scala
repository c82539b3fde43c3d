package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a `factor`x copy of a driver test-data directory for scale
  * stress runs (SCALE.md "self-scale evidence"): the driver tables cap at
  * sf0.1, so scaling evidence beyond that is self-made.
  *
  * Big tables are replicated with shifted ids, kept CONTIGUOUS (replica i
  * of key k becomes k + i * (max+1)) so structures derived from key
  * arithmetic — the heap tree the graph queries walk, the group-of-7
  * component chains — grow into one organically larger instance instead of
  * `factor` disconnected copies. Document text is token-prefixed per
  * replica so the dedup corpus grows organically too (replicas are NOT
  * near-duplicates of each other: every 5-shingle differs, so x2/x3/x4
  * candidate structure scales like real data rather than like a corpus
  * with factor-sized duplicate clusters).
  *
  * Two dimension doctrines (the r10 verdict's "dimension-growth" gap):
  * DEFAULT mode copies dim tables through and leaves fact foreign keys
  * unshifted — `factor`x facts over the same dims, the growth shape of a
  * fixed product catalog accumulating history. `--grow-dims` replicates
  * customer/part/supplier WITH the facts and shifts the fact foreign keys
  * by the DIM table's span (not the fact's own max — customers without
  * orders would desynchronize the shift), so every replica's facts
  * reference that replica's dims: the growth shape where the entity
  * population scales with the corpus. Only grow-dims exercises the
  * AQE broadcast→sort-merge transition on the dim joins, which is why the
  * fixed-dims decade tables could never land it. nation/region stay
  * fixed in both modes (25/5 rows at every TPC-H SF).
  *
  * Usage: runMain graft.ScaleUp <srcDir> <outDir> <factor> [--grow-dims]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val (srcDir, outDir, factorS) = (args(0), args(1), args(2))
    val growDims = args.contains("--grow-dims")
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      // events.parquet is TIMESTAMP(NANOS); read it as nanos-since-epoch
      // longs and write the same longs back (Tables.events handles both).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$srcDir/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    /** Union of `factor` copies with each key column shifted by i*span. */
    def replicateWith(
        df: DataFrame,
        keySpans: Seq[(String, Long)],
        perReplica: (DataFrame, Int) => DataFrame = (d, _) => d,
    ): DataFrame =
      (0 until factor).map { i =>
        keySpans.foldLeft(perReplica(df, i)) { case (d, (k, span)) =>
          d.withColumn(k, col(k) + lit(i * span))
        }
      }.reduce(_ unionByName _)

    def span(df: DataFrame, k: String): Long = df.agg(max(col(k))).head.getLong(0) + 1L

    /** Default-mode replicate: spans derived from the table's own keys. */
    def replicate(
        df: DataFrame,
        keys: Seq[String],
        perReplica: (DataFrame, Int) => DataFrame = (d, _) => d,
    ): DataFrame = replicateWith(df, keys.map(k => k -> span(df, k)), perReplica)

    // every token prefixed per replica: texts share no 5-shingle across
    // replicas, token/char counts grow ~proportionally
    def perturbText(d: DataFrame, i: Int): DataFrame =
      if (i == 0) d
      else d.withColumn(
        "text",
        array_join(transform(split(col("text"), " "), tk => concat(lit(s"r$i"), tk)), " "))

    write(replicate(t("documents"), Seq("doc_id"), perturbText), "documents")
    write(replicate(t("embeddings"), Seq("vec_id")), "embeddings")
    write(replicate(t("events"), Seq("event_id", "user_id")), "events")
    if (growDims) {
      // Spans come from the DIM side so fact FKs land on real replica keys
      // even when some dim rows have no facts; the order span comes from
      // orders (every TPC-H order has lineitems, so lineitem agrees).
      val custSpan  = span(t("customer"), "c_custkey")
      val suppSpan  = span(t("supplier"), "s_suppkey")
      val partSpan  = span(t("part"), "p_partkey")
      val orderSpan = span(t("orders"), "o_orderkey")
      write(replicateWith(t("customer"), Seq("c_custkey" -> custSpan)), "customer")
      write(replicateWith(t("supplier"), Seq("s_suppkey" -> suppSpan)), "supplier")
      write(replicateWith(t("part"), Seq("p_partkey" -> partSpan)), "part")
      write(replicateWith(t("orders"),
        Seq("o_orderkey" -> orderSpan, "o_custkey" -> custSpan)), "orders")
      write(replicateWith(t("lineitem"),
        Seq("l_orderkey" -> orderSpan, "l_partkey" -> partSpan, "l_suppkey" -> suppSpan)),
        "lineitem")
      Seq("nation", "region").foreach(n => write(t(n), n))
    } else {
      write(replicate(t("orders"), Seq("o_orderkey")), "orders")
      write(replicate(t("lineitem"), Seq("l_orderkey")), "lineitem")
      Seq("customer", "supplier", "part", "nation", "region").foreach(n => write(t(n), n))
    }
    spark.stop()
  }
}
