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
  * with factor-sized duplicate clusters). Dim tables copy through; fact
  * foreign keys into them (o_custkey etc.) are left unshifted on purpose —
  * 10x facts over the same dims is the realistic growth shape.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <outDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args
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

    /** Union of `factor` copies with each key column shifted by i*(max+1). */
    def replicate(
        df: DataFrame,
        keys: Seq[String],
        perReplica: (DataFrame, Int) => DataFrame = (d, _) => d,
    ): DataFrame = {
      val spans = keys.map(k => k -> (df.agg(max(col(k))).head.getLong(0) + 1L)).toMap
      (0 until factor).map { i =>
        spans.foldLeft(perReplica(df, i)) { case (d, (k, span)) =>
          d.withColumn(k, col(k) + lit(i * span))
        }
      }.reduce(_ unionByName _)
    }

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
    write(replicate(t("orders"), Seq("o_orderkey")), "orders")
    write(replicate(t("lineitem"), Seq("l_orderkey")), "lineitem")
    Seq("customer", "supplier", "part", "nation", "region").foreach(n => write(t(n), n))
    spark.stop()
  }
}
