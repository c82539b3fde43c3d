package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch profiler for the x87/x88 hotspot attribution (r13). */
object LmProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Graft.session()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.Tables(spark, sfDir)

    def time(name: String)(f: => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-40s min=${times.min}%.3f all=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    import graft.operators.{Curation, TrainPrep}

    val toks = split(col("text"), " ")
    val bgs = when(
      size(toks) >= 2,
      transform(
        sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

    time("explode_only") {
      t.documents.select(col("doc_id"), explode(bgs).as("bg"))
    }
    time("explode_zipwith_attr") {
      val w = col("__w")
      val bgs2 = when(
        size(w) >= 2,
        zip_with(
          slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array().cast("array<string>"))
      t.documents.select(col("doc_id"), split(col("text"), " ").as("__w"))
        .select(col("doc_id"), explode(bgs2).as("bg"))
    }
    time("explode_md5bucket") {
      t.documents.select(col("doc_id"), explode(bgs).as("bg"))
        .withColumn("b", Curation.hashBucket(col("bg"), "dsir|", 64))
    }
    time("ref_agg_only") {
      t.documents.filter(col("lang") === "en")
        .select(explode(bgs).as("bg")).groupBy("bg").count()
    }
    time("x87_full") { TrainPrep.x87_lm_quality.run(spark, sfDir) }
    time("x88_full") { TrainPrep.x88_dsir_select.run(spark, sfDir) }

    // ---- shingle-form A/B: inline split in the lambda vs attribute ----
    val k = 5
    time("shingle5_inline") {
      val toks = split(col("text"), " ")
      val sh = when(
        size(toks) >= k,
        array_distinct(
          transform(
            sequence(lit(1), size(toks) - (k - 1)),
            i => array_join(slice(toks, i, lit(k)), " "))))
        .otherwise(array().cast("array<string>"))
      t.documents.select(col("doc_id"), explode(sh).as("sh"))
    }
    time("shingle5_attr") {
      val w = col("__w")
      val sh = when(
        size(w) >= k,
        array_distinct(
          transform(
            sequence(lit(1), size(w) - (k - 1)),
            i => array_join(slice(w, i, lit(k)), " "))))
        .otherwise(array().cast("array<string>"))
      t.documents.select(col("doc_id"), split(col("text"), " ").as("__w"))
        .select(col("doc_id"), explode(sh).as("sh"))
    }
    time("posgrams_inline") {
      val toks = split(col("text"), " ")
      val grams = transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => struct(i.as("pos"), array_join(slice(toks, i, lit(k)), " ").as("g")))
      t.documents.where(size(toks) >= k)
        .select(col("doc_id"), explode(grams).as("s"))
        .select(col("doc_id"), col("s.pos").as("pos"), xxhash64(col("s.g")).as("g"))
    }
    time("posgrams_attr") {
      val w = col("__w")
      val grams = transform(
        sequence(lit(1), size(w) - (k - 1)),
        i => struct(i.as("pos"), array_join(slice(w, i, lit(k)), " ").as("g")))
      t.documents.select(col("doc_id"), split(col("text"), " ").as("__w"))
        .where(size(w) >= k)
        .select(col("doc_id"), explode(grams).as("s"))
        .select(col("doc_id"), col("s.pos").as("pos"), xxhash64(col("s.g")).as("g"))
    }
    spark.stop()
  }
}
