package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler: time variants of one query shape at a given sf dir.
  * Not part of the driver contract; used to attribute bench hotspots.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Graft.session()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.Tables(spark, sfDir)

    def time(name: String)(f: => DataFrame): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-40s ${times.min}%.3f s")
    }

    // ===== x8 fingerprint variants =====
    time("x8_current_substr_fold") {
      val codes = transform(
        sequence(lit(1), length(col("text"))),
        i => ascii(col("text").substr(i, lit(1))).cast("long") * i.cast("long"))
      t.documents.select(col("doc_id"),
        (aggregate(codes, lit(0L), (acc, x) => acc + x) % 1000000007L).as("fp"))
        .orderBy("doc_id")
    }
    time("x8_split_chars") {
      val codes = transform(
        split(col("text"), ""),
        (x, i) => ascii(x).cast("long") * (i.cast("long") + 1L))
      t.documents.select(col("doc_id"),
        (aggregate(codes, lit(0L), (acc, x) => acc + x) % 1000000007L).as("fp"))
        .orderBy("doc_id")
    }

    // ===== x2 jaccard variants =====
    def shingles(k: Int): DataFrame = {
      val w = split(col("text"), " ")
      t.documents.select(col("doc_id"), posexplode(
        transform(sequence(lit(1), greatest(size(w) - (k - 1), lit(0))),
          i => array_join(slice(w, i, lit(k)), " "))).as(Seq("p", "sh")))
        .select("doc_id", "sh").distinct()
    }
    def x2(sh: DataFrame): DataFrame = {
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.as("a")
        .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("c"))
      val jac = col("c").cast("double") / (col("sa.n") + col("sb.n") - col("c"))
      inter
        .join(sz.as("sa"), col("sa.doc_id") === col("doc_a"))
        .join(sz.as("sb"), col("sb.doc_id") === col("doc_b"))
        .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
        .filter(col("jaccard") >= 0.1)
        .orderBy("doc_a", "doc_b")
    }
    time("x2_current_capped_nocache") {
      val sh0  = shingles(5)
      val rare = sh0.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 100).select("sh")
      x2(sh0.join(rare, Seq("sh"), "left_semi"))
    }
    time("x2_capped_checkpoint") {
      val sh0  = shingles(5)
      val rare = sh0.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 100).select("sh")
      x2(sh0.join(rare, Seq("sh"), "left_semi").localCheckpoint())
    }
    time("x2_checkpoint_sh0_then_cap") {
      val sh0  = shingles(5).localCheckpoint()
      val rare = sh0.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 100).select("sh")
      x2(sh0.join(rare, Seq("sh"), "left_semi"))
    }
    spark.stop()
  }
}
