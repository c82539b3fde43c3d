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
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-40s min=${times.min}%.3f all=${times.map(x => f"$x%.2f").mkString(",")}")
    }

    // ===== x73 attribution: generation vs decode vs sort =====
    import graft.operators.Multimodal
    import Multimodal.{MediaRow, WavDecode}
    import spark.implicits._
    implicit val sp: SparkSession = spark
    def media = t.documents.select(col("doc_id"))
      .repartition(col("doc_id")).as[Long].map { d =>
        val bytes =
          if (d % 7 == 3) s"NOISE$d".getBytes("UTF-8") else Multimodal.wavBytes(d)
        MediaRow(d, "audio", s"synth://wav/$d", bytes, 0, 0, 0L)
      }
    time("x73_gen_only") { media.toDF() }
    time("x73_gen_decode") { Multimodal.extractFeatures(media, WavDecode).toDF() }
    time("x73_gen_decode_noorder") {
      Multimodal.extractFeatures(media, WavDecode)
        .select(col("media_id"), col("n_bytes"), col("mean_intensity"))
    }
    time("x73_full") { Multimodal.x73_wav_decode.run(spark, sfDir) }
    spark.stop()
  }
}
