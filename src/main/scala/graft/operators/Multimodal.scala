package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder contract): media as opaque `binary`
  * columns plus typed metadata, processed in partition-sized batches.
  *
  * The decode step is STUBBED — no image/audio codecs exist in this
  * container — behind `DecodeStub`, a deterministic fake that derives
  * "pixels"/features from the bytes themselves, so the Spark-side contract
  * (schema, batch shape, partitioning, null handling) is real and tested
  * while the codec is swappable.
  *
  * Scale notes: media rows are wide — partition by size
  * (`maxPartitionBytes` down, or repartition on a size-bucketed key) so a
  * batch of decoded frames fits executor memory; metadata-only queries must
  * never touch the binary column (columnar pruning does this for free as
  * long as decode lives in its own projection).
  */
object Multimodal {

  /** Typed media row: bytes + the metadata a pipeline filters on. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      uri: String,
      bytes: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long,
  )

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      // stubbed decode outputs — deterministic from bytes
      mean_intensity: Double,
      frame_count: Int,
      feature: Array[Float],
  )

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("uri", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
  ))

  /** STUB decoder. Real deployments replace this object with a codec-backed
    * implementation (JNI/javacv); everything downstream is agnostic.
    * Deterministic: outputs are pure functions of the input bytes.
    */
  object DecodeStub {
    def meanIntensity(bytes: Array[Byte]): Double =
      if (bytes == null || bytes.isEmpty) 0.0
      else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length

    /** "Frame sample": pretend each 256-byte block is one frame. */
    def frameCount(bytes: Array[Byte], durationMs: Long): Int =
      if (bytes == null) 0 else math.max(1, bytes.length / 256)

    /** Fixed-width "embedding" from byte histogram (16 buckets). */
    def feature(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](16)
      if (bytes != null) {
        bytes.foreach(b => hist((b & 0xff) / 16) += 1f)
        val n = math.max(1, bytes.length)
        var i = 0
        while (i < 16) { hist(i) /= n; i += 1 }
      }
      hist
    }
  }

  /** Decode + feature-extract over partition-sized batches. mapPartitions
    * (the Scala analog of mapInPandas): one iterator per partition so a
    * codec could amortize per-batch init; rows stream through without
    * materializing the partition.
    */
  def extractFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (amortized, like a pandas UDF batch)
      rows.map { r =>
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          n_bytes = if (r.bytes == null) 0L else r.bytes.length.toLong,
          mean_intensity = DecodeStub.meanIntensity(r.bytes),
          frame_count = DecodeStub.frameCount(r.bytes, r.duration_ms),
          feature = DecodeStub.feature(r.bytes))
      }
    }
  }

  /** Metadata-only projection — must prune the binary column at the scan
    * (assert via explain: ReadSchema excludes `bytes`).
    */
  def metadataOnly(media: DataFrame): DataFrame =
    media.select("media_id", "kind", "width", "height", "duration_ms")

  /** Size-bucketed repartitioning so decode batches are byte-balanced, not
    * row-balanced — large videos don't pile into one task.
    */
  def repartitionBySize(media: DataFrame, targetPartitions: Int): DataFrame =
    media
      .withColumn("__size_bucket", pmod(xxhash64(col("media_id")), lit(targetPartitions)))
      .repartition(targetPartitions, col("__size_bucket"))
      .drop("__size_bucket")
}
