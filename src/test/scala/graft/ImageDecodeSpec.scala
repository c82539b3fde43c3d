package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.operators.Multimodal
import graft.operators.Multimodal.{ImageIoDecode, MediaRow}

/** The multimodal seam with a REAL codec: actual PNG and BMP bytes decoded
  * by javax.imageio through the same extractFeatures mapPartitions batch as
  * the stub path — dims, mean luma, and histogram checked against the known
  * pixels, undecodable bytes classified as dead-letter rows, and the
  * per-partition `init()` exercised across multiple partitions.
  */
class ImageDecodeSpec extends SparkSpec {

  import spark.implicits._

  /** A w x h image filled with one RGB gray level `g` (luma == g). */
  private def flat(w: Int, h: Int, g: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"JDK cannot encode $format")
    out.toByteArray
  }

  /** Top half black (luma 0), bottom half white (luma 255). */
  private def split(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (y < h / 2) 0x000000 else 0xffffff)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"JDK cannot encode $format")
    out.toByteArray
  }

  test("real PNG/BMP bytes decode to correct dims, mean luma, and histogram") {
    val rows = Seq(
      MediaRow(1L, "image", "mem://png-gray", flat(24, 16, 100, "png"), 24, 16, 0L),
      MediaRow(2L, "image", "mem://bmp-gray", flat(8, 8, 250, "bmp"), 8, 8, 0L),
      MediaRow(3L, "image", "mem://png-split", split(10, 10, "png"), 10, 10, 0L),
      MediaRow(4L, "image", "mem://garbage", Array[Byte](1, 2, 3, 4, 5), 99, 99, 0L),
      MediaRow(5L, "image", "mem://empty", null, 0, 0, 0L),
    ).toDS().repartition(3) // several partitions -> several init() calls
    val f = Multimodal.extractFeatures(rows, ImageIoDecode)
      .collect().map(r => r.media_id -> r).toMap

    // flat gray 100: every pixel luma == 100 -> mean 100, all mass in bucket 6
    assert(f(1L).decoded_width == 24 && f(1L).decoded_height == 16)
    assert(f(1L).mean_intensity == 100.0)
    assert(f(1L).frame_count == 1)
    assert(f(1L).feature(100 / 16) == 1.0f && f(1L).feature.sum == 1.0f)

    // BMP path: a second real format through the identical seam
    assert(f(2L).decoded_width == 8 && f(2L).decoded_height == 8)
    assert(f(2L).mean_intensity == 250.0)
    assert(f(2L).feature(250 / 16) == 1.0f)

    // half black / half white: mean (0+255)/2, mass split between buckets 0 and 15
    assert(f(3L).decoded_width == 10 && f(3L).decoded_height == 10)
    assert(f(3L).mean_intensity == 127.5)
    assert(f(3L).feature(0) == 0.5f && f(3L).feature(15) == 0.5f)

    // undecodable and empty bytes: dead-letter rows, never exceptions
    for (id <- Seq(4L, 5L)) {
      assert(f(id).frame_count == 0, s"row $id not classified dead-letter")
      assert(f(id).decoded_width == -1 && f(id).decoded_height == -1)
      assert(f(id).mean_intensity == 0.0)
    }
    // metadata vs decode cross-check: the corrupt row's claimed 99x99
    // disagrees with the decoder — the downstream quality filter's signal
    assert(f(4L).decoded_width != 99)
  }

  test("stub and real codec run through the byte-identical pipeline shape") {
    val rows = Seq(MediaRow(1L, "image", "mem://a", flat(4, 4, 32, "png"), 4, 4, 0L)).toDS()
    val stub = Multimodal.extractFeatures(rows).collect()(0)
    val real = Multimodal.extractFeatures(rows, ImageIoDecode).collect()(0)
    // same schema/row contract; stub has no pixel notion (dims -1), real does
    assert(stub.n_bytes == real.n_bytes && stub.media_id == real.media_id)
    assert(stub.decoded_width == -1 && real.decoded_width == 4)
    assert(stub.feature.length == 16 && real.feature.length == 16)
  }
}
