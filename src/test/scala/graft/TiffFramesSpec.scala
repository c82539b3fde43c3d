package graft

import java.awt.image.BufferedImage

import graft.operators.Multimodal

/** x82: the multi-frame codec must really SAMPLE — count every page from
  * the directory, decode only the even ones — and dead-letter garbage.
  */
class TiffFramesSpec extends SparkSpec {

  private def tiffOf(frames: Seq[Int => Int], w: Int = 4, h: Int = 3): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val bos    = new java.io.ByteArrayOutputStream()
    val ios    = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { px =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, px(y * w + x))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("odd frames are counted but never decoded into the stats") {
    // frame 0 all zeros, frame 1 all 255: a decoder that reads every frame
    // reports mean 127.5; the sampler must report 0 yet count 2 frames
    val bytes = tiffOf(Seq(_ => 0, _ => 255))
    val s = Multimodal.TiffFrameDecode.stats(bytes, 0L)
    assert(s.frameCount === 2)
    assert(s.meanIntensity === 0.0)
    assert(s.feature(0) === 1.0f) // every sampled pixel in bucket 0
    assert(s.width === 4 && s.height === 3)
  }

  test("three frames: frames 0 and 2 decoded, frame 1 skipped") {
    val bytes = tiffOf(Seq(_ => 16, _ => 255, _ => 48))
    val s = Multimodal.TiffFrameDecode.stats(bytes, 0L)
    assert(s.frameCount === 3)
    assert(s.meanIntensity === 32.0) // (16 + 48) / 2, no 255 anywhere
    assert(s.feature(1) === 0.5f && s.feature(3) === 0.5f && s.feature(15) === 0.0f)
  }

  test("garbage bytes dead-letter instead of throwing") {
    val s = Multimodal.TiffFrameDecode.stats("not a tiff".getBytes, 0L)
    assert(s.frameCount === 0 && s.width === -1 && s.height === -1)
  }

  test("the generated container matches its closed pixel rule frame by frame") {
    val d     = 11L // 4 frames, 5x3 — garbage residue avoided (11 % 7 != 3)
    val bytes = Multimodal.tiffBytes(d)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    assert(reader.getNumImages(true) === (2 + d % 4).toInt)
    for (f <- 0 until (2 + d % 4).toInt) {
      val img = reader.read(f)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        assert(img.getRaster.getSample(x, y, 0) === ((d * 31 + f * 17 + x * 7 + y * 13) % 256).toInt)
    }
    reader.dispose()
  }
}
