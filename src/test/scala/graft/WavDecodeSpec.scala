package graft

import java.io.ByteArrayOutputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaRow, WavDecode}

/** The multimodal seam with a REAL audio codec: actual WAV bytes decoded by
  * javax.sound.sampled through the same extractFeatures mapPartitions batch
  * as the image path — frame count, exact mean amplitude, sample rate,
  * channel count, and histogram checked against the known samples; the
  * hand-rolled [[Multimodal.wavBytes]] container cross-validated against
  * the JDK's own WAV encoder; 8-bit unsigned and stereo layouts decoded;
  * undecodable bytes classified as dead-letter rows.
  */
class WavDecodeSpec extends SparkSpec {

  import spark.implicits._

  /** Encode int16 samples as a WAV via the JDK's own writer (the
    * independent container implementation wavBytes is checked against).
    */
  private def jdkWav(samples: Array[Short], rate: Float, channels: Int): Array[Byte] = {
    val fmt  = new AudioFormat(rate, 16, channels, true, false)
    val data = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length / channels)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def wav8bit(samples: Array[Int], rate: Float): Array[Byte] = {
    val fmt  = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, rate, 8, 1, 1, rate, false)
    val data = samples.map(_.toByte) // already 0..255
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("hand-rolled wavBytes round-trips through the JDK decoder to the generation rule") {
    val d   = 42L
    val n   = (50 + d % 101).toInt
    val st  = WavDecode.stats(Multimodal.wavBytes(d), 0L)
    assert(st.frameCount == n)
    assert(st.width == 8000 && st.height == 1)
    val samples = (0 until n).map(i => ((d * 17 + i * 29) % 2048 - 1024).toInt)
    assert(st.meanIntensity == samples.sum.toDouble / n)
    // samples span [-1024, 1023] -> only full-range buckets 7 and 8 occupied
    val nPos = samples.count(_ >= 0)
    assert(st.feature(8) == nPos.toFloat / n)
    assert(st.feature(7) == (n - nPos).toFloat / n)
    assert(st.feature.sum == 1.0f)
  }

  test("wavBytes matches the JDK's own WAV encoder byte-for-byte on the data chunk") {
    val d    = 7L
    val n    = (50 + d % 101).toInt
    val ours = Multimodal.wavBytes(d)
    val samples = (0 until n).map(i => ((d * 17 + i * 29) % 2048 - 1024).toShort).toArray
    val jdk = jdkWav(samples, 8000f, 1)
    // both decode identically (headers may differ in chunk details)
    val a = WavDecode.stats(ours, 0L)
    val b = WavDecode.stats(jdk, 0L)
    assert(a.meanIntensity == b.meanIntensity && a.frameCount == b.frameCount)
    assert(a.feature.toSeq == b.feature.toSeq)
    // and our canonical 44-byte layout carries the identical sample bytes
    assert(ours.length == 44 + 2 * n)
    assert(ours.takeRight(2 * n).toSeq == jdk.takeRight(2 * n).toSeq)
  }

  test("stereo 16-bit: stats run over all channels' samples, frameCount is per-channel frames") {
    // L channel constant +1000, R channel constant -1000, 10 frames
    val samples = Array.tabulate[Short](20)(i => if (i % 2 == 0) 1000 else -1000)
    val st = WavDecode.stats(jdkWav(samples, 44100f, 2), 0L)
    assert(st.height == 2 && st.width == 44100)
    assert(st.frameCount == 10)
    assert(st.meanIntensity == 0.0)
    assert(st.feature((1000 + 32768) / 4096) == 0.5f)
    assert(st.feature((-1000 + 32768) / 4096) == 0.5f)
  }

  test("8-bit unsigned WAV: samples centered to signed and scaled onto the 16-bit histogram") {
    // 0 -> -32768 (bucket 0), 128 -> 0 (bucket 8), 255 -> +32512 (bucket 15)
    val st = WavDecode.stats(wav8bit(Array(0, 128, 255), 8000f), 0L)
    assert(st.frameCount == 3 && st.height == 1)
    assert(st.meanIntensity == ((-128 * 256) + 0 + (127 * 256)).toDouble / 3)
    assert(st.feature(0) == 1f / 3 && st.feature(8) == 1f / 3 && st.feature(15) == 1f / 3)
  }

  test("samplesOf: decoded stream equals the closed sample rule; garbage is null") {
    WavDecode.init()
    (0L until 50L).foreach { d =>
      val n   = (50 + d % 101).toInt
      val ref = Array.tabulate(n)(i => (((d * 17 + i * 29) % 2048) - 1024).toInt)
      assert(WavDecode.samplesOf(Multimodal.wavBytes(d)).toSeq === ref.toSeq, s"doc $d")
    }
    assert(WavDecode.samplesOf("NOISE1".getBytes("UTF-8")) == null)
    assert(WavDecode.samplesOf(null) == null)
  }

  test("the seam end-to-end: real WAVs + dead letters through extractFeatures") {
    val rows = Seq(
      MediaRow(1L, "audio", "mem://wav", Multimodal.wavBytes(1L), 0, 0, 0L),
      MediaRow(2L, "audio", "mem://garbage", "not audio at all".getBytes("UTF-8"), 0, 0, 0L),
      MediaRow(3L, "audio", "mem://empty", null, 0, 0, 0L),
    ).toDS().repartition(2)
    val f = Multimodal.extractFeatures(rows, WavDecode).collect().map(r => r.media_id -> r).toMap
    assert(f(1L).frame_count == 51 && f(1L).decoded_width == 8000)
    assert(f(2L).frame_count == 0 && f(2L).decoded_width == -1 && f(2L).decoded_height == -1)
    assert(f(3L).frame_count == 0 && f(3L).n_bytes == 0L)
  }
}
