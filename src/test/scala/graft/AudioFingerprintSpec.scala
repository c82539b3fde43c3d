package graft

import org.apache.spark.sql.functions.col

import graft.operators.Multimodal

/** x89: audio fingerprint near-dup — HK-shaped bits over really-decoded
  * PCM, banded hamming LSH, the audio modality of PerceptualDedupSpec.
  */
class AudioFingerprintSpec extends SparkSpec {

  /** Fingerprint straight off the sample RULE (no codec): the decoded-PCM
    * fingerprint must equal it bit for bit, proving the WAV writer/decoder
    * roundtrip is lossless where the fingerprint reads.
    */
  private def ruleBands(d: Long): Array[Int] =
    Multimodal.audioFingerprintBands(
      Array.tabulate(340)(i => Multimodal.audioFpSample(d, i)))

  private def decodedBands(d: Long): Array[Int] =
    Multimodal.audioFingerprintBands(decodeSamples(Multimodal.audioFpWav(d)))

  /** Local 16-bit LE mono PCM WAV decode via javax.sound (the same
    * library WavDecode wraps), so the roundtrip check does not depend on
    * spark plumbing.
    */
  private def decodeSamples(bytes: Array[Byte]): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val data = ais.readAllBytes()
      Array.tabulate(data.length / 2)(i =>
        ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toInt)
    } finally ais.close()
  }

  private def hamming(a: Array[Int], b: Array[Int]): Int =
    (0 until 4).map(i => Integer.bitCount(a(i) ^ b(i))).sum

  test("decoded-PCM fingerprint equals the closed sample rule for every doc") {
    (0L until 200L).foreach { d =>
      assert(decodedBands(d).toSeq === ruleBands(d).toSeq, s"doc $d")
    }
  }

  test("corpus geometry over the scaled id range: variants near canonical in ONE band, bases far apart") {
    (0L until 2000L by 4L).foreach { b =>
      val canon = ruleBands(b)
      (1 to 3).foreach { v =>
        val fp = ruleBands(b + v)
        val hd = hamming(fp, canon)
        assert(hd <= 8, s"variant ${b + v} is $hd bits from canonical $b")
        // perturbation confined to band v by construction: the other three
        // bands are bit-identical, so the banded equi-join cannot miss
        val shared = (0 until 4).count(i => fp(i) == canon(i))
        assert(shared >= 3, s"variant ${b + v} shares only $shared bands")
        (0 until 4).foreach { band =>
          if (band != v) assert(fp(band) == canon(band),
            s"variant ${b + v} drifted outside its own band: band $band differs")
        }
      }
    }
    // distinct bases stay far apart (precision side)
    val canons = (0L until 400L by 4L).map(ruleBands).toArray
    for (i <- canons.indices; j <- (i + 1) until canons.length)
      assert(hamming(canons(i), canons(j)) > 10, s"bases ${i * 4} / ${j * 4} collide")
  }

  test("volume invariance: uniform gain leaves the fingerprint unchanged (the perceptual property)") {
    (0L until 40L).foreach { d =>
      val s  = Array.tabulate(340)(i => Multimodal.audioFpSample(d, i))
      val g2 = s.map(_ * 2)
      val g5 = s.map(_ * 5)
      assert(Multimodal.audioFingerprintBands(g2).toSeq ===
        Multimodal.audioFingerprintBands(s).toSeq, s"doc $d gain 2x")
      assert(Multimodal.audioFingerprintBands(g5).toSeq ===
        Multimodal.audioFingerprintBands(s).toSeq, s"doc $d gain 5x")
      // while the BYTE hash — what exact dedup uses — changes under gain
      assert(java.util.Arrays.hashCode(g2) != java.util.Arrays.hashCode(s))
    }
  }

  test("x89 end to end: every canonical-variant pair found, none cross-base") {
    val rows = Multimodal.x89_audio_fingerprint.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val (s, d, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(s - s % 4 == d - d % 4, s"cross-base pair ($s, $d) at hamming $h")
      assert(h <= 10)
    }
    // recall by construction: (canonical, variant) always detected
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    (0L until nDocs by 4L).foreach { b =>
      (1 to 3).foreach { v =>
        if (b + v < nDocs)
          assert(pairs.contains((b, b + v)), s"missed pair ($b, ${b + v})")
      }
    }
  }

  // ---- x89b: the parametric WIDE fingerprint (33 frames, 9 bands, 8×32) ----

  private def ruleBandsWide(d: Long): Array[Long] =
    Multimodal.audioFingerprintBandsP(
      Array.tabulate(660)(i => Multimodal.audioFpSample(d, i)),
      frames = 33, bandsPerFrame = 9, bandBits = 32)

  test("narrow kernel is exactly the parametric kernel at (17, 5, 16)") {
    (0L until 100L).foreach { d =>
      val s = Array.tabulate(340)(i => Multimodal.audioFpSample(d, i))
      assert(Multimodal.audioFingerprintBands(s).toSeq ===
        Multimodal.audioFingerprintBandsP(s, 17, 5, 16).map(_.toInt).toSeq, s"doc $d")
    }
  }

  test("wide: decoded-PCM fingerprint equals the closed sample rule; 32-bit values stay unsigned") {
    (0L until 100L).foreach { d =>
      val decoded = Multimodal.audioFingerprintBandsP(
        decodeSamples(Multimodal.audioFpWav(d, 660)), 33, 9, 32)
      assert(decoded.toSeq === ruleBandsWide(d).toSeq, s"doc $d")
      decoded.foreach(v => assert(v >= 0L && v <= 0xffffffffL, s"doc $d band out of range"))
    }
  }

  test("wide: gain invariance and variant confinement to 32-bit band v") {
    (0L until 400L by 4L).foreach { b =>
      val s = Array.tabulate(660)(i => Multimodal.audioFpSample(b, i))
      assert(Multimodal.audioFingerprintBandsP(s.map(_ * 3), 33, 9, 32).toSeq ===
        ruleBandsWide(b).toSeq, s"doc $b gain 3x")
      val canon = ruleBandsWide(b)
      (1 to 3).foreach { v =>
        val fp = ruleBandsWide(b + v)
        val hd = (0 until 8).map(i => java.lang.Long.bitCount(fp(i) ^ canon(i))).sum
        assert(hd <= 16, s"variant ${b + v} is $hd bits from canonical $b")
        (0 until 8).foreach { band =>
          if (band != v) assert(fp(band) == canon(band),
            s"variant ${b + v} drifted outside band $v: band $band differs")
        }
      }
    }
    // precision: distinct bases stay far apart at the wide width too
    val canons = (0L until 400L by 4L).map(ruleBandsWide).toArray
    for (i <- canons.indices; j <- (i + 1) until canons.length)
      assert((0 until 8).map(k => java.lang.Long.bitCount(canons(i)(k) ^ canons(j)(k))).sum > 20,
        s"bases ${i * 4} / ${j * 4} collide")
  }

  // ---- x89c/x101: the persisted-index daily-ingest probe ----

  /** Independent naive wide fingerprint: a from-scratch double-delta walk
    * (per-band sums via filtered ranges, bits via explicit comparisons,
    * packing by hand) sharing only the corpus generator contract
    * (audioFpSample) with the engine.
    */
  private def naiveWideBands(d: Long): IndexedSeq[Long] = {
    val s = Array.tabulate(660)(i => Multimodal.audioFpSample(d, i))
    def energy(f: Int, b: Int): Long =
      (0 until 20).filter(_ % 9 == b).map(j => math.abs(s(f * 20 + j)).toLong).sum
    val bits = for (f <- 1 until 33; b <- 0 until 8) yield {
      val now  = energy(f, b) - energy(f, b + 1)
      val prev = energy(f - 1, b) - energy(f - 1, b + 1)
      if (now - prev > 0) 1L else 0L
    }
    (0 until 8).map(band =>
      (0 until 32).map(p => bits(band * 32 + p) << p).sum)
  }

  test("x89c: persisted-index probe flags equal the naive all-pairs reference; x101 streams to the same end state") {
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val corpusFps = (0L until n).filter(_ % 8 == 0).map(d => d -> naiveWideBands(d)).toMap
    val expect = (0L until n).filter(_ % 4 != 0).map { d =>
      val fp = naiveWideBands(d)
      d -> corpusFps.valuesIterator.exists(c => (0 until 8).exists(i => c(i) == fp(i)))
    }.toMap
    // both verdict paths must actually occur in this corpus
    assert(expect.valuesIterator.contains(true) && expect.valuesIterator.contains(false))
    val probed = Multimodal.x89c_audio_fp_ingest.run(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(probed === expect)
    // indexed-group variants flag true BY CONSTRUCTION (7 shared bands)
    expect.foreach { case (d, f) => if ((d - d % 4) % 8 == 0) assert(f, s"missed variant $d") }
    // the streaming rendering lands on the identical end state
    val streamed = Multimodal.x101_stream_audio_fp.run(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(streamed === probed)
  }

  test("x89c plan: index scan partition-pruned on bucket_shard; only the batch side decodes") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val docs   = spark.read.parquet(s"$sf0001/documents.parquet").select("doc_id", "lang")
    val dir    = java.nio.file.Files.createTempDirectory("audioidx").toString + "/idx"
    val bands  = (df: org.apache.spark.sql.DataFrame) =>
      Multimodal.audioBandTableWide(df)(spark).toDF()
        .select(col("media_id").as("doc_id"), col("band"), col("value").as("bucket"))
    graft.operators.Dedup.writeBandIndex(bands(docs.filter("doc_id % 8 = 0")), dir)
    // a SMALL daily batch: its bucket set hashes into few of the 64 shards
    val batch  = docs.filter("doc_id % 4 <> 0").orderBy("doc_id").limit(6)
    val probed = graft.operators.Dedup.probePersistedIndex(batch, bands(batch), spark, dir)
    probed.collect() // action first, so scan metrics are populated
    def leaves(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => leaves(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec        => leaves(q.plan)
        case r: org.apache.spark.sql.execution.ReusedSubqueryExec             => leaves(r.child)
        case other => other.collectLeaves().flatMap {
          case w @ (_: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec |
                    _: org.apache.spark.sql.execution.adaptive.QueryStageExec) => leaves(w)
          case l => Seq(l)
        }
      }
    val scan = leaves(probed.queryExecution.executedPlan).collectFirst {
      case s: FileSourceScanExec if s.metadata.get("Location").exists(_.contains("audioidx")) => s
    }.getOrElse(fail("no file scan over the audio band index in the probe plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "bucket_shard")),
      s"no bucket_shard partition filter: ${scan.partitionFilters}")
    val written = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("bucket_shard="))
    val read = scan.metrics("numFiles").value
    assert(read > 0 && read < written,
      s"expected a pruned scan: read $read files of $written shard dirs")
    // batch-only decode: the batch band table's decode pipeline is present
    // (mapPartitions -> SerializeFromObject), and the corpus side enters
    // ONLY as the index parquet scan — a corpus re-decode would surface as
    // a documents scan under the corpus filter (doc_id % 8 = 0) feeding a
    // second decode, so the plan must not contain that predicate anywhere
    // (the plan string includes AQE's initial plan too; both must be clean)
    val planStr = probed.queryExecution.executedPlan.toString()
    assert(planStr.contains("SerializeFromObject"), "batch decode pipeline missing")
    assert(!planStr.contains("% 8"),
      s"corpus-side filter in the probe plan — the corpus was re-decoded:\n$planStr")
  }

  test("x89b end to end: same pair set as the narrow rendering on this corpus") {
    val wide   = Multimodal.x89b_audio_fp_wide.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrow = Multimodal.x89_audio_fingerprint.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide.nonEmpty)
    // recall by construction holds at both widths; on this corpus the
    // precision side agrees too (no 16-bit bucket collisions survive the
    // hamming check at either width), so the pair SETS must coincide
    assert(wide === narrow)
  }
}
