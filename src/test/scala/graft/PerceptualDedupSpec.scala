package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** x83: perceptual image near-dup — dHash through the real decoder, banded
  * hamming LSH, clusters.
  */
class PerceptualDedupSpec extends SparkSpec {

  private def tables = Tables(spark, sf0001)

  /** JVM-reference dHash straight off the pixel RULE (no codec): the
    * decoded-raster hash must equal it bit for bit, proving the BMP
    * writer/decoder roundtrip is lossless where the hash samples.
    */
  private def ruleBands(d: Long): Array[Int] = {
    val (w, h) = Multimodal.perceptualDims(d - d % 5)
    val xs = Array.tabulate(9)(i => i * w / 9)
    val ys = Array.tabulate(8)(j => j * h / 8)
    val bands = new Array[Int](4)
    for (j <- 0 until 8; i <- 0 until 8)
      if (Multimodal.perceptualPixel(d, xs(i + 1), ys(j)) >
          Multimodal.perceptualPixel(d, xs(i), ys(j))) {
        val k = j * 8 + i
        bands(k / 16) |= 1 << (k % 16)
      }
    bands
  }

  private def hamming(a: Array[Int], b: Array[Int]): Int =
    (0 until 4).map(i => Integer.bitCount(a(i) ^ b(i))).sum

  test("decoded-raster dHash equals the closed pixel rule for every doc") {
    (0L until 200L).foreach { d =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.perceptualBmp(d)))
      assert(Multimodal.dhashBands(img).toSeq === ruleBands(d).toSeq, s"doc $d")
    }
  }

  test("corpus geometry: variants within 10 bits of their canonical, bases far apart") {
    // every variant ≤ 10 from its base's canonical (v=0) — the recall side
    (0L until 1000L by 5L).foreach { b =>
      val canon = ruleBands(b)
      (1 to 4).foreach { v =>
        val hd = hamming(ruleBands(b + v), canon)
        assert(hd <= 10, s"variant ${b + v} is $hd bits from canonical $b")
        // perturbation confined to ONE band: ≥ 3 of 4 bands shared, so the
        // banded equi-join can never miss an intra pair
        val shared = (0 until 4).count(i => ruleBands(b + v)(i) == canon(i))
        assert(shared >= 3, s"variant ${b + v} shares only $shared bands")
      }
    }
    // distinct bases stay far apart (precision side; measured min 12 over
    // 5 000 docs — spot-check a window here)
    val canons = (0L until 500L by 5L).map(ruleBands).toArray
    for (i <- canons.indices; j <- (i + 1) until canons.length)
      assert(hamming(canons(i), canons(j)) > 10, s"bases ${i * 5} / ${j * 5} collide")
    // the RECALL guarantee (every variant ≤ 10 bits from its canonical,
    // ≥ 3 bands shared) checked linearly over the FULL 30×g id range the
    // scaled benches run — the perturbation geometry must not drift at
    // ids the 500-doc window never sees
    (1000L until 150000L by 5L).foreach { b =>
      val canon = ruleBands(b)
      (1 to 4).foreach { v =>
        val vb = ruleBands(b + v)
        assert(hamming(vb, canon) <= 10, s"variant ${b + v} drifted from canonical $b")
        assert((0 until 4).count(i => vb(i) == canon(i)) >= 3, s"variant ${b + v} bands")
      }
    }
  }

  test("x83 clusters are exactly the five-variant base groups") {
    val rows = Multimodal.x83_phash_clusters.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val comp = r.getLong(0)
      assert(comp % 5 === 0L, s"component $comp is not a base id")
      assert(r.getLong(1) === comp, s"canonical of $comp is ${r.getLong(1)}")
      assert(r.getLong(3) === 5L, s"cluster $comp has ${r.getLong(3)} members")
    }
  }

  test("dHash is invariant under uniform brightness shift (the perceptual property)") {
    // the property byte-exact dedup fundamentally lacks: re-encoding an
    // image brighter/darker changes every byte but no GRADIENT — the
    // dHash must be identical as long as no pixel clips
    // TYPE_INT_RGB with r=g=b, the same representation the production BMPs
    // decode to — TYPE_BYTE_GRAY would detour through the nonlinear
    // gray→sRGB conversion whose plateaus break strict pixel ordering
    def gray(w: Int, h: Int, g: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = g(x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    (0L until 50L).foreach { d =>
      // base field compressed into 40..215 so ±40 shifts cannot clip
      def pix(x: Int, y: Int) = 40 + Multimodal.perceptualMix(d, x, y) * 175 / 255
      val base = Multimodal.dhashBands(gray(16, 12, pix))
      Seq(-40, -7, 13, 40).foreach { c =>
        val shifted = Multimodal.dhashBands(gray(16, 12, (x, y) => pix(x, y) + c))
        assert(shifted.toSeq === base.toSeq, s"doc $d shift $c changed the hash")
      }
    }
  }

  test("x83b probe: every arriving variant matches inside its own base group") {
    val rows = Multimodal.x83b_phash_probe.run(spark, sf0001).collect()
    assert(rows.length === tables.documents.filter(col("doc_id") % 5 === 4).count())
    rows.foreach { r =>
      val (probe, matched, ham) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(probe - probe % 5 === matched - matched % 5,
        s"probe $probe matched cross-base $matched")
      assert(ham <= 10L)
    }
  }

  test("x94 streaming probe: the streamed end state equals the one-shot batch probe") {
    val streamed = Multimodal.x94_stream_phash.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Multimodal.x83b_phash_probe.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("candidate generation is a keyed equi-join — never all pairs") {
    val bands = Multimodal.perceptualBandTable(tables.documents)(spark).toDF()
    val edges = Multimodal.perceptualNearDupEdges(bands, maxHamming = 10)
    edges.collect() // finalize the adaptive plan
    val plan = edges.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"unkeyed join:\n$plan")
  }
}
