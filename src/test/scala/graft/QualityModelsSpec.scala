package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityModels

/** x90/x91: the trained quality classifier and the scorer-AUC eval loop,
  * each pinned against a from-scratch JVM reference on the real features.
  */
class QualityModelsSpec extends SparkSpec {

  test("x90 GD trajectory matches a from-scratch logistic regression on the collected features") {
    val feat = QualityModels.features(
      spark.read.parquet(s"$sf0001/documents.parquet"))
    val rows = feat.collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))

    // independent reference: plain-Scala batch GD, identical init/lr/steps
    var b = 0.0; var v1 = 0.0; var v2 = 0.0
    (1 to 16).foreach { _ =>
      var gb = 0.0; var g1 = 0.0; var g2 = 0.0
      rows.foreach { case (y, f1, f2) =>
        val e = y - 1.0 / (1.0 + math.exp(-(b + v1 * f1 + v2 * f2)))
        gb += e; g1 += f1 * e; g2 += f2 * e
      }
      val n = rows.length
      b += gb / n; v1 += g1 / n; v2 += g2 / n
    }
    val got = QualityModels.logregGd(feat, lr = 1.0, steps = 16)
    assert(math.abs(got._1 - b) < 1e-9, s"bias ${got._1} vs $b")
    assert(math.abs(got._2 - v1) < 1e-9, s"w_stop ${got._2} vs $v1")
    assert(math.abs(got._3 - v2) < 1e-9, s"w_mcl ${got._3} vs $v2")

    val out = QualityModels.x90_quality_logreg.run(spark, sf0001).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("bias", "train_acc", "w_mcl", "w_stop"))
    val acc = out.find(_.getString(0) == "train_acc").get.getDouble(1)
    assert(acc >= 0.0 && acc <= 1.0)
  }

  test("x91 AUC matches a from-scratch tie-adjusted Mann-Whitney on the collected scores; LM beats the surface ratio") {
    val out = QualityModels.x91_scorer_auc.run(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set("lm_nll", "stop_ratio"))

    // reference AUC for the stop_ratio scorer from raw data
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text")).collect()
    val scored = docs.map { r =>
      val toks = r.getString(2).split(" ", -1)
      val stop = toks.count(w => w == "the" || w == "a").toDouble / toks.length
      val s    = BigDecimal(-stop).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (s, r.getString(1) != "en")
    }
    def refAuc(xs: Seq[(Double, Boolean)]): Double = {
      val byScore = xs.groupBy(_._1).toSeq.sortBy(_._1)
      var below = 0L; var num = 0L
      var np = 0L; var nn = 0L
      byScore.foreach { case (_, g) =>
        val p = g.count(_._2).toLong; val n = g.size - p
        num += p * (2 * below + n); below += n; np += p; nn += n
      }
      num.toDouble / (2.0 * np * nn)
    }
    val expected = BigDecimal(refAuc(scored.toSeq))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out("stop_ratio")._1 - expected) < 2e-6,
      s"stop_ratio AUC ${out("stop_ratio")._1} vs reference $expected")
    // the LM scorer must rank meaningfully better than the surface ratio
    assert(out("lm_nll")._1 > out("stop_ratio")._1 + 0.1,
      s"LM AUC ${out("lm_nll")._1} should clearly beat ratio ${out("stop_ratio")._1}")
    // positives + negatives = corpus, identical across scorers
    assert(out("lm_nll")._2 + out("lm_nll")._3 == docs.length.toLong)
    assert(out("stop_ratio")._2 == out("lm_nll")._2)
  }

  test("x99 calibration bins match a from-scratch reference and satisfy the ECE identity") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r10(x: Double) = BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val feat = graft.operators.Curation
      .lmQuality(docs, docs.filter(col("lang") === "en"), "doc_id", "text", 256)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .select(
        when(col("lang") =!= "en", 1.0).otherwise(0.0).as("y"),
        (col("avg_nll") - 5.0).as("f"))
      .localCheckpoint()
    val rows = feat.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    // independent reference: plain-Scala Platt GD, same init/lr/steps/quantization
    var b = 0.0; var a = 0.0
    (1 to 16).foreach { _ =>
      var gb = 0.0; var ga = 0.0
      rows.foreach { case (y, f) =>
        val e = y - 1.0 / (1.0 + math.exp(-(b + a * f)))
        gb += e; ga += f * e
      }
      b = r10(b + gb / rows.length); a = r10(a + ga / rows.length)
    }
    val got2 = QualityModels.plattGd(feat, lr = 1.0, steps = 16)
    assert(math.abs(got2._1 - b) < 1e-8, s"platt b ${got2._1} vs $b")
    assert(math.abs(got2._2 - a) < 1e-8, s"platt a ${got2._2} vs $a")
    // from-scratch: same fitted params, probability per doc, decile bins
    val binned = rows.map { case (y, f) =>
      val p = r6(1.0 / (1.0 + math.exp(-(b + a * f))))
      (math.min(math.floor(p * 10).toLong, 9L), y, p)
    }
    val ref = binned.groupBy(_._1).map { case (bin, g) =>
      val mp = r6(g.map(_._3).sum / g.length)
      val or = r6(g.map(_._2).sum / g.length)
      bin -> (g.length.toLong, mp, or, r6(math.abs(mp - or)))
    }

    val got = QualityModels.x99_scorer_calibration.run(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet == ref.keySet, s"bins ${got.keySet} vs ${ref.keySet}")
    assert(got.size > 1, "LM-scorer calibration must spread over multiple bins")
    assert(got.values.map(_._1).sum == rows.length.toLong, "bins partition the corpus")
    ref.foreach { case (bin, (n, mp, or, gap)) =>
      assert(got(bin)._1 == n, s"bin $bin n ${got(bin)._1} vs $n")
      assert(math.abs(got(bin)._2 - mp) < 2e-6, s"bin $bin mean_pred")
      assert(math.abs(got(bin)._3 - or) < 2e-6, s"bin $bin obs_rate")
      assert(math.abs(got(bin)._4 - gap) < 4e-6, s"bin $bin abs_gap")
    }
    // ECE identity: sum over the table's own columns reproduces the direct ECE
    val n = rows.length.toDouble
    val eceTable = got.values.map { case (nb, _, _, gap) => nb / n * gap }.sum
    val eceDirect = ref.values.map { case (nb, mp, or, _) => nb / n * math.abs(mp - or) }.sum
    assert(math.abs(eceTable - eceDirect) < 1e-6, s"ECE $eceTable vs $eceDirect")
    assert(eceTable >= 0.0 && eceTable <= 1.0)
  }
}
