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
}
