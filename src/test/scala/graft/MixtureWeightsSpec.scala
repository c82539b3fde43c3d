package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainPrep

/** x97: DoReMi-style multiplicative-weights domain mixture, pinned against
  * a from-scratch plain-Scala reference on the real sf0.001 corpus.
  */
class MixtureWeightsSpec extends SparkSpec {

  private def r10(x: Double) = BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r6(x: Double)  = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Independent reference: per-lang integer stats collected raw, the
    * linearized MWU loop re-derived from scratch with the same rounding
    * contract. Returns the 10dp-quantized trajectory (the engine's
    * stored precision); callers round to 6dp where they compare reports.
    */
  private def refTrajectory(): Seq[(Long, String, Double)] = {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("lang"), col("n_chars"), size(split(col("text"), " ")).cast("long").as("toks"))
      .collect()
    val stats = docs.groupBy(_.getString(0)).toSeq.map { case (lang, rs) =>
      val chars = rs.map(_.getLong(1)).sum
      val toks  = rs.map(_.getLong(2)).sum
      val n     = rs.length.toLong
      lang -> r6((chars.toDouble - toks + n) / toks)
    }.sortBy(_._1)
    val langs = stats.map(_._1)
    val l = stats.map(_._2)
    var w = Array.fill(stats.length)(r10(1.0 / stats.length))
    val out = Seq.newBuilder[(Long, String, Double)]
    langs.indices.foreach(i => out += ((0L, langs(i), w(i))))
    (1 to 8).foreach { r =>
      val mix = langs.indices.map(i => w(i) * l(i)).sum
      val u = langs.indices.map(i => w(i) * (1 + 0.5 * (l(i) - mix)))
      val z = u.sum
      w = u.map(x => r10(x / z)).toArray
      langs.indices.foreach(i => out += ((r.toLong, langs(i), w(i))))
    }
    out.result()
  }

  test("x97 trajectory matches the from-scratch reference row for row") {
    val got = TrainPrep.x97_doremi_weights.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val ref = refTrajectory()
    assert(got.size == ref.size, s"${got.size} rows vs ${ref.size}")
    got.zip(ref).foreach { case ((gs, gl, gw), (rs, rl, rw)) =>
      assert(gs == rs && gl == rl, s"row order: ($gs,$gl) vs ($rs,$rl)")
      assert(math.abs(gw - r6(rw)) < 1e-9, s"step $gs lang $gl: $gw vs ${r6(rw)}")
    }
  }

  test("x97 invariants: simplex per step, high-loss domains gain weight monotonically") {
    val rows = TrainPrep.x97_doremi_weights.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val bySteps = rows.groupBy(_._1).toSeq.sortBy(_._1)
    assert(bySteps.map(_._1) == (0L to 8L), "all 9 steps present")
    bySteps.foreach { case (s, g) =>
      val tot = g.map(_._3).sum
      assert(math.abs(tot - 1.0) < 1e-5, s"step $s weights sum $tot")
      assert(g.forall(_._3 > 0.0), s"step $s has a non-positive weight")
    }
    // the losses are fixed across steps, so the max-loss domain's weight
    // must be non-decreasing and the min-loss domain's non-increasing
    val ref = refTrajectory()
    val losses = ref.filter(_._1 == 0L).map(_._2) // langs in order
    val byLang = rows.groupBy(_._2).map { case (l, g) => l -> g.sortBy(_._1).map(_._3) }
    val trajFirst = byLang(losses.head)
    assert(losses.nonEmpty && byLang.size == losses.size)
    val langLoss = {
      val docs = spark.read.parquet(s"$sf0001/documents.parquet")
        .select(col("lang"), col("n_chars"), size(split(col("text"), " ")).cast("long").as("toks"))
        .collect()
      docs.groupBy(_.getString(0)).map { case (lang, rs) =>
        lang -> (rs.map(_.getLong(1)).sum.toDouble - rs.map(_.getLong(2)).sum + rs.length) /
          rs.map(_.getLong(2)).sum
      }
    }
    val maxLang = langLoss.maxBy(_._2)._1
    val minLang = langLoss.minBy(_._2)._1
    val up = byLang(maxLang); val dn = byLang(minLang)
    assert(up.zip(up.tail).forall { case (a, b) => b >= a - 1e-9 }, s"$maxLang not non-decreasing: ${up.toSeq}")
    assert(dn.zip(dn.tail).forall { case (a, b) => b <= a + 1e-9 }, s"$minLang not non-increasing: ${dn.toSeq}")
    assert(up.last > up.head, s"max-loss domain $maxLang never moved")
    assert(trajFirst.nonEmpty)
  }

  test("x97b wires the learned weights into x30's admission machinery exactly") {
    val got = graft.operators.TrainPrep.x97b_mixture_from_learned.run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // weights come from the final MWU step; per-mille integers partition ~1000
    val wpm = refTrajectory().filter(_._1 == 8L)
      .map { case (_, lang, w) => lang -> math.round(w * 1000) }.toMap
    val wpmSum = wpm.values.sum
    assert(math.abs(wpmSum - 1000L) <= wpm.size / 2 + 1, s"w_pm sum $wpmSum")
    // the admitted sets must be exactly admitByMixture under those weights
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("lang"),
        graft.operators.Curation.tokenCount(col("text")).as("tokens"))
    val rates = graft.operators.Curation
      .mixtureRates(toks, "lang", col("tokens"), wpm, budgetTokens = 20000L)
    val refAdm = graft.operators.Curation
      .admitByMixture(toks, "lang", col("doc_id"), rates)
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("tokens").as("tk"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    got.foreach { case (lang, avail, rateBp, nAdm, admTok) =>
      assert(rateBp >= 0 && rateBp <= 10000, s"$lang rate $rateBp")
      assert(admTok <= avail, s"$lang admitted $admTok > avail $avail")
      val (rn, rt) = refAdm.getOrElse(lang, (0L, 0L))
      assert(nAdm == rn && admTok == rt, s"$lang admitted ($nAdm,$admTok) vs ref ($rn,$rt)")
    }
  }
}
