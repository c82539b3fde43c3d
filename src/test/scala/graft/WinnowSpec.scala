package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** x93: winnowing fingerprints — the MOSS guarantee, the from-scratch
  * reference, and position-shift robustness.
  */
class WinnowSpec extends SparkSpec {

  import spark.implicits._

  private def md5Bucket(salt: String, key: String, mod: Long): Long = {
    val md  = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((salt + key).getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(6), 16) % mod
  }

  /** From-scratch winnow (k-gram md5 hashes, window-w minima, full
    * windows only, distinct): the Spark output must equal it exactly.
    */
  private def refFps(text: String, k: Int, w: Int): Set[Long] = {
    val toks = text.split(" ", -1)
    if (toks.length < k + w - 1) return Set.empty
    val hs = toks.sliding(k).map(g => md5Bucket("win|", g.mkString(" "), 1L << 24)).toArray
    hs.sliding(w).map(_.min).toSet
  }

  test("winnowFingerprints equals the from-scratch reference on the real corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = Dedup.winnowFingerprints(docs, k = 3, w = 4, maxDf = Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exp = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> refFps(r.getString(1), 3, 4)).toMap
    assert(got.keySet == exp.filter(_._2.nonEmpty).keySet)
    got.foreach { case (id, fps) => assert(fps == exp(id), s"doc $id") }
  }

  test("the MOSS guarantee: a shared run of >= k+w-1 tokens forces a shared fingerprint, shift-robustly") {
    val rnd = new scala.util.Random(93)
    def noise(n: Int) = Seq.fill(n)("n" + rnd.nextInt(100000)).mkString(" ")
    val run = "alpha beta gamma delta eps zeta" // 6 = k+w-1 tokens
    (1 to 20).foreach { i =>
      val a = s"${noise(10)} $run ${noise(7)}"
      // the same run at a DIFFERENT position (the case stride chunking misses)
      val b = s"${noise(3 + i)} $run ${noise(12)}"
      assert(refFps(a, 3, 4).intersect(refFps(b, 3, 4)).nonEmpty, s"trial $i missed the run")
    }
    // and through the Spark path on a tiny frame
    val df = Seq(
      (1L, s"${noise(8)} $run ${noise(5)}"),
      (2L, s"${noise(14)} $run ${noise(3)}"),
      (3L, noise(25))).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(df, k = 3, w = 4, maxDf = 10, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted pair not found: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"noise doc matched: $pairs")
  }

  test("x93b probe: batch-vs-index matches are exactly the mixed-parity slice when caps agree") {
    val docs = Tables(spark, sf0001).documents
    val probe = Dedup.winnowProbe(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 =!= 0),
      k = 3, w = 4, maxDf = 1000000, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    probe.foreach { case (b, c, n) =>
      assert(b % 2 == 1 && c % 2 == 0, s"parity violated: ($b, $c)")
      assert(n >= 3)
    }
    // with the DF cap effectively OFF on both paths, the probe's pair set
    // must equal the mixed-parity restriction of the full-corpus pair set
    val full = Dedup.winnowPairs(docs, k = 3, w = 4, maxDf = 1000000, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .collect { case (a, b, n) if (a % 2) != (b % 2) =>
        if (a % 2 == 1) (a, b, n) else (b, a, n)
      }.toSet
    assert(probe === full)
  }
}
