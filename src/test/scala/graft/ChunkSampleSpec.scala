package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, TextAnalysis}

/** x55 chunking + x57 per-group sampling: exact-coverage and
  * distribution/stability properties the oracle rows can't express.
  */
class ChunkSampleSpec extends SparkSpec {

  import spark.implicits._

  test("chunk: every token covered exactly by the declared windows; tail kept") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),   // len < chunk -> 1 chunk
      (2L, (1 to 32).map(i => s"t$i").mkString(" ")),   // len == chunk -> 1 chunk
      (3L, (1 to 33).map(i => s"t$i").mkString(" ")),   // one past -> tail window
      (4L, (1 to 99).map(i => s"t$i").mkString(" ")),
    ).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunk(docs, "doc_id", "text", chunkTokens = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc(1L).length === 1 && byDoc(2L).length === 1)
    assert(byDoc(3L).length === 2, s"tail window dropped: ${byDoc(3L).toSeq}")
    docs.collect().foreach { r =>
      val (id, toks) = (r.getLong(0), r.getString(1).split(' '))
      val covered = Array.fill(toks.length)(false)
      byDoc(id).foreach { case (_, idx, n, chunk) =>
        val start = (idx * 24).toInt
        assert(chunk === toks.slice(start, start + 32).mkString(" "), s"doc $id chunk $idx")
        assert(n === math.min(32, toks.length - start))
        (start until math.min(start + 32, toks.length)).foreach(covered(_) = true)
      }
      assert(covered.forall(identity), s"doc $id has uncovered tokens")
    }
    // consecutive full chunks overlap by exactly chunk - stride tokens
    val d4 = byDoc(4L).sortBy(_._2)
    d4.sliding(2).foreach { case Array((_, i, _, a), (_, j, _, b)) =>
      val overlap = a.split(' ').drop(24.toInt)
      assert(j == i + 1 && b.split(' ').startsWith(overlap))
    }
  }

  test("chunk: randomized lengths x (chunk, stride) combos keep exact coverage") {
    // one Spark job over 200 random-length docs x 3 window configs —
    // the property the fixed-length cases can't sweep: every token
    // covered, every chunk a verbatim slice, index arithmetic consistent
    val rnd = new scala.util.Random(7)
    val docs = (1 to 200)
      .map(i => (i.toLong, (1 to (1 + rnd.nextInt(120))).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    for ((ck, st) <- Seq((32, 24), (16, 16), (8, 3))) {
      val byDoc = TextAnalysis.chunk(docs, "doc_id", "text", ck, st)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .groupBy(_._1)
      docs.collect().foreach { r =>
        val (id, toks) = (r.getLong(0), r.getString(1).split(' '))
        val covered = Array.fill(toks.length)(false)
        byDoc(id).foreach { case (_, idx, n, chunk) =>
          val start = (idx * st).toInt
          assert(chunk === toks.slice(start, start + ck).mkString(" "),
            s"ck=$ck st=$st doc $id chunk $idx")
          assert(n === math.min(ck, toks.length - start))
          (start until math.min(start + ck, toks.length)).foreach(covered(_) = true)
        }
        assert(covered.forall(identity), s"ck=$ck st=$st doc $id uncovered")
      }
    }
  }

  test("samplePerGroup: exact size, subset, salt independence, map-side group limit") {
    val docs = Tables(spark, sf0001).documents
    val got = Curation.samplePerGroup(docs, Seq("lang", "source"), col("doc_id"), n = 3)
    val sizes = got.groupBy("lang", "source").count()
    val strata = docs.groupBy("lang", "source").count()
    // every stratum sampled; n capped at the stratum size
    assert(sizes.count() === strata.count())
    val over = sizes.as("s").join(strata.as("t"), Seq("lang", "source"))
      .where(col("s.count") > least(col("t.count"), lit(3L)))
    assert(over.isEmpty)
    // sample is a subset of the corpus
    assert(got.join(docs, Seq("doc_id"), "left_anti").isEmpty)
    // determinism + salt independence: same salt = same rows, different
    // salt draws a (here) different set of the same per-stratum size
    val again = Curation.samplePerGroup(docs, Seq("lang", "source"), col("doc_id"), n = 3)
    assert(got.select("doc_id").except(again.select("doc_id")).isEmpty)
    val other = Curation.samplePerGroup(docs, Seq("lang", "source"), col("doc_id"), n = 3, salt = "r2|")
    assert(other.count() === got.count())
    assert(got.select("doc_id").except(other.select("doc_id")).count() > 0)
    // scale guard: the rank<=n predicate reaches the map side as a
    // WindowGroupLimit, so the exchange never carries a full stratum
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }
}
