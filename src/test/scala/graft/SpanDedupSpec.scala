package graft

import org.apache.spark.sql.Row
import graft.operators.Dedup

/** x71 exact substring-span dedup: golden micro-corpus spans, fast==exact
  * parity on real testdata, and the no-quadratic plan contract.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("golden: shared 3-gram run between two docs becomes one maximal span in each") {
    // k=3; docs share the verbatim run "a b c d" (two overlapping 3-grams
    // -> one merged span covering words 2..5 in doc 0, 1..4 in doc 1).
    val docs = docsOf(
      0L -> "x a b c d y z q",
      1L -> "a b c d k l m n",
      2L -> "p q r s t u v w")
    val got = Dedup.duplicatedSpans(docs, k = 3, fingerprints = false).collect().toSeq
    assert(got === Seq(
      Row(0L, 2L, 5L, 4L),
      Row(1L, 1L, 4L, 4L)))
  }

  test("golden: within-doc repeat is a duplicated span even with no second doc") {
    val docs = docsOf(0L -> "a b c z z z a b c w w w")
    // "a b c" occurs twice inside the one doc -> both occurrences flagged.
    val got = Dedup.duplicatedSpans(docs, k = 3, fingerprints = false).collect().toSeq
    assert(got === Seq(Row(0L, 1L, 3L, 3L), Row(0L, 7L, 9L, 3L)))
  }

  test("golden: adjacent duplicated grams merge; a gap of 2+ words splits spans") {
    // Doc 0 vs doc 1: duplicated grams at positions 1-2 (overlap -> merge,
    // span 1..4) and at 7-8 ("e f g h", gap > 1 after span end 4 -> a
    // second span 7..10).
    val docs = docsOf(
      0L -> "a b c d x y e f g h",
      1L -> "a b c d q q e f g h")
    val got = Dedup.duplicatedSpans(docs, k = 3, fingerprints = false)
      .where($"doc_id" === 0L).collect().toSeq
    assert(got === Seq(Row(0L, 1L, 4L, 4L), Row(0L, 7L, 10L, 4L)))
  }

  test("docs shorter than k produce no grams and no crash (Spark sequence guard)") {
    val docs = docsOf(0L -> "a b", 1L -> "a b c d e f g h i j")
    val got = Dedup.duplicatedSpans(docs, k = 8, fingerprints = false).collect()
    assert(got.isEmpty) // no gram occurs twice
  }

  test("fast fingerprint rendering produces the identical span set on testdata") {
    val t = Tables(spark, sf0001)
    val exact = Dedup.duplicatedSpans(t.documents, 8, fingerprints = false)
      .collect().toSet
    val fast = Dedup.duplicatedSpans(t.documents, 8, fingerprints = true)
      .collect().toSet
    assert(exact.nonEmpty, "test corpus must contain duplicated 8-gram spans")
    assert(fast === exact)
  }

  test("golden: excision cuts exactly the span words, docs without spans pass through") {
    val docs = docsOf(
      0L -> "x a b c d y z q",
      1L -> "a b c d k l m n",
      2L -> "p q r s t u v w")
    val got = Dedup.exciseSpans(docs, k = 3, fingerprints = false).collect().toSeq
    assert(got === Seq(
      Row(0L, "x y z q", 4L, 4L),
      Row(1L, "k l m n", 4L, 4L),
      Row(2L, "p q r s t u v w", 8L, 0L)))
  }

  test("golden: fully-duplicated doc excises to the empty string, not a crash") {
    val docs = docsOf(0L -> "a b c", 1L -> "a b c")
    val got = Dedup.exciseSpans(docs, k = 3, fingerprints = false).collect().toSeq
    assert(got === Seq(Row(0L, "", 0L, 3L), Row(1L, "", 0L, 3L)))
  }

  test("excision: fast fingerprint rendering is text-equal on testdata and conserves words") {
    val t = Tables(spark, sf0001)
    val exact = Dedup.exciseSpans(t.documents, 8, fingerprints = false).collect().toSeq
    val fast  = Dedup.exciseSpans(t.documents, 8, fingerprints = true).collect().toSeq
    assert(exact === fast)
    assert(exact.exists(_.getLong(3) > 0), "test corpus must excise something")
    // kept + removed must equal the doc's word count, row by row
    val n = t.documents.selectExpr("doc_id", "size(split(text, ' ')) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    exact.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) === n(r.getLong(0)).toLong,
        s"word conservation broken for doc ${r.getLong(0)}")
    }
  }

  test("plan: semi-join on the gram key, no cartesian, no self-join fan-out") {
    val t = Tables(spark, sf0001)
    val plan = Dedup.duplicatedSpans(t.documents, 8, fingerprints = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"positions must be marked via semi-join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"span dedup must never go quadratic:\n$plan")
  }

  test("incremental spans: golden — only corpus-known grams hit, batch-internal dups ignored") {
    val corpus = docsOf(0L -> "a b c d k l m n")
    val batch = docsOf(
      1L -> "x a b c d y z q",  // shares "a b c d" with the corpus
      2L -> "p q r s p q r s",  // batch-internal repeat only — NOT flagged
      3L -> "u v w h i j e f")  // nothing shared
    val got = Dedup.incrementalSpans(batch,
      Dedup.corpusGramSet(corpus, 3, fingerprints = false), k = 3, fingerprints = false)
      .collect().toSeq
    assert(got === Seq(Row(1L, 2L, 5L, 4L)))
    // same carve through the fingerprint path
    val fast = Dedup.incrementalSpans(batch,
      Dedup.corpusGramSet(corpus, 3, fingerprints = true), k = 3, fingerprints = true)
      .collect().toSeq
    assert(fast === got)
  }

  test("incremental spans: x72 fast rendering and the persisted gram-index probe are span-equal") {
    val t = Tables(spark, sf0001)
    val corpus = t.documents.filter($"doc_id" % 2 === 0)
    val batch  = t.documents.filter($"doc_id" % 2 =!= 0)
    val exact = Dedup.incrementalSpans(batch,
      Dedup.corpusGramSet(corpus, 8, fingerprints = false), 8, fingerprints = false)
      .collect().toSet
    assert(exact.nonEmpty, "carved corpus/batch must share 8-gram spans")
    val fast = Dedup.incrementalSpans(batch,
      Dedup.corpusGramSet(corpus, 8, fingerprints = true), 8, fingerprints = true)
      .collect().toSet
    assert(fast === exact)
    // the persisted, hash-sharded index path returns the same spans AND
    // its scan is partition-pruned to the batch's shards
    val dir = java.nio.file.Files.createTempDirectory("gramidx").toString + "/idx"
    Dedup.writeGramIndex(Dedup.corpusGramSet(corpus, 8, fingerprints = true), dir, shards = 16)
    val probed = Dedup.probePersistedGramIndex(batch, spark, dir, 8, fingerprints = true)
    assert(probed.collect().toSet === exact)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [gram_shard"),
      s"index scan must be partition-pruned on gram_shard:\n$plan")
  }

  test("span monitor: bloom flags are never-false-negative vs exact x72 and exact at generous bits") {
    val t = Tables(spark, sf0001)
    val corpus = t.documents.filter($"doc_id" % 2 === 0)
    val batch  = t.documents.filter($"doc_id" % 2 =!= 0)
    val exactFlagged = Dedup.incrementalSpans(batch,
      Dedup.corpusGramSet(corpus, 8, fingerprints = false), 8, fingerprints = false)
      .where($"span_words" >= 16).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exactFlagged.nonEmpty, "carve must produce flaggable spans")
    val bloom = Dedup.corpusGramBloom(
      Dedup.corpusGramSet(corpus, 8, fingerprints = false), expectedKeys = 200000L)
    val got = Dedup.spanMonitor(batch, bloom, k = 8, minSpanWords = 16)
    val flagged = got.where($"flagged").select("doc_id").collect().map(_.getLong(0)).toSet
    // bloom polarity: no false negatives, ever
    assert(exactFlagged.subsetOf(flagged),
      s"monitor missed exact dups: ${exactFlagged -- flagged}")
    // at 2^24 bits / ~2e5 grams FPs are ~1e-4 per gram — on this corpus
    // the sets coincide (deterministic: bloom hashing is seed-fixed)
    assert(flagged === exactFlagged)
    // and the per-doc span lengths agree with the exact island merge
    val exactBest = Dedup.incrementalSpans(batch,
      Dedup.corpusGramSet(corpus, 8, fingerprints = false), 8, fingerprints = false)
      .groupBy("doc_id").agg(org.apache.spark.sql.functions.max("span_words").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.collect().foreach { r =>
      val exp = exactBest.getOrElse(r.getLong(0), 0L)
      assert(r.getLong(1) >= exp,
        s"doc ${r.getLong(0)}: monitor span ${r.getLong(1)} below exact $exp")
    }
  }

  test("span monitor streams with ZERO state: memory-sink run matches batch, no stateful operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = Tables(spark, sf0001)
    val corpus = t.documents.filter($"doc_id" % 2 === 0)
    val bloom = Dedup.corpusGramBloom(
      Dedup.corpusGramSet(corpus, 8, fingerprints = false), expectedKeys = 200000L)
    val arriving = t.documents.filter($"doc_id" % 2 =!= 0)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = Dedup.spanMonitor(
      t.documents.filter($"doc_id" % 2 =!= 0), bloom, 8, 16).collect().toSet
    val input = MemoryStream[(Long, String)]
    val query = Dedup.spanMonitor(input.toDF().toDF("doc_id", "text"), bloom, 8, 16)
      .writeStream.format("memory").queryName("span_monitor")
      .outputMode(OutputMode.Append).start()
    try {
      // batch boundaries cannot change a per-row computation
      val (first, second) = arriving.splitAt(arriving.length / 2)
      input.addData(first: _*)
      query.processAllAvailable()
      input.addData(second: _*)
      query.processAllAvailable()
      assert(spark.table("span_monitor").collect().toSet === expected)
      assert(query.lastProgress.stateOperators.isEmpty,
        "span monitor must keep no streaming state")
    } finally query.stop()
  }
}
