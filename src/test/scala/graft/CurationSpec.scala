package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** The Curation facade at parameters OTHER than the oracle-pinned ones
  * (TrainPrep's x-rows cover those): the API must hold for arbitrary
  * windows, rates, and cluster shapes.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("hashBucket: deterministic, in-range, salts independent") {
    val df = (0L until 500L).toDF("id")
    val b = df.select(
      Curation.hashBucket(col("id"), "a|", 7).as("a"),
      Curation.hashBucket(col("id"), "b|", 7).as("b")).collect()
    assert(b.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 7))
    // different salts decorrelate: buckets must not be identical across
    // the board (they would be with a salt-ignoring hash)
    assert(b.exists(r => r.getLong(0) != r.getLong(1)))
    val again = df.select(Curation.hashBucket(col("id"), "a|", 7).as("a")).collect()
    assert(b.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("sampleByHash: kept set is monotone in the rate (nested samples)") {
    val df = (0L until 1000L).toDF("id")
    def kept(pct: Int): Set[Long] =
      Curation.sampleByHash(df, col("id"), lit(pct)).as[Long].collect().toSet
    val k10 = kept(10); val k50 = kept(50); val k90 = kept(90)
    assert(k10.subsetOf(k50) && k50.subsetOf(k90), "hash sampling must nest")
    assert(k10.size > 50 && k10.size < 200, s"~10% expected, got ${k10.size}")
  }

  test("packBins: bins are contiguous-or-skipping, never exceed window capacity rule") {
    val docs = Seq(
      ("a", 1L, 100L), ("a", 2L, 400L), ("a", 3L, 50L), ("a", 4L, 700L),
      ("b", 1L, 10L), ("b", 2L, 10L),
    ).toDF("stratum", "id", "toks")
    val out = Curation.packBins(docs, Seq("stratum"), "toks", "id", 512)
      .select("stratum", "id", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // a: cum starts 0,100,500,550 -> bins 0,0,0,1 (doc4 starts at 550)
    assert(out(("a", 1L)) == 0L && out(("a", 2L)) == 0L && out(("a", 3L)) == 0L)
    assert(out(("a", 4L)) == 1L)
    assert(out(("b", 1L)) == 0L && out(("b", 2L)) == 0L)
  }

  test("decontaminate: exact n-gram overlap only, counts distinct shared grams") {
    val corpus = Seq((1L, "a b c d e"), (2L, "x y z w q"), (3L, "b c d e f")).toDF("doc_id", "text")
    val eval   = Seq((9L, "a b c d zz b c d e ff")).toDF("doc_id", "text")
    val hits = Curation.decontaminate(corpus, eval, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // eval 4-grams: {a b c d, b c d zz, c d zz b, d zz b c, zz b c d, b c d e, c d e ff}
    assert(hits(1L) == 2L, "doc1 shares 'a b c d' and 'b c d e'")
    assert(hits(3L) == 1L, "doc3 shares 'b c d e'")
    assert(!hits.contains(2L), "doc2 shares nothing")
  }

  test("canonicalPerCluster: ties break to the smallest id, singletons pass through") {
    val labeled = Seq(
      (1L, 5L, 100L), (2L, 5L, 100L), (3L, 5L, 7L), // tie on quality 100 in cluster 5
      (4L, 9L, 1L),                                  // singleton cluster
    ).toDF("doc_id", "component", "quality")
    val out = Curation.canonicalPerCluster(labeled, "component", "doc_id", "quality")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(5L) == ((1L, 100L, 3L)), "tie must pick doc 1, max quality 100, 3 members")
    assert(out(9L) == ((4L, 1L, 1L)))
  }

  test("packShards: shards concatenated in bin order reconstruct the stratum corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("lang"), col("doc_id"), col("text"),
        Curation.tokenCount(col("text")).as("tokens"))
    val shards = Curation.packShards(docs, Seq("lang"), "tokens", "doc_id", "text", 512)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(4)).toMap
      .groupBy(_._1._1)
    val expected = docs.orderBy("doc_id").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(2)).mkString(" ")).toMap
    expected.foreach { case (lang, corpus) =>
      val rebuilt = shards(lang).toSeq.sortBy(_._1._2).map(_._2).mkString(" ")
      assert(rebuilt == corpus, s"$lang shards do not reconstruct the corpus")
    }
  }

  test("writeShards: round-trip hash equality, partition pruning, one file per stratum") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString + "/t"
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("lang"), col("doc_id"), col("text"),
        Curation.tokenCount(col("text")).as("tokens"))
    val written = Curation.writeShards(docs, Seq("lang"), "tokens", "doc_id", "text", 512, dir)

    // round trip: every persisted shard's text re-hashes to its recorded
    // shard_hash, and the row set matches what the writer returned
    val back = spark.read.parquet(dir)
    assert(back.filter(md5(col("shard_text")) =!= col("shard_hash")).isEmpty,
      "persisted shard bytes must re-hash to shard_hash")
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select("lang", "bin", "shard_hash").collect()
      .map(r => (r.getString(r.fieldIndex("lang")), r.getLong(r.fieldIndex("bin")),
        r.getString(r.fieldIndex("shard_hash")))).toSet
    assert(key(back) == key(written))

    // read side prunes to the queried stratum's directory
    val pruned = back.filter(col("lang") === "en")
    val plan   = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), s"no partition pruning:\n$plan")
    assert(pruned.count() > 0)

    // one parquet file per stratum directory (the compact-on-write shape)
    val langDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("lang="))
    assert(langDirs.nonEmpty)
    langDirs.foreach { d =>
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"${d.getName} has $files parquet files, want 1")
    }
  }

  test("qualityVerdict: rule precedence is first-failing") {
    // a doc that is BOTH too short and repetitive reports too_short
    val df = Seq("x x x x").toDF("text")
    val v = df.select(Curation.qualityVerdict(col("text"), 10, 100, 0.0, 100.0, 0.01)).head.getString(0)
    assert(v == "too_short")
  }
}
