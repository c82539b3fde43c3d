package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

import graft.plans.CosineSimilarity.cosine_sim
import graft.plans.FreqItemsAgg.mg_freq

/** GraftExtensions: the SQL registrations must resolve and agree with the
  * Column forms, and the SparkSessionExtensions injection path must
  * accept every builder (the `spark.sql.extensions` deployment contract).
  */
class ExtensionsSpec extends SparkSpec {

  import spark.implicits._

  test("SQL forms of the custom functions equal their Column forms") {
    GraftExtensions.registerAll(spark)
    Graft.registerViews(spark, sf0001)

    val sqlCos = spark.sql(
      """SELECT a.vec_id AS qa, b.vec_id AS qb, cosine_sim(a.embedding, b.embedding) AS c
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id <= 5 AND b.vec_id <= 5
        |ORDER BY qa, qb""".stripMargin).collect()
    val t = Tables(spark, sf0001)
    val dfCos = t.embeddings.as("a").join(t.embeddings.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .where(col("a.vec_id") <= 5 && col("b.vec_id") <= 5)
      .select(col("a.vec_id").as("qa"), col("b.vec_id").as("qb"),
        cosine_sim(col("a.embedding"), col("b.embedding")).as("c"))
      .orderBy("qa", "qb").collect()
    assert(sqlCos.toSeq === dfCos.toSeq)

    val sqlMg = spark.sql(
      "SELECT mg_freq(event_type, 64) AS m FROM events")
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    val dfMg = t.events.agg(mg_freq(col("event_type"), 64).as("m"))
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    assert(sqlMg === dfMg && sqlMg.nonEmpty)

    val sqlSim = spark.sql(
      """SELECT doc_id, simhash_agg(t.tok) AS fp
        |FROM (SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents
        |      WHERE doc_id < 10) t
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin).collect()
    assert(sqlSim.length === 10)

    // mg_freq rejects a non-literal capacity with a clear error
    val err = intercept[Exception] {
      spark.sql("SELECT mg_freq(event_type, CAST(user_id AS INT)) FROM events").collect()
    }
    assert(err.getMessage.contains("capacity must be an INT literal") ||
      String.valueOf(err.getCause).contains("capacity must be an INT literal"))
  }

  test("every builder injects through SparkSessionExtensions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // throws if any registration is malformed
    assert(GraftExtensions.builders.map(_._1).toSet ===
      Set("cosine_sim", "int8_dot", "simhash_agg", "mg_freq"))
  }
}
