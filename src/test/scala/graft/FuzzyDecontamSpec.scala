package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainPrep

/** x79: pin the fuzzy-decontamination scores against a from-scratch JVM
  * recomputation (plain Scala sets over the raw texts — no Spark, no shared
  * helper code), and the containment relations that make the verdicts
  * meaningful.
  */
class FuzzyDecontamSpec extends SparkSpec {

  private def tables = Tables(spark, sf0001)

  private def shingleSet(text: String, k: Int): Set[String] = {
    val w = text.split(" ", -1)
    if (w.length < k) Set.empty
    else w.sliding(k).map(_.mkString(" ")).toSet
  }

  test("flagged scores equal a from-scratch JVM jaccard over the raw texts") {
    val res = TrainPrep.x79_fuzzy_decontam.run(spark, sf0001).collect()
    assert(res.nonEmpty, "threshold degenerate: nothing flagged at sf0.001")
    val texts = tables.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val evalSets = texts.collect {
      case (id, tx) if id % 50 == 11 => shingleSet(tx, 5)
    }.toSeq
    res.foreach { row =>
      val (docId, nMatches, best) = (row.getLong(0), row.getLong(2), row.getDouble(3))
      assert(docId % 50 != 11, s"eval doc $docId flagged as training")
      val tr = shingleSet(texts(docId), 5)
      val jacs = evalSets
        .map(ev => ev.intersect(tr).size.toDouble / (ev.size + tr.size - ev.intersect(tr).size))
        .filter(_ >= 0.5)
      assert(jacs.size.toLong === nMatches, s"doc $docId match count")
      assert(jacs.max === best, s"doc $docId best jaccard")
    }
  }

  test("a below-threshold tau flags a superset (monotonicity)") {
    val eval  = tables.documents.filter(col("doc_id") % 50 === 11)
    val train = tables.documents.filter(col("doc_id") % 50 =!= 11)
    val strict = graft.operators.Curation
      .fuzzyDecontaminate(train, eval, "doc_id", "text", 5, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val loose = graft.operators.Curation
      .fuzzyDecontaminate(train, eval, "doc_id", "text", 5, 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(strict.subsetOf(loose))
    assert(loose.size >= strict.size)
  }
}
