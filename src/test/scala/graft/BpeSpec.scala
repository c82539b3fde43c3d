package graft

import scala.collection.mutable

import graft.operators.Curation

/** x80: the distributed BPE trainer must reproduce a canonical from-scratch
  * JVM reference — symbol VECTORS and an explicit left-to-right
  * non-overlapping merge scan, no shared encoding or replace tricks — so a
  * defect in the engines' symbol-string representation (delimiter sharing,
  * partial-symbol matches) cannot hide behind oracle agreement.
  */
class BpeSpec extends SparkSpec {

  private def tables = Tables(spark, sf0001)

  test("12-round merge trajectory equals the canonical JVM reference") {
    val res = Curation.bpeMerges(tables.documents, "text", 12)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))

    // reference trainer over the raw texts
    val wordCounts = mutable.Map.empty[String, Long].withDefaultValue(0L)
    tables.documents.select("text").collect().foreach { row =>
      row.getString(0).split(" ", -1)
        .filter(w => w.length >= 2 && !w.contains("|"))
        .foreach(w => wordCounts(w) += 1L)
    }
    var vocab: Map[Vector[String], Long] = wordCounts.toMap.map { case (w, n) =>
      w.split("").filter(_.nonEmpty).toVector -> n
    }
    val expected = (1 to 12).map { r =>
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, n) =>
        (0 until syms.length - 1).foreach(i => counts((syms(i), syms(i + 1))) += n)
      }
      // max count; ties on the ENCODED pair string ascending — the exact
      // comparator both engines use (symbols are '|'-terminated there)
      val ((l, rt), cnt) = counts.minBy { case ((a, b), c) => (-c, s"$a| $b|") }
      def merge(syms: Vector[String]): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rt) {
            out += (l + rt); i += 2 // left-to-right, non-overlapping
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }
      vocab = vocab.map { case (syms, n) => merge(syms) -> n }
      (r, l, rt, cnt)
    }
    assert(res.toSeq === expected)
  }
}
