package graft

import org.apache.spark.sql.functions._

/** Probes Spark 4's native ICU collation surface for the O6 exactness gap
  * (reference: `localeCompare(sensitivity: 'base')` in
  * webapp/src/features/directories/utils/treeUtils.ts:71 — case- AND
  * accent-insensitive ordering). `lower()` approximates the case half
  * only; `collate(c, "UNICODE_CI_AI")` is the real ICU rendering.
  */
class CollationSpec extends SparkSpec {
  import spark.implicits._

  test("UNICODE_CI_AI equates case and accent variants like localeCompare(base)") {
    val df = Seq(("Ähnlich", "ahnlich"), ("STRASSE", "strasse"), ("café", "CAFE"))
      .toDF("a", "b")
    val eqs = df.select(
      (collate(col("a"), "UNICODE_CI_AI") === collate(col("b"), "UNICODE_CI_AI")).as("eq"))
      .collect().map(_.getBoolean(0))
    assert(eqs.forall(identity), "CI_AI collation failed to equate base-sensitivity pairs")
  }

  test("childrenByParent orders non-ASCII children by ICU base sensitivity (O6 exactness)") {
    val nodes = Seq(
      (1L, "d", "Örebro"), (2L, "d", "apple"), (3L, "d", "Ähnlich"),
      (4L, "d", "zebra"), (5L, "d", "orange"))
      .toDF("id", "parent", "name")
    val children = graft.operators.GraphOps
      .childrenByParent(nodes, "id", "parent", "name")
      .select(explode(col("children")).as("c")).select("c.name")
      .collect().map(_.getString(0)).toSeq
    // lower()-order would yield apple, orange, zebra, Ähnlich, Örebro
    // (Ä/Ö after z); ICU base sensitivity interleaves with a/o
    assert(children == Seq("Ähnlich", "apple", "orange", "Örebro", "zebra"),
      s"got $children")
  }

  test("UNICODE_CI_AI sorts accents with their base letter, not after 'z'") {
    val names = Seq("zebra", "Ärger", "apple", "Öl", "orange").toDF("name")
    val sorted = names
      .orderBy(collate(col("name"), "UNICODE_CI_AI"))
      .collect().map(_.getString(0))
    // byte-order (and lower()-order) puts Ä/Ö after z; ICU base sensitivity
    // interleaves them with a/o
    assert(sorted.head == "apple" || sorted.head == "Ärger")
    assert(sorted.last == "zebra", s"got ${sorted.mkString(",")}")
  }
}
