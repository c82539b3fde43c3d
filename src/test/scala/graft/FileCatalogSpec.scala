package graft

import java.nio.file.{Files, Path}

import graft.sources.FileCatalog

/** Directory catalog over a real temp tree covering FIXTURES B6: hidden
  * entries, deep paths beyond the guard, markers with/without metadata,
  * text/image/binary classification.
  */
class FileCatalogSpec extends SparkSpec {

  private def mk(root: Path, rel: String, bytes: Int = 4): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.write(p, Array.fill[Byte](bytes)(65))
  }

  private lazy val root: Path = {
    val r = Files.createTempDirectory("catalog")
    mk(r, "projA/.amplified", 0)
    mk(r, "projA/metadata.json")
    mk(r, "projA/notes.md")
    mk(r, "projA/pic.png")
    mk(r, "projB/.amplified", 0) // marker WITHOUT metadata.json
    mk(r, "projB/big.md", 2 * 1024 * 1024) // text over the 1MB cap
    mk(r, "projB/blob.bin")
    mk(r, ".hiddenDir/inner.txt")
    mk(r, "deep/a/b/c/d/e/f/g/h/i/j/k/toodeep.txt") // beyond maxDepth=10
    Files.createDirectories(r.resolve("emptyDir"))
    r
  }

  private lazy val catalog = FileCatalog.scan(spark, root.toString, maxDepth = 10)

  test("scan respects the depth guard and records hidden flags") {
    assert(catalog.filter(org.apache.spark.sql.functions.col("name") === "toodeep.txt").count() == 0)
    val hidden = catalog.filter("hidden").collect().map(_.getAs[String]("name")).toSet
    assert(hidden.contains(".hiddenDir") && hidden.contains(".amplified"))
  }

  test("listDirectories: top-level dirs only, hidden excluded, ci-sorted (S3/O4)") {
    val names = FileCatalog.listDirectories(catalog).collect().map(_.getAs[String]("name")).toSeq
    assert(names == Seq("deep", "emptyDir", "projA", "projB"))
  }

  test("classify: text/image caps and binary fallback (S9/F6)") {
    val m = FileCatalog.classify(catalog).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[String]("viewability")).toMap
    assert(m("projA/notes.md") == "text")
    assert(m("projA/pic.png") == "image")
    assert(m("projB/big.md") == "text_too_large")
    assert(m("projB/blob.bin") == "binary")
    assert(m("emptyDir") == "directory")
  }

  test("discoverMarked: marker dirs join metadata presence (S4/J6)") {
    val m = FileCatalog.discoverMarked(catalog).collect()
      .map(r => r.getAs[String]("dir") -> r.getAs[Boolean]("has_metadata")).toMap
    assert(m == Map("projA" -> true, "projB" -> false))
  }

  test("collated listing orders like localeCompare(sensitivity:'base'), unlike lower()") {
    import org.apache.spark.sql.functions.{col, lit, lower}
    import spark.implicits._
    val cat = Seq("zebra", "Éclair", "apple", "Banana").toDF("name")
      .withColumn("depth", lit(1))
      .withColumn("is_directory", lit(true))
      .withColumn("hidden", lit(false))
    val collated = FileCatalog.listDirectoriesCollated(cat).select("name").as[String].collect().toSeq
    // ICU base strength: é ~ e, case ignored -> Éclair lands between Banana and zebra
    assert(collated == Seq("apple", "Banana", "Éclair", "zebra"))
    // lower() would put Éclair last (U+00E9 > 'z'), which is the documented
    // deviation of the oracle-checked o4/o6 forms
    val lowered = cat.orderBy(lower(col("name"))).select("name").as[String].collect().toSeq
    assert(lowered == Seq("apple", "Banana", "zebra", "Éclair"))
  }

  test("scanDistributed returns exactly the driver-side scan's rows (any order)") {
    val dist = FileCatalog.scanDistributed(spark, root.toString, maxDepth = 10)
    assert(dist.schema == catalog.schema)
    val toSet = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getAs[String]("path"), r.getAs[String]("name"),
        r.getAs[Boolean]("is_directory"), r.getAs[Long]("size"), r.getAs[String]("ext"),
        r.getAs[Boolean]("hidden"), r.getAs[Int]("depth"))).toSet
    assert(toSet(dist) == toSet(catalog))
    // consumers produce identical results over either catalog
    val names = FileCatalog.listDirectories(dist).collect().map(_.getAs[String]("name")).toSeq
    assert(names == Seq("deep", "emptyDir", "projA", "projB"))
    val m = FileCatalog.discoverMarked(dist).collect()
      .map(r => r.getAs[String]("dir") -> r.getAs[Boolean]("has_metadata")).toMap
    assert(m == Map("projA" -> true, "projB" -> false))
  }

  test("autocomplete: ci prefix, dirs first, capped (F5/O5)") {
    val got = FileCatalog.autocomplete(catalog, "proj").collect().map(_.getAs[String]("name")).toSeq
    assert(got == Seq("projA", "projB"))
    assert(FileCatalog.autocomplete(catalog, "PIC").collect().map(_.getAs[String]("name")).toSeq == Seq("pic.png"))
    assert(FileCatalog.autocomplete(catalog, "zzz").count() == 0)
  }
}
