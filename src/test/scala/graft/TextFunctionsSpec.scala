package graft

import graft.functions.TextFunctions
import graft.functions.TextFunctions.{extractMentionPath, parseMentions}

/** C1 mention grammar (golden cases straight from the reference docstrings
  * and FIXTURES B5) + the scalar Column combinators.
  */
class TextFunctionsSpec extends SparkSpec {

  test("simple mentions") {
    assert(parseMentions("See @file1.md and @file2.txt") == Seq("@file1.md", "@file2.txt"))
  }

  test("quoted mentions keep spaces, lose quotes, and come first") {
    assert(parseMentions("""Use @"My Document.md" here""") == Seq("@My Document.md"))
    assert(parseMentions("""@"a b.md" then @plain.md""") == Seq("@a b.md", "@plain.md"))
  }

  test("mentions inside backticks are ignored") {
    assert(parseMentions("Use `@code` not @real") == Seq("@real"))
  }

  test("mentions inside plain quoted strings are ignored (simple form only)") {
    assert(parseMentions("""say "@hidden.md" aloud""") == Seq.empty)
    assert(parseMentions("say '@hidden.md' aloud") == Seq.empty)
  }

  test("the literal @mention is excluded") {
    assert(parseMentions("use an @mention here, plus @real.md") == Seq("@real.md"))
  }

  test("embedded @ in alphanumeric text is not a mention") {
    assert(parseMentions("email me a@b.com ok") == Seq.empty)
    assert(parseMentions("ref @context-key:path/x.md") == Seq("@context-key:path/x.md"))
  }

  test("extractMentionPath strips @ and quotes") {
    assert(extractMentionPath("@file.md") == "file.md")
    assert(extractMentionPath("@\"My Doc.md\"") == "My Doc.md")
    assert(extractMentionPath("@dir/sub/file.txt") == "dir/sub/file.txt")
  }

  test("property: every parsed mention starts with @ and never contains backticks") {
    val vocab = Vector("@a.md", "plain", "`@code`", "@mention", "\"@q.md\"", "@x/y:z", "a@b.com")
    val rnd   = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val out  = parseMentions(text)
      assert(out.forall(m => m.startsWith("@") && !m.contains("`")), s"text=$text out=$out")
      assert(!out.contains("@mention"), s"text=$text")
    }
  }

  test("parse_mentions UDF works as a column over a DataFrame") {
    import spark.implicits._
    val df = Seq((1L, "see @a.md and `@no.md`"), (2L, "nothing")).toDF("id", "text")
    val got = df.select($"id", TextFunctions.parse_mentions($"text").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("@a.md"))
    assert(got(2L) == Seq.empty)
  }

  test("interval parse matches reference table and rejects malformed") {
    import spark.implicits._
    val df = Seq("30m", "2h", "1d", "45s", "bad", "7w", "m30").toDF("s")
    val out = df.select($"s", TextFunctions.parseIntervalSeconds($"s").as("sec"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("30m").contains(1800L))
    assert(out("2h").contains(7200L))
    assert(out("1d").contains(86400L))
    assert(out("45s").contains(45L))
    assert(out("bad").isEmpty && out("7w").isEmpty && out("m30").isEmpty)
  }

  test("path functions: basename, parent, depth, prefixes") {
    import spark.implicits._
    val df  = Seq("a/b/c.md").toDF("p")
    val row = df.select(
      TextFunctions.pathBasename($"p"),
      TextFunctions.pathParent($"p"),
      TextFunctions.pathDepth($"p"),
      TextFunctions.pathPrefixes($"p")).collect().head
    assert(row.getString(0) == "c.md")
    assert(row.getString(1) == "a/b")
    assert(row.getInt(2) == 3)
    assert(row.getSeq[String](3) == Seq("a", "a/b", "a/b/c.md"))
  }

  test("URL normalization: case, default ports, trailing slash, query order") {
    import spark.implicits._
    val urls = Seq(
      "HTTPS://Example.COM:443/path/",
      "http://example.com:80/a?b=2&a=1",
      "https://example.com/x",
      "not a url").toDF("u")
    val out = urls.select(TextFunctions.normalize_url($"u")).as[String].collect()
    assert(out(0) == "https://example.com/path")
    assert(out(1) == "http://example.com/a?a=1&b=2")
    assert(out(2) == "https://example.com/x")
    assert(out(3) == "not a url") // malformed passes through
  }

  test("truncateWithMarker matches reference boundary semantics") {
    import spark.implicits._
    val df = Seq("short", "x" * 20).toDF("t")
    val out = df.select(TextFunctions.truncateWithMarker($"t", 10)).as[String].collect()
    assert(out(0) == "short")
    assert(out(1) == "x" * 10 + "... (truncated)")
  }

  test("lang_id picks the dominant stopword profile") {
    import spark.implicits._
    val df = Seq(
      "the cat sat on the mat and the dog",
      "el perro y el gato en la casa que es",
      "zzz qqq www").toDF("t")
    val out = df.select(TextFunctions.lang_id($"t")).as[String].collect()
    assert(out(0) == "en")
    assert(out(1) == "es")
    assert(out(2) == "und")
  }

  test("lang_id: correct argmax for all seven profiles, including overlap forms") {
    import spark.implicits._
    val samples = Seq(
      "en" -> "the quick fox and the dog that is in this yard for a while",
      "es" -> "el perro y la casa es un lugar en los pueblos del valle",
      "fr" -> "le chien est dans les rues et nous avons du pain pour vous",
      "de" -> "der hund und die katze ist von einem haus zu dem garten mit uns",
      "it" -> "il cane che corre e la casa per una strada del paese si vede",
      "pt" -> "o cão que corre e a casa para os meninos com uma rua não",
      "nl" -> "de hond en de kat is van het huis op een tafel met niet veel",
    )
    val out = samples.toDF("expected", "t")
      .select($"expected", TextFunctions.lang_id($"t").as("got"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    out.foreach { case (exp, got) => assert(got == exp, s"$exp detected as $got") }
  }

  test("lang_id null/blank edge cases yield 'und'") {
    assert(TextFunctions.langIdOf(null) == "und")
    assert(TextFunctions.langIdOf("   ") == "und")
    assert(TextFunctions.langIdOf("zq aa bb") == "und") // below the 2% signal bar
  }

  test("cron shape validation: 5 or 6 fields") {
    import spark.implicits._
    val df = Seq("0 9 * * *", "0 9 * * * 2026", "0 9 * *", "").toDF("c")
    val out = df.select(TextFunctions.isValidCronShape($"c")).collect().map(_.getBoolean(0))
    assert(out.toSeq == Seq(true, true, false, false))
  }
}
