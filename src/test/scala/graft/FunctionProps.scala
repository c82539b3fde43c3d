package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.TextFunctions
import graft.streaming.TraceSessionizer

/** ScalaCheck property tests for the parser-ish operators (SURVEY §5:
  * mention grammar, interval parse, truncation idempotence).
  */
object FunctionProps extends Properties("graft.functions") {

  private val word = Gen.oneOf(
    "@a.md", "plain", "`@code`", "@mention", "\"@q.md\"", "@x/y:z",
    "a@b.com", "'@sq.md'", "@\"spaced name.md\"", "text")
  private val text = Gen.listOf(word).map(_.mkString(" "))

  property("mentions start with @, exclude backticked and literal @mention") =
    forAll(text) { t =>
      val out = TextFunctions.parseMentions(t)
      out.forall(m => m.startsWith("@") && !m.contains("`")) && !out.contains("@mention")
    }

  property("extractMentionPath strips exactly the @ prefix and outer quotes") =
    forAll(text) { t =>
      TextFunctions.parseMentions(t).forall { m =>
        val p = TextFunctions.extractMentionPath(m)
        !p.startsWith("@") && !(p.startsWith("\"") && p.endsWith("\"") && p.length >= 2)
      }
    }

  property("truncate is idempotent and length-bounded") =
    forAll(Gen.asciiPrintableStr, Gen.choose(1, 50)) { (s, n) =>
      val once  = TraceSessionizer.truncate(s, n)
      val twice = TraceSessionizer.truncate(once, n + "... (truncated)".length)
      once == twice && once.length <= n + "... (truncated)".length
    }

  property("timestamp parse never throws; malformed yields 0") =
    forAll(Gen.oneOf(Gen.asciiPrintableStr, Gen.const("2025-01-02T03:04:05+00:00"))) { s =>
      val ms = TraceSessionizer.parseTimestampMs(s)
      ms >= 0 || ms < 0 // total function: any Long is acceptable, no exception
    }

  private val langBases = Map(
    "es" -> "el la de que y en un es los del",
    "de" -> "der die das und ist von ein zu den dem",
    "nl" -> "het een van dat op te met voor niet zijn",
  )

  property("lang_id argmax survives up to 2x non-stopword noise") =
    forAll(
      Gen.oneOf(langBases.keySet.toSeq),
      Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, Gen.identifier.map("zq" + _))),
    ) { (lang, noise) =>
      // noise tokens hit no profile: they dilute every language's score
      // equally, so the argmax can't flip and stays above the 'und' bar
      // (10 base hits / <=30 tokens > 2%)
      TextFunctions.langIdOf((langBases(lang).split(" ").toSeq ++ noise).mkString(" ")) == lang
    }

  // x20's patterns via java.util.regex — the same engine Spark's
  // regexp_replace runs, so these properties transfer to the query.
  private val piiFragment = Gen.oneOf(
    "plain", "word", "a@b.co", "user.name+tag@mail.example.org",
    "+1-415-555-0000", "+12-123-456-7890", "10.1.2.3", "255.255.255.255",
    // near-misses that must NOT be eaten (and must not mask a real span)
    "a@b.c", "user@", "@example.com", "+1-415-555", "1.2.3", "1.2.3.4.5",
    // adjacency stress: spans glued together with no separator
    "10.1.2.3+1-415-555-0000", "a@b.coc@d.ef")
  private val piiText = for {
    frags <- Gen.listOf(piiFragment)
    seps  <- Gen.listOfN(frags.length, Gen.oneOf(" ", "", ".", "-"))
  } yield frags.zip(seps).map { case (f, s) => f + s }.mkString

  property("pii redaction: no email/phone/ipv4 span survives, and it is idempotent") =
    forAll(piiText) { t =>
      import graft.operators.TrainPrep
      val red = TrainPrep.redactPii(t)
      val leaked = Seq(TrainPrep.EmailRe, TrainPrep.Ipv4Re, TrainPrep.PhoneRe)
        .exists(p => java.util.regex.Pattern.compile(p).matcher(red).find())
      !leaked && TrainPrep.redactPii(red) == red
    }

  // From-scratch vocab-grain BPE reference (independent of BpeSpec's
  // text-grain one): weighted multiset pair counts, '|'-encoded tie
  // break, left-to-right non-overlapping merges.
  private def bpeRef(vocab: Seq[(String, Long)], k: Int)
      : (Seq[(Int, String, String, Long)], Seq[Int]) = {
    import scala.collection.mutable
    var syms = vocab.map { case (w, _) => w.split("").filter(_.nonEmpty).toVector }
    val ms   = Seq.newBuilder[(Int, String, String, Long)]
    var r    = 1
    var stop = false
    while (r <= k && !stop) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      syms.zip(vocab).foreach { case (s, (_, n)) =>
        (0 until s.length - 1).foreach(i => counts((s(i), s(i + 1))) += n)
      }
      if (counts.isEmpty) stop = true
      else {
        val ((l, rt), c) = counts.minBy { case ((a, b), cc) => (-cc, s"$a| $b|") }
        ms += ((r, l, rt, c))
        syms = syms.map { s =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == l && s(i + 1) == rt) { out += (l + rt); i += 2 }
            else { out += s(i); i += 1 }
          }
          out.result()
        }
        r += 1
      }
    }
    (ms.result(), syms.map(_.length))
  }

  private val vocabGen: Gen[List[(String, Long)]] = Gen
    .listOfN(10, for {
      len <- Gen.choose(2, 6)
      w   <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      n   <- Gen.choose(1L, 5L)
    } yield (w, n))
    .map(_.distinctBy(_._1))

  property("driver-local BPE trainer equals the from-scratch reference on random vocabs") =
    forAll(vocabGen, Gen.choose(1, 12)) { (vocab, k) =>
      import graft.operators.Curation
      val (gotM, gotV) = Curation.bpeTrainCollected(vocab.toArray, k, strict = false)
      val (refM, refV) = bpeRef(vocab, k)
      gotM == refM.toVector && gotV.map(_._2).toSeq == refV
    }
}
