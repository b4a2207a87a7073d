package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Chunker invariants, mirroring `tests/test-telegram-agent.py:165-179`
  * plus deterministic-seed ScalaCheck generation over adversarial text
  * (scalatestplus isn't in the offline cache, so sampling is done with a
  * fixed seed walk instead of forAll). */
class ChunkerSpec extends AnyFunSuite {

  test("short message is not split or labeled") {
    assert(Chunker.chunk("hello") == Seq("hello"))
  }

  test("long message splits, labels, and respects the limit") {
    val longText = ("word " * 900).trim
    val chunks = Chunker.chunk(longText)
    assert(chunks.length > 1)
    assert(chunks.head.startsWith("[1/"))
    chunks.foreach(c => assert(c.length <= Chunker.TgMaxChars))
  }

  test("astral-plane text: code-point limits, no surrogate pair ever split") {
    // Python len() counts code points; a UTF-16-unit port would split
    // emoji in half at the hard-split boundary. 🚀 = 2 UTF-16 units.
    val rocket = new String(Character.toChars(0x1F680))
    for (text <- Seq(
        rocket * 4096,                    // exactly at the limit in cps
        rocket * 5000,                    // hard mid-sentence split
        (rocket * 680 + ". ") * 4,       // sentence packing
        "a" * 4087 + rocket * 3)) {      // boundary straddles the budget
      val chunks = Chunker.chunk(text)
      chunks.foreach { c =>
        assert(c.codePointCount(0, c.length) <= Chunker.TgMaxChars)
        assert(!Character.isLowSurrogate(c.charAt(0)), "chunk starts mid-pair")
        assert(!Character.isHighSurrogate(c.charAt(c.length - 1)), "chunk ends mid-pair")
      }
      // No content lost: code points (minus labels/whitespace) survive.
      val payload = if (chunks.length > 1)
        chunks.map(_.replaceFirst("^\\[\\d+/\\d+\\] ", "")) else chunks
      assert(payload.mkString.count(_ == rocket.charAt(0)) ==
        text.count(_ == rocket.charAt(0)))
    }
  }

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma.", "x", "longword" * 40)
  private val sepGen  = Gen.oneOf(" ", " ", ". ", "\n\n")
  private val textGen: Gen[String] = for {
    n     <- Gen.choose(0, 400)
    words <- Gen.listOfN(n, wordGen)
    seps  <- Gen.listOfN(n, sepGen)
  } yield words.zip(seps).map { case (w, s) => w + s }.mkString

  private val caseGen: Gen[(String, Int)] =
    for { t <- textGen; l <- Gen.choose(32, 256) } yield (t, l)

  /** 200 deterministic samples (seed walk from 42). */
  private def cases: Seq[(String, Int)] =
    Iterator.iterate(Seed(42L))(_.next).take(200)
      .map(s => caseGen.pureApply(Gen.Parameters.default, s)).toSeq

  test("property: every chunk payload fits limit - headerBudget") {
    // The 8-char header budget assumes N ≤ 10 (same assumption as the
    // reference, telegram-agent.py:201): beyond that the label itself can
    // push a chunk past the limit, so the hard invariant is on the
    // payload; the full-chunk bound holds whenever N ≤ 10.
    for ((text, limit) <- cases) {
      val chunks = Chunker.chunk(text, limit)
      val payloads =
        if (chunks.length > 1) chunks.map(_.replaceFirst("^\\[\\d+/\\d+\\] ", ""))
        else chunks
      payloads.foreach(p => assert(p.length <= limit - Chunker.HeaderBudget ||
                                   chunks.length == 1))
      if (chunks.length > 1 && chunks.length <= 10)
        chunks.foreach(c => assert(c.length <= limit))
    }
  }

  test("property: labels are exactly [i/N] when multi-chunk") {
    for ((text, limit) <- cases) {
      val chunks = Chunker.chunk(text, limit)
      if (chunks.length > 1) {
        val n = chunks.length
        chunks.zipWithIndex.foreach { case (c, i) =>
          assert(c.startsWith(s"[${i + 1}/$n] "))
        }
      }
    }
  }

  test("property: no non-whitespace content is lost") {
    for ((text, limit) <- cases) {
      val chunks = Chunker.chunk(text, limit)
      val stripped =
        if (chunks.length > 1) chunks.map(_.replaceFirst("^\\[\\d+/\\d+\\] ", ""))
        else chunks
      // Chunking only rearranges whitespace (paragraph/sentence joins);
      // the non-whitespace character stream must round-trip exactly.
      assert(stripped.mkString.replaceAll("\\s", "") == text.replaceAll("\\s", ""))
    }
  }

  test("property: single chunk iff text fits") {
    for ((text, _) <- cases) {
      val chunks = Chunker.chunk(text, Chunker.TgMaxChars)
      if (text.length <= Chunker.TgMaxChars) assert(chunks == Seq(text))
    }
  }

  test("null and empty inputs") {
    assert(Chunker.chunk(null) == Seq.empty)
    assert(Chunker.chunk("") == Seq(""))
  }
}
