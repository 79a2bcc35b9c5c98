package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the VADER rule engine (negation, boosters, punctuation
  * emphasis — the published algorithm's core rules, reference scorer
  * `scripts/03_add_sentiment.py:10,28`). Expected values are computed
  * by hand from the documented rule constants and the embedded
  * lexicon ("good" → 1.9, "bad" → -2.5, "best" → 3.2).
  */
class VaderSpec extends AnyFunSuite {

  private def norm(s: Double): Double = s / math.sqrt(s * s + 15.0)

  test("boosters and lexicon keys stay disjoint (no double-counting)") {
    // the scorer guards the overlap at runtime (a booster token is
    // consumed as a booster, never also as a lexicon word); this pins
    // the invariant at the data level so a future lexicon addition
    // cannot silently change booster semantics
    val shared = Vader.boosters.keySet.intersect(Vader.lexicon.keySet)
    assert(shared.isEmpty, s"booster words present in lexicon: $shared")
  }

  test("lexicon blocks are pairwise disjoint (no entry silently masked)") {
    // the three Map literals are merged with ++, so a key repeated
    // across blocks would silently take the LAST value — a transcription
    // slip that nothing else would catch (scores are not oracle-compared)
    val blocks = Seq(
      "base" -> VaderLexicon.base.keySet,
      "extended" -> VaderLexicon.extended.keySet,
      "extended2" -> VaderLexicon.extended2.keySet,
      "extended3" -> VaderLexicon.extended3.keySet,
      "extended4" -> VaderLexicon.extended4.keySet,
      "extended5" -> VaderLexicon.extended5.keySet,
      "extended6" -> VaderLexicon.extended6.keySet,
      "extended7" -> VaderLexicon.extended7.keySet,
      "extended8" -> VaderLexicon.extended8.keySet,
      "extended9" -> VaderLexicon.extended9.keySet,
      "extended10" -> VaderLexicon.extended10.keySet,
      "extended11" -> VaderLexicon.extended11.keySet,
      "extended12" -> VaderLexicon.extended12.keySet,
      "extended13" -> VaderLexicon.extended13.keySet,
      "extended14" -> VaderLexicon.extended14.keySet,
      "extended15" -> VaderLexicon.extended15.keySet,
      "extended16" -> VaderLexicon.extended16.keySet,
      "extended17" -> VaderLexicon.extended17.keySet,
      "extended18" -> VaderLexicon.extended18.keySet,
      "extended19" -> VaderLexicon.extended19.keySet,
      "extended20" -> VaderLexicon.extended20.keySet,
      "extended21" -> VaderLexicon.extended21.keySet,
      "extended22" -> VaderLexicon.extended22.keySet,
      "extended23" -> VaderLexicon.extended23.keySet,
      "extended24" -> VaderLexicon.extended24.keySet,
      "extended25" -> VaderLexicon.extended25.keySet,
      "extended26" -> VaderLexicon.extended26.keySet,
      "extended27" -> VaderLexicon.extended27.keySet,
      "extended28" -> VaderLexicon.extended28.keySet)
    for (Seq((na, a), (nb, bk)) <- blocks.combinations(2)) {
      val shared = a.intersect(bk)
      assert(shared.isEmpty, s"$na∩$nb: $shared")
    }
    assert(VaderLexicon.entries.size == blocks.map(_._2.size).sum)
  }

  test("empty / null / neutral text scores 0") {
    assert(Vader.compound("") == 0.0)
    assert(Vader.compound(null) == 0.0)
    assert(Vader.compound("the and of with") == 0.0)
  }

  test("single lexicon word: compound = v/sqrt(v²+15)") {
    assert(math.abs(Vader.compound("good") - norm(1.9)) < 1e-12)
    assert(math.abs(Vader.compound("bad") - norm(-2.5)) < 1e-12)
  }

  test("negation flips and damps: 'not good' = ×(−0.74)") {
    val expect = norm(1.9 * -0.74)
    assert(math.abs(Vader.compound("not good") - expect) < 1e-12)
    assert(Vader.compound("not good") < 0)
  }

  test("'no' is negation-only before a lexicon word, standalone otherwise") {
    // "no good": 'no' contributes NO valence of its own (published
    // special case) — only the negation flip applies: 1.9 × −0.74
    assert(math.abs(Vader.compound("no good") - norm(1.9 * -0.74)) < 1e-12)
    // standalone 'no' keeps its lexicon valence (−1.2)
    assert(math.abs(Vader.compound("no") - norm(-1.2)) < 1e-12)
    // 'no' NOT followed by a lexicon word: own valence counts
    assert(math.abs(Vader.compound("good no") - norm(1.9 - 1.2)) < 1e-12)
  }

  test("booster amplifies with distance decay") {
    // adjacent: v = 1.9 + 0.293
    assert(math.abs(Vader.compound("very good") - norm(1.9 + 0.293)) < 1e-12)
    assert(Vader.compound("very good") > Vader.compound("good"))
    // one token between: decay 0.95 (second-back slot)
    val oneGap = norm(1.9 + 0.293 * 0.95)
    assert(math.abs(Vader.compound("very so good") - oneGap) < 1e-12)
    // damper reduces
    assert(Vader.compound("slightly good") < Vader.compound("good"))
    assert(Vader.compound("slightly good") > 0)
  }

  test("exclamation emphasis: +0.292 per bang, capped at 4") {
    val one = norm(1.9 + 0.292)
    val four = norm(1.9 + 4 * 0.292)
    assert(math.abs(Vader.compound("good!") - one) < 1e-12)
    assert(math.abs(Vader.compound("good!!!!") - four) < 1e-12)
    // cap: 6 bangs == 4 bangs
    assert(Vader.compound("good!!!!!!") == Vader.compound("good!!!!"))
    // emphasis follows the sign of the summed valence
    assert(Vader.compound("bad!") < Vader.compound("bad"))
    // bangs alone (no valence) stay 0
    assert(Vader.compound("!!!") == 0.0)
  }

  test("compound stays within [-1, 1] and is monotone in repetition") {
    val many = Seq.fill(200)("best").mkString(" ")
    val c = Vader.compound(many)
    assert(c <= 1.0 && c > 0.99)
    assert(Vader.compound("best best") > Vader.compound("best"))
    val manyBad = Seq.fill(200)("worst").mkString(" ")
    assert(Vader.compound(manyBad) >= -1.0 && Vader.compound(manyBad) < -0.99)
  }

  test("punctuation is stripped before lexicon lookup") {
    assert(Vader.compound("good.") == Vader.compound("good"))
    assert(math.abs(Vader.compound("(good)") - norm(1.9)) < 1e-12)
  }

  test("merged lexicon: published-slice words score, F6 set wins") {
    // words only in the big published slice (VaderLexicon.entries)
    assert(math.abs(Vader.compound("excellent") - norm(2.7)) < 1e-12)
    assert(math.abs(Vader.compound("disaster") - norm(-2.7)) < 1e-12)
    // the 20 oracle-checked F6 valences take precedence on collision
    graft.operators.TextAnalysis.lexicon.foreach { case (w, v) =>
      assert(Vader.lexicon(w) == v, s"F6 word '$w' must keep valence $v")
    }
    assert(Vader.lexicon.size > 500, "merge must keep the full slice")
  }

  test("round-6 breadth extension: finance-news and general vocabulary") {
    // finance/news domain — the vocabulary the reference's headlines
    // actually carry (scripts/03_add_sentiment.py scoring domain)
    assert(math.abs(Vader.compound("bankruptcy") - norm(-2.6)) < 1e-12)
    assert(math.abs(Vader.compound("rally") - norm(1.4)) < 1e-12)
    assert(math.abs(Vader.compound("downgraded") - norm(-1.6)) < 1e-12)
    // general extension range
    assert(math.abs(Vader.compound("nightmare") - norm(-2.5)) < 1e-12)
    assert(math.abs(Vader.compound("stellar") - norm(2.4)) < 1e-12)
    // rules compose with the new vocabulary
    assert(math.abs(Vader.compound("not bullish") - norm(1.9 * -0.74)) < 1e-12)
    assert(Vader.compound("stocks rally on earnings") > 0)
    assert(Vader.compound("recession fears deepen") < 0)
  }

  test("tranche 12: emoticons survive tokenization and score") {
    // a raw token that IS a lexicon entry skips punctuation stripping
    // (the published _words_and_emoticons behavior)
    assert(math.abs(Vader.compound(":)") - norm(2.0)) < 1e-12)
    assert(math.abs(Vader.compound("<3") - norm(3.0)) < 1e-12)
    assert(Vader.compound(":(") < 0)
    assert(Vader.compound("great launch :)") >
      Vader.compound("great launch"))
    // non-lexicon punctuation still strips ("(good)" → "good")
    assert(math.abs(Vader.compound("(good)") - norm(1.9)) < 1e-12)
    // slang register
    assert(Vader.compound("lol") > 0 && Vader.compound("ugh") < 0)
  }

  test("ALL-CAPS emphasis: +0.733 along the sign, only on mixed case") {
    // mixed-case text: the upper-cased lexicon word gets the bump
    assert(math.abs(Vader.compound("GOOD day") - norm(1.9 + 0.733)) < 1e-12)
    assert(math.abs(Vader.compound("BAD day") - norm(-2.5 - 0.733)) < 1e-12)
    // uniformly-cased text: no differential, no bump
    assert(math.abs(Vader.compound("GOOD DAY") - norm(1.9)) < 1e-12)
    assert(math.abs(Vader.compound("good day") - norm(1.9)) < 1e-12)
    // an ALL-CAPS booster gets its own bump (published scalar rule)
    val capsBooster = norm(1.9 + (0.293 + 0.733))
    assert(math.abs(Vader.compound("VERY good day") - capsBooster) < 1e-12)
  }

  test("'but' pivot: pre-but halved, post-but amplified 1.5x") {
    val expect = norm(1.9 * 0.5 + (-2.5) * 1.5)
    assert(math.abs(Vader.compound("good but bad") - expect) < 1e-12)
    assert(Vader.compound("good but bad") < 0)
    // symmetric check: the later clause dominates
    assert(Vader.compound("bad but good") > 0)
    // no pivot → plain sum
    assert(math.abs(Vader.compound("good and bad") -
      norm(1.9 - 2.5)) < 1e-12)
  }
}
