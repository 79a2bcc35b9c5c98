package graft.functions

/** VADER-style rule-based sentiment scorer (F6).
  *
  * The reference scores each article with the published VADER
  * algorithm (`/root/reference/scripts/03_add_sentiment.py:10,28`,
  * via the `vaderSentiment` package). This is an original Scala
  * implementation of the public algorithm's core rules over a reduced
  * embedded lexicon (the full ~7.5k-entry lexicon is not shipped in
  * this container; divergence documented):
  *
  *  - token valences from the lexicon;
  *  - booster words within 3 tokens scale the valence (decayed
  *    0.95/0.9 by distance, as published);
  *  - a negator within 3 preceding tokens flips valence × −0.74;
  *  - trailing exclamation marks add emphasis (×0.292 each, max 4);
  *  - compound = s / sqrt(s² + 15), clamped to [−1, 1].
  */
object Vader {

  val lexicon: Map[String, Double] =
    graft.operators.TextAnalysis.lexicon.toMap

  private val boosters: Map[String, Double] = Map(
    "very" -> 0.293, "extremely" -> 0.293, "incredibly" -> 0.293,
    "really" -> 0.193, "slightly" -> -0.293, "somewhat" -> -0.193)

  private val negators: Set[String] = Set(
    "not", "no", "never", "none", "isnt", "dont", "cant", "wont",
    "isn't", "don't", "can't", "won't", "neither", "nor")

  private def stripPunct(t: String): String =
    t.dropWhile(c => !c.isLetterOrDigit)
      .reverse.dropWhile(c => !c.isLetterOrDigit).reverse

  /** Compound score in [-1, 1]; 0.0 for empty/neutral text. */
  def compound(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    val raw = text.toLowerCase.trim.split("\\s+").toIndexedSeq
    val toks = raw.map(stripPunct)
    var s = 0.0
    var i = 0
    while (i < toks.length) {
      lexicon.get(toks(i)).foreach { v0 =>
        var v = v0
        // look back up to 3 tokens for boosters / negators
        val decay = Array(1.0, 0.95, 0.9)
        var back = 1
        while (back <= 3 && i - back >= 0) {
          val prev = toks(i - back)
          boosters.get(prev).foreach { b =>
            v += math.signum(v0) * b * decay(back - 1)
          }
          if (negators.contains(prev)) v *= -0.74
          back += 1
        }
        s += v
      }
      i += 1
    }
    if (s != 0.0) {
      val bangs = math.min(text.count(_ == '!'), 4)
      s += math.signum(s) * bangs * 0.292
    }
    val c = s / math.sqrt(s * s + 15.0)
    math.max(-1.0, math.min(1.0, c))
  }
}
