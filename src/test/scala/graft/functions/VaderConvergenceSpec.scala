package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Convergence tracking toward the reference's golden sentiment
  * distribution: the reference scores its news corpus at mean
  * compound 0.433 with 74.7% positive articles
  * (`/root/reference/todo/implementation_roadmap.md:30`). Its corpus
  * is not shipped, so this fixture holds 48 headline-like sentences
  * with the reference corpus's positive-heavy mix (financial news
  * skews positive); the measured mean / positive share on it are
  * recorded in README ("VADER sentiment" section) next to the
  * reference's numbers and re-measured as the lexicon grows. The
  * asserted bands are deliberately loose — the metric exists to be
  * TRACKED, not to pin exact values that would break on every
  * lexicon extension.
  */
class VaderConvergenceSpec extends AnyFunSuite {

  // 36 positive-leaning, 12 negative-leaning — the ~75/25 mix of the
  // reference golden. Vocabulary drawn from real headline patterns.
  private val headlines = Seq(
    // positive-leaning
    "Shares rally as earnings beat expectations",
    "Company reports record profit and raises guidance",
    "Analysts upgrade the stock citing strong growth",
    "New product launch wins praise from early customers",
    "Merger approved, investors celebrate the deal",
    "Revenue surges on robust consumer demand",
    "Breakthrough treatment shows promising results",
    "Startup secures funding to expand innovative platform",
    "Dividend increase rewards loyal shareholders",
    "Factory expansion creates hundreds of new jobs",
    "Partnership boosts outlook for both companies",
    "CEO confident about a bright future ahead",
    "Markets rebound after strong economic data",
    "Customers love the improved service experience",
    "Award-winning team delivers outstanding performance",
    "Successful launch marks major milestone for the firm",
    "Profits improve as efficiency gains take hold",
    "Optimistic forecast lifts the entire sector",
    "Generous bonus plan delights employees",
    "Stock hits record high on stellar results",
    "Recovery gains momentum as sales flourish",
    "Impressive demand drives lucrative new contracts",
    "Innovation praised as firm wins industry accolade",
    "Strong balance sheet reassures investors",
    "Turnaround succeeds, company thrives again",
    "Upbeat guidance triggers a buying frenzy",
    "Healthy growth and happy customers lift shares",
    "Deal wins approval, benefits both sides",
    "Excellent quarter beats every estimate",
    "Expansion into new markets looks promising",
    "Shareholders cheer the generous buyback",
    "Talented hires strengthen the leadership team",
    "Product quality wins trust and admiration",
    "Energy costs ease, boosting profit outlook",
    "Promising trial data excites researchers",
    "Confidence returns as outlook brightens",
    // negative-leaning
    "Shares plunge after disappointing earnings miss",
    "Company warns of layoffs amid slowing demand",
    "Regulators launch probe into alleged fraud",
    "Bankruptcy fears grow as losses mount",
    "Recall damages the brand's reputation",
    "Lawsuit threatens costly settlement for the firm",
    "Downgrade sparks a selloff in the sector",
    "Factory accident disrupts production lines",
    "Scandal forces executive to resign in disgrace",
    "Weak guidance fuels recession worries",
    "Data breach exposes customers to serious risk",
    "Supply shortage hurts margins and delays orders")

  private def metrics: (Double, Double) = {
    val scores = headlines.map(Vader.compound)
    val mean = scores.sum / scores.size
    val posShare = scores.count(_ > 0.05).toDouble / scores.size
    (mean, posShare)
  }

  test("headline fixture tracks the reference golden distribution") {
    val (mean, posShare) = metrics
    info(f"fixture mean compound = $mean%.3f (reference golden 0.433)")
    info(f"fixture positive share = ${posShare * 100}%.1f%% (reference 74.7%%)")
    // converged bands (round 9): the reference golden ±~0.05 / ±10pp.
    // Round-8 measured 0.332; the round-9 market-register tranche
    // (beat/lifts/secures/reassures/brightens + inflections) moved the
    // fixture to 0.387 — the bands are tightened to hold that.
    // Round 10 completed the lexicon to published-file breadth
    // (~7,455 entries) and the mean moved by exactly 0: every
    // sentiment-bearing fixture word was already scored, so the
    // residual vs 0.433 is the fixture's stronger-than-corpus
    // negative tail, and narrowing the band further would assert a
    // number this fixture structurally cannot reach.
    assert(mean > 0.38 && mean < 0.48, f"mean drifted: $mean%.3f")
    assert(posShare > 0.65 && posShare < 0.85,
      f"positive share drifted: $posShare%.3f")
    // every headline must hit the lexicon — a 0.0 score means the
    // vocabulary gap swallowed the sentence entirely
    val zeros = headlines.filter(h => math.abs(Vader.compound(h)) < 1e-9)
    assert(zeros.isEmpty, s"unscored headlines: $zeros")
  }
}
