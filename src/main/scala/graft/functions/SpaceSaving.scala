package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One summary entry: `est` OVERcounts the token's true frequency by
  * at most `err` (the invariant est − err ≤ true ≤ est — SpaceSavingSpec
  * asserts it through arbitrary splits and merge orders). */
final case class SSItem(token: String, est: Long, err: Long)

/** Aggregator output (a product wrapper so the encoder stays on the
  * public `Encoders.product` surface; the query explodes `.items`). */
final case class SSSummary(items: Seq[SSItem])

/** Space-Saving heavy hitters (Metwally, Agrawal & El Abbadi, "Efficient
  * Computation of Frequent and Top-k Elements in Data Streams", 2005),
  * merged across partitions per the parallel variant (Cafaro &
  * Tempesta 2011): the k-slot frequency summary whose guarantees make
  * approximate vocab counting safe at 100 TB —
  *
  *   - every token with true count > N/k is in the summary;
  *   - each estimate overshoots by at most err ≤ N/k;
  *   - the state is k fixed slots, so per-partition partial summaries
  *     reduce map-side and only k·(token, 2 longs) ever shuffles —
  *     TXT8's exact vocab shuffles the full (token, count) space,
  *     this shuffles a constant.
  *
  * Merge keeps the bounds one-sided: a token absent from a summary has
  * true count ≤ that summary's min estimate (≤ 0 when the summary
  * never evicted), so the absent side contributes (min, min) to
  * (est, err). When capacity ≥ vocabulary the sketch never evicts and
  * degenerates to EXACT counting with err = 0 — which is what makes
  * `txt9_heavy_hitters` fully oracle-checkable on the test corpus
  * (31-word vocab < 64 slots) while SpaceSavingSpec exercises the
  * approximating regime (k < vocab) the 100 TB deployment runs in.
  */
final class SpaceSaving(k: Int)
    extends Aggregator[String, SpaceSaving.State, SSSummary] {
  import SpaceSaving.State

  override def zero: State =
    State(new Array[String](k), new Array[Long](k), new Array[Long](k))

  /** In-place slot update (the Aggregator contract allows mutating and
    * returning the buffer): O(k) scan per token — k is a small
    * constant, and the object buffer never re-encodes per row. */
  override def reduce(s: State, w: String): State = {
    var i = 0
    var free = -1
    var minIdx = 0
    while (i < k) {
      val t = s.tokens(i)
      if (t == null) { if (free < 0) free = i }
      else if (t == w) { s.ests(i) += 1; return s }
      else if (s.ests(i) < s.ests(minIdx) || s.tokens(minIdx) == null)
        minIdx = i
      i += 1
    }
    if (free >= 0) {
      s.tokens(free) = w; s.ests(free) = 1L; s.errs(free) = 0L
    } else {
      // evict the min-count victim: the newcomer inherits its count
      // as the overcount bound (the Space-Saving step)
      val m = s.ests(minIdx)
      s.tokens(minIdx) = w; s.ests(minIdx) = m + 1; s.errs(minIdx) = m
    }
    s
  }

  override def merge(a: State, b: State): State = {
    // a summary that never evicted bounds its absent tokens at 0;
    // a full one at its min estimate
    def absentBound(s: State): Long =
      if (s.tokens.contains(null)) 0L
      else s.tokens.indices.map(s.ests).min
    val mA = absentBound(a)
    val mB = absentBound(b)
    val acc = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    for (i <- 0 until k; if a.tokens(i) != null)
      acc(a.tokens(i)) = (a.ests(i) + mB, a.errs(i) + mB)
    for (i <- 0 until k; if b.tokens(i) != null)
      acc.get(b.tokens(i)) match {
        case Some((e, r)) =>
          // common token: both mA/mB corrections retract — the true
          // per-stream estimates just sum
          acc(b.tokens(i)) = (e - mB + b.ests(i), r - mB + b.errs(i))
        case None =>
          acc(b.tokens(i)) = (b.ests(i) + mA, b.errs(i) + mA)
      }
    val top = acc.toSeq
      .sortBy { case (t, (e, _)) => (-e, t) }
      .take(k)
    val out = zero
    for (((t, (e, r)), i) <- top.zipWithIndex) {
      out.tokens(i) = t; out.ests(i) = e; out.errs(i) = r
    }
    out
  }

  override def finish(s: State): SSSummary =
    SSSummary(
      (0 until k).filter(s.tokens(_) != null)
        .map(i => SSItem(s.tokens(i), s.ests(i), s.errs(i)))
        .sortBy(it => (-it.est, it.token)))

  override def bufferEncoder: Encoder[State] = Encoders.product[State]
  override def outputEncoder: Encoder[SSSummary] = Encoders.product[SSSummary]
}

object SpaceSaving {
  /** k parallel slot arrays; null token = free slot. Arrays (not Seq)
    * so `reduce` mutates in place — the buffer lives as an object
    * inside the hash aggregate and only encodes on spill/shuffle. */
  final case class State(tokens: Array[String], ests: Array[Long],
                         errs: Array[Long])

  /** The registered 64-slot instance TXT9 uses. */
  private lazy val agg64 = udaf(new SpaceSaving(64), Encoders.STRING)
  def heavyHitters(w: Column): Column = agg64(w)
}
