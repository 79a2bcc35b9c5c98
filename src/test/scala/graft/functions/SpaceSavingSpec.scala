package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.splitmix64

/** The Space-Saving guarantees in the regime the test-corpus query
  * can't reach (capacity < vocabulary, evictions happening): the
  * one-sided estimate bounds, the heavy-item guarantee, their
  * preservation through arbitrary splits and merge orders, and the
  * exact-degeneration case TXT9's oracle check rests on.
  */
class SpaceSavingSpec extends AnyFunSuite {

  /** Zipf-flavored deterministic stream over a 200-token vocabulary:
    * token t appears ~ C/(t+1) times, far more skew than uniform, so
    * a 32-slot summary must evict constantly. */
  private val stream: Vector[String] = {
    val raw = for {
      t <- 0 until 200
      c = 2000 / (t + 1)
      j <- 0 until math.max(c, 1)
    } yield (s"tok$t", splitmix64(t * 100003L + j))
    raw.sortBy(_._2).map(_._1).toVector // deterministic shuffle
  }
  private val trueCounts: Map[String, Long] =
    stream.groupBy(identity).map { case (t, v) => t -> v.size.toLong }

  private def fold(agg: SpaceSaving, xs: Seq[String]): SpaceSaving.State =
    xs.foldLeft(agg.zero)(agg.reduce)

  private def items(agg: SpaceSaving, s: SpaceSaving.State): Seq[SSItem] =
    agg.finish(s).items

  private def checkInvariants(agg: SpaceSaving, s: SpaceSaving.State,
      n: Long, k: Int): Unit = {
    val its = items(agg, s)
    its.foreach { it =>
      val t = trueCounts.getOrElse(it.token, 0L)
      assert(t <= it.est, s"${it.token}: est ${it.est} under true $t")
      assert(it.est - it.err <= t,
        s"${it.token}: lower bound ${it.est - it.err} over true $t")
      assert(it.err <= n / k + 1,
        s"${it.token}: err ${it.err} exceeds N/k = ${n / k}")
    }
    // the heavy-item guarantee: anything above N/k is in the summary
    val kept = its.map(_.token).toSet
    trueCounts.foreach { case (t, c) =>
      if (c > n / k)
        assert(kept.contains(t), s"heavy token $t (count $c > N/k) evicted")
    }
  }

  test("sequential stream keeps bounds and the heavy-item guarantee") {
    val agg = new SpaceSaving(32)
    checkInvariants(agg, fold(agg, stream), stream.size.toLong, 32)
  }

  test("bounds survive arbitrary splits and merge orders") {
    val agg = new SpaceSaving(32)
    val n = stream.size.toLong
    // uneven chunks, left fold of merges
    val chunks = stream.grouped(137).map(fold(agg, _)).toVector
    checkInvariants(agg, chunks.reduceLeft(agg.merge), n, 32)
    // balanced tree (what a wide map-side combine produces)
    def tree(v: Vector[SpaceSaving.State]): SpaceSaving.State = v match {
      case Vector(one) => one
      case _ =>
        val (l, r) = v.splitAt(v.size / 2)
        agg.merge(tree(l), tree(r))
    }
    val fine = stream.grouped(23).map(fold(agg, _)).toVector
    checkInvariants(agg, tree(fine), n, 32)
  }

  test("capacity >= vocabulary degenerates to exact counting") {
    // TXT9's oracle check rests on this: no eviction ever happens, so
    // every estimate is the exact count with zero error — regardless
    // of how the stream was split and merged
    val agg = new SpaceSaving(256)
    val parts = stream.grouped(101).map(fold(agg, _)).toVector
    val merged = items(agg, parts.reduceLeft(agg.merge))
    assert(merged.size == trueCounts.size)
    merged.foreach { it =>
      assert(it.err == 0L, s"${it.token}: err ${it.err} in exact regime")
      assert(it.est == trueCounts(it.token),
        s"${it.token}: est ${it.est} != true ${trueCounts(it.token)}")
    }
  }

  test("top of the summary matches the true top tokens on skewed data") {
    // with Zipf skew the head is far above the error floor, so the
    // sketch's leading entries are the true leaders in true order
    val agg = new SpaceSaving(32)
    val top5 = items(agg, fold(agg, stream)).take(5).map(_.token)
    val trueTop5 = trueCounts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(5).map(_._1)
    assert(top5 == trueTop5, s"$top5 vs $trueTop5")
  }
}
