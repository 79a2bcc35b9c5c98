package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkTestSession, Tables}

/** Properties of the dataset-assembly operators that the row/hash
  * oracle can't express: the split is leakage-free at the group
  * level, conserves rows, and lands near its design mass; the
  * balanced sample is exactly-k per class and rerun-stable.
  */
class DatasetOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf0001

  test("ds8: weighted sample favors long docs, deterministic, size k") {
    val docs = graft.Tables.documents(spark, sf)
    val corpusMean = docs
      .select(avg(size(split(lower(trim(col("text"))), "\\s+"))))
      .head().getDouble(0)
    val s1 = DatasetOps.queries("ds8_weighted_sample")(spark, sf).collect()
    val s2 = DatasetOps.queries("ds8_weighted_sample")(spark, sf).collect()
    // deterministic: the md5-derived uniforms make reruns identical
    assert(s1.map(_.getLong(0)).toSeq == s2.map(_.getLong(0)).toSeq)
    assert(s1.length == math.min(100L, docs.count()))
    // A-ES with weight = length: inclusion odds scale with tokens, so
    // the sample's mean length must exceed the corpus mean
    val sampleMean = s1.map(_.getLong(1)).sum.toDouble / s1.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean vs corpus mean $corpusMean")
  }

  test("ds1: no user straddles splits; rows conserve; mass near design") {
    val tagged = Tables.events(spark, sf)
      .withColumn("split", DatasetOps.split(col("user_id")))
    // leakage-free: (user, split) pairs == users
    val users = tagged.select("user_id").distinct().count()
    val pairs = tagged.select("user_id", "split").distinct().count()
    assert(pairs == users, "a user appears in both splits")
    val agg = DatasetOps.queries("ds1_hash_split")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(agg.keySet == Set("train", "val"), s"both splits present: $agg")
    assert(agg.values.map(_._1).sum == Tables.events(spark, sf).count())
    // 81.25% design mass over ~150 users: generous band
    val frac = agg("train")._2.toDouble / users
    assert(frac > 0.6 && frac < 0.95, s"train user fraction $frac")
  }

  test("ds2: exactly min(k, class size) rows per class, rerun-stable") {
    val got = DatasetOps.queries("ds2_balanced_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val classSizes = Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perClass = got.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    assert(perClass == classSizes.map { case (k, n) => k -> math.min(100L, n) })
    // deterministic: a second run selects the identical rows
    val again = DatasetOps.queries("ds2_balanced_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == again.toSeq)
  }

  test("ds16: kept docs are exactly the maximal within-budget prefix") {
    // the greedy-fill contract, recomputed sequentially from the
    // corpus: per source, walk the seeded-md5 permutation and keep
    // while the running token sum stays ≤ 500 — the query must
    // return exactly that prefix (no skip-and-continue, no overflow)
    val got = DatasetOps.queries("ds16_token_budget")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        size(TextAnalysis.toks).cast("long").as("n_tok"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // NB: .toSeq before flatMap — flatMapping a Map into pairs would
    // rebuild a Map and silently collapse to one doc per source key
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      var cum = 0L
      rows.sortBy(r => (r._4, r._2)).iterator.takeWhile { r =>
        cum += r._3; cum <= 500L
      }.map { r => (src, r._2) }.toList
    }.toSet
    assert(got.map(r => (r._1, r._2)).toSet == expected)
    assert(expected.nonEmpty && expected.size < docs.length,
      "budget must bind: some docs kept, some dropped")
    // budget invariant straight off the output
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.map(_._4).max <= 500L, s"$src exceeded the budget")
    }
  }

  test("ds18: every bin lands exactly at the min-bin count, by md5 rank") {
    import org.apache.spark.sql.functions._
    val out = DatasetOps.queries("ds18_balance_lengths")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // recompute input bins sequentially
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(org.apache.spark.sql.functions.split(
          lower(trim(col("text"))), "\\s+")).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val tmin = docs.map(_._2).min; val tmax = docs.map(_._2).max
    val binned = docs.map { case (id, n) =>
      (id, n, (n - tmin) * 10 / (tmax - tmin + 1)) }
    val m = binned.groupBy(_._3).values.map(_.size).min
    // uniform BY CONSTRUCTION: every output bin has exactly m rows
    out.groupBy(_._3).foreach { case (bin, rs) =>
      assert(rs.length == m, s"bin $bin: ${rs.length} != $m") }
    assert(out.length == m * binned.map(_._3).distinct.length)
    // membership: the m smallest md5-permutation ranks per bin
    val mdAlg = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      mdAlg.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val want = binned.groupBy(_._3).toSeq.flatMap { case (_, rs) =>
      rs.toSeq.map(r => (md5hex(s"ds18:${r._1}"), r._1))
        .sortBy(identity).take(m).map(_._2)
    }.toSet
    assert(out.map(_._1).toSet == want)
  }

  test("ds17: exact per-stratum allocation; two-level rank == direct sort") {
    val out = DatasetOps.queries("ds17_stratified_split")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    assert(out.nonEmpty)
    // exact ⌊0.8n⌋/⌊0.9n⌋−⌊0.8n⌋/rest allocation per stratum — the
    // property hash splits only hit in expectation
    out.groupBy(r => (r._2, r._3)).foreach { case (strat, rs) =>
      val n = rs.length
      val c = rs.groupBy(_._4).view.mapValues(_.length).toMap
      assert(c.getOrElse("train", 0) == n * 8 / 10, s"$strat train")
      assert(c.getOrElse("val", 0) == n * 9 / 10 - n * 8 / 10,
        s"$strat val")
      assert(c.getOrElse("test", 0) == n - n * 9 / 10, s"$strat test")
    }
    // the distributed two-level rank must equal a direct per-stratum
    // sort of the md5 permutation keys (sequential recompute)
    val mdAlg = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      mdAlg.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    out.groupBy(r => (r._2, r._3)).foreach { case (strat, rs) =>
      val n = rs.length
      val ranked = rs.map(r => (md5hex(s"ds17:${r._1}"), r._1))
        .sortBy(identity).zipWithIndex
        .map { case ((_, id), i) => id -> (i + 1) }.toMap
      rs.foreach { case (id, _, _, split) =>
        val rk = ranked(id)
        val want = if (rk <= n * 8 / 10) "train"
          else if (rk <= n * 9 / 10) "val" else "test"
        assert(split == want, s"$strat doc $id rank $rk: $split")
      }
    }
  }

  test("ds19: interleave is strict round-robin and matches the seeded order") {
    val rows = graft.operators.DatasetOps.queries("ds19_interleave")(
        spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._4)
    assert(rows.nonEmpty)
    val sources = rows.map(_._2).distinct.sorted
    val nS = sources.length
    // positions are a contiguous 0..N-1 run; every aligned prefix of
    // length m*S holds exactly m docs of each source (the guarantee)
    assert(rows.map(_._4).toSeq == (0L until rows.length).toSeq)
    assert(rows.length % nS == 0)
    rows.grouped(nS).foreach { batch =>
      assert(batch.map(_._2).sorted.toSeq == sources.toSeq,
        s"unbalanced batch at ${batch.head._4}")
    }
    // per-source order equals the sequential seeded-md5 permutation,
    // truncated at the shortest source (first_exhausted)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String = md.digest(s"3:$id".getBytes)
      .map("%02x".format(_)).mkString
    val bySrc = graft.Tables.documents(spark, sf)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (src, ds) =>
        src -> ds.map(_._2).map(id => (h(id), id)).sortBy(x => x).map(_._2)
      }
    val mn = bySrc.values.map(_.length).min
    val got = rows.groupBy(_._2).map { case (src, rs) =>
      src -> rs.sortBy(_._3).map(_._1).toSeq }
    bySrc.foreach { case (src, perm) =>
      assert(got(src) == perm.take(mn).toSeq, s"$src permutation")
    }
  }

  test("ds20 rolling-origin splits: expanding trains, disjoint future tests") {
    import org.apache.spark.sql.functions._
    val offs = graft.Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("day").getTime / 86400000L))
    val mn = offs.map(_._2).min
    val span = offs.map(_._2).max - mn
    val rel = offs.map { case (u, d) => (u, d - mn) }
    val got = graft.operators.DatasetOps.queries("ds20_rolling_origin")(
        spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    (1 to 4).foreach { f =>
      val te = span * f / 5; val xe = span * (f + 1) / 5
      val train = rel.filter(_._2 <= te)
      val test = rel.filter(e => e._2 > te && e._2 <= xe)
      assert(got(f.toLong) == ((te, xe, train.length.toLong,
        test.length.toLong, train.map(_._1).distinct.length.toLong,
        test.map(_._1).distinct.length.toLong)), s"fold $f")
      assert(test.nonEmpty, s"fold $f vacuous test slice")
    }
    // temporal-CV invariants: trains EXPAND monotonically, every test
    // slice sits strictly in its train's future, consecutive test
    // windows tile without overlap
    val byFold = (1 to 4).map(f => got(f.toLong))
    assert(byFold.map(_._3).sliding(2).forall(p => p(0) <= p(1)),
      "train sizes must be monotone")
    (1 to 4).foreach(f => assert(got(f.toLong)._1 < got(f.toLong)._2))
    (1 to 3).foreach(f =>
      assert(got(f.toLong)._2 == got(f.toLong + 1)._1,
        "test windows must tile: fold f's test end = fold f+1's train end"))
  }

  test("ds22 leakage audit: pair counts partition corpus_pairs; ds13 exists for the leaks") {
    val sf = SparkTestSession.Sf0001
    def sp(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString
      if (hex.charAt(0) < 'd') "train" else "val"
    }
    // the verified pair set via the oracle-checked d25 surface
    val pairs = graft.operators.Dedup.queries("d25_edge_strength")(
      spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    val exp = pairs.groupBy { case (a, b) =>
      val (x, y) = (sp(a), sp(b))
      (if (x <= y) x else y, if (x <= y) y else x)
    }.map { case (k, v) => k -> v.size.toLong }
    val got = DatasetOps.queries("ds22_leakage_audit")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(got.map(_._2._1).sum == pairs.size.toLong,
      "pair counts must partition the verified edge set")
    exp.foreach { case (k, n) =>
      val (gn, leak) = got(k)
      assert(gn == n, s"$k")
      assert(leak == (k._1 != k._2), s"$k leak verdict")
    }
    // the audit's point: the naive split DOES leak on this corpus
    assert(got.exists { case ((a, b), (n, leak)) => leak && n > 0 },
      "vacuous: no straddling near-dup pair; rebalance the fixture claim")
  }

  test("ds21 dedup weights: credit splits uniformly, effective <= raw") {
    import org.apache.spark.sql.functions._
    val sf = graft.SparkTestSession.Sf0001
    val cc = graft.operators.Dedup.queries("d10_cc_corpus")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val sizes = cc.groupBy(_._2).map { case (c, m) => c -> m.size }
    val docSrc = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // sequential recompute: per source, Σ r6(1/|cluster|)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = cc.groupBy(t => docSrc(t._1)).map { case (src, ds) =>
      val eff = BigDecimal(ds.map(t =>
        BigDecimal(r6(1.0 / sizes(t._2)))).sum.toDouble)
      src -> ((ds.size.toLong,
        ds.count(t => sizes(t._2) > 1).toLong, eff.toDouble))
    }
    val got = DatasetOps.queries("ds21_dedup_weights")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (src, (n, inCl, eff)) =>
      val (gn, gin, geff, gr) = got(src)
      assert(gn == n && gin == inCl, s"$src counts")
      assert(math.abs(geff - eff) <= 1e-9, s"$src effective")
      // effective mass can never exceed raw rows, and the ratio is
      // exactly their quotient
      assert(geff <= gn + 1e-9 && gr == geff / gn, s"$src ratio")
    }
    // non-vacuous: the corpus HAS clusters, so some source must lose
    // effective mass
    assert(got.values.exists { case (n, _, eff, _) => eff < n },
      "vacuous: no dedup discount anywhere")
  }
}
