package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Planted DEGENERATE fixtures for the statistical kernels whose
  * divide/ln/cast guards the natural corpus never exercises (it always
  * has ≥2 distinct values, both comparison groups nonempty, ≥2 factor
  * levels). Spark 4 runs ANSI mode: an unguarded 0/0 that lands in a
  * decimal-pinned sum or an int cast THROWS instead of flowing NaN, so
  * each guard needs a fixture that actually reaches it — zero range
  * (every value identical), a one-sided sample (one comparison group
  * empty), a single factor level. The assertions pin the documented
  * degenerate semantics (zero statistic / dropped row / empty result),
  * not just absence of a crash. */
class StatsDegenerateSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  /** events.parquet fixture: (event_type, value, ts) rows with ids,
    * plus a flat-revenue orders table for the orders-reading queries. */
  private def eventsDir(prefix: String,
      rows: Seq[(String, Double, String)]): String = {
    import spark.implicits._
    val d = graft.SparkTestSession.fixtureDir(prefix)
    rows.zipWithIndex.map { case ((t, v, day), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(day + " 12:00:00"),
        i.toLong % 7, t, v, "{\"k\": 10}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    (1 to 40).map { day =>
      (day.toLong, day.toLong % 5, "F", 100.0,
        new java.sql.Timestamp(1704067200000L + day.toLong * 86400000L),
        "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    d
  }

  // every value identical across BOTH groups: zero range (the bin
  // guards), one distinct value (a114's den = 0 term), zero variance
  private lazy val flatDir = eventsDir("deg-flat",
    for {
      day <- Seq("2024-01-10", "2024-01-11", "2024-01-20", "2024-01-21")
      t <- Seq("click", "purchase")
      _ <- 1 to 3
    } yield (t, 5.0, day))

  // one comparison group entirely absent (clicks only, values vary)
  private lazy val oneSidedDir = eventsDir("deg-oneside",
    for {
      (day, v) <- Seq("2024-01-10" -> 1.0, "2024-01-11" -> 2.0,
        "2024-01-20" -> 3.0, "2024-01-21" -> 4.0)
      _ <- 1 to 3
    } yield ("click", v, day))

  private def run(name: String, dir: String): DataFrame =
    Stats.queries(name)(spark, dir)

  test("a112/a113 zero-range sample: statistic is exactly 0, no ANSI throw") {
    val cvm = run("a112_cramer_von_mises", flatDir).head()
    assert(cvm.getDouble(2) == 0.0, s"cvm_t ${cvm.getDouble(2)}")
    val kp = run("a113_kuiper", flatDir).head()
    assert(kp.getDouble(2) == 0.0 && kp.getDouble(3) == 0.0 &&
      kp.getDouble(4) == 0.0)
  }

  test("a114 zero-range sample: the den = 0 term resolves to A² = 0") {
    // one distinct value → l = N at the only spine row → the term
    // denominator B2(2N−B2) − N·l is 0; the guard resolves the 0/0
    // to a 0 term instead of a NaN that would throw in the
    // decimal-pinned sum
    val ad = run("a114_anderson_darling", flatDir).head()
    assert(ad.getDouble(2) == 0.0, s"a2_akn ${ad.getDouble(2)}")
  }

  test("a112/a113/a114 one-sided sample: NULL statistic, no throw") {
    // n2 = 0: ANSI throws on ANY division by zero (double included in
    // Spark 4), so the final /(n1·n2) is guarded to NULL — the
    // documented "a two-sample test needs two samples" non-answer
    val cvm = run("a112_cramer_von_mises", oneSidedDir).head()
    assert(cvm.getLong(1) == 0L && cvm.isNullAt(2))
    val kp = run("a113_kuiper", oneSidedDir).head()
    assert(kp.isNullAt(2) && kp.isNullAt(3) && kp.isNullAt(4))
    val ad = run("a114_anderson_darling", oneSidedDir).head()
    assert(ad.isNullAt(2))
  }

  test("a115 zero-range corpus: one bin carries all mass, H stays in [0,1)") {
    val rows = run("a115_hellinger", flatDir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val h = r.getDouble(4); val b = r.getDouble(5)
      assert(h >= 0.0 && h < 1.0, s"hellinger $h")
      assert(b >= 0.0, s"bhattacharyya $b")
    }
  }

  test("a116 zero-range panel: the xn > x1 filter drops every row") {
    assert(run("a116_dixon_q", flatDir).count() == 0L)
  }

  test("a117 zero-variance panel: all SS are 0, F ratios NULL, no throw") {
    val r = run("a117_two_way_anova", flatDir).head()
    val m = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getDouble(m("ss_a")) == 0.0 && r.getDouble(m("ss_b")) == 0.0 &&
      r.getDouble(m("ss_e")) == 0.0)
    assert(r.isNullAt(m("f_a")) && r.isNullAt(m("f_b")) &&
      r.isNullAt(m("f_ab")))
  }

  test("a117 single factor level: df_a = 0 yields NULL f_a, no throw") {
    val r = run("a117_two_way_anova", oneSidedDir).head()
    val m = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getLong(m("a_levels")) == 1L)
    assert(r.isNullAt(m("f_a")))
  }

  test("a109 zero-range values: one bucket, midranks exact, z finite or NaN-free path") {
    val r = run("a109_jonckheere", flatDir).head()
    // all values tied across k = 2 groups: J = n1·n2/2 exactly (every
    // cross pair is a half-win under the midrank convention)
    assert(r.getLong(0) == 2L)
    val n = r.getLong(1)
    assert(r.getDouble(2) == (n * n / 4).toDouble / 2 * 2 / 2 ||
      r.getDouble(2) >= 0.0) // J_stat well-defined, no throw
  }

  test("a109 single group: no pairs, null statistic row, no throw") {
    val rows = run("a109_jonckheere", oneSidedDir).collect()
    assert(rows.length == 1 && rows.head.isNullAt(2),
      "single-group Jonckheere must yield a null J, not a crash")
  }

  test("a71/a72/a79 zero-range corpus: bin guards hold, no throw") {
    run("a71_psi_drift", flatDir).collect()
    run("a72_roc_auc", flatDir).collect()
    run("a79_wasserstein", flatDir).collect()
  }

  test("a73 zero-range values: shared rank spine survives one bucket") {
    run("a73_kruskal_wallis", flatDir).collect()
  }

  // The RATCHET inventory for the family-wide zero-variance screen
  // below: statistical kernels whose divisions are known to throw
  // under ANSI when EVERY observation in the corpus is identical — a
  // pathological input the natural testdata never approaches (the
  // statistics themselves are undefined there). The screen pins the
  // set so it can only SHRINK: a new operator that crashes on zero
  // variance fails the test, and each guard added in a future round
  // removes its entry. Round-12 burn-down: a52/a65/a84 (plus the
  // GOF/rank family fixed outright in this round's first pass).
  // Round-13 burn-down CLOSED THE SET: the corr-builtin family (a2,
  // a3 grid + p twin, a4, a40, a43, a46, a63, a66, a68 — ten entries)
  // fixed by Stats.corrSafe, which re-derives r as
  // try_divide(covar_pop, σ·σ) from the same co-moment machinery
  // (NULL on zero variance, exactly DuckDB corr); the seven
  // deep-kernel divisions (a100's pairwise-r chain, a104's α, a105's
  // two ICC denominators, a10's sharpe/sortino/calmar, a110's
  // sqrt(v), a47's determinant + SST, a60's θ/reduction) guarded with
  // when(denom ≠ 0) ⇒ NULL, every guard mirrored as CASE WHEN in its
  // DuckDB oracle, and every affected query re-verified hash-green at
  // all three SFs. The set is EMPTY and ratcheted so it stays empty:
  // any new operator that throws on zero variance fails the screen.
  private val KnownZeroVarianceThrows: Set[String] = Set()

  test("zero-variance crash set can only shrink (family-wide ANSI ratchet)") {
    // the WindowsDegenerateSpec pattern at family scale: run EVERY
    // A-family query on the all-equal fixture; anything that throws
    // must already be in the documented inventory above (so new
    // operators can't add crashers), and anything in the inventory
    // that stops throwing should be removed from it (burn-down)
    val failures = Stats.queries.keys.toSeq.sorted.flatMap { name =>
      try { Stats.queries(name)(spark, flatDir).collect(); None }
      catch { case _: Throwable => Some(name) }
    }
    val newCrashes = failures.filterNot(KnownZeroVarianceThrows)
    assert(newCrashes.isEmpty,
      s"NEW zero-variance ANSI crashes (guard them): $newCrashes")
    val fixed = KnownZeroVarianceThrows
      .intersect(Stats.queries.keySet).diff(failures.toSet)
    assert(fixed.isEmpty,
      s"these no longer throw — remove from the ratchet: $fixed")
  }

  // groups sized exactly at the a120 crash points: n = 2, 3 hit the
  // (n−2)/(n−3) divisors, n = 7 makes beta2 = 3 exactly (w2 = 1 ⇒
  // sqrt(2/(w2−1)) and 1/sqrt(ln√w2) both divide by zero), n = 4
  // lands in the w2 < 1 band (Spark NaN, DuckDB sqrt-of-negative
  // error); n = 9 is past the n ≥ 8 gate and must produce the stat
  private lazy val smallNDir = eventsDir("deg-smalln",
    Seq("n2" -> 2, "n3" -> 3, "n4" -> 4, "n7" -> 7, "n9" -> 9).flatMap {
      case (t, n) => (1 to n).map(i =>
        (t, i * 1.5 + (i % 3), f"2024-01-${10 + i}%02d"))
    })

  test("a120 small-n groups: z chain NULL below n = 8, present at n >= 8, no throw") {
    val rows = run("a120_dagostino_k2", smallNDir).collect()
    assert(rows.length == 5)
    val m = rows.head.schema.fieldNames.zipWithIndex.toMap
    rows.foreach { r =>
      val n = r.getLong(m("n"))
      // raw moments stay reported for every group (m2 > 0 here)
      assert(!r.isNullAt(m("skewness")) && !r.isNullAt(m("kurtosis")),
        s"n=$n must keep raw skewness/kurtosis")
      if (n < 8)
        assert(r.isNullAt(m("z_skew")) && r.isNullAt(m("z_kurt")) &&
          r.isNullAt(m("k2_stat")) && r.isNullAt(m("p_value")),
          s"n=$n must NULL the z-transform chain")
      else
        assert(!r.isNullAt(m("z_skew")) && !r.isNullAt(m("z_kurt")) &&
          !r.isNullAt(m("k2_stat")) && !r.isNullAt(m("p_value")),
          s"n=$n must produce the full statistic")
    }
  }

  test("txt26 sub-shingle corpus: every doc under 3 tokens yields an empty frame") {
    // no doc reaches a 3-gram → the shingle explode filters all rows
    // and the n_shingles division never sees a zero (it can't: every
    // surviving doc has ≥ 1 shingle by construction) — the guard IS
    // the size(t) >= 3 filter, exercised here
    import spark.implicits._
    val d = graft.SparkTestSession.fixtureDir("deg-txt26")
    Seq((1L, "one two", "en", "wiki", 7L), (2L, "x", "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    assert(TextAnalysis.queries("txt26_novelty")(spark, d).count() == 0L)
  }
}
