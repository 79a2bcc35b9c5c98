package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The HLL approximate distinct (A16, rsd 2%) must land within 5% of
  * the exact count on every group — the error contract that makes it
  * the 100 TB substitute for countDistinct.
  */
class ApproxAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf0001

  test("approx distinct within 5% of exact per group") {
    val exact = Relational.queries("a6_distinct_count")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Relational.queries("a16_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty && exact.keySet == approx.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / n
      assert(err <= 0.05, s"group $k: exact=$n approx=${approx(k)} err=$err")
    }
  }

  test("approx quantiles inside the exact ±1%-rank band per group") {
    // percentile_approx(accuracy=1000) guarantees rank error n/1000
    // (0.1% of each group); the assertion band is the exact quantile
    // at ±1% rank — 10× the guarantee — computed with the same
    // linear-interpolation percentile the oracle-checked A17 uses.
    import org.apache.spark.sql.functions._
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val bandCols = qs.flatMap(q => Seq(
      expr(s"percentile(value, ${math.max(q - 0.01, 0.0)})").as(s"lo$q"),
      expr(s"percentile(value, ${math.min(q + 0.01, 1.0)})").as(s"hi$q")))
    val bands = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(bandCols.head, bandCols.tail: _*)
      .collect()
      .map(r => r.getString(0) ->
        qs.indices.map(i => (r.getDouble(1 + 2 * i), r.getDouble(2 + 2 * i))))
      .toMap
    val approx = Relational.queries("a18_approx_quantiles")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> qs.indices.map(i => r.getDouble(1 + i)))
      .toMap
    assert(approx.nonEmpty && approx.keySet == bands.keySet)
    approx.foreach { case (k, vals) =>
      vals.zip(bands(k)).zip(qs).foreach { case ((v, (lo, hi)), q) =>
        assert(v >= lo - 1e-6 && v <= hi + 1e-6,
          s"group $k q=$q: approx $v outside exact band [$lo, $hi]")
      }
    }
  }

  test("a32 merged day-sketches estimate within 5% of exact, grouping-invariant") {
    import org.apache.spark.sql.functions._
    val exact = graft.Tables.events(spark, sf)
      .agg(countDistinct(col("user_id"))).head().getLong(0)
    val row = Relational.queries("a32_hll_union")(spark, sf).head()
    val est = row.getLong(1)
    assert(row.getLong(0) > 1, "need >1 day for the merge to be real")
    assert(math.abs(est - exact).toDouble / exact <= 0.05,
      s"exact=$exact merged est=$est")
    // associativity: merging per-day sketches must equal sketching the
    // whole table in one pass — the property that makes precomputed
    // sketch rollups safe to serve
    val oneShot = graft.Tables.events(spark, sf)
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))"))
      .head().getLong(0)
    assert(est === oneShot,
      s"merged=$est one-shot=$oneShot — sketch union not associative")
  }

  test("a53 CMS estimates bounded by [exact, exact + eps*N]; day-merge associative") {
    import org.apache.spark.sql.functions._
    val events = graft.Tables.events(spark, sf)
    val n = events.count()
    val exact = events.filter(col("user_id") < 20)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = Relational.queries("a53_cms_freq")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.size == 20)
    val epsN = math.ceil(1e-4 * n).toLong
    est.foreach { case (u, e) =>
      val x = exact.getOrElse(u, 0L)
      assert(e >= x, s"user $u: CMS undercounted ($e < $x) — impossible by construction")
      assert(e <= x + epsN, s"user $u: est $e > exact $x + eps*N $epsN")
    }
    // associativity: merging per-day sketches must equal the one-shot
    // sketch — the property that lets 100 TB be sketched
    // partition-by-partition and rolled up without rescans
    val dayBins = events
      .groupBy(date_trunc("day", col("ts")))
      .agg(expr("count_min_sketch(user_id, 0.0001d, 0.99d, 42)").as("sk"))
      .collect().map(_.getAs[Array[Byte]]("sk"))
    assert(dayBins.length > 1, "need >1 day for the merge to be real")
    val merged = dayBins.map(b =>
        org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(b)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    (0L until 20L).foreach { u =>
      assert(merged.estimateCount(u) == est(u),
        s"user $u: day-merged ${merged.estimateCount(u)} != one-shot ${est(u)}")
    }
  }

  test("a59 HLL set-algebra estimates within bounds of the exact set sizes") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sf)
    def users(t: String) = ev.filter(col("event_type") === t)
      .select("user_id").collect().map(_.getLong(0)).toSet
    val c = users("click"); val p = users("purchase")
    val row = Relational.queries("a59_hll_set_algebra")(spark, sf).head()
    val (ec, ep, eu, ei) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3))
    def within(est: Long, exact: Int, tol: Double, what: String): Unit =
      assert(math.abs(est - exact).toDouble / math.max(exact, 1) <= tol,
        s"$what: est=$est exact=$exact")
    within(ec, c.size, 0.05, "click")
    within(ep, p.size, 0.05, "purchase")
    within(eu, c.union(p).size, 0.05, "union")
    // inclusion–exclusion compounds three sketch errors — the bound
    // is on the UNION scale, not the intersection's own size
    assert(math.abs(ei - c.intersect(p).size).toDouble /
      math.max(c.union(p).size, 1) <= 0.10,
      s"intersection: est=$ei exact=${c.intersect(p).size}")
  }

  test("salted aggregation equals the plain aggregate") {
    val plain = Relational.queries("a1_grouped_avg")(spark, sf)
    val salted = Relational.queries("a15_salted_agg")(spark, sf)
    // a15 aggregates per event_type only; compare against a direct
    // unsalted computation with identical decimal-exact arithmetic
    import org.apache.spark.sql.functions._
    val direct = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(round(sum(col("value").cast("decimal(24,10)")).cast("double") /
        count(lit(1)), 6).as("avg_value"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val got = salted.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == direct)
    assert(plain.count() > 0)
  }

  test("f16 bitmap distinct is exact and bucket-spanning ids sum correctly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // natural user_ids may all fall inside ONE 2^15-id bitmap bucket,
    // leaving the cross-bucket sum untested — plant ids that span
    // three buckets (0, 40k, 70k) plus duplicates
    val d = SparkTestSession.fixtureDir("f16-fix")
    val ids = Seq(1L, 2L, 2L, 40000L, 40000L, 70000L, 70001L)
    ids.zipWithIndex.map { case (u, i) =>
      (i.toLong, new java.sql.Timestamp(1704067200000L + i * 86400000L),
        u, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = Relational.queries("f16_bitmap_funcs")(spark, d).head()
    assert(r.getLong(1) == 5L, s"n_users ${r.getLong(1)}")
    assert(r.getLong(2) == 5L && r.getBoolean(3))
    // and on the natural corpus the bitmap count must equal the
    // oracle-checked exact distinct (a6) per group
    val exact = Relational.queries("a6_distinct_count")(spark, sf)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    Relational.queries("f16_bitmap_funcs")(spark, sf).collect()
      .foreach { x =>
        assert(x.getLong(1) == exact(x.getString(0)), x.getString(0))
        assert(x.getBoolean(3), s"${x.getString(0)} merge_exact")
      }
  }
}
