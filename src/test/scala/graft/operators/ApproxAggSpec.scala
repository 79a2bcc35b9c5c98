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
}
