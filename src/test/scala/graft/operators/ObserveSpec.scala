package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.{SparkTestSession, Tables}

/** Single-pass QA counters via `Dataset.observe` — the 100 TB answer
  * to "how many rows / how much value did this write actually carry?":
  * at scale a separate audit aggregation re-reads the entire output;
  * `observe` attaches accumulator-backed metrics to the SAME pass the
  * action already makes, so the audit is free. The spec proves the
  * observed numbers equal an independent aggregation — i.e. the free
  * counters are the true counters.
  */
class ObserveSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf0001

  test("observe collects exact audit counters in the write pass itself") {
    val obs = Observation("qa")
    val kept = Tables.events(spark, sf)
      .filter(col("value") > 50)
      .select(col("event_id"), col("user_id"), col("value"))
      .observe(obs,
        count(lit(1)).as("n_rows"),
        round(sum(col("value")), 6).as("total_value"),
        // DISTINCT aggregates are not observable (they need a shuffle
        // the pass doesn't have) — the sketch form is, which is also
        // the 100 TB form
        approx_count_distinct(col("user_id"), 0.02).as("n_users"))
    // the one action a write job already performs — no second pass
    kept.write.format("noop").mode("overwrite").save()
    val m = obs.get
    // independent recomputation (its own scan) must agree exactly
    val check = Tables.events(spark, sf).filter(col("value") > 50)
      .agg(count(lit(1)), round(sum(col("value")), 6),
        count_distinct(col("user_id"))).head()
    assert(m("n_rows") == check.getLong(0))
    assert(m("total_value") == check.getDouble(1))
    val exactUsers = check.getLong(2).toDouble
    val approxUsers = m("n_users").asInstanceOf[Long].toDouble
    assert(math.abs(approxUsers - exactUsers) <= 0.05 * exactUsers,
      s"observed sketch $approxUsers vs exact $exactUsers")
    assert(m("n_rows").asInstanceOf[Long] > 0)
  }
}
