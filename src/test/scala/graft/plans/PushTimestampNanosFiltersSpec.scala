package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkTestSession, Tables}

/** The nanos-pushdown optimizer rule: a NAIVE filter on the converted
  * ts column must gain pushed int64 bounds under the rule (and return
  * exactly the same rows), while the rule-less session keeps the
  * unpushed plan (asserted in TablesSpec).
  *
  * Runs on a separate `newSession()` so the shared test session's
  * optimizer is untouched.
  */
class PushTimestampNanosFiltersSpec extends AnyFunSuite {
  private lazy val base = SparkTestSession.spark
  private val sf = SparkTestSession.Sf0001

  private val Lo = "2024-01-10 00:00:00"
  private val Hi = "2024-01-20 00:00:00"

  private def naive(s: org.apache.spark.sql.SparkSession) =
    Tables.events(s, sf)
      .filter(col("ts") >= lit(Lo) && col("ts") < lit(Hi))
      .select("event_id")

  test("naive converted-ts filter gains pushed int64 bounds") {
    val s = base.newSession()
    s.experimental.extraOptimizations = Seq(PushTimestampNanosFilters)
    val scan = naive(s).queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PushedFilters")).get
    assert(scan.contains("GreaterThanOrEqual(ts") &&
           scan.contains("LessThan(ts"),
      s"rule did not push the bounds: $scan")
  }

  test("rule preserves results exactly") {
    val s = base.newSession()
    s.experimental.extraOptimizations = Seq(PushTimestampNanosFilters)
    val withRule = naive(s).collect().map(_.getLong(0)).sorted.toSeq
    val without = naive(base).collect().map(_.getLong(0)).sorted.toSeq
    assert(withRule.nonEmpty && withRule == without)
  }

  test("comparisons under OR are left alone (no unsound conjuncts)") {
    val s = base.newSession()
    s.experimental.extraOptimizations = Seq(PushTimestampNanosFilters)
    val df = Tables.events(s, sf)
      .filter(col("ts") >= lit(Lo) || col("event_type") === "click")
      .select("event_id")
    // the OR disjunct must NOT become a top-level pushed ts bound
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PushedFilters")).get
    assert(!scan.contains("GreaterThanOrEqual(ts,"), scan)
    // and results match the rule-less session
    val a = df.collect().map(_.getLong(0)).sorted.toSeq
    val b = Tables.events(base, sf)
      .filter(col("ts") >= lit(Lo) || col("event_type") === "click")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }
}
