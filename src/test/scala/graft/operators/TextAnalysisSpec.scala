package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Cross-anchor for the rows-only F7: on text whose tokens are only
  * F6-lexicon words plus out-of-lexicon fillers — no negators,
  * boosters, case mixing, punctuation, or "but" — the full VADER rule
  * engine must reduce to exactly the oracle-checked F6 lexicon sum
  * (both are Σvalence → s/sqrt(s²+15), rounded to 1e-6). This pins
  * the codegen expression path to the DuckDB-verified relational plan
  * on the rule-free subset; rule behavior itself is golden-tested in
  * VaderSpec.
  */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs(rows: (Long, String)*): String = {
    val d = SparkTestSession.fixtureDir("txt-fix")
    import spark.implicits._
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("f7 rule engine equals oracle-checked f6 on rule-free F6 text") {
    // every sentiment-bearing token is in the F6 set (which wins the
    // lexicon merge), fillers are in no lexicon at all
    val d = docs(
      1L -> "good fast query",
      2L -> "bad slow scan with the table",
      3L -> "merge sort hash data",
      4L -> "terrible error stream value",
      5L -> "data table row")
    val f6 = TextAnalysis.queries("f6_sentiment_lexicon")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val f7 = TextAnalysis.queries("f7_vader_rules")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(f6.keySet == f7.keySet)
    f6.foreach { case (id, c6) =>
      assert(f7(id) == c6, s"doc $id: f7=${f7(id)} vs f6=$c6")
    }
    // non-vacuous: the fixture spans positive, negative and neutral
    assert(f6(1L) > 0 && f6(2L) < 0 && f6(5L) == 0.0)
  }
}
