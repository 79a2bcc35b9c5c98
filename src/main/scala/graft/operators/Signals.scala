package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Signal generation: threshold predicates (P5), the conditional
  * BUY/SELL/HOLD CASE expression with inverse-flip on correlation sign
  * (P8), and the per-key config broadcast join (J5).
  *
  * Reference: `scripts/06_strategy_signals.py:88-150` — per-ticker best
  * lag config is applied to every daily sentiment row; sentiment above
  * +τ with enough news ⇒ BUY (direct) or SELL (inverse when the
  * fitted correlation is negative), below −τ the reverse, else HOLD.
  *
  * Scale: the config side is a per-key aggregate (|keys| rows) —
  * explicitly `broadcast()` so the fact side never shuffles for the
  * join; the daily aggregate before it is map-side combinable.
  */
object Signals {

  private def r6(c: Column): Column = round(c, 6)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p8_signal_pipeline" -> ((s, d) => {
      val ev = Tables.events(s, d)
      // J5 config side: per-key correlation (sign drives the flip).
      val cfg = ev
        .select(col("event_type"), col("value"),
          get_json_object(col("props"), "$.k").cast("double").as("k"))
        .groupBy(col("event_type"))
        .agg(corr(col("value"), col("k")).as("r"))
      // Daily sentiment-like aggregate per key.
      val dailyAgg = ev
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(avg(col("value")).as("avg_v"), count(lit(1)).as("n"))
        .withColumn("sent", col("avg_v") / 100.0 - 1)
      val inverse = col("r") < 0
      // P5 threshold gates + P8 nested CASE with inverse flip.
      val signal =
        when(col("n") < 5, "HOLD")
          .when(col("sent") > 0.1, when(inverse, "SELL").otherwise("BUY"))
          .when(col("sent") < -0.1, when(inverse, "BUY").otherwise("SELL"))
          .otherwise("HOLD")
      dailyAgg.join(broadcast(cfg), Seq("event_type"))
        .select(col("event_type"), col("day"), r6(col("sent")).as("sent"),
          col("n"), signal.as("signal"),
          when(inverse, "inverse").otherwise("direct").as("signal_type"))
        .orderBy("event_type", "day")
    })
  )

  val oracles: Map[String, String] = Map(
    "p8_signal_pipeline" ->
      """WITH cfg AS (
           SELECT event_type,
                  corr(value, CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS r
           FROM events GROUP BY 1),
         daily AS (
           SELECT event_type, date_trunc('day', ts) AS day,
                  avg(value) / 100.0 - 1 AS sent, count(*) AS n
           FROM events GROUP BY 1, 2)
         SELECT d.event_type, d.day, round(d.sent, 6) AS sent, d.n,
                CASE WHEN d.n < 5 THEN 'HOLD'
                     WHEN d.sent > 0.1 THEN
                       CASE WHEN c.r < 0 THEN 'SELL' ELSE 'BUY' END
                     WHEN d.sent < -0.1 THEN
                       CASE WHEN c.r < 0 THEN 'BUY' ELSE 'SELL' END
                     ELSE 'HOLD' END AS signal,
                CASE WHEN c.r < 0 THEN 'inverse' ELSE 'direct' END AS signal_type
         FROM daily d JOIN cfg c ON d.event_type = c.event_type
         ORDER BY d.event_type, d.day"""
  )
}
