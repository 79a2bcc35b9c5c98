package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Sources & sinks beyond the base parquet scan: parquet write (S2),
  * partitioned write (S3), CSV write+scan (S4/S5), JSON write+read
  * (S6/S7), and the chart-data sink queries (S14).
  *
  * Reference: per-stage parquet persistence `scripts/02_fetch_news.py:131`,
  * per-ticker partitioned write `:139-144`, CSV trade/equity logs
  * `scripts/07_backtest.py:435-441` re-read by `scripts/08_visualize_
  * equity.py:14-19`, JSON metric sinks `scripts/07_backtest.py:429-432`.
  *
  * Each query is a write→read-back roundtrip into a per-query temp dir,
  * so the oracle (plain SELECT on the original table) verifies the
  * sink preserves values exactly. Roundtrips write with an explicit
  * schema on re-read — never inference — per the 100 TB rule that
  * schema is declared, not discovered.
  */
object SourceSinks {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2: parquet write + read back.
    "s2_parquet_roundtrip" -> ((s, d) => {
      val out = tmp("s2")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).orderBy("o_orderkey")
    }),

    // S3: partitioned write (partition column round-trips through the
    // directory layout; read back restores it — cast to original type).
    "s3_partitioned_write" -> ((s, d) => {
      val out = tmp("s3")
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
        .write.mode("overwrite").partitionBy("event_type").parquet(out)
      s.read.parquet(out)
        .select(col("event_id"), col("event_type").cast("string"),
          col("value"))
        .orderBy("event_id")
    }),

    // S4+S5: CSV write then schema'd scan (header, explicit schema —
    // timestamps serialize ISO and parse back exactly).
    "s4_csv_roundtrip" -> ((s, d) => {
      val out = tmp("s4")
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .write.mode("overwrite").option("header", "true").csv(out)
      val schema = StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_acctbal", DoubleType)))
      s.read.option("header", "true").schema(schema).csv(out)
        .orderBy("c_custkey")
    }),

    // S6+S7: JSON write then schema'd read.
    "s6_json_roundtrip" -> ((s, d) => {
      val out = tmp("s6")
      Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .write.mode("overwrite").json(out)
      val schema = StructType(Seq(
        StructField("s_suppkey", LongType),
        StructField("s_name", StringType),
        StructField("s_acctbal", DoubleType)))
      s.read.schema(schema).json(out).orderBy("s_suppkey")
    }),

    // S14: chart-data sink — the exact per-day series a dashboard equity
    // chart consumes (scripts/08_visualize_equity.py data prep).
    "s14_chart_data" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(round(sum(col("value")), 6).as("total_value"),
          count(lit(1)).as("n_events"))
        .orderBy("day"))
  )

  val oracles: Map[String, String] = Map(
    "s2_parquet_roundtrip" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
         ORDER BY o_orderkey""",
    "s3_partitioned_write" ->
      """SELECT event_id, event_type, value FROM events ORDER BY event_id""",
    "s4_csv_roundtrip" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         ORDER BY c_custkey""",
    "s6_json_roundtrip" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
         ORDER BY s_suppkey""",
    "s14_chart_data" ->
      """SELECT date_trunc('day', ts) AS day,
                round(sum(value), 6) AS total_value, count(*) AS n_events
         FROM events GROUP BY 1 ORDER BY day"""
  )
}
