package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lazy loaders for the harness tables (TESTDATA.md / FIXTURES.md §A).
  *
  * One parquet file per table under the scale-factor dir. Parquet carries
  * the authoritative schema; each load is a lazy scan that Catalyst
  * prunes columns from and pushes predicates into — callers should
  * `select`/`filter` early so the parquet reader sees it
  * (`PushedFilters`/`ReadSchema` in explain output).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. The data is microsecond-precision (verified: no
    * sub-µs component), so read nanos as long and convert losslessly.
    * Trade-off: `ts` predicates no longer push into the parquet scan —
    * at production scale the table would be written with µs timestamps
    * and partitioned by day, restoring pushdown + partition pruning. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Time-bounded events scan WITH parquet pushdown: a filter written
    * against the converted `ts` cannot push through
    * `timestamp_micros(ts div 1000)`, so every time-filtered query
    * would full-scan. Here the [lo, hi) bound is translated to raw
    * nanos and applied to the long column BEFORE conversion — it
    * reaches the reader as `PushedFilters: [GreaterThanOrEqual(ts,…),
    * LessThan(ts,…)]` and prunes row groups via int64 min/max stats.
    * At production scale the table would also be day-partitioned,
    * adding partition pruning on top. Bounds are UTC
    * "yyyy-MM-dd HH:mm:ss" strings (harness convention). */
  def eventsBetween(s: SparkSession, d: String,
                    loUtc: String, hiUtc: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    def ns(t: String): Long =
      java.time.LocalDateTime.parse(t.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L
    table(s, d, "events")
      .filter(col("ts") >= ns(loUtc) && col("ts") < ns(hiUtc))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  /** documents.text drives per-row-CPU operators (fingerprinting,
    * tokenization, sentiment), whose parallelism comes entirely from
    * input splits: the testdata corpus sits in ONE parquet file, so a
    * CPU-bound stage over it runs one task unless the file exceeds
    * maxPartitionBytes. At scale the corpus is expected to be written
    * as many files (any partitioned/bucketed ingest does this), which
    * is the correct fix — operators here deliberately do NOT each
    * carry a repartition() band-aid, since an extra full-corpus
    * shuffle ahead of a map-only stage is exactly what a 100 TB plan
    * must not pay. (The one historical exception, txt6's repartition,
    * was removed when its codegen kernel made the stage cheap.) */
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
