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
  private val InferFromGenerate =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  /** Exclude Catalyst's InferFiltersFromGenerate for the session.
    *
    * The rule adds `size(e) > 0 AND isnotnull(e)` above every
    * `explode(e)` — pure pushdown bait. When `e` is a COMPUTED array
    * (this engine's dominant shape: shingle/token transforms built
    * inline from `text`), predicate pushdown then substitutes the
    * full expression into the filter, so the regex tokenize + lambda
    * transform chain is re-evaluated several times per row in an
    * interpreted (non-codegen) Filter before the Generate computes it
    * once more. Measured on d18 at sf0.1: the shingle explode alone
    * 9.2 s → 0.3 s, the whole query 15.5 s → 3.1 s once the rule is
    * excluded. The filters it would add only ever pay off for STORED
    * array columns (parquet isnotnull pushdown), which this engine's
    * query surface never explodes, so the exclusion is strictly a
    * win here; results are unaffected either way (outer=false
    * Generate drops null/empty inputs itself). Applied on every
    * table load (the Tables.events conf precedent) so any caller
    * session gets it without its own setup. */
  private def excludeInferFiltersFromGenerate(s: SparkSession): Unit = {
    val cur = s.conf.getOption("spark.sql.optimizer.excludedRules")
      .filter(_.nonEmpty)
    if (!cur.exists(_.split(",").map(_.trim).contains(InferFromGenerate)))
      s.conf.set("spark.sql.optimizer.excludedRules",
        (cur.toSeq :+ InferFromGenerate).mkString(","))
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    excludeInferFiltersFromGenerate(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")

  /** `events.ts` is parquet timestamp[us] written without the UTC
    * flag, which Spark 4 infers as TIMESTAMP_NTZ by default. The
    * engine's time semantics are session-UTC TimestampType throughout
    * (all sessions pin spark.sql.session.timeZone=UTC), so disable the
    * NTZ inference and read the column as plain TimestampType — the
    * wall-clock values are identical under UTC, every downstream
    * date_trunc/window/watermark behaves as documented, and ts
    * predicates push natively into the parquet scan (µs min/max
    * row-group stats prune). At production scale the table would also
    * be day-partitioned, adding partition pruning on top. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    table(s, d, "events")
  }

  /** Time-bounded events scan. With µs timestamps in the file the
    * bound is a plain comparison the file-source strategy pushes as
    * `PushedFilters: [GreaterThanOrEqual(ts,…), LessThan(ts,…)]` —
    * no raw-column rewrite needed (the historical int64-nanos layout
    * required one; see git history of this file). Bounds are UTC
    * "yyyy-MM-dd HH:mm:ss" strings (harness convention). */
  def eventsBetween(s: SparkSession, d: String,
                    loUtc: String, hiUtc: String): DataFrame = {
    import org.apache.spark.sql.functions._
    events(s, d)
      .filter(col("ts") >= to_timestamp(lit(loUtc)) &&
              col("ts") < to_timestamp(lit(hiUtc)))
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
