package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dataset-assembly operators a training-data pipeline needs between
  * cleaning and writing shards: deterministic train/validation
  * splitting and class-balanced downsampling. Both are expressed over
  * md5 — the one hash both engines share — so unlike the xxhash64
  * paths these are FULLY oracle-checked, and both are reproducible by
  * construction (no RNG state: the split of a row is a pure function
  * of its key, stable across reruns, partitionings, and engines).
  *
  * Scale notes: DS1 is a stateless map + hash agg — nothing shuffles
  * but the per-split counters. DS2's exact per-class k is a windowed
  * rank — one shuffle by class, and a skewed class lands on one
  * reducer; at 100 TB the constant-FRACTION form (filter on the hash
  * like DS1, no shuffle at all) replaces exact-k unless a hard row
  * budget is contractual — both forms are deterministic, which is the
  * property that matters (the reference has no sampling story at all;
  * this is the builder-brief training-pipeline extension).
  */
object DatasetOps {

  /** Leakage-free split assignment: hash the GROUP key (user), not the
    * row, so every row of a user lands in the same split — split
    * leakage across correlated rows is the classic eval bug this
    * prevents. First hex char < 'd' ⇒ train: 13/16 = 81.25% expected
    * mass, realized proportions depend on the key distribution. */
  private[operators] def split(key: Column): Column =
    when(substring(md5(key.cast("string")), 1, 1) < "d", "train")
      .otherwise("val")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DS1: deterministic group-aware train/val split — per-split row
    // and group accounting (the audit a split job emits).
    "ds1_hash_split" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("split", split(col("user_id")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("split")),

    // DS2: class-balanced downsample — exactly k rows per class,
    // chosen by deterministic hash order (not "first k seen", which
    // would bias toward whatever the scan order favors).
    "ds2_balanced_sample" -> ((s, d) => {
      val k = 100
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
        .orderBy(md5(col("event_id").cast("string")), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy("event_type", "event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "ds1_hash_split" ->
      """WITH tagged AS (
           SELECT user_id,
                  CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < 'd'
                       THEN 'train' ELSE 'val' END AS split
           FROM events)
         SELECT split, count(*) AS n_rows,
                count(DISTINCT user_id) AS n_users
         FROM tagged GROUP BY split ORDER BY split""",
    "ds2_balanced_sample" ->
      """SELECT event_id, event_type, value FROM (
           SELECT event_id, event_type, value,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
           FROM events)
         WHERE rn <= 100
         ORDER BY event_type, event_id"""
  )
}
