package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkTestSession, Tables}

/** Real Structured Streaming executions (T1/T2/T6): a readStream →
  * event-time window agg → checkpointed memory sink run must equal
  * the batch aggregate over the same data, and a kill/resume on the
  * same checkpoint must recover offsets + state (T2) — the Spark
  * re-expression of the reference's poll-loop + offset semantics
  * (`ingestion/producer.py:184-197`).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf0001

  private def batchExpected: Set[(String, String, Long, Double)] =
    Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(24,10)")).cast("double") /
          count(lit(1)), 6).as("avg_value"))
      .select(col("w.start").cast("string"), col("event_type"),
        col("n"), col("avg_value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("win_start").cast("string"), col("event_type"),
        col("n"), col("avg_value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("T1: a real streaming run equals the batch aggregate") {
    val streamed = asSet(EventStream.runStreamingAgg(spark, sf))
    assert(streamed == batchExpected)
  }

  test("T2: kill + resume from checkpoint reconstructs the full result") {
    // runCheckpointResume feeds the chronological first half, stops the
    // query, appends the second half, and restarts on the SAME
    // checkpoint. Equality with the full-data batch aggregate holds
    // only if file-source offsets and aggregation state both recover.
    val resumed = asSet(EventStream.runCheckpointResume(spark, sf))
    assert(resumed == batchExpected)
  }

  test("T6: watermarked streaming dedup+agg runs and stays bounded") {
    // The watermarked form (dropDuplicates under a 2-day watermark)
    // through a real streaming execution: drop events as JSON, run
    // dedupWindowAgg via readStream in update-less complete mode.
    val base = java.nio.file.Files.createTempDirectory("t6-stream").toFile
    val src = s"$base/src"; val ckpt = s"$base/ckpt"
    Tables.events(spark, sf).coalesce(1).write.mode("overwrite").json(src)
    val q = EventStream.dedupWindowAgg(EventStream.readJsonStream(spark, src))
      .writeStream.format("memory").queryName("t6_mem")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // sf0.001 has no duplicate event_ids → dedup is the identity and
    // the watermarked streaming result equals the plain batch agg.
    assert(asSet(spark.table("t6_mem")) == batchExpected)
  }
}
