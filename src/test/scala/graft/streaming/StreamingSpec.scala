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

  test("T8: flatMapGroupsWithState tallies survive a checkpoint restart") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("t8-stream").toFile
    val src = s"$base/src"; val ckpt = s"$base/ckpt"
    val h1 = s"$base/h1"; val h2 = s"$base/h2"
    val ev = Tables.events(spark, sf)
    val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
    ev.filter(col("event_id") <= maxId / 2)
      .coalesce(1).write.mode("overwrite").json(h1)
    ev.filter(col("event_id") > maxId / 2)
      .coalesce(1).write.mode("overwrite").json(h2)

    def copyParts(from: String): Unit = {
      val dst = new java.io.File(src); dst.mkdirs()
      Option(new java.io.File(from).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".json"))
        .foreach(f => java.nio.file.Files.copy(f.toPath,
          new java.io.File(dst, f.getName).toPath))
    }
    // the memory sink refuses checkpoint RECOVERY outside Complete
    // mode, so the restart test collects run-2 emissions through a
    // foreachBatch sink (which is recovery-capable) into a buffer
    val got = scala.collection.mutable.ArrayBuffer
      .empty[EventStream.KeyTally]
    def runOnce(collect: Boolean): Unit = {
      val q = EventStream.statefulTally(
          EventStream.readJsonStream(spark, src).as[EventStream.Event])
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[EventStream.KeyTally],
           _: Long) =>
            val rows = df.collect()
            if (collect) got.synchronized { got ++= rows }
            ()
        }
        .start()
      q.awaitTermination()
    }
    copyParts(h1); runOnce(collect = false)  // first run: first half only
    copyParts(h2); runOnce(collect = true)   // restart on the SAME ckpt

    // run-2 emits one updated tally per key that had new rows. If
    // state recovered, each of those tallies covers BOTH halves; if
    // it didn't, a key spanning the split reports only its
    // second-half count.
    val full = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"), max(col("value")).as("mx"),
        min(col("value")).as("mn"), max(col("event_id")).as("lid"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toMap
    val run2 = got.groupBy(_.user_id).map { case (k, ts) =>
      // keep-final if AvailableNow sliced run 2 into several batches
      val t = ts.maxBy(_.n_events)
      k -> (t.n_events, t.max_value, t.min_value, t.last_event_id)
    }
    // non-vacuous: at least one key must span both halves
    val h1Keys = spark.read.schema(EventStream.eventSchema).json(h1)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(run2.keySet.exists(h1Keys), "no key spans the restart — vacuous")
    run2.foreach { case (k, tally) =>
      assert(tally == full(k), s"key $k: run-2 tally $tally != full ${full(k)}")
    }
  }
}
