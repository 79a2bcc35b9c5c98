package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Layout-level assertions for the lake-maintenance sinks — the part
  * a content-only oracle compare cannot see.
  */
class SourceSinksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf0001

  private def partFiles(dir: String): Int =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .count(_.getName.endsWith(".parquet"))

  test("s19 compaction collapses 64 files to 2 with identical content") {
    val frag = SourceSinks.fragmentedDir(spark, sf)
    assert(partFiles(frag) == 64, s"fixture fragmentation: ${partFiles(frag)}")
    val out = SparkTestSession.fixtureDir("s19-spec")
    SourceSinks.compact(spark, frag, out)
    assert(partFiles(out) == 2, s"compacted layout: ${partFiles(out)}")
    // content identity — the oracle proves this against the source
    // table; here against the fragmented layout directly
    val a = spark.read.parquet(frag).orderBy("event_id").collect()
    val b = spark.read.parquet(out).orderBy("event_id").collect()
    assert(a.sameElements(b), "compaction must not change content")
  }
}
