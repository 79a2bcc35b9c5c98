package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
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

  test("s22 z-order concentrates a value slice that a user_id sort spreads") {
    val zdir = SourceSinks.zorderDir(spark, sf)
    // the single-column alternative: same data, same file count,
    // range-sorted by user_id alone
    val lin = SparkTestSession.fixtureDir("s22-linear")
    graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(lin)
    // files containing any matching row — the lower bound on what any
    // min-max-stats reader must open for this predicate. The slice
    // must be selective in DATA MASS, not column range: value ≥ 200
    // holds ~3% of rows (the value distribution is skewed low), so a
    // clustered layout CAN concentrate it — a slice holding half the
    // mass must occupy half of any equal-size layout
    def touched(dir: String): Long =
      spark.read.parquet(dir).filter(col("value").between(200, 340))
        .select(input_file_name()).distinct().count()
    val zt = touched(zdir)
    val lt = touched(lin)
    // user-sorted files each span the full value range → the slice
    // lives in most files; z-files are value-bounded rectangles → the
    // slice concentrates
    assert(lt >= 10, s"user_id-sorted layout should spread the slice: $lt")
    assert(zt <= 4, s"z-layout should bound the slice: $zt files")
    assert(zt < lt, s"z-order must beat the single-column sort: $zt vs $lt")
    // content is layout-invariant (the oracle proves this vs the
    // source table; here vs the linear layout directly)
    val a = spark.read.parquet(zdir).orderBy("event_id").collect()
    val b = spark.read.parquet(lin).orderBy("event_id").collect()
    assert(a.sameElements(b), "z-ordering must not change content")
  }
}
