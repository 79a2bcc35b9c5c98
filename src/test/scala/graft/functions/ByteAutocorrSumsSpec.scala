package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.SparkTestSession

/** MM14's lag-1 byte-sum kernel: the codegen single pass agrees
  * bit-for-bit (exact BIGINTs) with the retired HOF formulation on the
  * real corpus and on crafted edge rows, stays total on rows the
  * query's filter later drops (L < 2), and the struct field order/
  * types match what the query projects.
  */
class ByteAutocorrSumsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** The retired HOF formulation, kept VERBATIM as the anchor (the
    * formulation whose sums the DuckDB oracle replays). */
  private def hofSums(text: Column): Seq[Column] = {
    val bv = transform(split(text, ""), c => ascii(c).cast("long"))
    val np = (length(text) - 1).cast("long")
    val x = slice(bv, lit(1), greatest(np, lit(0L)).cast("int"))
    val y = slice(bv, lit(2), greatest(np, lit(0L)).cast("int"))
    Seq(np.as("np"),
      aggregate(x, lit(0L), (acc, v) => acc + v).as("sx"),
      aggregate(y, lit(0L), (acc, v) => acc + v).as("sy"),
      aggregate(x, lit(0L), (acc, v) => acc + v * v).as("sxx"),
      aggregate(y, lit(0L), (acc, v) => acc + v * v).as("syy"),
      aggregate(zip_with(x, y, (a, b) => a * b),
        lit(0L), (acc, v) => acc + v).as("sxy"))
  }

  private val fields = Seq("np", "sx", "sy", "sxx", "syy", "sxy")

  test("kernel equals the HOF fold exactly on the real ASCII corpus") {
    val docs = graft.Tables.documents(spark, SparkTestSession.Sf0001)
      .filter(length(col("text")) >= 2 &&
        octet_length(encode(col("text"), "UTF-8")) === length(col("text")))
    val rows = docs.select(
      (col("doc_id") +: fields.map(f =>
        ByteAutocorrSums.sums(col("text")).getField(f).as(s"k_$f"))) ++
        hofSums(col("text")): _*)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      fields.zipWithIndex.foreach { case (f, i) =>
        assert(r.getLong(1 + i) == r.getLong(1 + fields.size + i),
          s"doc ${r.getLong(0)} field $f: kernel ${r.getLong(1 + i)} vs " +
            s"hof ${r.getLong(1 + fields.size + i)}")
      }
    }
  }

  test("edge rows: short strings are total, sums are exact") {
    import spark.implicits._
    val df = Seq("", "a", "ab", "aba", "!!  zz").toDF("text")
    val got = df.select(col("text"),
      ByteAutocorrSums.sums(col("text")).as("m")).collect()
    def sums(s: String): (Long, Long, Long, Long, Long, Long) = {
      val b = s.getBytes("UTF-8").map(v => (v & 0xff).toLong)
      val pairs = if (b.length < 2) Array.empty[(Long, Long)]
        else b.dropRight(1).zip(b.drop(1))
      (s.length - 1L, pairs.map(_._1).sum, pairs.map(_._2).sum,
        pairs.map(p => p._1 * p._1).sum, pairs.map(p => p._2 * p._2).sum,
        pairs.map(p => p._1 * p._2).sum)
    }
    got.foreach { r =>
      val m = r.getStruct(1)
      val e = sums(r.getString(0))
      assert((m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3),
        m.getLong(4), m.getLong(5)) == e, s"text '${r.getString(0)}'")
    }
  }

  test("mm14 query output is unchanged by the kernel swap (sf0.001)") {
    // full-query anchor: recompute the retired formulation end to end
    // and compare the emitted (doc_id, np, autocorr) rows exactly
    val d = SparkTestSession.Sf0001
    val hof = graft.Tables.documents(spark, d)
      .filter(length(col("text")) >= 2 &&
        octet_length(encode(col("text"), "UTF-8")) === length(col("text")))
      .select(col("doc_id") +: hofSums(col("text")): _*)
      .withColumn("vx", col("np") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("np") * col("syy") - col("sy") * col("sy"))
      .filter(col("vx") > 0 && col("vy") > 0)
      .select(col("doc_id"), col("np"),
        ((col("np") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt(col("vx").cast("double")) *
            sqrt(col("vy").cast("double")))).as("autocorr"))
      .orderBy("doc_id").collect()
    val got = graft.operators.Multimodal.queries("mm14_byte_autocorr")(
      spark, d).collect()
    assert(got.length == hof.length && got.nonEmpty)
    got.zip(hof).foreach { case (g, h) =>
      assert(g.getLong(0) == h.getLong(0))
      assert(g.getLong(1) == h.getLong(1))
      assert(g.getDouble(2) == h.getDouble(2)) // bit-for-bit
    }
  }
}
