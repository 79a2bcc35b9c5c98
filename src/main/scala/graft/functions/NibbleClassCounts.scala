package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MM8/MM13's byte-class histogram kernel: the 16-slot high-nibble
  * class counts of a string's UTF-8 bytes in one compiled pass.
  *
  * Replaces the relational scan stack (hex(encode(text)) →
  * regexp_replace("(.).", "$1") to keep the high-nibble chars → 16
  * separate `length(hs) - length(replace(hs, c, ''))` full-string
  * scans, i.e. ~18 passes and two O(2L) temporary strings per row)
  * with a single O(L) loop over the raw bytes.
  *
  * Exactness contract: slot i (0..15) holds the exact count of bytes
  * whose high nibble is i — the same quantity the replace()-scan form
  * counts for hex char "0123456789ABCDEF"(i), in the same index
  * order. Counts are exact longs; the 16-element array is always
  * dense (zero slots included) so MM13's positional fold reads
  * identically and MM8's `filter(x > 0)` reproduces its non-zero
  * list in the same order. Empty input → all-zero array (callers
  * filter octet_length > 0 first, as before).
  */
object NibbleClassKernel {
  def classCounts(bytes: Array[Byte]): GenericArrayData = {
    val counts = new Array[Long](16)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) >>> 4) & 0xf) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }
}

case class NibbleClassCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nibble_class_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING input, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    NibbleClassKernel.classCounts(t.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // Static forwarder, not MODULE$ — janino rejects the Scala-object
    // form (see the PearsonPValue.doGenCode note).
    val kernel = NibbleClassKernel.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $kernel.classCounts($t.getBytes());")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NibbleClassCounts = copy(child = newChild)
}

object NibbleClassCounts {
  /** Column-API entry point: dense 16-slot high-nibble class counts
    * (index order 0x0..0xF) of a string column's UTF-8 bytes. */
  def counts(text: Column): Column =
    ColumnBridge.column(NibbleClassCounts(ColumnBridge.expression(text)))
}
