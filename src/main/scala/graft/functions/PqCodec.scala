package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Product-quantization kernels (Jégou, Douze & Schmid 2011, public
  * algorithm) behind SIM6. The encode/LUT arithmetic originally lived
  * as ~270 inlined Column expressions per row — which blew whole-stage
  * codegen past janino's 64 KB method limit and forced interpreted
  * fallback; as a static compiled kernel behind two thin codegen
  * expressions (the DotProduct pattern), the generated code is ONE
  * call per row and the stage stays inside whole-stage codegen.
  *
  * Float discipline (what makes SIM6 fully oracle-checkable): every
  * sum runs in index order (while-loops ≡ DuckDB's list_sum), the
  * squared distance uses the expansion (‖x_j‖² − 2·x_j·c) + ‖c‖² in
  * exactly that association, and argmin takes the FIRST minimal code —
  * all mirrored verbatim by the SQL oracle, so codes and LUT values
  * are bit-identical across engines.
  */
object PqKernel {

  /** Immutable codebook: cb(j)(c) = the d-dim code c of subspace j;
    * ships to executors once per plan as a codegen reference object. */
  final class Book(val cb: Array[Array[Array[Double]]]) extends Serializable {
    val m: Int = cb.length
    val k: Int = cb(0).length
    val d: Int = cb(0)(0).length
    /** ‖code‖² per (j, c), index-order sums. */
    val cn2: Array[Array[Double]] = cb.map(_.map { cv =>
      var s = 0.0; var i = 0
      while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
      s
    })
  }

  private def toDoubles(a: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      out(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    out
  }

  /** 1-based nearest-code per subspace. */
  def encode(b: Book, x: Array[Double]): Array[Long] = {
    val codes = new Array[Long](b.m)
    var j = 0
    while (j < b.m) {
      val off = j * b.d
      var xx = 0.0
      var i = 0
      while (i < b.d) { val v = x(off + i); xx += v * v; i += 1 }
      var best = 0; var bestD = Double.PositiveInfinity
      var c = 0
      while (c < b.k) {
        val cv = b.cb(j)(c)
        var xc = 0.0
        i = 0
        while (i < b.d) { xc += x(off + i) * cv(i); i += 1 }
        val d2 = (xx - 2.0 * xc) + b.cn2(j)(c)
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(j) = best + 1L
      j += 1
    }
    codes
  }

  /** Flat ADC lookup table: lut(j·k + c) = x_j · code(j, c). */
  def luts(b: Book, x: Array[Double]): Array[Double] = {
    val out = new Array[Double](b.m * b.k)
    var j = 0
    while (j < b.m) {
      val off = j * b.d
      var c = 0
      while (c < b.k) {
        val cv = b.cb(j)(c)
        var s = 0.0
        var i = 0
        while (i < b.d) { s += x(off + i) * cv(i); i += 1 }
        out(j * b.k + c) = s
        c += 1
      }
      j += 1
    }
    out
  }

  // ArrayData entry points for the generated code: one static call per
  // row; null element or length mismatch → null result.
  def encodeArray(b: Book, a: ArrayData, isFloat: Boolean): ArrayData = {
    val x = toDoubles(a, isFloat)
    if (x == null || x.length != b.m * b.d) null
    else new GenericArrayData(encode(b, x))
  }
  def lutArray(b: Book, a: ArrayData, isFloat: Boolean): ArrayData = {
    val x = toDoubles(a, isFloat)
    if (x == null || x.length != b.m * b.d) null
    else new GenericArrayData(luts(b, x))
  }
}

/** Shared shape of the two PQ expressions: vector column in, array
  * out, kernel referenced as a codegen object. */
abstract class PqCodecExpression extends UnaryExpression {
  def book: PqKernel.Book
  protected def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects ARRAY<FLOAT|DOUBLE>, got ${t.sql}")
    }
  protected def kernelMethod: String // encodeArray | lutArray

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", book,
      classOf[PqKernel.Book].getName)
    val kernel = PqKernel.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  $kernel.$kernelMethod($bookRef, $a, $isFloat);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })
  }
}

/** codes(j) ∈ [1, k] per subspace — ARRAY<BIGINT> of length m. */
case class PqEncode(child: Expression, book: PqKernel.Book)
    extends PqCodecExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override protected def kernelMethod: String = "encodeArray"
  override def nullSafeEval(a: Any): Any =
    PqKernel.encodeArray(book, a.asInstanceOf[ArrayData], isFloat)
  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** Flat ADC LUT — ARRAY<DOUBLE> of length m·k, indexed j·k + c. */
case class PqLuts(child: Expression, book: PqKernel.Book)
    extends PqCodecExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_luts"
  override protected def kernelMethod: String = "lutArray"
  override def nullSafeEval(a: Any): Any =
    PqKernel.lutArray(book, a.asInstanceOf[ArrayData], isFloat)
  override protected def withNewChildInternal(c: Expression): PqLuts =
    copy(child = c)
}

object PqCodec {
  def encode(book: PqKernel.Book)(v: Column): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), book))
  def luts(book: PqKernel.Book)(v: Column): Column =
    ColumnBridge.column(PqLuts(ColumnBridge.expression(v), book))
}
