package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference tokenizer
  * (/root/reference/src/core/tokenizer.cpp:3-25) — BYTE-wise over the
  * UTF8String's raw bytes, which is exactly the reference's `unsigned char`
  * scan: ASCII alnum bytes are kept (ASCII-lowercased), every other byte
  * (including every byte of a multibyte UTF-8 char) is a separator. Token
  * bytes are pure-ASCII so slicing the byte array is always valid UTF-8.
  *
  * `doGenCode` emits a direct static call, so the expression stays inside
  * whole-stage codegen (no UDF serialization, no Row boxing) — this is the
  * hot inner loop of the 100 TB index build.
  */
case class RefTokenize(child: Expression) extends UnaryExpression {
  // (ExpectsInputTypes is sealed behind private[sql] AbstractDataType in
  // Spark 4 — input typing is enforced at construction instead)
  require(child.dataType == StringType, s"ref_tokenize expects STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ref_tokenize"

  override def nullSafeEval(input: Any): Any =
    RefTokenize.tokenizeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.RefTokenize.tokenizeUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): RefTokenize =
    copy(child = newChild)
}

object RefTokenize {

  /** Byte-wise reference tokenization over a UTF8String. */
  def tokenizeUtf8(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var start = -1
    var i = 0
    var dirty = false // current token contains uppercase -> needs copy
    while (i < n) {
      val b = bytes(i)
      val isDigit = b >= '0' && b <= '9'
      val isLower = b >= 'a' && b <= 'z'
      val isUpper = b >= 'A' && b <= 'Z'
      if (isDigit || isLower || isUpper) {
        if (start < 0) { start = i; dirty = false }
        if (isUpper) dirty = true
      } else if (start >= 0) {
        out += slice(bytes, start, i, dirty)
        start = -1
      }
      i += 1
    }
    if (start >= 0) out += slice(bytes, start, n, dirty)
    new GenericArrayData(out.toArray)
  }

  private def slice(bytes: Array[Byte], from: Int, until: Int, lower: Boolean): UTF8String = {
    val len = until - from
    val tok = new Array[Byte](len)
    System.arraycopy(bytes, from, tok, 0, len)
    if (lower) {
      var j = 0
      while (j < len) {
        val b = tok(j)
        if (b >= 'A' && b <= 'Z') tok(j) = (b + 32).toByte
        j += 1
      }
    }
    UTF8String.fromBytes(tok)
  }

  /** Register as a SQL function: `SELECT ref_tokenize(text) ...`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ref_tokenize_native",
      (exprs: Seq[Expression]) => RefTokenize(exprs.head),
      "scala_udf"
    )
}
