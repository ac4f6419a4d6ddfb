package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused reference-tokenize + per-doc term-frequency expression: one byte
  * scan of the text yields struct<dl: int, tfmap: map<string,int>> — the two
  * columns the docstore materializes for the segment build. Replaces the
  * RefTokenize array + Scala-UDF-HashMap pair on the build hot path: no
  * intermediate token ArrayData, no UDF boundary (catalyst<->scala array and
  * map conversions per document), and `doGenCode` keeps the whole projection
  * inside whole-stage codegen. Token semantics identical to RefTokenize
  * (byte-wise ASCII alnum runs, ASCII-lowercased —
  * /root/reference/src/core/tokenizer.cpp:3-25); parity asserted in
  * RefTokenizeSpec.
  */
case class RefTokenizeTf(child: Expression) extends UnaryExpression {
  require(child.dataType == StringType, s"ref_tokenize_tf expects STRING, got ${child.dataType}")

  override def dataType: DataType = RefTokenizeTf.outType
  override def prettyName: String = "ref_tokenize_tf"

  override def nullSafeEval(input: Any): Any =
    RefTokenizeTf.tokenizeCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.RefTokenizeTf.tokenizeCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): RefTokenizeTf =
    copy(child = newChild)
}

object RefTokenizeTf {

  val outType: StructType = StructType(Seq(
    StructField("dl", IntegerType, nullable = false),
    StructField("tfmap", MapType(StringType, IntegerType, valueContainsNull = false), nullable = false)
  ))

  /** One pass: byte-wise reference tokenization, counting term frequencies
    * directly (first-occurrence key order — deterministic for a given text).
    */
  def tokenizeCounts(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    val counts = new java.util.LinkedHashMap[UTF8String, Int](16)
    var dl = 0
    var start = -1
    var dirty = false // current token contains uppercase -> lowercase on slice

    @inline def flush(until: Int): Unit = {
      val tok = slice(bytes, start, until, dirty)
      // unboxToInt(null) == 0, and a present count is always >= 1
      counts.put(tok, counts.get(tok) + 1)
      dl += 1
      start = -1
    }

    var i = 0
    while (i < n) {
      val b = bytes(i)
      val isDigit = b >= '0' && b <= '9'
      val isLower = b >= 'a' && b <= 'z'
      val isUpper = b >= 'A' && b <= 'Z'
      if (isDigit || isLower || isUpper) {
        if (start < 0) { start = i; dirty = false }
        if (isUpper) dirty = true
      } else if (start >= 0) flush(i)
      i += 1
    }
    if (start >= 0) flush(n)

    val m = counts.size()
    val keys = new Array[Any](m)
    val vals = new Array[Any](m)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue
      j += 1
    }
    new GenericInternalRow(Array[Any](
      dl,
      new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
    ))
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

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ref_tokenize_tf",
      (exprs: Seq[Expression]) => RefTokenizeTf(exprs.head),
      "scala_udf"
    )
}
