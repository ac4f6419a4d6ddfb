package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local shingle sketch expressions for the dedup operators.
  *
  * A document's MinHash signature and bottom-k fingerprint are pure
  * functions of its own token array, so computing them per row removes the
  * explode(shingles x hashes) + two-aggregation dataflow entirely — at
  * 100 TB only the LSH band keys (a handful of rows per doc) ever reach a
  * shuffle. The hash math is IDENTICAL to the DuckDB oracles:
  * h_i(s) = first 16 hex chars of md5(i ":" shingle), lexicographic min per
  * i over the doc's (distinct — min ignores duplicates) shingle set.
  */
object ShingleExprs {

  private val threadMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** first 16 hex chars (= first 8 bytes) of md5(prefix ++ shingleBytes). */
  private def md5Prefix16(prefix: Array[Byte], shingle: Array[Byte]): String = {
    val md = threadMd5.get()
    md.reset()
    md.update(prefix)
    md.update(shingle)
    val d = md.digest()
    val out = new Array[Char](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Iterate the w-token shingles of `tokens` (space-joined byte arrays). */
  private def foreachShingle(tokens: ArrayData, w: Int)(f: Array[Byte] => Unit): Unit = {
    val n = tokens.numElements()
    if (n < w) return
    var i = 0
    while (i + w <= n) {
      var len = w - 1 // separators
      var j = 0
      while (j < w) { len += tokens.getUTF8String(i + j).numBytes(); j += 1 }
      val sh = new Array[Byte](len)
      var pos = 0
      j = 0
      while (j < w) {
        if (j > 0) { sh(pos) = ' '; pos += 1 }
        val tb = tokens.getUTF8String(i + j).getBytes
        System.arraycopy(tb, 0, sh, pos, tb.length)
        pos += tb.length
        j += 1
      }
      f(sh)
      i += 1
    }
  }

  /** MinHash signature: array of `numHashes` 16-hex-char minima (null-free);
    * EMPTY array when the doc has fewer than w tokens (no shingles).
    */
  def minhashSig(tokens: ArrayData, w: Int, numHashes: Int): ArrayData = {
    val mins = new Array[String](numHashes)
    val prefixes = Array.tabulate(numHashes)(i => s"${i + 1}:".getBytes("UTF-8"))
    var any = false
    foreachShingle(tokens, w) { sh =>
      any = true
      var i = 0
      while (i < numHashes) {
        val h = md5Prefix16(prefixes(i), sh)
        if (mins(i) == null || h < mins(i)) mins(i) = h
        i += 1
      }
    }
    if (!any) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(mins.map(UTF8String.fromString(_): Any))
  }

  /** Bottom-k fingerprint: the k smallest DISTINCT md5 hex digests (full 32
    * chars — matches md5(sh) in the oracle) of the doc's shingles, joined by
    * ",". Empty string when no shingles.
    */
  def bottomKFingerprint(tokens: ArrayData, w: Int, k: Int): UTF8String = {
    val seen = new java.util.TreeSet[String]()
    foreachShingle(tokens, w) { sh =>
      val md = threadMd5.get()
      md.reset()
      md.update(sh)
      val d = md.digest()
      val out = new Array[Char](32)
      var i = 0
      while (i < 16) {
        out(2 * i) = HexChars((d(i) >> 4) & 0xf)
        out(2 * i + 1) = HexChars(d(i) & 0xf)
        i += 1
      }
      val hex = new String(out)
      seen.add(hex)
      if (seen.size > k) seen.pollLast() // keep only the k smallest
      ()
    }
    import scala.jdk.CollectionConverters._
    UTF8String.fromString(seen.iterator().asScala.mkString(","))
  }

  /** 16-bit SimHash, row-local: bit j (0-based) set iff the tf-weighted sum
    * of (+tf if hex digit j+1 of md5(term) has its high bit, else -tf) over
    * the doc's DISTINCT terms is positive — identical math to the SQL oracle
    * (md5 hex nibble inspection). One pass: count tfs, hash each distinct
    * term once, accumulate 16 signed sums.
    */
  def simhash16(tokens: ArrayData): Long = {
    val counts = new java.util.HashMap[UTF8String, Int]()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      // unboxToInt(null) == 0, and a present count is always >= 1
      counts.put(t, counts.get(t) + 1)
      i += 1
    }
    val sums = new Array[Long](16)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val md = threadMd5.get()
      md.reset()
      md.update(e.getKey.getBytes)
      val d = md.digest()
      val tf = e.getValue.toLong
      var j = 0
      while (j < 16) {
        val nibble = if ((j & 1) == 0) (d(j / 2) >> 4) & 0xf else d(j / 2) & 0xf
        sums(j) += (if (nibble >= 8) tf else -tf)
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 16) {
      if (sums(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  private def litInt(e: Expression): Int = e.eval(null) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"expected INT literal, got $other")
  }

  /** SQL surface: minhash_sig(tokens, w, numHashes), shingle_fp(tokens, w, k)
    * — the int args must be literals (folded into the expression instance).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      (exprs: Seq[Expression]) => MinhashSig(exprs.head, litInt(exprs(1)), litInt(exprs(2))),
      "scala_udf"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_fp",
      (exprs: Seq[Expression]) => ShingleFingerprint(exprs.head, litInt(exprs(1)), litInt(exprs(2))),
      "scala_udf"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash16",
      (exprs: Seq[Expression]) => Simhash16(exprs.head),
      "scala_udf"
    )
  }
}

/** tokens -> 16-bit SimHash (long). */
case class Simhash16(child: Expression) extends UnaryExpression {
  require(child.dataType.isInstanceOf[ArrayType], s"simhash16 expects ARRAY, got ${child.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash16"
  override def nullSafeEval(input: Any): Any =
    ShingleExprs.simhash16(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleExprs.simhash16($c)")
  override protected def withNewChildInternal(newChild: Expression): Simhash16 =
    copy(child = newChild)
}

/** tokens -> MinHash signature (numHashes 16-hex minima over w-shingles). */
case class MinhashSig(child: Expression, w: Int, numHashes: Int) extends UnaryExpression {
  require(child.dataType.isInstanceOf[ArrayType], s"minhash_sig expects ARRAY, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(input: Any): Any =
    ShingleExprs.minhashSig(input.asInstanceOf[ArrayData], w, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleExprs.minhashSig($c, $w, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** tokens -> bottom-k shingle fingerprint string over w-shingles. */
case class ShingleFingerprint(child: Expression, w: Int, k: Int) extends UnaryExpression {
  require(child.dataType.isInstanceOf[ArrayType], s"shingle_fp expects ARRAY, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "shingle_fp"
  override def nullSafeEval(input: Any): Any =
    ShingleExprs.bottomKFingerprint(input.asInstanceOf[ArrayData], w, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleExprs.bottomKFingerprint($c, $w, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleFingerprint =
    copy(child = newChild)
}
