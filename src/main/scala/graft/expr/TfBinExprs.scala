package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.index.TfBin

/** Conversions between the docstore's packed `tfbin` binary column and
  * map<string,int> — used by the reference-format import/export seams (off
  * the build hot path, so CodegenFallback eval is fine; the hot path never
  * materializes a MapData at all).
  */
case class TfBinToMap(child: Expression) extends UnaryExpression with CodegenFallback {
  require(child.dataType == BinaryType, s"tfbin_to_map expects BINARY, got ${child.dataType}")
  override def dataType: DataType = MapType(StringType, IntegerType, valueContainsNull = false)
  override def prettyName: String = "tfbin_to_map"

  override def nullSafeEval(input: Any): Any = {
    val bin = input.asInstanceOf[Array[Byte]]
    val ks = scala.collection.mutable.ArrayBuffer[Any]()
    val vs = scala.collection.mutable.ArrayBuffer[Any]()
    TfBin.foreachEntry(bin) { (b, off, len, tf) =>
      ks += UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, off, off + len))
      vs += tf
    }
    new ArrayBasedMapData(new GenericArrayData(ks.toArray), new GenericArrayData(vs.toArray))
  }

  override protected def withNewChildInternal(newChild: Expression): TfBinToMap =
    copy(child = newChild)
}

object TfBinExprs {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tfbin_to_map", (exprs: Seq[Expression]) => TfBinToMap(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "map_to_tfbin", (exprs: Seq[Expression]) => MapToTfBin(exprs.head), "scala_udf")
  }
}

/** map<string,int> -> packed tfbin, preserving the map's stored entry
  * order (deterministic for a deterministically-built map).
  */
case class MapToTfBin(child: Expression) extends UnaryExpression with CodegenFallback {
  require(child.dataType.isInstanceOf[MapType], s"map_to_tfbin expects MAP, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "map_to_tfbin"

  override def nullSafeEval(input: Any): Any = {
    val m = input.asInstanceOf[MapData]
    val n = m.numElements()
    val ks = new Array[UTF8String](n)
    val cs = new Array[Int](n)
    val ka = m.keyArray()
    val va = m.valueArray()
    var i = 0
    while (i < n) { ks(i) = ka.getUTF8String(i); cs(i) = va.getInt(i); i += 1 }
    TfBin.encode(ks, cs, n)
  }

  override protected def withNewChildInternal(newChild: Expression): MapToTfBin =
    copy(child = newChild)
}
