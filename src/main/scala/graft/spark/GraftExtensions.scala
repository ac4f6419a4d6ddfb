package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr.RefTokenize

/** SparkSessionExtensions injection point — lets any cluster enable the
  * engine's SQL surface via configuration (no code changes):
  *
  *   spark-submit --conf spark.sql.extensions=graft.spark.GraftExtensions ...
  *
  * Registers the native tokenizer expression for SQL/DataFrame users:
  *   SELECT ref_tokenize_native(content) FROM src_files
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("ref_tokenize_native"),
        new ExpressionInfo(classOf[RefTokenize].getName, "ref_tokenize_native"),
        (children: Seq[Expression]) => RefTokenize(children.head)
      )
    )
  }
}
