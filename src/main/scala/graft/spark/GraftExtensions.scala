package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr.{MinhashSig, RefTokenize, RefTokenizeTf, ShingleFingerprint, Simhash16}

/** SparkSessionExtensions injection point — lets any cluster enable the
  * engine's SQL surface via configuration (no code changes):
  *
  *   spark-submit --conf spark.sql.extensions=graft.spark.GraftExtensions ...
  *
  * Registers every native expression for SQL/DataFrame users:
  *   SELECT ref_tokenize_native(content) FROM src_files
  *   SELECT ref_tokenize_tf(content).dl, simhash16(ref_tokenize_native(content)) ...
  *   SELECT minhash_sig(ref_tokenize_native(content), 3, 12) ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def litInt(e: Expression): Int = e.eval(null) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"expected INT literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_], builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder))

    inject("ref_tokenize_native", classOf[RefTokenize], es => RefTokenize(es.head))
    inject("ref_tokenize_tf", classOf[RefTokenizeTf], es => RefTokenizeTf(es.head))
    inject("simhash16", classOf[Simhash16], es => Simhash16(es.head))
    inject("minhash_sig", classOf[MinhashSig],
      es => MinhashSig(es.head, litInt(es(1)), litInt(es(2))))
    inject("shingle_fp", classOf[ShingleFingerprint],
      es => ShingleFingerprint(es.head, litInt(es(1)), litInt(es(2))))
  }
}
