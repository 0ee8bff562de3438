package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{ByteSumModExpr, FingerprintExpr}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions so `spark.sql("...")` users get the
  * same surface as the Column API. Activate with
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * or spark.sql.extensions=graft.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("byte_sum_mod"),
      new ExpressionInfo(classOf[ByteSumModExpr].getName, null, "byte_sum_mod"),
      (args: Seq[Expression]) => args match {
        case Seq(c, Literal(n: Int, _)) => ByteSumModExpr(c, n)
        case _ => throw new IllegalArgumentException(
          "byte_sum_mod(col, <int literal>)")
      }))

    e.injectFunction((
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[FingerprintExpr].getName, null,
        "graft_fingerprint"),
      (args: Seq[Expression]) => FingerprintExpr(args.head)))
  }
}
