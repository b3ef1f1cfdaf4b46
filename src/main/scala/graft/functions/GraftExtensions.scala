package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension hook registering graft's custom Catalyst functions for
  * SQL use (`spark.sql("SELECT nan_product(x) ...")`). Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("nan_product"),
      new ExpressionInfo(classOf[NanProduct].getName, "nan_product"),
      (exprs: Seq[Expression]) => NanProduct(exprs.head)))
  }
}
