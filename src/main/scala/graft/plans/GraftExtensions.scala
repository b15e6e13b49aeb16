package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProductFx

/** SparkSessionExtensions entry point: registers graft's native
  * Catalyst expressions as SQL functions so `spark.sql("… dot_fx(a,b)
  * …")` works alongside the Column API.
  *
  * Activate with `.config("spark.sql.extensions",
  * "graft.plans.GraftExtensions")` (done in [[graft.Sessions]]) or
  * `.withExtensions(new GraftExtensions)`. This is the sanctioned
  * extension seam — no Spark internals are patched, and additional
  * rules/strategies (e.g. a pushdown rule for similarity top-k) would
  * register here too. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("dot_fx"),
      new ExpressionInfo(classOf[DotProductFx].getName, "dot_fx"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"dot_fx takes 2 arguments, got ${args.length}")
        DotProductFx(args.head, args(1))
      }))
  }
}
