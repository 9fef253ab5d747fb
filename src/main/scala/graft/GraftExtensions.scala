package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: installs graft's native functions at
  * session build time, so a user enables the whole engine with
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions        // conf, or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * and `dot_f64` / `simhash_agg` resolve in SQL text with no imperative
  * `register` call. Only the constant-parameter natives live here —
  * `MinHashAgg`/`LshBuckets`/`NearestCell` carry query-time constants
  * (permutation tables, plane matrices, fitted centroids), so their
  * call sites bind them per query. The per-query `register` helpers
  * remain for sessions built without extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[functions.DotProduct].getName, "dot_f64"),
      (exprs: Seq[Expression]) => functions.DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[functions.SimHashAgg].getName, "simhash_agg"),
      (exprs: Seq[Expression]) => functions.SimHashAgg(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[functions.JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => functions.JaroWinkler(exprs.head, exprs(1))))
    // Rewrite the portable aggregate(zip_with(...)) dot-product spelling
    // to the native codegen'd DotProduct (see functions.DotFusion).
    ext.injectOptimizerRule(_ => functions.DotFusion)
  }
}
