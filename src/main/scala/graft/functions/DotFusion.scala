package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule — the (c) tier of the extension preference order, a
  * `Rule[LogicalPlan]` injected through [[graft.GraftExtensions]]: any
  * query writing the COMPOSABLE dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0d, (acc, v) => acc + v) }}}
  *
  * is rewritten to the native codegen'd [[DotProduct]]. The composable
  * form is the portable spelling (it runs on stock Spark with no graft
  * jars), but it executes on the interpreted higher-order-function path
  * and disables whole-stage codegen for its stage; with the rule
  * installed, library users keep writing the portable form and the
  * session plans the native expression automatically.
  *
  * Semantics are identical by construction: both evaluate
  * Σ a(i)·b(i) left-to-right in IEEE order (the parity is
  * bit-for-bit-tested in SourcesSpec). NULL behavior matches too:
  * [[DotProduct]] yields NULL on mismatched lengths (zip_with pads with
  * null and the interpreted fold nulls out) AND on null elements of
  * containsNull=true inputs (the fold nulls out there as well — the
  * expression runs an element null-scan exactly when the input type
  * admits nulls, so the rewrite never turns a NULL into a number). The
  * rewrite fires only on exact shape+type matches: both inputs
  * `array<double>`, zero literal 0.0, merge a pure two-variable add,
  * finish the identity lambda.
  */
object DotFusion extends Rule[LogicalPlan] {

  private def sameVars(
      used: Seq[Expression], declared: Seq[NamedLambdaVariable]): Boolean = {
    val u = used.collect { case v: NamedLambdaVariable => v.exprId }.toSet
    used.forall(_.isInstanceOf[NamedLambdaVariable]) &&
      u == declared.map(_.exprId).toSet && u.size == declared.size
  }

  private def isArrayDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx, my, _), Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(al, ar, _), Seq(ma: NamedLambdaVariable, me: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
          if isArrayDouble(a) && isArrayDouble(b) &&
            sameVars(Seq(mx, my), Seq(zx, zy)) &&
            sameVars(Seq(al, ar), Seq(ma, me)) &&
            fin.exprId == fv.exprId =>
        DotProduct(a, b)
    }
}
