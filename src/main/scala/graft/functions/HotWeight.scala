package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the fitted hot-token sort weight for the
  * prefix-filtered similarity join — `(1 << 61) + df` for tokens in the
  * fitted hot set (so they sort AFTER every 60-bit hash weight, rarer
  * hot tokens first), null for everything else (the caller coalesces
  * with the md5-prefix hash weight). The hot map is a referenced object
  * built from the bounded driver-side document-frequency fit: a real
  * hash lookup per token, constant-time at any hot-set size — a literal
  * MAP column would linear-scan its entries per lookup.
  */
case class HotWeight(child: Expression, hot: Map[String, Long])
    extends UnaryExpression {

  /** UTF8String-keyed view of the fit — lazy and transient so Catalyst's
    * many expression copies during analysis/optimization don't each
    * rebuild a 4096-entry map; the instance that actually evaluates (or
    * is referenced from generated code) builds it once on first use.
    */
  @transient private lazy val lookup: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](hot.size * 2)
    hot.foreach { case (t, df) =>
      m.put(UTF8String.fromString(t), (1L << 61) + df)
    }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hot_weight expects string, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  def compute(t: UTF8String): Any = lookup.get(t)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hotWeight", this, classOf[HotWeight].getName)
    nullSafeCodeGen(ctx, ev, t => {
      val tmp = ctx.freshName("w")
      s"""
         |Object $tmp = $self.compute($t);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $tmp).longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
