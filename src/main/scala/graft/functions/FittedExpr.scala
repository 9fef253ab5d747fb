package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.call_function

/** Binds a native expression that CAPTURES per-call fitted state (an IVF
  * centroid table, quantizer boundaries, a decontamination eval matrix)
  * to a frame at construction time.
  *
  * Registering such an expression under a SHARED temp-function name is a
  * latent aliasing bug: DataFrame analysis resolves function names
  * against the session registry, so building frames for two directories
  * before executing either would silently resolve BOTH against the
  * last-registered closure (the wrong eval matrix for one of them).
  * Stateless natives (`dot_f64`, `simhash_agg`, …) keep their fixed
  * shared names — re-registration is a no-op for them; only
  * fitted-state natives route through here.
  */
object FittedExpr {
  private val seq = new AtomicLong()

  /** Register `build` under a fresh `base_N` name and return a Column
    * invoking it on `args`. The unique name makes late resolution land
    * on THIS call's closure no matter how many sibling frames exist.
    */
  def bind(
      spark: SparkSession,
      base: String,
      build: Seq[Expression] => Expression,
      args: Column*): Column =
    call_function(bindName(spark, base, build), args: _*)

  /** Same registration, returning the fresh name — for call sites that
    * need the function INSIDE a SQL lambda (where no Column can reach).
    */
  def bindName(
      spark: SparkSession,
      base: String,
      build: Seq[Expression] => Expression): String = {
    val name = s"${base}_${seq.incrementAndGet()}"
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, build, "built-in")
    name
  }
}
