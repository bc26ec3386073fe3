package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable char-fold hash:
  * fold over code points, h' = (h*131 + cp) mod (2^31-1).
  *
  * Semantically identical to the HOF formulation in
  * [[graft.functions.HashFunctions.charFoldHash]] (asserted by
  * CharFoldHashSpec) and to the DuckDB list_reduce fragment — but
  * compiled: higher-order functions are CodegenFallback in Spark (always
  * interpreted, megamorphic Expression.eval), which profiled 10-50x
  * slower on the dedup hot path once the JIT profile degrades in a
  * long-lived session. This expression participates in whole-stage
  * codegen via doGenCode.
  */
case class CharFoldHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_fold_hash needs a string argument, got ${child.dataType}")
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    CharFoldHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CharFoldHash.hash($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): CharFoldHash =
    copy(child = newChild)
}

object CharFoldHash {
  final val P = 2147483647L

  /** Shared by interpreted eval and generated code. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 131L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Register `char_fold_hash` in the session's function registry
    * (idempotent) so it is usable from expr()/SQL. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_fold_hash", exprs => CharFoldHash(exprs.head), "built-in")

  /** Column over a named input column (register first). */
  def charFoldHashNative(spark: SparkSession, colName: String): Column = {
    register(spark)
    expr(s"char_fold_hash($colName)")
  }
}
