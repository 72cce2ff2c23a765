package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Custom Catalyst expressions (with `doGenCode`) for hot-path scalar
 * functions the built-ins can't express — they stay inside
 * whole-stage codegen instead of breaking it the way a Scala UDF
 * would.
 */

/**
 * Polynomial rolling hash of a string: h ← (h·base + byte) mod m over
 * the UTF-8 bytes (codepoint-identical to byte-wise for ASCII corpora,
 * mirroring DuckDB's `list_reduce` formulation in the t04 oracle).
 * Used for document fingerprinting (SURVEY §2 t04).
 */
case class RollingHash(child: Expression, base: Long = 31L, mod: Long = 1000000007L)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * base + (bytes(i) & 0xff)) % mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * ${base}L + ($bytes[$i] & 0xff)) % ${mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/**
 * Standard normal quantile (inverse CDF) as a codegen'd expression —
 * the hot path of the rank-based inverse-normal transform (p08), one
 * call per row. Delegates to the from-scratch Acklam+Halley
 * implementation in [[Numerics]].
 */
case class QNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == DoubleType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"qnorm requires a double argument, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Numerics.qnorm(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Numerics$$.MODULE$$.qnorm($c)")

  override protected def withNewChildInternal(newChild: Expression): QNorm =
    copy(child = newChild)
}

/** Column-level entry points for the custom expressions. */
object GraftFunctions {
  def rollingHash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
  def rollingHash(c: Column, base: Long, mod: Long): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c), base, mod))
  def qnorm(c: Column): Column =
    ColumnBridge.column(QNorm(ColumnBridge.expression(c)))
}
