package graft.xrpl.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for X5 — BookDirectory quality decode
  * (lib/ledgerParser/quality.js:5-19): the one scalar in the hot
  * exchange-parse path that a built-in can't express (hex mantissa +
  * biased exponent + XRP decimal shifts).
  *
  * Implemented as a TernaryExpression with `doGenCode` emitting a
  * static call, so it stays inside whole-stage codegen instead of
  * falling back to per-row interpreted eval — the preference order of
  * the build brief: built-ins > native Expression > UDF.
  */
case class QualityDecode(
    bookDirectory: Expression,
    paysCurrency: Expression,
    getsCurrency: Expression)
  extends TernaryExpression {

  override def first: Expression = bookDirectory
  override def second: Expression = paysCurrency
  override def third: Expression = getsCurrency

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(bd: Any, pays: Any, gets: Any): Any =
    QualityDecode.decode(
      bd.asInstanceOf[UTF8String],
      pays.asInstanceOf[UTF8String],
      gets.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bd, pays, gets) => {
      val cls = QualityDecode.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = $cls.decode($bd, $pays, $gets);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(bookDirectory = newFirst, paysCurrency = newSecond, getsCurrency = newThird)
}

object QualityDecode {

  /** Static decode entry shared by interpreted eval and codegen.
    * Returns null (SQL NULL) when the directory is malformed —
    * callers fall back to amount division, mirroring the reference's
    * try/catch (exchanges.js:101-116).
    */
  def decode(bd: UTF8String, pays: UTF8String, gets: UTF8String): UTF8String = {
    if (bd == null || pays == null || gets == null) return null
    try {
      val q = graft.xrpl.Scalars.parseQuality(bd.toString, pays.toString, gets.toString)
      UTF8String.fromString(graft.xrpl.Scalars.fmt(q))
    } catch {
      case _: Exception => null
    }
  }

  /** Column-API form. */
  def quality_decode(bookDirectory: Column, pays: Column, gets: Column): Column =
    column(QualityDecode(expression(bookDirectory), expression(pays),
      expression(gets)))

  /** Register as a SQL function `xrpl_quality_decode(...)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "xrpl_quality_decode",
      exprs => QualityDecode(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
}
