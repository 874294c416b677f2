package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the integer dot product of two
  * quantized embedding vectors (`array<bigint>` · `array<bigint>`).
  *
  * The similarity/dedup operators quantize floats to integer
  * micro-units and fold dot products in exact integer math; doing that
  * fold with SQL higher-order functions (`aggregate(zip_with(...))`)
  * allocates a zipped array per pair and evaluates a lambda per
  * element, all interpreted. This expression is a tight primitive loop
  * over the two `ArrayData`s with `doGenCode` emitting a static call,
  * so candidate-pair scoring stays inside whole-stage codegen — the
  * dominant cost of `dedup_embedding_cosine` / `sim_*_topk` at scale.
  */
case class DotProductLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductLong.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = DotProductLong.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.dot($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductLong {

  /** Static fold shared by interpreted eval and codegen. Vectors of
    * unequal length dot over the common prefix (callers always pass
    * equal-length embeddings).
    */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** Column-API form. */
  def dot_long(a: Column, b: Column): Column =
    column(DotProductLong(expression(a), expression(b)))

  /** Register as a SQL function `graft_dot_long(a, b)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_long",
      exprs => DotProductLong(exprs(0), exprs(1)),
      "scala_udf")
}
