package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the longest-common-subsequence
  * LENGTH of two token arrays (`array<string>` × `array<string>` →
  * `bigint`) — the ROUGE-L kernel.
  *
  * The same DP is expressible with SQL higher-order functions (the
  * anti-diagonal `aggregate`/`transform` form the eval_rouge_l ORACLE
  * keeps — it is the executable spec this kernel is hash-checked
  * against), but interpreted lambda evaluation allocates a diagonal
  * array per step and costs ~µs/cell; this is the textbook two-row
  * rolling DP in primitive long arrays with `doGenCode` emitting a
  * static call, so pair scoring stays inside whole-stage codegen —
  * ~ns/cell, the difference between a 4 s and a sub-second gate at
  * 10³ pairs, and the difference between feasible and not at an
  * eval-harness 10⁶ pairs.
  */
case class LcsLen(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsLen.lcs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = LcsLen.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.lcs($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LcsLen {

  /** Two-row rolling DP shared by interpreted eval and codegen:
    * dp[i][j] = max(dp[i−1][j], dp[i][j−1], dp[i−1][j−1] + eq). */
  def lcs(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    var prev = new Array[Long](m + 1)
    var cur = new Array[Long](m + 1)
    var i = 1
    while (i <= n) {
      val ai = a.getUTF8String(i - 1)
      var j = 1
      while (j <= m) {
        val diag =
          if (ai.equals(b.getUTF8String(j - 1))) prev(j - 1) + 1
          else 0L
        var v = prev(j)
        if (cur(j - 1) > v) v = cur(j - 1)
        if (diag > v) v = diag
        cur(j) = v
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0L)
      i += 1
    }
    prev(m)
  }

  /** Column-API form. */
  def lcs_len(a: Column, b: Column): Column =
    column(LcsLen(expression(a), expression(b)))
}
