package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the occurrence count of a token
  * array's MOST-REPEATED word n-gram (the numerator of the
  * Gopher-style repetition signals).
  *
  * The declarative formulation materializes the n-gram array, sorts
  * it, and folds an interpreted `aggregate` lambda over the sorted
  * copy to find the longest equal-run — O(L log L) with per-element
  * lambda dispatch, three times per document (uni/bi/tri-gram). The
  * max run of a sorted multiset is just the max multiplicity, so this
  * expression counts n-grams into one open-addressing pass —
  * O(L) per document with no array materialization. Identical values
  * to the sort+fold plan (proven in TopNgramSpec); the DuckDB oracle
  * keeps the explode+groupBy formulation.
  *
  * Returns 0 when the array holds fewer than `n` tokens (no n-gram
  * exists — matching the SQL plan's empty-array guard).
  */
case class TopNgramCount(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "n-gram width must be positive")

  // analysis-time type check: a non-array<string> child fails with a
  // clear error instead of a runtime ClassCastException (the element
  // type is the concrete ArrayType — AbstractDataType is private[sql],
  // so the member type is inferred)
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(tokens: Any): Any =
    TopNgramCount.topCount(tokens.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val cls = TopNgramCount.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.topCount($t, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopNgramCount {

  /** Max multiplicity over the n-grams of `tokens` (0 if none). The
    * n-gram key is the tokens joined by a single space — the same
    * string the SQL plan concatenates, so ties and counts agree.
    */
  def topCount(tokens: ArrayData, n: Int): Long = {
    val len = tokens.numElements()
    if (len < n) return 0L
    val toks = new Array[String](len)
    var i = 0
    while (i < len) {
      toks(i) = tokens.getUTF8String(i).toString
      i += 1
    }
    val counts = new java.util.HashMap[String, Int](len * 2)
    var best = 0
    i = 0
    val sb = new java.lang.StringBuilder
    while (i <= len - n) {
      val key =
        if (n == 1) toks(i)
        else {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          sb.toString
        }
      val c = counts.merge(key, 1, Integer.sum)
      if (c > best) best = c
      i += 1
    }
    best.toLong
  }

  /** Column-API form over an `array<string>` token column. */
  def top_ngram_count(tokens: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      TopNgramCount(
        org.apache.spark.sql.graft.ColumnBridge.expression(tokens), n))
}

/** Native Catalyst expression: how many of a token array's n-gram
  * POSITIONS carry an n-gram that occurs more than once in the array
  * — the numerator of the duplicated-n-gram mass signal
  * (text_dup_ngram_mass), the Gopher filter complementary to
  * [[TopNgramCount]]'s top-n-gram family.
  *
  * Same design rationale as its sibling: the declarative spellings
  * either shuffle every (doc, gram) occurrence (explode+groupBy) or
  * run an interpreted sort+neighbor-scan per document; this is one
  * O(L) open-addressing counting pass per document, in whole-stage
  * codegen, no shuffle and no array materialization. Returns 0 when
  * fewer than `n` tokens (no n-gram positions exist — callers decide
  * whether that renders as NULL).
  */
case class DupNgramMass(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "n-gram width must be positive")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(tokens: Any): Any =
    DupNgramMass.dupMass(tokens.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val cls = DupNgramMass.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.dupMass($t, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DupNgramMass {

  /** Count of n-gram positions whose n-gram has multiplicity ≥ 2
    * (0 if no n-gram exists). Key construction matches the SQL
    * plan's space-joined concatenation, so counts agree exactly.
    */
  def dupMass(tokens: ArrayData, n: Int): Long = {
    val len = tokens.numElements()
    if (len < n) return 0L
    val toks = new Array[String](len)
    var i = 0
    while (i < len) {
      toks(i) = tokens.getUTF8String(i).toString
      i += 1
    }
    val counts = new java.util.HashMap[String, Int](len * 2)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i <= len - n) {
      val key =
        if (n == 1) toks(i)
        else {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          sb.toString
        }
      counts.merge(key, 1, Integer.sum)
      i += 1
    }
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > 1) dup += c
    }
    dup
  }

  /** Column-API form over an `array<string>` token column. */
  def dup_ngram_mass(tokens: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      DupNgramMass(
        org.apache.spark.sql.graft.ColumnBridge.expression(tokens), n))
}
