package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's winnowing
  * fingerprint (the MOSS scheme) in one pass.
  *
  * The declarative formulation (transform positions → md5 k-grams →
  * transform windows → array_min over w-slices → distinct → sort)
  * allocates a w-element slice per window and evaluates interpreted
  * higher-order lambdas per element — the dominant cost of the
  * text_winnow path. Semantically the fingerprint is a per-document
  * scalar, so this expression computes it as one: k-gram md5s in a
  * tight loop, the per-window minimum via a monotonic deque (O(n)
  * amortized instead of O(n·w)), selected values de-duplicated and
  * sorted once at the end. Identical values to the SQL formulation
  * (code-point k-gram boundaries, lexicographic minima over lowercase
  * hex), so the DuckDB oracle is unchanged.
  *
  * Returns NULL for texts with fewer than k + w − 1 code points
  * (callers filter those like the SQL plan does).
  */
case class WinnowFp(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(text: Any): Any =
    WinnowFp.fp(text.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val cls = WinnowFp.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.fp($t, $k, $w);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFp {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def md5hex(md: MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = hexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Sorted distinct winnowing fingerprint of `text`, or null when the
    * text is shorter (in code points) than one window of k-grams.
    */
  def fp(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    // k-gram boundaries count CODE POINTS (SQL substring semantics)
    val cpCount = s.codePointCount(0, s.length)
    if (cpCount < k + w - 1) return null
    val offs = new Array[Int](cpCount + 1)
    var c = 0
    var o = 0
    while (c < cpCount) {
      offs(c) = o
      o = s.offsetByCodePoints(o, 1)
      c += 1
    }
    offs(cpCount) = s.length

    val n = cpCount - k + 1
    val md = digests.get()
    val hashes = new Array[String](n)
    var i = 0
    while (i < n) {
      hashes(i) = md5hex(md, s.substring(offs(i), offs(i + k)))
      i += 1
    }

    // sliding minimum over windows of w hashes: monotonic index deque
    val selected = new java.util.TreeSet[String]()
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // deque occupies [head, tail)
    i = 0
    while (i < n) {
      while (tail > head && hashes(deque(tail - 1)).compareTo(hashes(i)) >= 0)
        tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) selected.add(hashes(deque(head)))
      i += 1
    }

    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var j = 0
    while (it.hasNext) {
      out(j) = UTF8String.fromString(it.next())
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API form. */
  def winnow_fp(text: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      WinnowFp(org.apache.spark.sql.graft.ColumnBridge.expression(text), k, w))
}
