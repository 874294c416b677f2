package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's full MinHash
  * signature in one pass.
  *
  * The declarative formulation (explode 8-char shingles → md5 →
  * groupBy(doc) with n `min` aggregates) materializes one row per
  * character position and shuffles them into a hash aggregate — the
  * dominant cost of the MinHash dedup family. Semantically the
  * signature is a per-document scalar, so this expression computes it
  * as one: a tight loop over shingle positions, one md5 per shingle
  * group, four unsigned-int minima per digest tracked in registers,
  * hex-encoded once at the end. Identical values to the SQL
  * formulation (permutation i = the (i%4)-th 8-hex-char slice of
  * md5(i/4 || shingle)), so the DuckDB oracle is unchanged; the plan
  * loses the explode, the shuffle, and the aggregate.
  *
  * Returns NULL for texts shorter than the shingle width (callers
  * filter those like the SQL plan does).
  */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(text: Any): Any =
    MinHashSig.sig(text.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val cls = MinHashSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $cls.sig($t, $numHashes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  val ShingleWidth = 8

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  /** Signature of `text`, or null if it has fewer characters than one
    * shingle. Slice minima are tracked as unsigned 32-bit ints —
    * fixed-width lowercase hex sorts identically to the unsigned
    * numeric order, so the minimum int IS the minimum hex string.
    */
  def sig(text: UTF8String, numHashes: Int): ArrayData = {
    val s = text.toString
    // shingle boundaries count CODE POINTS, not UTF-16 units — SQL
    // substr/length in both engines are code-point-based, and a
    // UTF-16-based loop would split surrogate pairs (emoji, CJK
    // extensions) and disagree with the oracle on the shingle count
    val cpCount = s.codePointCount(0, s.length)
    val n = cpCount - ShingleWidth + 1
    if (n <= 0) return null
    // UTF-16 offset of each code-point start (offs(cpCount) = end)
    val offs = new Array[Int](cpCount + 1)
    var c = 0
    var o = 0
    while (c < cpCount) {
      offs(c) = o
      o = s.offsetByCodePoints(o, 1)
      c += 1
    }
    offs(cpCount) = s.length
    val groups = (numHashes + 3) / 4
    val minima = Array.fill(numHashes)(0xffffffffL)
    val md = digests.get()
    var g = 0
    while (g < groups) {
      val prefix = String.valueOf(g).getBytes("UTF-8")
      val inGroup = math.min(4, numHashes - g * 4)
      var i = 0
      while (i < n) {
        md.reset()
        md.update(prefix)
        md.update(s.substring(offs(i), offs(i + ShingleWidth)).getBytes("UTF-8"))
        val d = md.digest()
        var j = 0
        while (j < inGroup) {
          val v = ((d(j * 4) & 0xffL) << 24) | ((d(j * 4 + 1) & 0xffL) << 16) |
            ((d(j * 4 + 2) & 0xffL) << 8) | (d(j * 4 + 3) & 0xffL)
          val k = g * 4 + j
          if (v < minima(k)) minima(k) = v
          j += 1
        }
        i += 1
      }
      g += 1
    }
    val out = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) {
      val hex = new Array[Char](8)
      var b = 0
      while (b < 8) {
        hex(b) = hexChars(((minima(k) >>> ((7 - b) * 4)) & 0xf).toInt)
        b += 1
      }
      out(k) = UTF8String.fromString(new String(hex))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API form. */
  def minhash_sig(text: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MinHashSig(org.apache.spark.sql.graft.ColumnBridge.expression(text),
        numHashes))

  /** Register as SQL function `graft_minhash_sig(text, n)` (n must be
    * a literal).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_sig",
      exprs => MinHashSig(exprs(0),
        exprs(1).eval().asInstanceOf[Int]),
      "scala_udf")
}
