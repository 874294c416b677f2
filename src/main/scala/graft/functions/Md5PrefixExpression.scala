package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine-portable md5-prefix hash:
  * the first `hexLen` hex chars of md5(s) as a base-16 value in a
  * LONG — bit-identical to the declarative
  * `conv(substring(md5(s), 1, hexLen), 16, 10)` spelling and to
  * DuckDB's `CAST(('0x' || substr(md5(s), 1, hexLen)) AS BIGINT)`, so
  * every oracle that uses the portable hash is unchanged (hexLen 8 =
  * the 32-bit draws; hexLen 13 = the 52-bit sketch hashes).
  *
  * The declarative chain allocates three intermediate strings per call
  * (32-char hex digest, substring, conv's base conversion); this
  * expression digests the UTF8 bytes and assembles the value from the
  * leading digest bytes directly — one codegen'd static call, zero
  * intermediate allocations. Used by the hash-derived gates (bootstrap
  * replicas, derived partsupp, k-folds, hashing trick, class-balanced
  * sampling, KMV/HLL sketch hashes).
  */
case class Md5Prefix(child: Expression, hexLen: Int = 8)
    extends UnaryExpression {
  require(hexLen >= 1 && hexLen <= 15, "hexLen must fit a signed long")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    Md5Prefix.prefix(s.asInstanceOf[UTF8String], hexLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val cls = Md5Prefix.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.prefix($t, $hexLen);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Raw md5 digest of the UTF-8 bytes (thread-local MessageDigest). */
  private[functions] def digest(s: UTF8String): Array[Byte] = {
    val md = digests.get()
    md.reset()
    md.digest(s.getBytes)
  }

  /** First `hexLen` hex chars of the digest as a base-16 long —
    * assembled from the leading ceil(hexLen/2) bytes, dropping the
    * trailing low nibble when hexLen is odd. */
  def prefix(s: UTF8String, hexLen: Int): Long = {
    val d = digest(s)
    var acc = 0L
    var i = 0
    val full = hexLen / 2
    while (i < full) {
      acc = (acc << 8) | (d(i) & 0xffL)
      i += 1
    }
    if ((hexLen & 1) == 1) acc = (acc << 4) | ((d(full) & 0xf0L) >> 4)
    acc
  }

  /** Column-API form (first 8 hex chars — the 32-bit draw). */
  def md5_prefix_long(s: Column): Column = column(Md5Prefix(expression(s)))

  /** Column-API form with explicit prefix width in hex chars. */
  def md5_prefix_long(s: Column, hexLen: Int): Column =
    column(Md5Prefix(expression(s), hexLen))
}

/** Five 24-bit draws from one md5: draw j = hex chars [6j, 6j+6) of
  * the digest as a base-16 integer (= digest bytes [3j, 3j+3)
  * big-endian — six hex chars are byte-aligned). Bit-identical to the
  * declarative `conv(substring(md5(s), 1 + 6*j, 6), 16, 10)` chain and
  * its DuckDB twin, with ONE digest and zero intermediate strings for
  * all five draws — the bootstrap-replica gate's inner loop.
  */
case class Md5Draws(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    Md5Draws.draws(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val cls = Md5Draws.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.draws($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Draws {
  val NumDraws = 5

  def draws(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val md = Md5Prefix.digest(s)
    val out = new Array[Long](NumDraws)
    var j = 0
    while (j < NumDraws) {
      out(j) = ((md(3 * j) & 0xffL) << 16) |
        ((md(3 * j + 1) & 0xffL) << 8) | (md(3 * j + 2) & 0xffL)
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Column-API form. */
  def md5_draws(s: Column): Column = column(Md5Draws(expression(s)))
}
