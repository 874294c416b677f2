package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's 16-bit SimHash in
  * one pass.
  *
  * The declarative formulation (explode whitespace tokens → md5 → 16
  * bit-position rows per token → vote groupBy → fingerprint groupBy)
  * multiplies the corpus 16× and shuffles it twice. Semantically the
  * fingerprint is a per-document scalar: one md5 per token, ±1 votes
  * per bit tracked in a 16-slot register array, sign → bit. Values are
  * identical to the SQL plan (token hash = first 4 hex chars of
  * md5(token) as a base-16 integer; bit j = floor(v / 2^j) mod 2), so
  * the DuckDB oracle is unchanged.
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(text: Any): Any =
    SimHash.fingerprint(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val cls = SimHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.fingerprint($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  val Bits = 16

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** 16-bit SimHash of the whitespace tokens of `text` — tokens split
    * on single spaces with empties kept, exactly like
    * `split(text, ' ')` in SQL.
    */
  def fingerprint(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](Bits)
    val md = digests.get()
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes("UTF-8"))
      // first 4 hex chars = first 2 bytes, big-endian
      val v = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      var j = 0
      while (j < Bits) {
        votes(j) += (if (((v >> j) & 1) == 1) 1 else -1)
        j += 1
      }
      i += 1
    }
    var hash = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) > 0) hash |= (1L << j)
      j += 1
    }
    hash
  }

  /** Column-API form. */
  def simhash(text: Column): Column = column(SimHash(expression(text)))

  /** Register as SQL function `graft_simhash(text)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", exprs => SimHash(exprs(0)), "scala_udf")
}
