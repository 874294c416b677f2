package graft.xrpl

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xrpl.store.XrplStore

/** The Z-ordered store layout must make BOTH predicate families
  * (by-account and by-time-slice) skip row groups off the parquet
  * footer min/max stats — the claim [[XrplStore.writeZOrdered]] is
  * for. Proven against the footers directly (the same stats the scan's
  * row-group pruning consumes), with the default account-sorted layout
  * as the control: it prunes the account family but its time family
  * reads EVERY row group, which is exactly what a second lu_* table
  * copy papered over in the reference.
  *
  * Tiny parquet.block.size + row-check interval force many row groups
  * out of the small fixture so pruning ratios are measurable.
  */
class ZOrderLayoutSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private lazy val tables =
    XrplTables.fromFiles(spark, XrplTables.fixturesPath)

  /** Force tiny row groups via the HADOOP conf — parquet reads
    * block-size knobs from there, not from DataFrameWriter options
    * (passing them as options silently yields one group per file and
    * layout-independent file-level stats).
    */
  private def withSmallRowGroups[A](body: => A): A = {
    val hc = spark.sparkContext.hadoopConfiguration
    val prev = Option(hc.get("parquet.block.size"))
    val prevChk = Option(hc.get("parquet.block.size.row.check.min"))
    hc.setInt("parquet.block.size", 1024)
    hc.setInt("parquet.block.size.row.check.min", 5)
    try body finally {
      prev.fold(hc.unset("parquet.block.size"))(
        hc.set("parquet.block.size", _))
      prevChk.fold(hc.unset("parquet.block.size.row.check.min"))(
        hc.set("parquet.block.size.row.check.min", _))
    }
  }

  /** (accountMin, accountMax, timeMin, timeMax) per row group, over
    * every partition of the table. */
  private def rowGroups(dir: String, entityCol: String)
      : Seq[(String, String, Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val parts = fs.listFiles(root, true)
    val out = Seq.newBuilder[(String, String, Long, Long)]
    while (parts.hasNext) {
      val f = parts.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try r.getFooter.getBlocks.asScala.foreach { b =>
          def stats(c: String) = b.getColumns.asScala
            .find(_.getPath.toDotString == c).get.getStatistics
          val sa = stats(entityCol)
          val st = stats("time")
          out += ((sa.genericGetMin.asInstanceOf[Binary].toStringUsingUTF8,
            sa.genericGetMax.asInstanceOf[Binary].toStringUsingUTF8,
            st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue))
        } finally r.close()
      }
    }
    out.result()
  }

  test("z-ordered balance_changes: both predicate families skip row groups") {
    val base = Files.createTempDirectory("graft-z-base").toString
    val zdir = Files.createTempDirectory("graft-z-zord").toString
    val bc = tables.balanceChanges.toDF()
    withSmallRowGroups {
      XrplStore.write(bc, "balance_changes", base)
      XrplStore.writeZOrdered(bc, "balance_changes", zdir)
    }

    // z layout must not lose or duplicate rows
    assert(spark.read.parquet(s"$zdir/balance_changes").count() === bc.count())

    val gBase = rowGroups(s"$base/balance_changes", "account")
    val gZ = rowGroups(s"$zdir/balance_changes", "account")
    assert(gZ.size >= 6, s"need several row groups, got ${gZ.size}")

    // probe account: a LOW-frequency account (the realistic point
    // lookup — the busiest account genuinely occupies most row groups,
    // which no layout can prune)
    val probe = bc.groupBy(col("account")).count()
      .filter(col("count") >= 3)
      .orderBy(col("count"), col("account")).head().getString(0)
    // probe time slice: a 2-minute window at the median (the fixture's
    // activity is a minutes-long burst; a wide window would cover it
    // entirely and no layout could prune)
    val ts = bc.select(col("time")).collect().map(_.getLong(0)).sorted
    val t0 = ts(ts.length / 2)
    val (p1, p2) = (t0 - 60, t0 + 60)

    def accCands(gs: Seq[(String, String, Long, Long)]) =
      gs.count(g => g._1 <= probe && probe <= g._2)
    def timeCands(gs: Seq[(String, String, Long, Long)]) =
      gs.count(g => g._3 <= p2 && p1 <= g._4)

    // account family: both layouts prune (z keeps the entity prefix
    // as the interleave's x dimension, so stats stay tight)
    assert(accCands(gZ) < gZ.size,
      s"z layout: account probe hits all ${gZ.size} groups")
    assert(accCands(gBase) < gBase.size)

    // time family: the account-sorted control reads essentially
    // everything; the z layout must skip, and skip strictly better
    val zFrac = timeCands(gZ).toDouble / gZ.size
    val baseFrac = timeCands(gBase).toDouble / gBase.size
    assert(timeCands(gZ) < gZ.size,
      s"z layout: time slice hits all ${gZ.size} groups")
    assert(zFrac < baseFrac,
      s"z time fraction $zFrac not better than control $baseFrac")
  }

  test("z-ordered exchanges: currency-pair and time families both skip") {
    val zdir = Files.createTempDirectory("graft-z-ex").toString
    val ex = tables.exchanges.toDF()
    withSmallRowGroups {
      XrplStore.writeZOrdered(ex, "exchanges", zdir)
    }
    assert(spark.read.parquet(s"$zdir/exchanges").count() === ex.count())

    val gZ = rowGroups(s"$zdir/exchanges", "base_currency")
    assert(gZ.size >= 3,
      s"need several row groups, got ${gZ.size} over ${ex.count()} rows")

    val probe = ex.groupBy(col("base_currency")).count()
      .filter(col("count") >= 3)
      .orderBy(col("count"), col("base_currency")).head().getString(0)
    val ts = ex.select(col("time")).collect().map(_.getLong(0)).sorted
    val t0 = ts(ts.length / 2)
    val (p1, p2) = (t0 - 60, t0 + 60)

    val acc = gZ.count(g => g._1 <= probe && probe <= g._2)
    val tim = gZ.count(g => g._3 <= p2 && p1 <= g._4)
    assert(acc < gZ.size, s"currency probe hits all ${gZ.size} groups")
    assert(tim < gZ.size, s"time slice hits all ${gZ.size} groups")
  }
}
