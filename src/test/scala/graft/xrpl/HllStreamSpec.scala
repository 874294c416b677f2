package graft.xrpl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.streaming.HllStream
import graft.streaming.HllStream.HllEvent

/** The incrementally-maintained HLL registers must end at exactly the
  * batch gate's estimate (same hash, same register ranks, same
  * harmonic sum and rounding — bit-for-bit), however the stream is
  * micro-batched; and register states must merge by elementwise max.
  */
class HllStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("streamed registers converge to the batch estimate") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val expected = SparkEntry.queries("sketch_hll_distinct")(spark, dir)
      .select(col("event_type"), col("n_regs_used"), col("hll_est"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    val all = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"))
      .as[HllEvent].collect()
    val (b1, b2) = all.splitAt(all.length / 3)

    val stream = MemoryStream[HllEvent]
    val q = HllStream.estimates(spark, stream.toDS())
      .writeStream.format("memory").queryName("hll_est")
      .outputMode("update").start()
    try {
      stream.addData(b1.toSeq)
      q.processAllAvailable()
      stream.addData(b2.toSeq)
      q.processAllAvailable()
      val got = spark.table("hll_est")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type")).orderBy(col("seq").desc)))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("n_regs_used"), col("hll_est"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("register states merge by elementwise max (mergeability)") {
    // the property that makes HLL state distributable: the sketch of a
    // union is the elementwise max of the sketches — estimate(merge)
    // must equal the estimate of the concatenated input
    val ids1 = (1L to 400L)
    val ids2 = (250L to 700L)
    def regsOf(ids: Seq[Long]): Array[Int] = {
      val regs = Array.fill(HllStream.M)(0)
      ids.foreach { id =>
        val hv = graft.streaming.KmvStream.hashUser(id)
        val b = (hv % HllStream.M).toInt
        val r = HllStream.rho(hv)
        if (r > regs(b)) regs(b) = r
      }
      regs
    }
    val merged = regsOf(ids1).zip(regsOf(ids2)).map { case (a, b) => a max b }
    assert(merged.toSeq == regsOf(ids1 ++ ids2).toSeq)
    assert(HllStream.estimate(merged.toSeq) ==
      HllStream.estimate(regsOf(ids1 ++ ids2).toSeq))
  }
}
