package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming XmR (individuals) control chart: the batch
  * `ts_xmr_control` gate CALIBRATES limits from a whole series; this
  * object is the deployed monitor — center line μ and average moving
  * range M̄R are fixed design parameters (scaled ×100 so the 2.66/1.77
  * Western-Electric multipliers stay integral), and each arriving
  * bucket is graded in O(1) against them:
  *
  *   |x − μ|·100 > 266·M̄R  ⇒ beyond_3sigma
  *   |x − μ|·100 > 177·M̄R  ⇒ zone_a
  *
  * plus the classic run rule the batch chart cannot express without
  * windows: EIGHT consecutive points on one side of the center line
  * alarm too (a mean shift too small for the bands). State per series
  * is three longs (last epoch, run side, run length).
  */
object XmrStream {

  /** One closed bucket of a monitored series. */
  final case class Bucket(series: String, epoch: Long, x: Long)

  /** Graded output: zone ∈ {in_control, zone_a, beyond_3sigma};
    * runAlarm fires on the 8th consecutive same-side point. */
  final case class XmrPoint(series: String, epoch: Long, x: Long,
      zone: String, side: String, runLen: Long, runAlarm: Boolean)

  /** Keyed state (public for the state encoder). */
  final case class St(lastEpoch: Long, side: Long, runLen: Long)

  /** Calibrated design: center ×100 and average moving range ×100
    * (both exact integers from the calibration window's sums). */
  final case class Params(mu100: Long, mrbar100: Long)

  private def grade(p: Params, x: Long): (String, String) = {
    val dev100 = x * 100 - p.mu100
    val mag = math.abs(dev100)
    val side = if (dev100 > 0) "above" else if (dev100 < 0) "below"
      else "center"
    val zone =
      if (mag * 100 > 266 * p.mrbar100) "beyond_3sigma"
      else if (mag * 100 > 177 * p.mrbar100) "zone_a"
      else "in_control"
    (zone, side)
  }

  private def update(p: Params)(series: String, it: Iterator[Bucket],
      state: GroupState[St]): Iterator[XmrPoint] = {
    var st = state.getOption.getOrElse(St(Long.MinValue, 0L, 0L))
    val out = scala.collection.mutable.ArrayBuffer.empty[XmrPoint]
    it.toSeq.sortBy(_.epoch).foreach { b =>
      if (b.epoch > st.lastEpoch) {
        val (zone, side) = grade(p, b.x)
        val sideSign = side match {
          case "above" => 1L
          case "below" => -1L
          case _ => 0L
        }
        val runLen =
          if (sideSign != 0 && sideSign == st.side) st.runLen + 1
          else if (sideSign != 0) 1L
          else 0L
        st = St(b.epoch, sideSign, runLen)
        out += XmrPoint(series, b.epoch, b.x, zone, side, runLen,
          runLen >= 8)
      }
    }
    state.update(st)
    out.iterator
  }

  /** Graded points over a (possibly streaming) bucket frame. */
  def monitor(spark: SparkSession, buckets: Dataset[Bucket],
      params: Params): Dataset[XmrPoint] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    buckets
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update(params))
  }

  /** Batch reference: the same sequential grading fold. */
  def reference(buckets: Seq[Bucket], params: Params): Seq[XmrPoint] =
    buckets.groupBy(_.series).toSeq.flatMap { case (series, bs) =>
      var side = 0L
      var runLen = 0L
      var last = Long.MinValue
      bs.sortBy(_.epoch).flatMap { b =>
        if (b.epoch <= last) None
        else {
          last = b.epoch
          val (zone, s) = grade(params, b.x)
          val sign = s match {
            case "above" => 1L
            case "below" => -1L
            case _ => 0L
          }
          runLen = if (sign != 0 && sign == side) runLen + 1
            else if (sign != 0) 1L else 0L
          side = sign
          Some(XmrPoint(series, b.epoch, b.x, zone, s, runLen,
            runLen >= 8))
        }
      }
    }
}
