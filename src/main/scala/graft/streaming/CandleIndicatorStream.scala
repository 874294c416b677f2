package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of the candle technical-indicator gates (`ts_rsi`,
  * `ts_atr`): RSI-14 and ATR-14 maintained INCREMENTALLY as each
  * day's candle closes — the live-indicator feed a market-data
  * deployment serves, instead of rescanning the candle history.
  *
  * Both batch gates run 14-ROW series-keyed windows (Cutler RSI over
  * close-to-close diffs, SMA ATR over true ranges), so the exact
  * incremental state is a bounded ring of the last 15 closed candles
  * per series (15 closes ⇒ 14 diffs; the TR of the oldest window row
  * needs its predecessor's close). Emission starts at the 15th candle
  * — exactly where the batch gates' full-window filters (nd = 14,
  * nw = 14 past the first row) start emitting — and reproduces the
  * gates' BIGINT columns bit-for-bit (same floor divisions, same
  * flat-window midpoint).
  *
  * Scale design: state is ≤ 15×4 longs per series — series-count-
  * bounded, uniform keys. Candles must arrive per-series in
  * non-decreasing epoch order across micro-batches; within a batch
  * the group iterator is sorted, and a candle at or before the last
  * consumed epoch is a late duplicate of a closed day and is dropped.
  */
object CandleIndicatorStream {

  /** One closed daily candle, cents-quantized (epoch = days since
    * 1970-01-01). */
  final case class Candle(series: String, epoch: Long, open_c: Long,
      close_c: Long, high_c: Long, low_c: Long)

  /** RSI/ATR as of `epoch` — the batch gates' columns. */
  final case class IndicatorPoint(series: String, epoch: Long,
      gain_c: Long, loss_c: Long, rsi_ppm: Long, tr_c: Long,
      atr_c: Long)

  /** Keyed state: the 15-candle ring (parallel arrays, public for the
    * state encoder's generated code). */
  final case class St(lastEpoch: Long, epochs: Seq[Long],
      closes: Seq[Long], highs: Seq[Long], lows: Seq[Long])

  /** Fold a FULL 15-candle ring (oldest first) into the gates' exact
    * columns at the newest candle. */
  private def fold(series: String, epochs: Seq[Long],
      closes: Seq[Long], highs: Seq[Long], lows: Seq[Long])
      : IndicatorPoint = {
    var gain = 0L; var loss = 0L; var str = 0L
    var i = 1
    while (i < 15) {
      val d = closes(i) - closes(i - 1)
      if (d > 0) gain += d else loss -= d
      val tr = math.max(highs(i) - lows(i),
        math.max(math.abs(highs(i) - closes(i - 1)),
          math.abs(lows(i) - closes(i - 1))))
      str += tr
      i += 1
    }
    val last = 14
    val trLast = math.max(highs(last) - lows(last),
      math.max(math.abs(highs(last) - closes(last - 1)),
        math.abs(lows(last) - closes(last - 1))))
    // mirror the gates' floor divisions (gain/loss/tr non-negative)
    val rsi = if (gain + loss > 0) gain * 1000000L / (gain + loss)
      else 500000L
    IndicatorPoint(series, epochs(last), gain, loss, rsi, trLast,
      str / 14L)
  }

  private def update(series: String, it: Iterator[Candle],
      state: GroupState[St]): Iterator[IndicatorPoint] = {
    var st = state.getOption
      .getOrElse(St(Long.MinValue, Nil, Nil, Nil, Nil))
    val out = scala.collection.mutable.ArrayBuffer.empty[IndicatorPoint]
    it.toSeq.sortBy(_.epoch).foreach { c =>
      if (c.epoch > st.lastEpoch) {
        val ep = (st.epochs :+ c.epoch).takeRight(15)
        val cl = (st.closes :+ c.close_c).takeRight(15)
        val hi = (st.highs :+ c.high_c).takeRight(15)
        val lo = (st.lows :+ c.low_c).takeRight(15)
        st = St(c.epoch, ep, cl, hi, lo)
        if (ep.length == 15) out += fold(series, ep, cl, hi, lo)
      }
    }
    state.update(st)
    out.iterator
  }

  /** Indicator points over a (possibly streaming) candle frame; one
    * output row per closed candle past the 15th, Append-compatible.
    */
  def monitor(spark: SparkSession, candles: Dataset[Candle])
      : Dataset[IndicatorPoint] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    candles
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Batch reference: the same ring fold as a sequential pass — what
    * [[monitor]] must reproduce for any micro-batching. */
  def reference(candles: Seq[Candle]): Seq[IndicatorPoint] =
    candles.groupBy(_.series).toSeq.flatMap { case (series, cs) =>
      var ring = Vector.empty[Candle]
      var last = Long.MinValue
      cs.sortBy(_.epoch).flatMap { c =>
        if (c.epoch <= last) None
        else {
          last = c.epoch
          ring = (ring :+ c).takeRight(15)
          if (ring.length == 15)
            Some(fold(series, ring.map(_.epoch), ring.map(_.close_c),
              ring.map(_.high_c), ring.map(_.low_c)))
          else None
        }
      }
    }
}
