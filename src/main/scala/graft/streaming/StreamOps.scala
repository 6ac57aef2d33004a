package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface matching the reference's streaming
  * layer (src/streaming/mod.rs:136-926, window.rs:23-938): tumbling /
  * sliding / session windows with watermarks and allowed lateness,
  * plus count-based windows via flatMapGroupsWithState (Spark has no
  * count-window primitive — SURVEY §7.4.5). Backpressure maps to
  * engine config (maxOffsetsPerTrigger etc.), not code.
  */
object StreamOps {

  /** tumbling window agg with watermark
    * (reference WindowType::Tumbling, src/streaming/window.rs:23;
    * watermark_delay :151). */
  def tumbling(df: DataFrame, tsCol: String, size: String,
      watermark: String, keyCols: Seq[String],
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), size) +: keyCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** sliding window agg (WindowType::Sliding). */
  def sliding(df: DataFrame, tsCol: String, size: String, slide: String,
      watermark: String, keyCols: Seq[String],
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), size, slide) +: keyCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** session window with gap (WindowType::Session,
    * src/streaming/window.rs:103-131). Spark's session_window covers
    * the gap semantics; the reference's max_duration cap needs the
    * stateful path below. */
  def session(df: DataFrame, tsCol: String, gap: String,
      watermark: String, keyCols: Seq[String],
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy((session_window(col(tsCol), gap) +: keyCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  case class CountWindowState(buf: List[Double])
  case class CountWindowOut(key: String, windowEnd: Long, count: Int,
      sum: Double, mean: Double)

  /** count-based windows (WindowType::Count): emit an aggregate every
    * `n` records per key — no Spark primitive, implemented with
    * flatMapGroupsWithState keyed state. State is O(n) per key. */
  def countWindow(ds: Dataset[(String, Double)], n: Int)(
      implicit e: Encoder[CountWindowOut],
      se: Encoder[CountWindowState]): Dataset[CountWindowOut] =
    ds.groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[CountWindowState, CountWindowOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Double)],
         state: GroupState[CountWindowState]) =>
          var buf = state.getOption.map(_.buf).getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer[CountWindowOut]()
          var emitted = 0L
          rows.foreach { case (_, v) =>
            buf = v :: buf
            if (buf.size >= n) {
              emitted += 1
              out += CountWindowOut(key, emitted, buf.size, buf.sum,
                buf.sum / buf.size)
              buf = Nil
            }
          }
          state.update(CountWindowState(buf))
          out.iterator
      }

  /** Batch-equivalent of the streaming tumbling aggregation — used to
    * verify window semantics against the oracle on static data. */
  def tumblingBatch(df: DataFrame, tsCol: String, size: String,
      keyCols: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy((window(col(tsCol), size) +: keyCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
}
