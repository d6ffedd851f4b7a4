package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time streaming aggregations (SURVEY.md §2.9). The reference
  * has no native windows (its rollups are batch, A6/J4); these are the
  * streaming-native forms the engine adds: tumbling event-time buckets
  * with late-data bounds, and the obs-date rollup as a continuously
  * maintained result.
  */
object StreamOps {

  /** Tumbling event-time aggregation with a late-data watermark.
    * State is bounded: windows older than the watermark are finalized
    * and dropped from the store.
    */
  def tumblingAgg(stream: DataFrame, tsCol: String, windowDuration: String,
                  lateness: String, keys: Seq[Column],
                  aggs: Seq[Column]): DataFrame =
    stream
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowDuration) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Obs-date rollup (A6/J4) maintained over a stream: one row per
    * (date, key) with counts — the streaming twin of q19.
    */
  def obsDateRollup(stream: DataFrame, tsCol: String, lateness: String,
                    keys: Seq[Column]): DataFrame =
    stream
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), "1 day") +: keys: _*)
      .agg(count(lit(1)).as("n_events"))
      .select((Seq(to_date(col("window.start")).as("obs_date")) ++ keys :+
        col("n_events")): _*)
}
