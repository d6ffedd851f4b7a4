package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

case class Ev(ts: Timestamp, kind: String, value: Double)

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window agg with watermark finalizes closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(ts("2024-01-01 10:05:00"), "a", 1.0),
      Ev(ts("2024-01-01 10:55:00"), "a", 2.0),
      Ev(ts("2024-01-01 11:10:00"), "b", 5.0),
      // event far ahead pushes the watermark past the 10:00 window
      Ev(ts("2024-01-01 13:00:00"), "a", 9.0))
    val agg = StreamOps.tumblingAgg(mem.toDF(), "ts", "1 hour", "10 minutes",
      Seq(col("kind")), Seq(count(lit(1)).as("n"), sum($"value").as("s")))
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // append mode emits only windows the watermark has passed:
    // the 10:00 and 11:00 windows are final; 13:00 is still open
    val rows = spark.table("tumbling")
      .select(col("window.start").cast("string"), $"kind", $"n", $"s")
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(rows.sameElements(Array(
      ("2024-01-01 10:00:00", "a", 2L, 3.0),
      ("2024-01-01 11:00:00", "b", 1L, 5.0))))
  }

  test("streaming obs-date rollup matches the batch rollup shape") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(ts("2024-01-01 10:00:00"), "a", 1.0),
      Ev(ts("2024-01-01 22:00:00"), "a", 1.0),
      Ev(ts("2024-01-02 01:00:00"), "b", 1.0),
      Ev(ts("2024-01-05 00:00:00"), "a", 1.0)) // advances watermark
    val roll = StreamOps.obsDateRollup(mem.toDF(), "ts", "1 hour",
      Seq(col("kind")))
    val q = roll.writeStream.format("memory").queryName("obsroll")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("obsroll")
      .select($"obs_date".cast("string"), $"kind", $"n_events")
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(rows.sameElements(Array(
      ("2024-01-01", "a", 2L),
      ("2024-01-02", "b", 1L))))
  }
}
