package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Edge semantics of the two non-equi join operators:
  * asofJoinPrior (union-then-window as-of) and rangeJoinBucketed
  * (epoch-bucketed interval join).
  */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    // key, time, px
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 11:00:00"), 110.0),
    (2L, ts("2024-01-01 10:30:00"), 200.0)
  ).toDF("k", "qt", "px")

  private lazy val trades = Seq(
    // id, key, time
    (10L, 1L, ts("2024-01-01 09:00:00")), // before any quote -> null
    (11L, 1L, ts("2024-01-01 10:00:00")), // exactly at quote -> matches it
    (12L, 1L, ts("2024-01-01 10:59:59")), // between -> earlier quote
    (13L, 1L, ts("2024-01-01 12:00:00")), // after all -> latest quote
    (14L, 3L, ts("2024-01-01 10:00:00")) // key with no quotes -> null
  ).toDF("id", "k", "tt")

  test("asofJoinPrior matches the latest right row at or before leftTs") {
    val out = RelationalOps.asofJoinPrior(trades, quotes, "k", "tt", "qt")
      .select(col("id"), col("asof.px").as("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(10L).isEmpty)
    assert(out(11L).contains(100.0)) // <= semantics: equal time matches
    assert(out(12L).contains(100.0))
    assert(out(13L).contains(110.0))
    assert(out(14L).isEmpty)
  }

  test("asofJoinPrior preserves every left row and its columns") {
    val out = RelationalOps.asofJoinPrior(trades, quotes, "k", "tt", "qt")
    assert(out.count() === trades.count())
    assert(out.columns.toSeq === Seq("id", "k", "tt", "asof"))
  }

  test("asofJoinPrior never matches null-key or null-time right rows") {
    val q = Seq(
      (Option(1L), Option(ts("2024-01-01 10:00:00")), 100.0),
      (Option(1L), Option.empty[Timestamp], 999.0), // null time
      (Option.empty[Long], Option(ts("2024-01-01 09:00:00")), 888.0) // null key
    ).toDF("k", "qt", "px")
    val l = Seq(
      (20L, Option(1L), ts("2024-01-01 11:00:00")),
      (21L, Option.empty[Long], ts("2024-01-01 11:00:00"))
    ).toDF("id", "k", "tt")
    val out = RelationalOps.asofJoinPrior(l, q, "k", "tt", "qt")
      .select(col("id"), col("asof.px").as("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(20L).contains(100.0)) // not the null-ts 999 row
    assert(out(21L).isEmpty) // null left key matches nothing
  }

  test("asofJoinPrior refuses mismatched time types (tz-dependent coercion)") {
    val q = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 1.0))
      .toDF("k", "qt", "px")
    assertThrows[IllegalArgumentException] {
      RelationalOps.asofJoinPrior(trades, q, "k", "tt", "qt")
    }
  }

  test("rangeJoinBucketed is [start, end) and spans bucket boundaries") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == start -> in
      (2L, ts("2024-01-01 10:59:59")), // just inside
      (3L, ts("2024-01-01 11:00:00")), // == end -> out
      (4L, ts("2024-01-01 09:59:59")) // just before -> out
    ).toDF("pid", "pt")
    val intervals = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    ).toDF("iid", "ws", "we")
    // bucket width 600s: the 1h interval spans 7 bucket ids; each
    // matching point must still appear exactly once
    val out = RelationalOps
      .rangeJoinBucketed(points, "pt", intervals, "ws", "we", 600L)
      .select("iid", "pid").as[(Long, Long)].collect().sorted
    assert(out.toSeq === Seq((100L, 1L), (100L, 2L)))
  }

  test("rangeJoinBucketed pairs across overlapping intervals, no dups") {
    val points = Seq((1L, ts("2024-01-01 10:30:00"))).toDF("pid", "pt")
    val intervals = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (101L, ts("2024-01-01 10:15:00"), ts("2024-01-01 10:45:00")),
      (102L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"))
    ).toDF("iid", "ws", "we")
    val out = RelationalOps
      .rangeJoinBucketed(points, "pt", intervals, "ws", "we", 3600L)
      .select("iid", "pid").as[(Long, Long)].collect().sorted
    assert(out.toSeq === Seq((100L, 1L), (101L, 1L)))
  }
}
