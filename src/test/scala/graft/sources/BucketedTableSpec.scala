package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The scale contract of [[BucketedTable]]: bucketed layout must
  * actually eliminate the pk-join and pk-agg shuffles and prune
  * buckets on key-equality scans — asserted on the physical plan,
  * with a non-bucketed control proving the assertions bite.
  */
class BucketedTableSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  // formatted mode prints the operator name and its Arguments on
  // separate lines inside a numbered block — count Exchange BLOCKS
  // that hash-partition, not a single-line phrase
  private def shuffles(p: String): Int =
    p.split("(?m)^\\s*\\(\\d+\\) ")
      .count(b => b.startsWith("Exchange") && b.contains("hashpartitioning"))

  private def snapshot(n: Int, rev: String) =
    (0 until n).map(i => (i.toLong, s"doc $i $rev", s"s${i % 3}"))
      .toDF("doc_id", "text", "source")

  // joins must not degrade to broadcast (which would hide the
  // shuffle-elimination claim) — pin with broadcast disabled
  private def noBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed pk join plans with zero exchanges; control shuffles") {
    BucketedTable.write(snapshot(100, "v1"), "bt_v1", "doc_id", 8)
    BucketedTable.write(snapshot(100, "v2"), "bt_v2", "doc_id", 8)
    try noBroadcast {
      val j = BucketedTable.joinColocated(spark, "bt_v1", "bt_v2", "doc_id")
      val p = plan(j)
      assert(shuffles(p) === 0, p)
      assert(j.count() === 100)

      // control: the same join over plain (non-bucketed) data
      // shuffles both sides — the assertion above is load-bearing
      val a = snapshot(100, "v1"); val b = snapshot(100, "v2")
      assert(shuffles(plan(a.join(b, Seq("doc_id")))) === 2)
    } finally {
      BucketedTable.drop(spark, "bt_v1"); BucketedTable.drop(spark, "bt_v2")
    }
  }

  test("full-outer snapshot delta over bucketed tables is shuffle-free") {
    BucketedTable.write(snapshot(60, "v1"), "bt_d1", "doc_id", 4)
    BucketedTable.write(snapshot(80, "v2"), "bt_d2", "doc_id", 4)
    try noBroadcast {
      val d = BucketedTable
        .joinColocated(spark, "bt_d1", "bt_d2", "doc_id", "full_outer")
      assert(shuffles(plan(d)) === 0, plan(d))
      assert(d.count() === 80)
    } finally {
      BucketedTable.drop(spark, "bt_d1"); BucketedTable.drop(spark, "bt_d2")
    }
  }

  test("aggregation keyed by the bucket column skips its shuffle") {
    BucketedTable.write(snapshot(100, "v1"), "bt_agg", "doc_id", 8)
    try {
      val g = BucketedTable.read(spark, "bt_agg")
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
      assert(shuffles(plan(g)) === 0, plan(g))
      assert(g.count() === 100)
    } finally BucketedTable.drop(spark, "bt_agg")
  }

  test("key-equality scan prunes to one bucket's files") {
    BucketedTable.write(snapshot(100, "v1"), "bt_prune", "doc_id", 8)
    // the planner auto-disables bucketed scans for filter-only queries
    // (no join/agg to feed) — force it on to exercise bucket pruning,
    // the layout property the point-lookup relies on
    val k = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(k)
    spark.conf.set(k, "false")
    try {
      val p = plan(BucketedTable.read(spark, "bt_prune")
        .filter(col("doc_id") === 42L))
      assert(p.contains("SelectedBucketsCount: 1 out of 8"), p)
    } finally {
      spark.conf.set(k, prev)
      BucketedTable.drop(spark, "bt_prune")
    }
  }

  test("one file per bucket: the writer pre-partitions by bucket key") {
    BucketedTable.write(snapshot(100, "v1"), "bt_files", "doc_id", 8)
    try {
      val loc = spark.sql("DESCRIBE TABLE EXTENDED bt_files")
        .filter(col("col_name") === "Location")
        .head().getString(1).stripPrefix("file:")
      val files = new java.io.File(loc)
        .listFiles().filter(_.getName.startsWith("part-"))
      assert(files.length === 8, files.map(_.getName).mkString(", "))
    } finally BucketedTable.drop(spark, "bt_files")
  }

  test("round trip preserves rows") {
    val df = snapshot(50, "v1")
    BucketedTable.write(df, "bt_rt", "doc_id", 4)
    try {
      val back = BucketedTable.read(spark, "bt_rt")
        .orderBy("doc_id").collect().toSeq
      assert(back === df.orderBy("doc_id").collect().toSeq)
    } finally BucketedTable.drop(spark, "bt_rt")
  }
}
