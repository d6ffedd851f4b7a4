package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Hash-bucketed catalog tables: the co-located-join layout the CoW
  * scaladocs promise (q117's snapshot delta, J7's update join-back,
  * J1's ingest anti-join all equi-join on the table's primary key —
  * the reference leans on Postgres' pk index for the same access
  * pattern, eodatadownsensor.py:214-260).
  *
  * Why this matters at 100 TB: every pk equi-join between two plain
  * parquet snapshots shuffles BOTH sides — rewriting 200 TB of
  * network traffic to compare two crawls. Two tables bucketed by the
  * same key into the same bucket count expose Spark's
  * `HashPartitioning(key, n)` as their OUTPUT partitioning, so
  * SortMergeJoin consumes them with ZERO Exchange (pinned in
  * BucketedTableSpec); aggregations keyed by the bucket column skip
  * their shuffle the same way, and an equality filter on the key
  * prunes to 1 of n buckets at the FILE level (SelectedBucketsCount
  * in the scan) — the pk point-lookup (F11) without reading the
  * table.
  *
  * The writer repartitions by the bucket expression first, so each
  * task holds exactly one bucket and writes exactly one file —
  * without this, bucketed writes emit (shuffle partitions × buckets)
  * files, the classic small-file explosion ("bucketing writes 6400
  * files" is a layout bug, not a Spark property).
  *
  * Scope: bucket layout is a CATALOG property (Spark resolves bucket
  * spec through the table identifier, not the parquet path), so these
  * tables complement — not replace — the path-addressed CoW tables:
  * use [[PartitionedCowTable]] for versioned partition-level updates,
  * register the stable snapshots you repeatedly join via this.
  */
object BucketedTable {

  /** Write `df` as a managed parquet table bucketed (and sorted)
    * by `key` into `buckets` buckets, one file per bucket.
    */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$table`")

  /** Equi-join two same-key same-bucket-count tables; with both sides
    * bucketed this plans with no shuffle on either side.
    */
  def joinColocated(spark: SparkSession, left: String, right: String,
                    key: String, joinType: String = "inner"): DataFrame =
    read(spark, left).join(read(spark, right), Seq(key), joinType)
}
