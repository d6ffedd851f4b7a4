package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-table snapshot catalog — the CROSS-TABLE consistency layer
  * single-table time travel (q131) cannot express: a LOGICAL STEP
  * records the versions of every participating table only AFTER all
  * of that step's per-table commits have landed, so a reader
  * resolving step k sees either all of a step's commits or none of
  * them — never the half-state between two tables' pointer flips
  * (the reference wraps its downloader + catalogue update in one DB
  * transaction, eodatadownlandsatgoogsensor.py:2375-2388; this is
  * that guarantee at table granularity). The log is itself an
  * append-only [[CowTable]], so recovery and concurrency inherit its
  * atomic pointer flip: a crashed multi-table step leaves the log
  * unadvanced and the orphan table versions invisible to every
  * snapshot reader (vacuum reclaims them later).
  *
  * Scale shape: the log holds (step, table, version) triples —
  * metadata by construction — and [[versionsAt]] is a grouped argmax
  * over it; the data tables are never touched until the caller
  * resolves a snapshot and `readVersion`s them.
  */
class SnapshotCatalog(val root: String, spark: SparkSession) {

  private val log = new CowTable(root, spark)

  /** Publish a step: every participating table's committed version,
    * recorded atomically (one log append = one pointer flip). Call
    * AFTER all the step's table commits succeeded.
    */
  def record(step: Long, versions: Map[String, Int]): Unit = {
    import spark.implicits._
    val rows = versions.toSeq.sortBy(_._1)
      .map { case (t, v) => (step, t, v) }
    log.append(rows.toDF("step", "table", "version"))
  }

  /** table → version in force at-or-before `step` (latest recorded
    * step wins per table); tables first recorded after `step` are
    * absent. Driver-side collect is bounded by the table COUNT.
    */
  def versionsAt(step: Long): Map[String, Int] = {
    log.read().filter(col("step") <= step)
      .groupBy("table")
      .agg(max(struct(col("step"), col("version"))).as("m"))
      .select(col("table"), col("m.version").as("version"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
  }

  /** Highest recorded step, or -1 on an empty/absent log. */
  def currentStep: Long =
    if (!log.exists) -1L
    else log.read().agg(coalesce(max("step"), lit(-1L)))
      .head().getLong(0)
}
