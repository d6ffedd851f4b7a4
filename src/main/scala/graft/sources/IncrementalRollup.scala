package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate — the "keep the
  * corpus stats table fresh without re-aggregating the lake" op
  * (Materialize/Delta-Live-Tables territory, partition-aligned
  * flavor): `summary = base.groupBy(dims).agg(aggs)` is maintained by
  * re-aggregating ONLY the partitions a commit actually touched.
  *
  * Requirements: `dims` must contain the base table's partition
  * column (checked loudly) — that alignment is what makes a
  * partition-local re-aggregate complete for every group it touches
  * (a group never spans two base partitions).
  *
  * [[refresh]] flow, all increments derived from the base MANIFEST
  * diff ([[PartitionedCowTable.changedPartitionValuesSince]] — the
  * same sharing argument as changedSince: untouched partitions keep
  * their dirs, so the diff IS the change list):
  *  1. read only CHANGED base partitions (pruned read) and
  *     re-aggregate them;
  *  2. reconcile the summary declaratively with `mergeSync`: source =
  *     summary's untouched rows + the fresh aggregate, so summary
  *     partitions rewrite only where a value changed, in ONE commit
  *     (inserts for new base partitions, updates for re-aggregated
  *     ones, deletes for base partitions that vanished or emptied —
  *     a DV-emptied partition yields no aggregate row and falls out
  *     naturally);
  *  3. checkpoint the synced base version in `_rollup_sync.json`
  *     beside the summary manifest. The checkpoint is written AFTER
  *     the commit, so a crash between them re-runs the same refresh —
  *     which reconciles to the identical state and commits nothing
  *     (mergeSync's no-op contract): idempotent, never lossy.
  *
  * At 100 TB the refresh cost is O(changed partitions' bytes) +
  * O(summary size) — the summary is an aggregate (metadata-scale
  * next to the base), and the base read opens only touched dirs
  * through the manifest index.
  */
class IncrementalRollup(val base: PartitionedCowTable,
                        val summaryRoot: String,
                        dims: Seq[String],
                        aggs: Seq[(String, Column)])
                       (implicit spark: SparkSession) {

  require(dims.contains(base.currentPartCol),
    s"IncrementalRollup: dims must include the base partition column " +
      s"'${base.currentPartCol}' — partition-aligned maintenance " +
      s"needs every group confined to one base partition")

  val summary = new PartitionedCowTable(
    summaryRoot, base.currentPartCol, spark)

  private def syncFile = Paths.get(summaryRoot, "_rollup_sync.json")

  /** The base version the summary reflects, if any. */
  def syncedVersion: Option[Int] =
    if (!Files.exists(syncFile)) None
    else Some(new String(Files.readAllBytes(syncFile), "UTF-8")
      .replaceAll("[^0-9]", "").toInt)

  private def aggregate(rows: DataFrame): DataFrame =
    rows.groupBy(dims.map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)

  /** One maintenance cycle. Returns (syncedFrom (-1 = full build),
    * recomputed partitions, removed partitions, (inserted, updated,
    * deleted) summary rows). No-op (all zeros, no commit) when the
    * summary is already at the base version.
    */
  def refresh(): (Int, Int, Int, (Long, Long, Long)) = {
    val cur = base.version
    val last = syncedVersion
    if (last.contains(cur)) return (cur, 0, 0, (0L, 0L, 0L))
    val (changed, removed) = last match {
      case Some(v) => base.changedPartitionValuesSince(v)
      case None => (base.manifest.keySet, Set.empty[String])
    }
    val touched = changed ++ removed
    val fresh = aggregate(base.readWhere(changed.contains))
    val source =
      if (!summary.exists) fresh
      else summary.read()
        .filter(!col(base.currentPartCol).isin(touched.toSeq: _*))
        .unionByName(fresh)
    val iud =
      if (!summary.exists) { summary.overwrite(fresh); (-1L, -1L, -1L) }
      // partition-scoped diff (r15, guide §1.2): outside `touched`
      // the source rows ARE the summary's rows by construction (they
      // were read from it two lines up), so the unrestricted
      // mergeSync hashed and full-outer-joined the WHOLE summary —
      // twice — to re-discover a change set this refresh derived
      // from the manifest diff in the first place. The scoped form
      // diffs only touched partitions (manifest-pruned on the table
      // side) and returns identical I/U/D counts and content.
      else summary.mergeSyncInPartitions(touched, source, dims)
    Files.write(syncFile, s"""{"base": $cur}""".getBytes("UTF-8"))
    (last.getOrElse(-1), changed.size, removed.size, iud)
  }
}
