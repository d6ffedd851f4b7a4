package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Partition-level copy-on-write table — the 100 TB layout promised by
  * [[CowTable]]'s scaladoc, implemented. A version is a MANIFEST
  * (JSON: partition value → data directory) rather than a data
  * directory: committing an update writes ONLY the partitions
  * containing touched rows into a fresh `w_<n>/` dir and re-references
  * every untouched partition's existing directory. A catalogue update
  * that touches one acquisition month rewrites that month, not the
  * table — unchanged bytes are shared across versions, the same
  * file-re-listing idea as Delta/Iceberg, without the dependency.
  *
  * Layout: `<root>/w_<n>/__part=<value>/part-*.parquet` (data; one
  * Spark job per commit via `partitionBy`), `<root>/v_<n>.json`
  * (manifest: partitions + schema DDL), `<root>/_current` (atomic
  * pointer). Readers follow `_current` → manifest → dirs, so a
  * crashed writer never tears the table and re-runs are idempotent
  * (the reference's recovery story, SURVEY.md §7.5 #1).
  *
  * Constraints (pinned in PartitionedCowTableSpec): `partCol` values
  * must be non-null and path-safe (dates/months are); a key's
  * partition value must not change across upserts (the reference
  * never rewrites `Date_Acquired`). Rows keep `partCol` as a normal
  * column — each partition dir has a constant value for it, so
  * parquet min/max stats prune it even on full-table reads.
  */
class PartitionedCowTable(val root: String, val partCol: String,
                          spark: SparkSession) extends VersionedTable {

  private val mapper = new ObjectMapper()
  private def pointer = Paths.get(root, "_current")

  private def currentVersion: Option[Int] =
    if (Files.exists(pointer))
      Some(new String(Files.readAllBytes(pointer), UTF_8).trim.toInt)
    else None

  override def exists: Boolean = currentVersion.isDefined

  private def requireVersion: Int = currentVersion.getOrElse(
    throw new IllegalStateException(s"no committed version at $root"))

  /** partition value → data dir relative to root (current version) —
    * public introspection, the `DESCRIBE DETAIL` analogue.
    */
  def manifest: Map[String, String] = manifestAt(requireVersion)

  private def manifestAt(v: Int): Map[String, String] = {
    val node = mapper.readTree(Files.readAllBytes(
      Paths.get(root, f"v_$v%06d.json")))
    node.get("partitions").fields().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap
  }

  private def schemaAt(v: Int): StructType =
    StructType.fromDDL(mapper.readTree(Files.readAllBytes(
      Paths.get(root, f"v_$v%06d.json"))).get("schema").asText())

  override def read(): DataFrame = readWhere(_ => true)

  /** Manifest-level partition pruning: only matching partitions' dirs
    * are listed, opened, or scheduled — the reader never touches the
    * rest (the watermark/date-range scan path at scale).
    */
  def readWhere(partFilter: String => Boolean): DataFrame =
    readVersionWhere(requireVersion, partFilter)

  /** Time travel: the table exactly as version `v` committed it.
    * A version is a manifest, so reading one is just following ITS
    * partition→dir map — superseded versions stay readable until
    * [[vacuum]] reclaims their unshared directories (the Delta-style
    * retention contract; a vacuumed version raises on read because
    * its manifest file is gone).
    */
  def readVersion(v: Int): DataFrame = readVersionWhere(v, _ => true)

  /** [[readVersion]] with manifest-level partition pruning. */
  def readVersionWhere(v: Int,
                       partFilter: String => Boolean): DataFrame = {
    require(Files.exists(Paths.get(root, f"v_$v%06d.json")),
      s"no version $v at $root (never committed, or vacuumed away)")
    val dirs = manifestAt(v).filter { case (value, _) => partFilter(value) }
      .values.map(d => s"$root/$d").toSeq
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schemaAt(v))
    else spark.read.parquet(dirs: _*)
  }

  /** Current committed version number (for [[changedSince]]). */
  def version: Int = requireVersion

  /** CDC-lite: rows of every partition whose data directory differs
    * from version `sinceVersion`'s manifest (rewritten, newly created,
    * or re-created). Untouched partitions share their directory across
    * versions by construction, so the manifest diff IS the change set —
    * a downstream consumer checkpoints the version number and
    * re-processes only rewritten partitions, never the table.
    * `sinceVersion < 0` means everything. Note `vacuum()` retention:
    * a vacuumed-away base version can no longer be diffed against
    * (same contract as Delta-style time travel).
    */
  def changedSince(sinceVersion: Int): DataFrame = {
    val cur = requireVersion
    val old =
      if (sinceVersion < 0) Map.empty[String, String]
      else manifestAt(sinceVersion)
    val changed = manifestAt(cur).filter { case (k, d) =>
      !old.get(k).contains(d)
    }.keySet
    readWhere(changed.contains)
  }

  /** The distinct partition values present in a DataFrame — small by
    * construction (a commit touches few partitions), so the collect is
    * bounded by partition count, not data size.
    */
  private def touchedValues(df: DataFrame): Set[String] = {
    val vals = df.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    // manifest keys are recovered from `__part=<value>` directory
    // names, which Spark percent-escapes — a value that doesn't
    // round-trip would mismatch its raw form here, leave the stale
    // manifest entry in place, and silently duplicate rows on read.
    // Enforce the documented constraint instead of trusting it.
    vals.foreach { v =>
      require(v != null,
        s"partition column '$partCol' contains null — not supported")
      val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(v)
      require(esc == v,
        s"partition value '$v' is not path-safe (escapes to '$esc'); " +
          s"use a path-safe derivation for '$partCol' (dates/months are)")
    }
    vals
  }

  /** Core commit: write `data` as the new content of exactly the
    * partitions in `touched` (a touched partition absent from `data`
    * is dropped — it became empty); carry every untouched partition
    * from `carried`.
    */
  private def commit(data: DataFrame, touched: Set[String],
                     carried: Map[String, String]): Unit = {
    val next = currentVersion.map(_ + 1).getOrElse(0)
    val wdir = f"w_$next%06d"
    // stage under a writer-unique name, then claim w_<next> with a
    // no-replace rename (see CowTable.commit): two writers racing from
    // the same base both target w_<next>, and the loser's overwrite
    // could delete the winner's committed files mid-write — the
    // dir-name collision fails the loser before shared state is touched
    val stage = s"_stage_${wdir}_${java.util.UUID.randomUUID()}"
    data
      .withColumn("__part", col(partCol).cast("string"))
      .write.partitionBy("__part").mode("overwrite").parquet(s"$root/$stage")
    // catch the whole FileSystemException family, not just the
    // pre-rename existence stat's FileAlreadyExistsException: two
    // racers passing that check together fall through to raw
    // rename(2), which surfaces as DirectoryNotEmptyException on a
    // non-empty claimed target (see CowTable.commit)
    try {
      Files.move(Paths.get(root, stage), Paths.get(root, wdir))
    } catch {
      case e: java.nio.file.FileSystemException =>
        // best-effort cleanup; never mask the rename diagnosis
        try CowTable.walkDelete(Paths.get(root, stage))
        catch { case c: Exception => e.addSuppressed(c) }
        val cme = new java.util.ConcurrentModificationException(
          s"concurrent commit detected at $root: data dir $wdir " +
            s"already claimed (competing writer from the same base; " +
            s"rename failed with ${e.getClass.getSimpleName})")
        cme.initCause(e)
        throw cme
    }
    val written: Map[String, String] = {
      val listing = Files.list(Paths.get(root, wdir))
      try listing.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("__part="))
        .map(n => n.stripPrefix("__part=") -> s"$wdir/$n").toMap
      finally listing.close()
    }
    try {
      writeVersion(next, data.schema.toDDL, (carried -- touched) ++ written)
    } catch {
      case e: java.util.ConcurrentModificationException =>
        // the claimed data dir is ours (the rename succeeded) and no
        // manifest references it — remove it so a clean retry from the
        // new base isn't blocked by the orphan
        CowTable.walkDelete(Paths.get(root, wdir))
        throw e
    }
  }

  private def writeVersion(v: Int, schemaDdl: String,
                           partitions: Map[String, String]): Unit = {
    // optimistic concurrency (see CowTable.commit): a competing writer
    // advancing the pointer mid-commit means this manifest's carried
    // partitions derive from a stale read — fail loudly, don't
    // silently drop the other commit
    val expected = if (v == 0) None else Some(v - 1)
    if (currentVersion != expected)
      throw new java.util.ConcurrentModificationException(
        s"concurrent commit detected at $root: expected base " +
          s"${expected.getOrElse("<none>")}, found " +
          s"${currentVersion.getOrElse("<none>")}")
    val node = mapper.createObjectNode()
    node.put("schema", schemaDdl)
    val parts = node.putObject("partitions")
    partitions.toSeq.sortBy(_._1).foreach { case (k, d) => parts.put(k, d) }
    Files.write(Paths.get(root, f"v_$v%06d.json"),
      mapper.writeValueAsBytes(node))
    val tmp = Paths.get(root, s"_current.tmp.$v")
    Files.write(tmp, v.toString.getBytes(UTF_8))
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def currentManifestOrEmpty: Map[String, String] =
    currentVersion.map(manifestAt).getOrElse(Map.empty)

  /** Create or fully replace the table (every partition rewritten). */
  override def overwrite(df: DataFrame): Unit = {
    val all = currentManifestOrEmpty.keySet ++ touchedValues(df)
    commit(df, all, currentManifestOrEmpty)
  }

  /** Append rows: only the partitions the batch lands in are
    * rewritten (existing rows of those partitions union the batch).
    */
  override def append(df: DataFrame): Unit =
    if (!exists) overwrite(df)
    else {
      val touched = touchedValues(df)
      commit(readWhere(touched).unionByName(df), touched, manifest)
    }

  /** PK upsert (J7): incoming rows replace same-key rows; untouched
    * PARTITIONS (not just rows) are carried by reference.
    */
  override def upsert(updates: DataFrame, keys: Seq[String]): Unit =
    if (!exists) overwrite(updates)
    else {
      val touched = touchedValues(updates)
      commit(
        readWhere(touched)
          .join(updates.select(keys.map(col): _*), keys, "left_anti")
          .unionByName(updates),
        touched, manifest)
    }

  /** Targeted column update: partitions containing matching rows are
    * found first (pruned scan), then only those are rewritten.
    */
  override def updateWhere(pred: Column,
                           sets: Map[String, Column]): Unit = {
    val touched = touchedValues(read().filter(pred))
    if (touched.nonEmpty) {
      val updated = sets.foldLeft(readWhere(touched)) {
        case (df, (name, value)) =>
          df.withColumn(name, when(pred, value).otherwise(col(name)))
      }
      commit(updated, touched, manifest)
    }
  }

  /** Anti-delete: only partitions containing matching rows are
    * rewritten; a partition deleted empty leaves the manifest.
    */
  override def deleteWhere(pred: Column): Unit = {
    val touched = touchedValues(read().filter(pred))
    if (touched.nonEmpty)
      commit(readWhere(touched).filter(!pred), touched, manifest)
  }

  /** Single-commit CDC apply — MERGE INTO semantics over an ops log:
    * `ops` carries the table's columns plus `opCol` ∈ {'I','U','D'}.
    * Inserts and updates land as a PK upsert, deletes drop their
    * keys, and ALL of it commits as ONE version — the shape a
    * downstream consumer of [[changedSince]] (or any Debezium-style
    * feed) replays a batch with, where upsert-then-delete as two
    * commits would publish a state no upstream transaction ever held.
    * Only partitions containing op rows are rewritten (delete rows
    * must carry their partition value — the same never-rewrites-the-
    * partition-column contract as [[upsert]]). A batch with two ops
    * for one key has no defined order and fails loudly (the probe is
    * a limit-1 existence job, not a full count); callers consolidate
    * to final-state-per-key first (the q126 latest-per-key device).
    */
  def mergeApply(ops: DataFrame, keys: Seq[String],
                 opCol: String = "op"): Unit = {
    val dup = ops.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      .limit(1).count()
    require(dup == 0,
      s"mergeApply: multiple ops for one key — consolidate the batch " +
        s"to final state per key before applying")
    val data = ops.filter(col(opCol) =!= "D").drop(opCol)
    if (!exists) { overwrite(data); return }
    val touched = touchedValues(ops)
    val touchedKeys = ops.select(keys.map(col): _*)
    commit(
      readWhere(touched)
        .join(touchedKeys, keys, "left_anti")
        .unionByName(data),
      touched, manifest)
  }

  /** Compact the selected partitions: rewrite each as a single task's
    * output (one file per partition dir), carrying everything else by
    * reference. The small-file antidote for long-lived tables — every
    * upsert rewrites whole partitions with the writer's parallelism,
    * so file counts grow with commit history; compaction is the same
    * commit path with a hash repartition on the partition column, so
    * each partition's rows land in exactly one task. Row content is
    * unchanged (a pure layout commit); old dirs become vacuumable.
    */
  def compact(partFilter: String => Boolean = _ => true): Unit = {
    val touched = manifest.keySet.filter(partFilter)
    if (touched.nonEmpty)
      commit(readWhere(touched).repartition(col(partCol)), touched, manifest)
  }

  /** Drop every `w_*` dir and `v_*.json` no longer reachable from the
    * current manifest; shared dirs it still references survive.
    */
  override def vacuum(): Unit = currentVersion.foreach { cur =>
    val live = manifestAt(cur).values.map(_.split('/').head).toSet
    val entries = {
      val listing = Files.list(Paths.get(root))
      try listing.iterator().asScala.toSeq finally listing.close()
    }
    entries.foreach { p =>
      val n = p.getFileName.toString
      val deadData = n.startsWith("w_") && !live.contains(n)
      val deadManifest = n.startsWith("v_") && n.endsWith(".json") &&
        n != f"v_$cur%06d.json"
      val deadStage = n.startsWith("_stage_")
      if (deadData || deadManifest || deadStage) CowTable.walkDelete(p)
    }
  }
}

object PartitionedCowTable {
  def apply(root: String, partCol: String)
           (implicit spark: SparkSession): PartitionedCowTable =
    new PartitionedCowTable(root, partCol, spark)
}
