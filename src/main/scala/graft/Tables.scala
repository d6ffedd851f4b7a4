package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Table registry over the driver-generated parquet test tables
  * (TESTDATA.md). At production scale these would be date-partitioned
  * Parquet/Delta catalogues (SURVEY.md §1.1); loading stays a plain
  * columnar scan either way, so filters/projections push down to the
  * parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Scratch base for queries that exercise real file/table I/O
    * (q44/q56/q57/q58): tmpfs when present — those queries measure
    * operator shape, not the scratch disk.
    */
  def scratchBase: String =
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
      "/dev/shm"
    else System.getProperty("java.io.tmpdir")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, s"$dir/$name.parquet")
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table has shipped under two physical encodings of `ts`:
    * TIMESTAMP(NANOS) (which Spark 4 rejects unless read as a raw long)
    * and plain timestamp[us]. Branch on the schema actually present in
    * the file rather than hard-coding either generation — contract
    * tables outlive any one materialization.
    */
  private[graft] def loadEvents(spark: SparkSession, path: String): DataFrame = {
    // `nanosAsLong` only affects how a NANOS column is surfaced; with it
    // set, a nanos file reads `ts` as LongType while a micros file still
    // reads a proper TimestampType. One schema probe decides the branch.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Legacy nanos file: truncate to micros. Integer `div`, not `/`,
        // because epoch-nanos (~1.7e18) overflows a double's 53-bit
        // mantissa.
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: org.apache.spark.sql.types.TimestampType => raw
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", expr("cast(ts as timestamp)"))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other at $path")
    }
  }
}
