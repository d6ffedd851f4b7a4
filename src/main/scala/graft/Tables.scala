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
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects
      // outright. Read nanos as long and truncate to micros —
      // integer `div`, not `/`, because epoch-nanos (~1.7e18)
      // overflows a double's 53-bit mantissa.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
