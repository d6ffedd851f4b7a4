package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
