package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{GraftFunctions => G}

/** Dev utility: LSH band-bucket size distribution for the q30 minhash
  * pipeline — the metric behind `bucketCap` tuning (a bucket is
  * quadratic work in the unguarded self-join, so the cap must sit
  * above the corpus's organic sizes and below the pathology).
  * `sbt "runMain graft.examples.LshStats <sfDir>"`
  */
object LshStats {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (k, bands) = (128, 16)
    val rows = k / bands
    val banded = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), G.minhashSig(G.sortedWordSet(col("text")), k).as("sig"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          i => xxhash64(i, slice(col("sig"), i * lit(rows) + lit(1), lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val sizes = banded.groupBy("band", "bucket").count()
    val stats = sizes.agg(
      count(lit(1)).as("n_buckets"),
      max("count").as("max_size"),
      expr("percentile(count, 0.99)").as("p99"),
      sum(col("count") * (col("count") - 1) / 2).as("candidate_pairs_upper"))
    println("[lshstats] " + stats.collect().head)
    println("[lshstats] top buckets:")
    sizes.orderBy(col("count").desc).limit(10).collect()
      .foreach(r => println(s"[lshstats]   $r"))
    spark.stop()
  }
}
