package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: materialize an approximate sf1 dataset by replicating the
  * driver's sf0.1 tables with key offsets — used ONCE per round to
  * measure the per-query sf0.1→sf1 scaling curve recorded in
  * BASELINE.md (the driver only ships sf≤0.1; /root/testdata is
  * read-only, so the output goes to a scratch dir).
  *
  * Fact tables offset every id-like column by replica·10⁷ so joins
  * fan out consistently; dimension tables (region/nation) keep their
  * organic cardinality like real TPC-H. Documents get a per-replica
  * marker token appended (replica 0 untouched) so the DISTINCT
  * word-set count grows ~10× like an organic corpus would — without
  * it, exact-dedup-first pipelines (q30) would measure an artificially
  * easy workload. Events keep their nanosecond `ts` as raw longs
  * (plain INT64 parquet), which Tables.load's `ts div 1000` decode
  * handles identically to the driver's TIMESTAMP(NANOS) files.
  *
  * `sbt "runMain graft.examples.MakeScaledData [srcDir] [outDir] [replicas] [tables] [markerTokens]"`
  * (`tables` = optional comma list — an sf10 run for the text/vector
  * heavies needs only documents,embeddings, not 6 GB of lineitem)
  *
  * `markerTokens` (default 1) sets how many replica-unique tokens are
  * appended to each replicated document. At 1 every replica stays a
  * near-dup of its original (31-word docs: Jaccard 31/33 ≈ 0.94 ≥ the
  * q30 τ=0.9), so the TRUE near-dup pair set grows ∝ replicas² — at
  * 100 replicas that is ~1.4B pairs, a property of the replica
  * generator, not of any plan (organic corpora keep dup-group sizes
  * bounded as they grow). At 4, cross-replica Jaccard drops to
  * 31/35 ≈ 0.886 < 0.9 while within-replica structure is preserved —
  * the CONSTANT-DENSITY variant that measures how the plan scales
  * when the answer grows linearly.
  */
object MakeScaledData {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val n = if (args.length > 2) args(2).toInt else 10
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").toSet) else None
    val markerTokens = if (args.length > 4) args(4).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val OFF = 10000000L
    def load(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    def replicate(df: DataFrame, idCols: Seq[String])
                 (mutate: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until n).map { r =>
        val shifted = idCols.foldLeft(df) { (d, c) =>
          d.withColumn(c, col(c) + lit(r * OFF))
        }
        mutate(shifted, r)
      }.reduce(_ unionByName _)

    def write(df: => DataFrame, name: String): Unit =
      if (only.forall(_.contains(name))) {
        df.write.mode("overwrite").parquet(s"$out/$name.parquet")
        println(s"[mksf] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
      }

    // dimensions keep organic cardinality (broadcast side stays small
    // at any SF, like real TPC-H nation/region)
    write(load("region"), "region")
    write(load("nation"), "nation")
    write(replicate(load("customer"), Seq("c_custkey"))(), "customer")
    write(replicate(load("supplier"), Seq("s_suppkey"))(), "supplier")
    write(replicate(load("part"), Seq("p_partkey"))(), "part")
    write(replicate(load("orders"), Seq("o_orderkey", "o_custkey"))(), "orders")
    write(replicate(load("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey"))(), "lineitem")
    write(replicate(load("events"), Seq("event_id", "user_id"))(), "events")
    write(replicate(load("documents"), Seq("doc_id")) { (d, r) =>
      if (r == 0 || markerTokens <= 0) d
      else {
        val marker = (1 to markerTokens).map(k => s"rep${r}tk$k")
          .mkString(" ", " ", "")
        d.withColumn("text", concat(col("text"), lit(marker)))
      }
    }, "documents")
    write(replicate(load("embeddings"), Seq("vec_id"))(), "embeddings")
    spark.stop()
  }
}
