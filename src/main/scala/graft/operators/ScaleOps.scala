package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Operators that exist purely for 100 TB-scale execution shape
  * (SURVEY.md §4 optimizer table): skew mitigation and co-located
  * joins. On the toy test tables they change nothing semantically —
  * specs assert plan shape and result equivalence.
  */
object ScaleOps {

  /** Salted equi-join for skewed keys: the build side is replicated
    * `salt` times, the probe side scatters each row to one replica, so
    * one hot key spreads over `salt` reducers instead of one straggler
    * task. AQE's skew-join handles moderate skew automatically;
    * salting is for the pathological key that still exceeds a single
    * task (the reference's analogue is one-process-per-scene, which
    * simply stalls, eodatadownrun.py:786-787).
    *
    * `left` is the large/skewed side, `right` the smaller build side.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Range-partition pruning predicate for date-partitioned tables:
    * partition column filter composed alongside the row filter so the
    * scan skips whole partitions (the watermark-incremental read,
    * SURVEY §4 row 2).
    */
  def partitionPrunedRange(partCol: Column, rowCol: Column,
                           startIncl: String, endIncl: String): Column =
    partCol >= lit(startIncl.substring(0, 7)) &&
      partCol <= lit(endIncl.substring(0, 7)) &&
      rowCol >= lit(startIncl) && rowCol <= lit(endIncl)
}
