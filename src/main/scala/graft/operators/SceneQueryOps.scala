package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Predicate builders mirroring the reference sensor query API's
  * filter semantics (SURVEY.md §2.2). Pinned edge cases (§5):
  * scene date-ranges are CLOSED (F2) while obs-date ranges are STRICT
  * (F3); bbox overlap is strict `>` (F7); optional filters compose as
  * `Option` — `None` omits the predicate entirely, matching the
  * reference's conditional SQL-string building.
  *
  * All are plain `Column` expressions, so they push down to the
  * parquet scan and stay inside whole-stage codegen.
  */
object SceneQueryOps {

  /** F2: closed date range (eodatadownlandsatgoogsensor.py:1947-1948). */
  def dateRangeClosed(c: Column, startIncl: String, endIncl: String): Column =
    c >= lit(startIncl) && c <= lit(endIncl)

  /** F3: strict range on obs-date rollups (eodatadownsensor.py:720-721). */
  def dateRangeStrict(c: Column, startExcl: String, endExcl: String): Column =
    c > lit(startExcl) && c < lit(endExcl)

  /** F4: optional threshold — None ⇒ predicate omitted
    * (eodatadownlandsatgoogsensor.py:1945-1955).
    */
  def maxThreshold(c: Column, thres: Option[Double]): Column =
    thres.map(t => c <= lit(t)).getOrElse(lit(true))

  /** Compose optional predicates; empty list ⇒ true. */
  def allOf(preds: Option[Column]*): Column =
    preds.flatten.reduceOption(_ && _).getOrElse(lit(true))

  /** F7: strict bbox-overlap theta predicate
    * (eodatadownlandsatgoogsensor.py:2074-2103) — `>` not `>=`, i.e.
    * shared edges do NOT overlap. At scale this is the cheap envelope
    * prefilter that runs before any exact geometry test, and it prunes
    * range-partitioned data.
    */
  def bboxOverlap(north: Column, south: Column, east: Column, west: Column,
                  qNorth: Double, qSouth: Double, qEast: Double, qWest: Double): Column =
    lit(qEast) > west && east > lit(qWest) &&
      lit(qNorth) > south && north > lit(qSouth)

  /** C2 + F10: month-of-year membership
    * (eodatadownlandsatgoogsensor.py:603-615).
    */
  def monthIn(ts: Column, months: Seq[Int]): Column =
    month(ts).isin(months.map(Integer.valueOf): _*)

  /** F10: (path,row)-style pair disjunction via struct IN-list
    * (eodatadownlandsatgoogsensor.py:560-615).
    */
  def pairIn(a: Column, b: Column, pairs: Seq[(String, String)]): Column =
    struct(a, b).isin(pairs.map { case (x, y) => struct(lit(x), lit(y)) }: _*)
}
