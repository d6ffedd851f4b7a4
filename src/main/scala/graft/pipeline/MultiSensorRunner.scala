package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.SceneCatalog
import graft.pipeline.StepRunner.SceneStep

/** Cross-sensor run orchestration: the reference's
  * `get_scenes_need_processing` sweep (eodatadownrun.py:790-845) and
  * its date-ordered merge `get_scenes_need_processing_date_order`
  * (eodatadownrun.py:939-976) as one reusable operator over N
  * [[SceneCatalog]]s, plus the per-sensor step driver.
  *
  * The reference builds the merged list by keying a dict on the obs
  * DATETIME (`scns_dict[scn_datetime] = scn`, eodatadownrun.py:965) —
  * two scenes sharing a timestamp silently collapse to one (the
  * collision bug SURVEY.md §5 pins, fixed here as in q22): this union
  * keeps every row, and the sort key (obs_dt, sensor, PID) is total,
  * so ordering is deterministic and nothing is dropped. Dates cast to
  * timestamps exactly as the reference promotes `datetime.date`
  * (eodatadownrun.py:966-968).
  *
  * Scale shape: per-catalog work lists are unions of flag filters
  * (pushdown-friendly), each semi-join back to its scene table is
  * per-sensor (broadcast when the pending set is small), and the only
  * global operation is the final sort — a range-partitioned exchange,
  * never a driver collection.
  */
object MultiSensorRunner {

  /** Scenes still needing ANY of `steps`, tagged by sensor, each scene
    * once (the reference's per-sensor `scn_ids` dedup across step
    * lists, eodatadownrun.py:809-844). Columns: sensor, PID, obs_dt.
    */
  def scenesNeedProcessing(cats: Seq[(String, SceneCatalog)],
                           steps: Seq[SceneStep]): DataFrame = {
    require(cats.nonEmpty && steps.nonEmpty,
      "need at least one catalog and one step")
    cats.map { case (tag, cat) =>
      val pending = steps.map(_.workList(cat).select("PID"))
        .reduce(_.unionByName(_)).distinct()
      cat.scenes
        .join(pending, Seq("PID"), "left_semi")
        .select(lit(tag).as("sensor"), col("PID"),
          col(cat.sensor.obsDateCol).cast("timestamp").as("obs_dt"))
    }.reduce(_.unionByName(_))
  }

  /** [[scenesNeedProcessing]] in ascending obs-datetime order — the
    * run list `run_scn_analysis` consumes. Collision-safe total order:
    * (obs_dt, sensor, PID).
    */
  def scenesNeedProcessingDateOrder(cats: Seq[(String, SceneCatalog)],
                                    steps: Seq[SceneStep]): DataFrame =
    scenesNeedProcessing(cats, steps).orderBy("obs_dt", "sensor", "PID")

  /** Drive the ordered step sequence over every catalog
    * (process_scenes_all_steps across sensors, eodatadownrun.py:768-788).
    * @return (sensor, step, nProcessed, nSucceeded) per sensor × step.
    */
  def runAllSensors(spark: SparkSession, cats: Seq[(String, SceneCatalog)],
                    steps: Seq[SceneStep], parallelism: Int,
                    audit: Option[AuditLog] = None): Seq[(String, String, Long, Long)] =
    cats.flatMap { case (tag, cat) =>
      StepRunner.runAll(spark, cat, steps, parallelism, audit)
        .map { case (step, n, ok) => (tag, step, n, ok) }
    }
}
