package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.SceneCatalog
import graft.pipeline.{AuditLog, StepRunner}
import graft.pipeline.StepRunner.SceneStep

/** The reference's monitoring loop (bin/eoddrunmonitoring.py:88-89:
  * find new scenes, then run every processing step; same shape in
  * bin/eoddchknewscns.py + bin/eoddrunscnmonitoring.py) as ONE
  * pipeline: catalogue rows in → key-anti-join ingest → ordered
  * state-machine steps → audit sink (S12). SURVEY.md §2.9's "one
  * streaming pipeline" row.
  *
  * Idempotence is the recovery story at every layer, exactly like the
  * reference's re-runnable cron loop: replayed batches are dropped by
  * the ingest key anti-join, re-run steps re-select only still-pending
  * scenes, and a crashed tick resumes from the streaming checkpoint.
  */
object MonitorLoop {

  /** One monitoring tick over an already-materialized batch of
    * catalogue rows: ingest (J6 in-batch dedup + J1 anti-join), then
    * the ordered step sequence. Returns per-step (name, processed,
    * succeeded).
    */
  def tick(spark: SparkSession, cat: SceneCatalog, batch: DataFrame,
           keys: Seq[String], newestFirst: Seq[org.apache.spark.sql.Column],
           steps: Seq[SceneStep], parallelism: Int,
           audit: Option[AuditLog] = None): Seq[(String, Long, Long)] = {
    IncrementalIngest.ingestBatch(cat.table, batch, keys, newestFirst)
    StepRunner.runAll(spark, cat, steps, parallelism, audit)
  }

  /** The continuous form: a streaming source of catalogue rows drives
    * [[tick]] per micro-batch through `foreachBatch`. At-least-once
    * delivery from the checkpoint upgrades to effective exactly-once
    * on the table via the key anti-join; steps run after each ingest,
    * so a scene is processed in the first tick at or after its arrival.
    */
  def stream(spark: SparkSession, source: DataFrame, cat: SceneCatalog,
             keys: Seq[String], newestFirst: Seq[org.apache.spark.sql.Column],
             steps: Seq[SceneStep], parallelism: Int, checkpoint: String,
             audit: Option[AuditLog] = None,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        tick(spark, cat, batch, keys, newestFirst, steps, parallelism, audit)
        ()
      }
      .start()
}
