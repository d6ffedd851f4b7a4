package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming aggregations (SURVEY.md §2.9). The reference
  * has no native windows (its rollups are batch, A6/J4); these are the
  * streaming-native forms the engine adds: tumbling event-time buckets
  * with late-data bounds, and the obs-date rollup as a continuously
  * maintained result.
  */
object StreamOps {

  /** Tumbling event-time aggregation with a late-data watermark.
    * State is bounded: windows older than the watermark are finalized
    * and dropped from the store.
    */
  def tumblingAgg(stream: DataFrame, tsCol: String, windowDuration: String,
                  lateness: String, keys: Seq[Column],
                  aggs: Seq[Column]): DataFrame =
    stream
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowDuration) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** One processing-step event for a scene (download finished, ARD
    * built, datacube loaded — the reference's boolean state flags as
    * an event stream).
    */
  case class StepEvent(scene_id: String, step: String, ts: Timestamp)

  /** Consolidated per-scene progress through the state machine. */
  case class SceneProgress(scene_id: String, downloaded: Boolean,
                           ard: Boolean, dcloaded: Boolean,
                           last_ts: Timestamp, n_events: Int)

  /** The reference's per-scene state machine (Downloaded → ARDProduct
    * → DCLoaded, eodatadownlandsatgoogsensor.py:69-106) maintained as
    * keyed custom state over a step-event stream via
    * `flatMapGroupsWithState`: each arriving step folds into the
    * scene's state and emits the consolidated progress row. State is
    * BOUNDED — scenes idle past `idleGapMs` of event time are dropped
    * from the store (event-time timeout against the watermark), which
    * is what keeps the state store finite over an unbounded catalogue.
    */
  def sceneStateMachine(events: Dataset[StepEvent],
                        lateness: String,
                        idleGapMs: Long): Dataset[SceneProgress] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.scene_id)
      .flatMapGroupsWithState[SceneProgress, SceneProgress](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (sceneId: String, batch: Iterator[StepEvent],
         state: GroupState[SceneProgress]) =>
          if (state.hasTimedOut) {
            state.remove() // idle scene: free the store, emit nothing
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(
              SceneProgress(sceneId, downloaded = false, ard = false,
                dcloaded = false, last_ts = new Timestamp(0), n_events = 0))
            val next = batch.foldLeft(prev) { (p, e) =>
              SceneProgress(sceneId,
                p.downloaded || e.step == "download",
                p.ard || e.step == "ard",
                p.dcloaded || e.step == "dcload",
                if (e.ts.after(p.last_ts)) e.ts else p.last_ts,
                p.n_events + 1)
            }
            state.update(next)
            state.setTimeoutTimestamp(next.last_ts.getTime + idleGapMs)
            Iterator.single(next)
          }
      }
  }

  /** Obs-date rollup (A6/J4) maintained over a stream: one row per
    * (date, key) with counts — the streaming twin of q19.
    */
  def obsDateRollup(stream: DataFrame, tsCol: String, lateness: String,
                    keys: Seq[Column]): DataFrame =
    stream
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), "1 day") +: keys: _*)
      .agg(count(lit(1)).as("n_events"))
      .select((Seq(to_date(col("window.start")).as("obs_date")) ++ keys :+
        col("n_events")): _*)

  /** Streaming exact dedup — the streaming twin of the q25 batch
    * dedup: exactly one row survives per content hash (later arrivals
    * drop; within one micro-batch the survivor is partition-order
    * dependent). `dropDuplicatesWithinWatermark` bounds the state
    * store: a hash older than the event-time watermark is forgotten,
    * so an unbounded corpus stream runs in bounded memory (the dedup
    * guarantee then holds within the lateness horizon — exactly the
    * contract an ingest pipeline wants; a global guarantee would need
    * unbounded state on any engine).
    */
  def streamingDedup(stream: DataFrame, contentCol: String, tsCol: String,
                     lateness: String): DataFrame =
    stream
      .withColumn("__content_hash", md5(col(contentCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")

  /** One element of a merged as-of stream: a dimension update
    * (side = 0, payload set) or a fact event (side = 1). The caller
    * unions the two sources into this shape.
    */
  case class AsofInput(key: Long, ts: Timestamp, side: Int,
                       payload: String, event_id: Long)

  /** A fact event enriched with the dimension version in force at its
    * event time (nulls when no version that old is retained).
    */
  case class AsofEnriched(event_id: Long, key: Long, ts: Timestamp,
                          asof_payload: String, asof_ts: Timestamp)

  /** Keyed state for [[streamingAsofEnrich]]: parallel version
    * arrays (timestamps ascending) — parallel Seqs rather than a
    * Seq of tuples because the case-class state encoder must be
    * codegen-friendly (and the class must be public for the
    * generated code to reach its accessors).
    */
  case class AsofState(versionTs: Seq[Long], versionPayload: Seq[String],
                       maxTs: Long)

  /** Streaming as-of enrichment — the continuous twin of
    * [[graft.operators.RelationalOps.asofJoinPrior]]: facts are
    * enriched with the latest dimension version whose timestamp is
    * <= the fact's event time.
    *
    * Per-key custom state via `flatMapGroupsWithState` holds the last
    * `retainVersions` dimension versions (a few hundred bytes per key
    * — bounded regardless of stream length), and keys idle past
    * `idleGapMs` of event time are dropped on event-time timeout, so
    * the store stays finite over an unbounded key space.
    *
    * Semantics contract: inputs are processed in event-time order
    * WITHIN each micro-batch (so intra-batch disorder is corrected),
    * but a dimension update arriving in a LATER batch than a fact it
    * should have enriched does not retro-correct that fact — the
    * standard streaming-enrichment trade; widen the upstream
    * watermark/batch interval if cross-batch disorder matters.
    * Dimension updates sharing (key, ts) REPLACE each other (the one
    * processed last wins) — re-delivery is idempotent, but a source
    * that emits genuinely different payloads at the same (key, ts)
    * has no defined winner; deduplicate upstream, as with the batch
    * twin's unique-per-(key, rightTs) precondition.
    */
  /** One status observation for the SCD2 maintainer. */
  case class StatusEvent(user_id: Long, ts: Timestamp, event_id: Long,
                         status: String)

  /** The open run for one user: current status, when it started, the
    * last event timestamp it absorbed (millis — the idle-timeout
    * anchor), and how many observations it has absorbed. `since`
    * stays a full Timestamp — a long-millis form would truncate the
    * microsecond precision the events carry. */
  case class ScdRun(status: String, since: Timestamp, lastMs: Long,
                    n: Long)

  /** A CLOSED validity interval — what the stream emits. Open runs
    * live only in state; they close (and emit) when a different
    * status arrives, exactly the batch q197 contract for rows with a
    * non-null valid_to. */
  case class ScdInterval(user_id: Long, status: String,
                         valid_from: Timestamp, valid_to: Timestamp,
                         n_events: Long)

  /** Streaming SCD2 interval maintenance — the continuous twin of
    * the batch q197 build: per key, consecutive same-status
    * observations collapse into one run held in state; a status
    * CHANGE closes the run and emits [valid_from, valid_to) with
    * valid_to = the new run's start. Emission is append-only and
    * restricted to CLOSED intervals, so output is exactly the batch
    * build's non-null-valid_to rows regardless of how the stream is
    * sliced into micro-batches — the property the q208 multi-batch
    * gate checks. Observations are sorted (ts, event_id) WITHIN each
    * micro-batch (intra-batch disorder corrected); cross-batch
    * disorder follows the same no-retro-correction trade as
    * [[streamingAsofEnrich]]. State per key is one small run record;
    * keys idle past `idleGapMs` drop on event-time timeout (their
    * open run is discarded unemitted, like the batch form's
    * null-valid_to rows). "Idle" is anchored to the run's LAST
    * observed event (lastMs + idleGapMs), matching
    * [[streamingAsofEnrich]]/sessionize — anchoring to the run START
    * would discard long same-status runs that are still receiving
    * events, and once the watermark passed since+idleGapMs the
    * setTimeoutTimestamp call itself would throw.
    */
  def scdIntervals(events: Dataset[StatusEvent], lateness: String,
                   idleGapMs: Long): Dataset[ScdInterval] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ScdRun, ScdInterval](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[StatusEvent],
         state: GroupState[ScdRun]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ordered = batch.toSeq.sortBy(e =>
              (e.ts.getTime, e.ts.getNanos.toLong, e.event_id))
            val closed = Seq.newBuilder[ScdInterval]
            var run = state.getOption.orNull
            ordered.foreach { e =>
              if (run == null) {
                run = ScdRun(e.status, e.ts, e.ts.getTime, 1L)
              } else if (run.status == e.status) {
                run = run.copy(n = run.n + 1,
                  lastMs = math.max(run.lastMs, e.ts.getTime))
              } else {
                closed += ScdInterval(userId, run.status, run.since,
                  e.ts, run.n)
                run = ScdRun(e.status, e.ts, e.ts.getTime, 1L)
              }
            }
            if (run != null) {
              state.update(run)
              state.setTimeoutTimestamp(run.lastMs + idleGapMs)
            }
            closed.result().iterator
          }
      }
  }

  def streamingAsofEnrich(inputs: Dataset[AsofInput], lateness: String,
                          retainVersions: Int,
                          idleGapMs: Long): Dataset[AsofEnriched] = {
    require(retainVersions >= 1,
      s"retainVersions must be >= 1, got $retainVersions")
    import inputs.sparkSession.implicits._
    inputs
      .withWatermark("ts", lateness)
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsofState, AsofEnriched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, batch: Iterator[AsofInput],
         state: GroupState[AsofState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption
              .getOrElse(AsofState(Vector.empty, Vector.empty, 0L))
            var versions = prev.versionTs.zip(prev.versionPayload).toVector
            var maxTs = prev.maxTs
            val out = Vector.newBuilder[AsofEnriched]
            // dims sort before facts at equal ts: <= match semantics
            batch.toVector.sortBy(e => (e.ts.getTime, e.side)).foreach { e =>
              maxTs = math.max(maxTs, e.ts.getTime)
              if (e.side == 0) {
                // same-ts update replaces: idempotent re-delivery
                versions = (versions.filter(_._1 != e.ts.getTime) :+
                    (e.ts.getTime -> e.payload))
                  .sortBy(_._1).takeRight(retainVersions)
              } else {
                val m = versions.filter(_._1 <= e.ts.getTime).lastOption
                out += AsofEnriched(e.event_id, key, e.ts,
                  m.map(_._2).orNull,
                  m.map(v => new Timestamp(v._1)).orNull)
              }
            }
            state.update(
              AsofState(versions.map(_._1), versions.map(_._2), maxTs))
            state.setTimeoutTimestamp(maxTs + idleGapMs)
            out.result().iterator
          }
      }
  }
}
