package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.streaming.StreamOps

/** SURVEY.md §2.9 under the DRIVER GATE (round-5 verdict item 3):
  * streaming was the one yes-component verified only by ScalaTest, so
  * these queries run the REAL Structured Streaming operators —
  * `flatMapGroupsWithState` custom keyed state, watermarks, the state
  * machine — over a finite file stream and hash-compare the result
  * against an independent DuckDB oracle, exactly like every batch
  * query.
  *
  * Determinism contract (what makes a streaming operator gateable):
  *  - the input is staged to scratch parquet and read with
  *    `Trigger.Once` — ONE micro-batch, so per-batch emission
  *    (flatMapGroupsWithState emits one consolidated row per key per
  *    batch) yields exactly one final row per key, and intra-batch
  *    event-time sorting corrects all input disorder;
  *  - lateness is set far beyond the data's time span, so the
  *    watermark never finalizes state mid-stream and event-time
  *    timeouts never fire — nothing depends on arrival timing;
  *  - every fold in the operators is order-independent (bool OR, max,
  *    count) or explicitly event-time-sorted.
  * Under that contract the streaming result equals the batch
  * semantics, which is precisely what the oracle states in SQL.
  */
object StreamingQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Stage a finite DataFrame as a file stream and drain it through
    * `build` into a memory sink in one `Trigger.Once` micro-batch.
    * The sink's rows are spilled to scratch parquet and the in-memory
    * sink + staging/checkpoint dirs are RELEASED before returning —
    * without that, every bench rep would pin a full copy of the
    * result in driver memory for the rest of the session (8 reps ×
    * the enriched event stream at sf1+ is a driver OOM).
    */
  /** `mode`: "append" for row-emitting operators (dedup, flatMap
    * state); "complete" for windowed AGGREGATIONS — under the
    * never-advancing watermark no window ever finalizes, so append
    * mode would emit NOTHING for them (the one Structured Streaming
    * trap this harness has to dodge).
    */
  private def runOnce(s: SparkSession, tag: String, input: DataFrame,
                      build: DataFrame => DataFrame,
                      mode: String = "append"): DataFrame = {
    // fresh root + sink name per CALL (q58's pattern): a reused
    // checkpoint would make a re-run see "no new data" and emit
    // nothing — bench reps must each drain the full stream
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val base = s"${Tables.scratchBase}/graft_${tag}_" +
      s"${s.sparkContext.applicationId}/$uid"
    val sink = s"${tag}_$uid"
    input.write.mode("overwrite").parquet(s"$base/in")
    val stream = s.readStream.schema(input.schema).parquet(s"$base/in")
    val q = build(stream).writeStream
      .format("memory").queryName(sink)
      .outputMode(mode)
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.Once())
      .start()
    q.awaitTermination()
    s.table(sink).write.mode("overwrite").parquet(s"$base/out")
    s.catalog.dropTempView(sink)
    deleteRec(java.nio.file.Paths.get(s"$base/in"))
    deleteRec(java.nio.file.Paths.get(s"$base/ckpt"))
    // $base/out must OUTLIVE this call (the returned DataFrame reads
    // it lazily), so it can't be deleted here — but a fresh uid per
    // rep means bench/verify sessions would otherwise accumulate one
    // orphan dir per rep forever (round-6 advice). deleteOnExit walks
    // parent-before-child and the JVM deletes in REVERSE registration
    // order, so files go before their dirs.
    registerDeleteOnExit(java.nio.file.Paths.get(base))
    s.read.parquet(s"$base/out")
  }

  /** Register `p` and everything under it for deletion at JVM exit
    * (scratch reclamation for outputs that must stay readable for the
    * rest of the session). Walk stream closed, as in [[deleteRec]].
    */
  private def registerDeleteOnExit(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.forEach(f => f.toFile.deleteOnExit())
      finally walk.close()
    }
  }

  /** Recursive delete that CLOSES its walk stream (CowTable's lesson —
    * a leaked directory stream is an fd leak under bench reps).
    */
  private def deleteRec(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Streaming as-of enrichment (the continuous twin of q62, same
    // DuckDB native-ASOF oracle shape): dimension updates (per-user
    // latest order per day) and fact events union into ONE stream;
    // per-key custom state retains the version history and enriches
    // each fact with the version in force at its event time.
    "q91_streaming_asof" -> { (s, dir) =>
      import s.implicits._
      val facts = t(s, dir, "events")
        .select(col("user_id").as("key"), col("ts"),
          lit(1).as("side"), lit(null).cast("string").as("payload"),
          col("event_id"))
      val dims = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("key"),
          col("o_orderdate").cast("timestamp").as("ts"))
        .agg(max("o_orderkey").as("k"))
        .select(col("key"), col("ts"), lit(0).as("side"),
          col("k").cast("string").as("payload"),
          lit(-1L).as("event_id"))
      val input = facts.unionByName(dims)
      runOnce(s, "q91", input, in =>
        StreamOps.streamingAsofEnrich(in.as[StreamOps.AsofInput],
            lateness = "36500 days", retainVersions = 8,
            idleGapMs = Long.MaxValue / 4).toDF())
        .select(col("event_id"), col("key").as("user_id"),
          col("asof_payload").cast("long").as("as_of_orderkey"),
          to_date(col("asof_ts")).as("as_of_date"))
        .orderBy("event_id")
    },

    // The reference's per-scene state machine (Downloaded → ARDProduct
    // → DCLoaded) as keyed custom state over a step-event stream —
    // the q43/q58 family's streaming form, gated. Step events derive
    // deterministically from orders (q49's device): every scene
    // downloads; half build ARD a day later; a quarter load the
    // datacube a day after that.
    "q92_streaming_state_machine" -> { (s, dir) =>
      import s.implicits._
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"),
          col("o_orderdate").cast("timestamp").as("t0"))
        .filter(col("o_orderkey") % 10 === 0) // bounded key space
      // selectors divide by 10 FIRST: every key in `base` is already
      // ≡0 (mod 10), so a plain %2/%4 would be vacuous and the
      // partial-progress state (downloaded without ard) — the state
      // the machine exists to consolidate — would occur for no scene
      val dl = base.select(concat(lit("S"), col("o_orderkey")).as("scene_id"),
        lit("download").as("step"), col("t0").as("ts"))
      val ard = base.filter((col("o_orderkey") / 10).cast("long") % 2 === 0)
        .select(concat(lit("S"), col("o_orderkey")).as("scene_id"),
          lit("ard").as("step"),
          (col("t0") + expr("INTERVAL 1 DAY")).as("ts"))
      val dc = base.filter((col("o_orderkey") / 10).cast("long") % 4 === 0)
        .select(concat(lit("S"), col("o_orderkey")).as("scene_id"),
          lit("dcload").as("step"),
          (col("t0") + expr("INTERVAL 2 DAY")).as("ts"))
      val input = dl.unionByName(ard).unionByName(dc)
      runOnce(s, "q92", input, in =>
        StreamOps.sceneStateMachine(in.as[StreamOps.StepEvent],
            lateness = "36500 days", idleGapMs = Long.MaxValue / 4).toDF())
        .select(col("scene_id"), col("downloaded"), col("ard"),
          col("dcloaded"), col("last_ts"), col("n_events"))
        .orderBy("scene_id")
    },

    // Streaming exact dedup (dropDuplicatesWithinWatermark) gated:
    // WHICH physical row survives a dedup group is partition-order
    // dependent (documented in StreamOps), so the gated output is the
    // deterministic part of the contract — the surviving CONTENT set:
    // exactly one row per distinct text, reported as its hash. The
    // corpus texts are all distinct, so the stream is the corpus PLUS
    // a full replayed copy (the at-least-once re-delivery dedup
    // exists for): 2n rows in, n hashes out — the drop path carries
    // half the stream, and a dedup regression doubles the row count
    // before it can touch the hash.
    "q94_streaming_dedup" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val input = docs.unionByName(
          docs.withColumn("doc_id", col("doc_id") + 1000000L))
        .withColumn("ts", expr(
          "timestampadd(SECOND, doc_id, TIMESTAMP'2024-01-01 00:00:00')"))
      runOnce(s, "q94", input, in =>
        StreamOps.streamingDedup(in, "text", "ts", "36500 days"))
        .select(md5(col("text")).as("content_hash"))
        .orderBy("content_hash")
    },

    // The obs-date rollup (A6/J4) maintained BY THE STREAMING operator
    // (1-day event-time windows + key), gated in complete mode — the
    // continuously-maintained form of q43's batch rollup.
    "q95_streaming_rollup" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(col("ts"), col("event_type"))
      runOnce(s, "q95", ev, in =>
        StreamOps.obsDateRollup(in, "ts", "36500 days",
          Seq(col("event_type"))), mode = "complete")
        .select(col("obs_date"), col("event_type"), col("n_events"))
        .orderBy("obs_date", "event_type")
    }
  )

  val oracleSql: Map[String, String] = Map(

    // identical shape to q62's oracle (DuckDB's native ASOF JOIN — an
    // independent implementation of the as-of contract)
    "q91_streaming_asof" ->
      """WITH o AS (
        |  SELECT o_custkey AS user_id, o_orderdate AS t,
        |         max(o_orderkey) AS as_of_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, o.as_of_orderkey,
        |       CAST(o.t AS DATE) AS as_of_date
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.user_id AND e.ts >= o.t
        |ORDER BY e.event_id""".stripMargin,

    "q92_streaming_state_machine" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderdate::TIMESTAMP AS t0
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |ev AS (
        |  SELECT 'S' || k AS scene_id, 'download' AS step, t0 AS ts
        |  FROM base
        |  UNION ALL
        |  SELECT 'S' || k, 'ard', t0 + INTERVAL 1 DAY FROM base
        |  WHERE (k / 10)::BIGINT % 2 = 0
        |  UNION ALL
        |  SELECT 'S' || k, 'dcload', t0 + INTERVAL 2 DAY FROM base
        |  WHERE (k / 10)::BIGINT % 4 = 0)
        |SELECT scene_id,
        |  bool_or(step = 'download') AS downloaded,
        |  bool_or(step = 'ard') AS ard,
        |  bool_or(step = 'dcload') AS dcloaded,
        |  max(ts) AS last_ts,
        |  CAST(count(*) AS INT) AS n_events
        |FROM ev GROUP BY scene_id ORDER BY scene_id""".stripMargin,

    "q94_streaming_dedup" ->
      """SELECT DISTINCT md5(text) AS content_hash FROM documents
        |ORDER BY content_hash""".stripMargin,

    "q95_streaming_rollup" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS obs_date,
        |  event_type, CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY obs_date, event_type
        |ORDER BY obs_date, event_type""".stripMargin
  )
}
