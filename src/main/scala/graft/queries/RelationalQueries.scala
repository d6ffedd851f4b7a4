package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{RelationalOps => R, ScaleOps => Sc, SceneQueryOps => S}

/** SURVEY.md §2.2–§2.7 operator inventory re-expressed over the driver's
  * synthetic tables, each with a DuckDB oracle. Names q01–q22.
  *
  * Determinism contract for the hash-compare gate: every query ends in a
  * total ORDER BY (with key tiebreakers), aliases computed columns
  * identically to the oracle, and rounds doubles produced by
  * aggregation.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1/A7: multi-measure grouped aggregation (summary-report family,
    // eodatadownlandsatgoogsensor.py:2932-3051).
    "q01_pricing_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // F1/F2/F4/F14/O1: work-list query — closed date range + optional
    // threshold + flag equality, ordered (the reference's most-executed
    // shape, eodatadownlandsatgoogsensor.py:754-775).
    "q02_work_list" -> { (s, dir) =>
      t(s, dir, "orders")
        .filter(
          S.dateRangeClosed(col("o_orderdate"), "1996-01-01", "1996-12-31") &&
          S.maxThreshold(col("o_totalprice"), Some(150000.0)) &&
          col("o_orderstatus") === "O")
        .select(
          col("o_orderkey"),
          to_date(col("o_orderdate")).as("order_date"),
          round(col("o_totalprice"), 2).as("total_price"))
        .orderBy("o_orderkey")
    },

    // J4/J5-style multi-way equi-join with broadcast dims: revenue per
    // nation. nation/region are broadcast; the orders⋈lineitem join
    // shuffles on the key.
    "q03_revenue_by_nation" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val nat = t(s, dir, "nation")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .groupBy("n_name")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },

    // J1: ingest anti-join — rows with no match in the existing table
    // (eodatadownlandsatgoogsensor.py:637-639).
    "q04_customers_no_urgent_orders" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey"))
      R.antiJoin(cust, urgent, Seq("c_custkey"))
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // J2 keep-side: semi join (spatial-join "keep intersecting" shape,
    // eodatadownlandsatgoogsensor.py:685-732).
    "q05_suppliers_with_lineitems" -> { (s, dir) =>
      val sup = t(s, dir, "supplier")
      val li = t(s, dir, "lineitem").select(col("l_suppkey").as("s_suppkey"))
      R.semiJoin(sup, li, Seq("s_suppkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },

    // J6/§2.5: dedup-keep-newest via ranking window
    // (eodatadownlandsatgoogsensor.py:473-518).
    "q06_latest_event_per_user" -> { (s, dir) =>
      R.dedupKeepNewest(t(s, dir, "events"), Seq("user_id"),
          Seq(col("ts").desc, col("event_id").desc))
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    },

    // O1/O3: ordered pagination (Python slice in the reference,
    // eodatadownlandsatgoogsensor.py:1994).
    "q07_pagination" -> { (s, dir) =>
      R.paginate(
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice").as("total_price")),
        Seq(col("total_price").desc, col("o_orderkey")), offset = 40, n = 20)
    },

    // A5/A6: distinct-dates rollup with flag filter
    // (eodatadownlandsatgoogsensor.py:2223-2298).
    "q08_distinct_order_dates" -> { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(to_date(col("o_orderdate")).as("order_date"))
        .distinct()
        .orderBy("order_date")
    },

    // U1/U2: work-list union + distinct (eodatadownrun.py:790-845).
    "q09_union_distinct" -> { (s, dir) =>
      val ord = t(s, dir, "orders")
      R.unionDistinct(Seq(
          ord.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"),
          ord.filter(col("o_orderstatus") === "F").select("o_custkey")))
        .orderBy("o_custkey")
    },

    // A7: full summary-statistics family incl. exact quartiles
    // (eodatadownlandsatgoogsensor.py:2932-3051).
    "q10_summary_stats" -> { (s, dir) =>
      R.summaryStats(t(s, dir, "lineitem"), Seq("l_returnflag"), "l_extendedprice")
        .orderBy("l_returnflag")
    },

    // A2/F13: high-watermark per group (per-product watermark,
    // eodatadownICESAT2sensor.py:532-539).
    "q11_watermark_per_status" -> { (s, dir) =>
      R.watermarkPerGroup(t(s, dir, "orders"), Seq("o_orderstatus"), "o_orderdate")
        .select(col("o_orderstatus"), to_date(col("watermark")).as("watermark"))
        .orderBy("o_orderstatus")
    },

    // A1: state-machine conditional counts in one pass
    // (eodatadownlandsatgoogsensor.py:2949-2954).
    "q12_state_counts" -> { (s, dir) =>
      R.conditionalCounts(t(s, dir, "orders"), Seq("o_orderpriority"), Seq(
          "n_open" -> (col("o_orderstatus") === "O"),
          "n_finished" -> (col("o_orderstatus") === "F"),
          "n_pending" -> (col("o_orderstatus") === "P")))
        .orderBy("o_orderpriority")
    },

    // F11: primary-key lookup (eodatadownlandsatgoogsensor.py:788).
    "q13_pk_lookup" -> { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_partkey") === 42L)
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          round(col("p_retailprice"), 2).as("retail_price"))
    },

    // F10: (a,b) pair IN-list via struct membership
    // (eodatadownlandsatgoogsensor.py:560-615 WRS path/row pairs).
    "q14_pair_inlist" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(S.pairIn(col("l_returnflag"), col("l_linestatus"),
          Seq("A" -> "F", "R" -> "F")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // C2: month-of-year extraction + membership
    // (eodatadownlandsatgoogsensor.py:603-615).
    "q15_month_filter" -> { (s, dir) =>
      t(s, dir, "orders")
        .filter(S.monthIn(col("o_orderdate"), Seq(1, 3, 7)))
        .groupBy(month(col("o_orderdate")).as("order_month"))
        .agg(count(lit(1)).as("n"))
        .orderBy("order_month")
    },

    // C4/C7: string split / regex field extraction
    // (eodatadownlandsatgoogsensor.py:492 Product_ID parse).
    "q16_source_extract" -> { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(regexp_extract(col("source"), "src([0-9]+)", 1)
          .cast("int").as("src_num"))
        .agg(count(lit(1)).as("n"), min("doc_id").as("first_doc"))
        .orderBy("src_num")
    },

    // C14/F9: JSON path probe on a JSONB-style column
    // (eodatadownutils.py:688-950; ExtendedInfo key checks).
    "q17_json_probe" -> { (s, dir) =>
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .filter(col("k") > 90)
        .select("event_id", "k")
        .orderBy("event_id")
    },

    // C3: duration computation from timestamp pairs
    // (eodatadownlandsatgoogsensor.py:2992-2994).
    "q18_duration_days" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(datediff(to_date(max(col("o_orderdate"))),
          to_date(min(col("o_orderdate")))).as("span_days"))
        .orderBy("o_orderstatus")
    },

    // J4/A6/A9: obs-date rollup — per (date, type) counts + distinct
    // entities (eodatadownsensor.py:560-603).
    "q19_obsdate_rollup" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("obs_date"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("obs_date", "event_type")
    },

    // §2.5/§2.9: sessionization (gaps-and-islands) — lag window +
    // conditional sum, the batch shape of streaming session windows.
    "q20_sessionize" -> { (s, dir) =>
      R.sessionCounts(t(s, dir, "events"), "user_id", "ts", "event_id", 1800L)
        .orderBy("user_id")
    },

    // §2.5/O2: top-k per group via ranking window.
    "q21_topk_per_group" -> { (s, dir) =>
      R.topKPerGroup(
          t(s, dir, "orders"),
          Seq("o_orderpriority"),
          Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
        .select(col("o_orderpriority"), col("rank"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("total_price"))
        .orderBy("o_orderpriority", "rank")
    },

    // O4/U2: cross-source merge-by-date with source tag
    // (eodatadownrun.py:939-976 — fixed: sort/group, not dict-keyed).
    "q22_merge_by_date" -> { (s, dir) =>
      val ord = t(s, dir, "orders")
        .select(lit("orders").as("src"), to_date(col("o_orderdate")).as("d"))
      val li = t(s, dir, "lineitem")
        .select(lit("lineitem").as("src"), to_date(col("l_shipdate")).as("d"))
      ord.unionByName(li)
        .filter(col("d") >= lit("2001-06-01"))
        .groupBy("d", "src")
        .agg(count(lit(1)).as("n"))
        .orderBy("d", "src")
    },

    // As-of join: each event matched to the user's latest order at or
    // before the event time. The reference resolves "state as of a
    // scene's acquisition" with per-row lookups in Python
    // (eodatadownrun.py:939-976 walks per-date lists); here it is the
    // union-then-window as-of — one shuffle on the key, linear, no
    // inequality-join explosion (see RelationalOps.asofJoinPrior).
    // Right side is pre-aggregated to one row per (custkey, orderdate)
    // so the prior match is deterministic.
    "q62_asof_join" -> { (s, dir) =>
      val ev = t(s, dir, "events").select("event_id", "user_id", "ts")
      // o_orderdate reads as timestamp_ntz while events.ts is ltz:
      // align explicitly (identity under the pinned-UTC session) —
      // asofJoinPrior refuses a silent, tz-dependent union coercion
      val ord = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("user_id"),
          col("o_orderdate").cast("timestamp").as("t"))
        .agg(max("o_orderkey").as("as_of_orderkey"))
      R.asofJoinPrior(ev, ord, "user_id", "ts", "t")
        .select(col("event_id"), col("user_id"),
          col("asof").getField("as_of_orderkey").as("as_of_orderkey"),
          to_date(col("asof").getField("t")).as("as_of_date"))
        .orderBy("event_id")
    },

    // Bucketed range join: every event landing inside the one-hour
    // window after any high-value "anomaly" event — a pure interval
    // predicate with NO equi key, the shape Catalyst would otherwise
    // plan as a broadcast-nested-loop. Hour-wide epoch buckets turn it
    // into an equi-join (see RelationalOps.rangeJoinBucketed).
    "q65_range_join" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val pts = ev.select(col("event_id"), col("ts"))
      val hot = ev.filter(col("value") > 300.0)
        .select(col("event_id").as("anchor_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
      R.rangeJoinBucketed(pts, "ts", hot, "w_start", "w_end", 3600L)
        .filter(col("event_id") =!= col("anchor_id"))
        .select(col("anchor_id"), col("event_id"))
        .orderBy("anchor_id", "event_id")
    },

    // Salted skew join under the gate: the revenue join routed through
    // ScaleOps.saltedJoin (probe side salted, build side replicated per
    // salt) must produce byte-identical results to the plain join the
    // oracle runs — proving the skew device is a pure execution-shape
    // change. At 100 TB this is the fallback when one hot key floods a
    // reducer and AQE's skew split isn't available (e.g. a
    // non-sort-merge plan).
    "q66_salted_join" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      Sc.saltedJoin(li, ord, "l_orderkey", 4)
        .groupBy("o_orderpriority")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    },

    // Data-quality constraint report (the Deequ-style pre-publish
    // validation pass): five named checks — completeness, a
    // DELIBERATELY failing uniqueness (l_orderkey repeats across line
    // numbers; the report must surface failures with their observed
    // metric, not hide them), two row-predicate fractions, and
    // referential containment against orders. The four aggregate
    // checks evaluate in ONE partial-aggregated pass over lineitem;
    // the referential check adds one anti-join keyed on the fk.
    "q87_validation_report" -> { (s, dir) =>
      import graft.operators.{ValidateOps => V}
      val li = t(s, dir, "lineitem")
      V.run(li, Seq(
          V.completeness("l_orderkey_complete", col("l_orderkey"), 1.0),
          V.uniqueness("l_orderkey_unique", col("l_orderkey"), 1.0),
          V.satisfies("l_discount_in_range",
            col("l_discount").between(0.0, 0.1), 1.0),
          V.satisfies("l_quantity_positive", col("l_quantity") > 0, 1.0)))
        .unionByName(V.referential(li, col("l_orderkey"),
          t(s, dir, "orders"), col("o_orderkey"),
          "l_orderkey_in_orders", 1.0))
        .orderBy("check_name")
    },

    // ANALYZE-style statistics: a 10-bucket equi-width histogram of
    // l_extendedprice (bucket arithmetic is the same IEEE expression
    // in both engines — DuckDB 1.0 has no width_bucket). Two scans:
    // one for [min,max], one partial-aggregated bucket count.
    "q88_price_histogram" -> { (s, dir) =>
      graft.operators.ValidateOps.histogram(
        t(s, dir, "lineitem"), col("l_extendedprice"), 10)
    },

    // Join-size pre-flight: the EXACT cardinality and skew profile of
    // lineitem ⋈ orders computed from per-key counts WITHOUT running
    // the join — |A ⋈ B| = Σ_k nA(k)·nB(k). Two partial-aggregated
    // groupBys + a count-sized join; at 100 TB this is the cheap
    // decision input that picks broadcast vs shuffle vs saltedJoin
    // (q66) BEFORE committing to the expensive plan. skew_ratio =
    // the hottest key's share × number of keys (1.0 = perfectly
    // uniform; ≫1 = salt it).
    "q89_join_size_estimate" -> { (s, dir) =>
      val a = t(s, dir, "lineitem").groupBy(col("l_orderkey").as("k"))
        .agg(count(lit(1)).as("na"))
      val b = t(s, dir, "orders").groupBy(col("o_orderkey").as("k"))
        .agg(count(lit(1)).as("nb"))
      a.join(b, "k")
        .select(col("k"), (col("na") * col("nb")).as("rows_k"))
        .agg(sum("rows_k").as("join_rows"),
          count(lit(1)).as("n_keys"),
          max("rows_k").as("max_key_rows"))
        .select(col("join_rows"), col("n_keys"), col("max_key_rows"),
          round(col("max_key_rows") * col("n_keys") /
            col("join_rows").cast("double"), 6).as("skew_ratio"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_work_list" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  round(o_totalprice, 2) AS total_price
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <= TIMESTAMP '1996-12-31'
        |  AND o_totalprice <= 150000.0 AND o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin,

    "q03_revenue_by_nation" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q04_customers_no_urgent_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q05_suppliers_with_lineitems" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        |ORDER BY s_suppkey""".stripMargin,

    // ts::TIMESTAMP mirrors Tables.load's nanos->micros truncation —
    // a same-microsecond pair would otherwise rank by nano residue
    // here but by the event_id tie-break on the Spark side
    "q06_latest_event_per_user" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts::TIMESTAMP DESC, event_id DESC)
        |      AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q07_pagination" ->
      """SELECT o_orderkey, o_totalprice AS total_price FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20 OFFSET 40""".stripMargin,

    "q08_distinct_order_dates" ->
      """SELECT DISTINCT CAST(o_orderdate AS DATE) AS order_date
        |FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY order_date""".stripMargin,

    "q09_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "q10_summary_stats" ->
      """SELECT l_returnflag,
        |  count(l_extendedprice) AS n,
        |  round(sum(l_extendedprice), 2) AS sum_v,
        |  round(avg(l_extendedprice), 2) AS avg_v,
        |  round(min(l_extendedprice), 2) AS min_v,
        |  round(max(l_extendedprice), 2) AS max_v,
        |  round(stddev_samp(l_extendedprice), 4) AS stddev_v,
        |  round(quantile_cont(l_extendedprice, 0.25), 5) AS p25_v,
        |  round(quantile_cont(l_extendedprice, 0.5), 5) AS median_v,
        |  round(quantile_cont(l_extendedprice, 0.75), 5) AS p75_v
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q11_watermark_per_status" ->
      """SELECT o_orderstatus, CAST(max(o_orderdate) AS DATE) AS watermark
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q12_state_counts" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
        |  count(*) AS n_total
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q13_pk_lookup" ->
      """SELECT p_partkey, p_name, p_brand,
        |  round(p_retailprice, 2) AS retail_price
        |FROM part WHERE p_partkey = 42""".stripMargin,

    "q14_pair_inlist" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
        |WHERE (l_returnflag, l_linestatus) IN (('A','F'), ('R','F'))
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q15_month_filter" ->
      """SELECT CAST(month(o_orderdate) AS INT) AS order_month, count(*) AS n
        |FROM orders WHERE month(o_orderdate) IN (1, 3, 7)
        |GROUP BY order_month ORDER BY order_month""".stripMargin,

    "q16_source_extract" ->
      """SELECT CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INT) AS src_num,
        |  count(*) AS n, min(doc_id) AS first_doc
        |FROM documents GROUP BY src_num ORDER BY src_num""".stripMargin,

    "q17_json_probe" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k
        |FROM events
        |WHERE CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) > 90
        |ORDER BY event_id""".stripMargin,

    "q18_duration_days" ->
      """SELECT o_orderstatus,
        |  date_diff('day', CAST(min(o_orderdate) AS DATE),
        |            CAST(max(o_orderdate) AS DATE)) AS span_days
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q19_obsdate_rollup" ->
      """SELECT CAST(ts AS DATE) AS obs_date, event_type,
        |  count(*) AS n_events, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY obs_date, event_type
        |ORDER BY obs_date, event_type""".stripMargin,

    "q20_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts,
        |    lag(ts::TIMESTAMP) OVER (PARTITION BY user_id
        |      ORDER BY ts::TIMESTAMP, event_id) AS prev
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CASE WHEN prev IS NULL
        |           OR date_diff('second', prev, ts) > 1800
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q21_topk_per_group" ->
      """SELECT o_orderpriority, rank, o_orderkey,
        |  round(o_totalprice, 2) AS total_price FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
        |  FROM orders) WHERE rank <= 3
        |ORDER BY o_orderpriority, rank""".stripMargin,

    "q22_merge_by_date" ->
      """SELECT d, src, count(*) AS n FROM (
        |  SELECT 'orders' AS src, CAST(o_orderdate AS DATE) AS d FROM orders
        |  UNION ALL
        |  SELECT 'lineitem' AS src, CAST(l_shipdate AS DATE) AS d FROM lineitem)
        |WHERE d >= DATE '2001-06-01'
        |GROUP BY d, src ORDER BY d, src""".stripMargin,

    // DuckDB has a native ASOF JOIN — the ideal oracle for ours: an
    // entirely independent implementation of the same semantics.
    "q62_asof_join" ->
      """WITH o AS (
        |  SELECT o_custkey AS user_id, o_orderdate AS t,
        |         max(o_orderkey) AS as_of_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, o.as_of_orderkey,
        |       CAST(o.t AS DATE) AS as_of_date
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.user_id AND e.ts >= o.t
        |ORDER BY e.event_id""".stripMargin,

    "q65_range_join" ->
      """WITH hot AS (
        |  SELECT event_id AS anchor_id, ts::TIMESTAMP AS w_start,
        |         ts::TIMESTAMP + INTERVAL 1 HOUR AS w_end
        |  FROM events WHERE value > 300.0)
        |SELECT h.anchor_id, e.event_id
        |FROM hot h JOIN events e
        |  ON e.ts::TIMESTAMP >= h.w_start AND e.ts::TIMESTAMP < h.w_end
        | AND e.event_id <> h.anchor_id
        |ORDER BY h.anchor_id, e.event_id""".stripMargin,

    // The oracle is the PLAIN join: salting must not change results.
    "q66_salted_join" ->
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // Pass predicates compare the EXACT ratio; round() appears only on
    // the reported metric column (mirrors ValidateOps.run).
    "q87_validation_report" ->
      """WITH base AS (
        |  SELECT
        |    count(l_orderkey)::DOUBLE / count(*) AS c1,
        |    count(DISTINCT l_orderkey)::DOUBLE / count(l_orderkey) AS u1,
        |    sum(CASE WHEN l_discount BETWEEN 0.0 AND 0.1
        |        THEN 1 ELSE 0 END)::DOUBLE / count(*) AS s1,
        |    sum(CASE WHEN l_quantity > 0
        |        THEN 1 ELSE 0 END)::DOUBLE / count(*) AS s2
        |  FROM lineitem),
        |ref AS (
        |  SELECT sum(CASE WHEN o.o_orderkey IS NOT NULL
        |             THEN 1 ELSE 0 END)::DOUBLE / count(*) AS m
        |  FROM lineitem l
        |  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey)
        |SELECT * FROM (
        |  SELECT 'l_orderkey_complete' AS check_name, round(c1, 6) AS metric,
        |    c1 >= 1.0 AS passed FROM base
        |  UNION ALL SELECT 'l_orderkey_unique', round(u1, 6), u1 >= 1.0
        |    FROM base
        |  UNION ALL SELECT 'l_discount_in_range', round(s1, 6), s1 >= 1.0
        |    FROM base
        |  UNION ALL SELECT 'l_quantity_positive', round(s2, 6), s2 >= 1.0
        |    FROM base
        |  UNION ALL SELECT 'l_orderkey_in_orders', round(m, 6), m >= 1.0
        |    FROM ref)
        |ORDER BY check_name""".stripMargin,

    "q88_price_histogram" ->
      """WITH b AS (
        |  SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        |  FROM lineitem)
        |SELECT CASE WHEN mx = mn THEN 0 ELSE
        |    least(9, floor((l_extendedprice - mn) / ((mx - mn) / 10)))::BIGINT
        |  END AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(min(l_extendedprice), 2) AS lo,
        |  round(max(l_extendedprice), 2) AS hi
        |FROM lineitem, b
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q89_join_size_estimate" ->
      """WITH a AS (
        |  SELECT l_orderkey AS k, count(*) AS na FROM lineitem GROUP BY 1),
        |b AS (
        |  SELECT o_orderkey AS k, count(*) AS nb FROM orders GROUP BY 1),
        |j AS (SELECT a.k, a.na * b.nb AS rows_k FROM a JOIN b USING (k))
        |SELECT CAST(sum(rows_k) AS BIGINT) AS join_rows,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(max(rows_k) AS BIGINT) AS max_key_rows,
        |  round(max(rows_k) * count(*) / CAST(sum(rows_k) AS DOUBLE), 6)
        |    AS skew_ratio
        |FROM j""".stripMargin
  )
}
