package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TimeSeriesOps

/** SURVEY.md §2 operator inventory, demonstrated on the driver's synthetic
  * tables (TESTDATA.md) with DuckDB oracles.
  *
  * Determinism rules used throughout (the driver hash-compares values):
  *  - event time stays in exact epoch-nanosecond longs (`events.ts` is read
  *    as BIGINT via nanosAsLong); bucket math is pmod-based, no division;
  *  - double aggregates are rounded at a precision where the true value is
  *    provably interior (inputs have 2 decimals → sums rounded at 2-4);
  *  - every top-k / first-value has a total-order tiebreak.
  */
object CoreQueries {
  import Tables.t

  private val HourNs = 3600000000000L

  // ---- S1 + F1: keyed time-series range scan with pushed-down predicate --
  private val s1RangeLo = 1704067200000000000L // 2024-01-01T00:00:00Z in ns
  private val s1RangeHi = s1RangeLo + 2L * 24 * HourNs

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---- A1-A7 flagship: pricing summary (groupBy agg, map-side partials)
    "q1_agg" -> QueryDef(
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
              .as("sum_disc_price"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
             |  count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- Multi-join analytics: shipping-priority (Q3 shape) — selective
    // filters pushed to all three scans, join order left to Catalyst/AQE
    "q3_shipping" -> QueryDef(
      (s, dir) => {
        val cutoff = lit("1995-03-15").cast("timestamp")
        val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
        val li = t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1995-03-15'
             |  AND l_shipdate > TIMESTAMP '1995-03-15'
             |GROUP BY 1, 2, 3
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // ---- Five-way star join: local-supplier revenue by nation (Q5 shape)
    "q5_local_supplier" -> QueryDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1994-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1995-01-01").cast("timestamp"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue"))
      },
      Some("""SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |WHERE o_orderdate >= TIMESTAMP '1994-01-01'
             |  AND o_orderdate < TIMESTAMP '1995-01-01'
             |GROUP BY n_name""".stripMargin)),

    // ---- Q14-shape promo revenue: broadcast part join + conditional agg ---
    "q14_promo" -> QueryDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1995-09-01").cast("timestamp") &&
            col("l_shipdate") < lit("1995-10-01").cast("timestamp"))
        val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        li.join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
          .agg(round(
            sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0.0))) * 100.0
              / sum(rev), 4).as("promo_pct"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
             |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
             |  / sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_pct,
             |  count(*) AS n_items
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1995-09-01'
             |  AND l_shipdate < TIMESTAMP '1995-10-01'""".stripMargin)),

    // ---- Semi/anti joins (EXISTS / NOT EXISTS without materializing) ------
    "q_semi_anti" -> QueryDef(
      (s, dir) => {
        val heavy = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
          .select("l_orderkey")
        val ord = t(s, dir, "orders")
        val withHeavy = ord.join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select(lit("with_heavy_item").as("bucket"), col("o_totalprice"))
        val withoutHeavy = ord.join(heavy, col("o_orderkey") === col("l_orderkey"), "left_anti")
          .select(lit("without_heavy_item").as("bucket"), col("o_totalprice"))
        withHeavy.unionByName(withoutHeavy)
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
      },
      Some("""WITH heavy AS (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
             |SELECT bucket, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
             |FROM (
             |  SELECT 'with_heavy_item' AS bucket, o_totalprice FROM orders
             |    WHERE EXISTS (SELECT 1 FROM heavy WHERE l_orderkey = o_orderkey)
             |  UNION ALL
             |  SELECT 'without_heavy_item' AS bucket, o_totalprice FROM orders
             |    WHERE NOT EXISTS (SELECT 1 FROM heavy WHERE l_orderkey = o_orderkey))
             |GROUP BY bucket""".stripMargin)),

    // ---- Hierarchical rollup totals (partial-agg friendly) ----------------
    "q_rollup" -> QueryDef(
      (s, dir) => {
        t(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
            col("sum_qty"), col("n"))
      },
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
             |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // ---- Ranking / offset window functions --------------------------------
    "q_window_rank" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("s_nationkey").orderBy(col("s_acctbal").desc, col("s_suppkey"))
        t(s, dir, "supplier")
          .withColumn("rnk", rank().over(w))
          .withColumn("prev_bal", lag("s_acctbal", 1).over(w))
          .withColumn("next_bal", lead("s_acctbal", 1).over(w))
          .filter(col("rnk") <= 3)
          .select("s_nationkey", "rnk", "s_suppkey", "s_acctbal", "prev_bal", "next_bal")
      },
      Some("""SELECT s_nationkey, rnk, s_suppkey, s_acctbal, prev_bal, next_bal FROM (
             |  SELECT s_nationkey, s_suppkey, s_acctbal,
             |    rank() OVER w AS rnk,
             |    lag(s_acctbal, 1) OVER w AS prev_bal,
             |    lead(s_acctbal, 1) OVER w AS next_bal
             |  FROM supplier
             |  WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey))
             |WHERE rnk <= 3""".stripMargin)),

    // ---- Distinct aggregates (two-phase expand in Spark) ------------------
    "q_distinct_agg" -> QueryDef(
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_suppkey")).as("n_suppliers"),
            countDistinct(col("l_partkey")).as("n_parts"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_suppliers,
             |  count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- S1/F1: time-series range scan (filter pushed to parquet scan)
    "q_s1_range_scan" -> QueryDef(
      (s, dir) => {
        // the range is stated on the NATIVE ts column (raw-ns or timestamp,
        // whichever the fixture carries) so it reaches PushedFilters
        Tables.eventsRawFiltered(s, dir)(ets =>
            col("user_id") === 7 && ets.betweenNs(s1RangeLo, s1RangeHi))
          .select(col("event_id"), col("ts"), col("value"))
      },
      Some(s"""SELECT event_id, epoch_ns(ts) AS ts, value FROM events
              |WHERE user_id = 7 AND epoch_ns(ts) BETWEEN $s1RangeLo AND $s1RangeHi""".stripMargin)),

    // ---- S2/A1: max-time lookup (scan clamping input)
    "q_s2_max_time" -> QueryDef(
      (s, dir) =>
        Tables.events(s, dir).agg(max("ts").as("max_ts"), count(lit(1)).as("n_rows")),
      Some("SELECT max(epoch_ns(ts)) AS max_ts, count(*) AS n_rows FROM events")),

    // ---- S3: per-timestep block scan (one range scan + groupBy replaces the
    // reference's N proc calls; raincell block = (step, cell, value))
    "q_s3_raincell_blocks" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        ev.select(
            TimeSeriesOps.bucketRightClosedNs(col("ts"), 300).as("step_ns"),
            col("user_id"), col("value"))
          .groupBy("step_ns", "user_id")
          .agg(round(sum("value"), 2).as("cell_value"))
      },
      Some("""SELECT (epoch_ns(ts)-1) - ((epoch_ns(ts)-1) % 300000000000) + 300000000000 AS step_ns,
             |  user_id, round(sum(value), 2) AS cell_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // ---- S4: first-value-in-window lookup (min_by replaces fetchone)
    "q_s4_first_in_window" -> QueryDef(
      (s, dir) => {
        Tables.events(s, dir)
          .filter(col("ts").between(s1RangeLo, s1RangeLo + 6 * HourNs))
          .groupBy("user_id")
          .agg(min("ts").as("first_ts"), expr("min_by(value, ts)").as("first_value"))
      },
      Some(s"""SELECT user_id, min(epoch_ns(ts)) AS first_ts, arg_min(value, epoch_ns(ts)) AS first_value
              |FROM events WHERE epoch_ns(ts) BETWEEN $s1RangeLo AND ${s1RangeLo + 6 * HourNs}
              |GROUP BY user_id""".stripMargin)),

    // ---- S5: nearest lookup (distance + argmin with deterministic tiebreak)
    "q_s5_nearest" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "supplier")
          .select(col("s_nationkey"), col("s_suppkey"),
            abs(col("s_acctbal") - lit(1000.0)).as("dist"))
        val m = d.groupBy("s_nationkey").agg(min("dist").as("mind"))
        d.join(m, Seq("s_nationkey"))
          .filter(col("dist") === col("mind"))
          .groupBy("s_nationkey")
          .agg(min("s_suppkey").as("nearest_suppkey"), round(min("dist"), 2).as("dist"))
      },
      Some("""WITH d AS (SELECT s_nationkey, s_suppkey, abs(s_acctbal - 1000.0) AS dist FROM supplier),
             |m AS (SELECT s_nationkey, min(dist) AS mind FROM d GROUP BY 1)
             |SELECT d.s_nationkey AS s_nationkey, min(d.s_suppkey) AS nearest_suppkey,
             |  round(min(d.dist), 2) AS dist
             |FROM d JOIN m ON d.s_nationkey = m.s_nationkey AND d.dist = m.mind
             |GROUP BY 1""".stripMargin)),

    // ---- J1: dense time grid LEFT JOIN series (generated grid, no driver loop)
    "q_j1_timegrid" -> QueryDef(
      (s, dir) => {
        val hrs = Tables.events(s, dir)
          .select((col("ts") - pmod(col("ts"), lit(HourNs))).as("hr_ns"))
        val counts = hrs.groupBy("hr_ns").agg(count(lit(1)).as("n_events"))
        val grid = hrs.agg(min("hr_ns").as("mn"), max("hr_ns").as("mx"))
          .select(explode(sequence(col("mn"), col("mx"), lit(HourNs))).as("hr_ns"))
        grid.join(counts, Seq("hr_ns"), "left")
          .select(col("hr_ns"), coalesce(col("n_events"), lit(0L)).as("n_events"))
      },
      Some(s"""WITH h AS (SELECT epoch_ns(ts) - (epoch_ns(ts) % $HourNs) AS hr_ns FROM events),
              |c AS (SELECT hr_ns, count(*) AS n_events FROM h GROUP BY 1),
              |b AS (SELECT min(hr_ns) AS mn, max(hr_ns) AS mx FROM h),
              |g AS (SELECT unnest(generate_series(mn, mx, $HourNs)) AS hr_ns FROM b)
              |SELECT g.hr_ns AS hr_ns, coalesce(c.n_events, 0) AS n_events
              |FROM g LEFT JOIN c USING (hr_ns)""".stripMargin)),

    // ---- J2/J3: dimension enrichment via broadcast joins
    "q_j2_dims" -> QueryDef(
      (s, dir) => {
        t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 2).as("total_acctbal"))
      },
      Some("""SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name""".stripMargin)),

    // ---- J6: left join + coalesce default (observed-else-template pattern)
    "q_j6_coalesce" -> QueryDef(
      (s, dir) => {
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "left")
          .select(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"), col("o_totalprice"))
          .groupBy("segment")
          .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
      },
      Some("""SELECT coalesce(c_mktsegment, 'UNKNOWN') AS segment,
             |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
             |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1""".stripMargin)),

    // ---- A2: right-closed tumbling resample (pandas label='right' closed='right')
    "q_a2_resample" -> QueryDef(
      (s, dir) => {
        Tables.events(s, dir)
          .select(TimeSeriesOps.bucketRightClosedNs(col("ts"), 900).as("bucket_ns"), col("value"))
          .groupBy("bucket_ns")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      },
      Some("""SELECT (epoch_ns(ts)-1) - ((epoch_ns(ts)-1) % 900000000000) + 900000000000 AS bucket_ns,
             |  count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM events GROUP BY 1""".stripMargin)),

    // ---- A4/W2: running cumulative sum in time order
    "q_a4_cumsum" -> QueryDef(
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(round(sum("o_totalprice"), 2).as("rev"))
        daily.withColumn("cum_rev",
          round(sum("rev").over(
            Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      },
      Some("""WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, round(sum(o_totalprice), 2) AS rev
             |  FROM orders GROUP BY 1)
             |SELECT day, rev, round(sum(rev) OVER (ORDER BY day
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_rev FROM d""".stripMargin)),

    // ---- A4 at scale: distributed two-pass prefix scan (no global window).
    // Same running-total semantics as q_a4_cumsum, but computed with
    // ordered buckets + per-bucket scan + broadcast offsets — the form
    // that survives when the scanned column is NOT pre-aggregated to a
    // bounded domain. Cents-scaled longs make the two-pass result
    // bit-identical to the sequential window (integer math re-associates).
    "q_a4_cumsum_scan" -> QueryDef(
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(round(sum("o_totalprice") * 100).cast("long").as("rev_cents"))
        TimeSeriesOps.scanCumSumLong(daily, Seq("day"), "rev_cents", "cum_cents", 8)
          .select(col("day"), col("rev_cents"), col("cum_cents"))
      },
      Some("""WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
             |  CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS rev_cents
             |  FROM orders GROUP BY 1)
             |SELECT day, rev_cents, CAST(sum(rev_cents) OVER (ORDER BY day
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
             |FROM d""".stripMargin)),

    // ---- A3/A5: grand total + normalized cumulative fraction (RAIN.DAT math)
    "q_a5_normfrac" -> QueryDef(
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(round(sum("o_totalprice"), 2).as("rev"))
        TimeSeriesOps.normalizedCumulative(daily, "rev", "day", Nil, "frac")
          .select(col("day"), round(col("frac"), 6).as("frac"))
      },
      Some("""WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, round(sum(o_totalprice), 2) AS rev
             |  FROM orders GROUP BY 1)
             |SELECT day, round(CASE WHEN sum(rev) OVER () > 0 THEN
             |  (sum(rev) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |    / (sum(rev) OVER ()) ELSE 0.0 END, 6) AS frac FROM d""".stripMargin)),

    // ---- W1/X3: anchor-first elapsed hours per series
    "q_w1_anchor" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        Tables.events(s, dir)
          .withColumn("elapsed_h", (col("ts") - min("ts").over(w)) / lit(3.6e12))
          .select("user_id", "event_id", "elapsed_h")
      },
      Some("""SELECT user_id, event_id,
             |  (epoch_ns(ts) - min(epoch_ns(ts)) OVER (PARTITION BY user_id)) / 3600000000000.0 AS elapsed_h
             |FROM events""".stripMargin)),

    // ---- W3: skip-first-row (anchor row emits no data line)
    "q_w3_skipfirst" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") > 1)
          .select("user_id", "event_id", "rn")
      },
      Some("""SELECT user_id, event_id, rn FROM (
             |  SELECT user_id, event_id, row_number() OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id) AS rn FROM events) WHERE rn > 1""".stripMargin)),

    // ---- S7/S8 core primitive: propagate-last-marker (block header → rows)
    "q_w4_lastmarker" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("anchor_id",
            last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
          .filter(col("anchor_id").isNotNull && col("event_type") =!= "signup")
          .select("user_id", "event_id", "anchor_id")
      },
      Some("""SELECT user_id, event_id, anchor_id FROM (
             |  SELECT user_id, event_id, event_type,
             |    last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS anchor_id
             |  FROM events)
             |WHERE anchor_id IS NOT NULL AND event_type <> 'signup'""".stripMargin)),

    // ---- F3/F4/F5: sentinel / NaN / negative filtering
    "q_f_sentinel" -> QueryDef(
      (s, dir) => {
        Tables.events(s, dir)
          .filter(col("value") =!= lit(-99999.0) && col("value") >= 0 && !isnan(col("value")))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      },
      Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM events
             |WHERE value <> -99999.0 AND value >= 0 AND NOT isnan(value)
             |GROUP BY event_type""".stripMargin)),

    // ---- K1/X4-X6: fixed-width deck line formatting
    "q_x_format" -> QueryDef(
      (s, dir) => {
        t(s, dir, "orders")
          .filter(col("o_orderkey") < 500)
          .select(col("o_orderkey"),
            concat(lit("H"),
              lpad(col("o_orderkey").cast("string"), 16, " "),
              lpad(format_string("%.2f", col("o_totalprice")), 16, " ")).as("line"))
      },
      Some("""SELECT o_orderkey, 'H' || lpad(CAST(o_orderkey AS VARCHAR), 16, ' ')
             |  || lpad(printf('%.2f', o_totalprice), 16, ' ') AS line
             |FROM orders WHERE o_orderkey < 500""".stripMargin)),

    // ---- X14/X15: sha256 series-id derivation from metadata
    "q_x14_hashid" -> QueryDef(
      (s, dir) => {
        t(s, dir, "nation")
          .select(col("n_name"),
            TimeSeriesOps.seriesHashId(lit("flo2d_150_v2"), lit("MME"),
              TimeSeriesOps.seriesKey(lit("discharge"), lower(col("n_name")))).as("tms_id"))
      },
      Some("""SELECT n_name, sha256('flo2d_150_v2' || ';' || 'MME' || ';'
             |  || 'discharge' || '_' || lower(n_name)) AS tms_id FROM nation""".stripMargin)),

    // ---- X13: JSON attribute extraction (config / props blobs)
    "q_x13_json" -> QueryDef(
      (s, dir) => {
        Tables.events(s, dir)
          .filter(col("user_id") < 5)
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))
      },
      Some("""SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k
             |FROM events WHERE user_id < 5""".stripMargin)),

    // ---- Sorts/limits: distributed top-k (TakeOrdered, no global sort)
    "q_topk" -> QueryDef(
      (s, dir) => {
        t(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
          .select("o_orderkey", "o_totalprice")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin))
  )
}
