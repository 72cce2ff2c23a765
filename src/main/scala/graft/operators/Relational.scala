package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/**
 * Relational-core queries: the declarative substrate every higher
 * operator builds on. Each is a pure Catalyst plan — filters and
 * projections push to the parquet scan, dims broadcast, aggregates
 * partial map-side. Numeric outputs are rounded to 4 decimals so the
 * DuckDB oracle hash-compare is immune to summation-order ULPs.
 */
object Relational {

  /** q01: TPC-H Q1-shaped grouped aggregate over lineitem. */
  def q01Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q02: TPC-H Q6-shaped selective filter + single aggregate
    * (showcases predicate pushdown into the scan). */
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** q03: revenue per nation — 3 fact/dim joins, dims broadcast. */
  def q03Join(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    // customer grows with scale factor — never broadcast it; AQE picks
    // the join strategy. Only true dims (nation/region) broadcast.
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
        countDistinct("o_orderkey").as("n_orders"))
      .orderBy("n_name")
  }

  /** q04: top-k with deterministic tie-break. */
  def q04TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** q05: windowed ranking + running sum per supplier. */
  def q05Window(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("running_qty", round(sum("l_quantity").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
      .filter(col("rn") <= 5)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "rn", "running_qty")
      .orderBy("l_suppkey", "rn")
  }

  /** q06: semi/anti join — customers with vs without orders.
    * Single pass: left-join against the distinct key set and project
    * the null test — one scan + one shuffle of orders instead of the
    * semi/anti union's two. */
  def q06SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select("o_custkey").distinct()
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .select(col("c_custkey"), col("o_custkey").isNotNull.as("has_orders"))
      .orderBy("c_custkey")
  }

  /** q07: hierarchical ROLLUP aggregate — the grouping-sets family
    * (subtotals + grand total in ONE pass; Spark expands the sets
    * before the hash aggregate, so it stays a single shuffle instead
    * of one job per level). Subtotal rows are labeled 'ALL' via
    * `grouping()` — the grouping-bit indicator — NOT by coalescing the
    * key's NULL, so a data NULL in a grouping column stays NULL and
    * remains distinguishable from a subtotal row. */
  def q07Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 4).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .select(
        when(col("g_rf") === 1, lit("ALL")).otherwise(col("l_returnflag"))
          .as("l_returnflag"),
        when(col("g_ls") === 1, lit("ALL")).otherwise(col("l_linestatus"))
          .as("l_linestatus"),
        col("sum_qty"), col("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q10: CUBE — the full grouping-sets lattice (per-pair, per-flag,
    * per-status, AND grand total in ONE pass — q07's rollup emits
    * only the hierarchy's prefixes). Same single-shuffle expansion,
    * same grouping()-based subtotal labels. */
  def q10Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 4).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .select(
        when(col("g_rf") === 1, lit("ALL")).otherwise(col("l_returnflag"))
          .as("l_returnflag"),
        when(col("g_ls") === 1, lit("ALL")).otherwise(col("l_linestatus"))
          .as("l_linestatus"),
        col("sum_qty"), col("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q08: PIVOT — long-to-wide reshaping (revenue per priority column
    * per order-year row). Pivot values are enumerated explicitly:
    * with known values Spark skips the extra distinct-collection job
    * and the plan is ONE hash aggregate over (year) with a
    * CASE-per-value projection — the exact shape the p06 one-hot
    * uses, here as the general relational operator. */
  def q08Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).as("order_year"),
        col("o_orderpriority"), col("o_totalprice"))
      .groupBy("order_year")
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(round(sum("o_totalprice"), 4))
      .withColumnsRenamed(Map(
        "1-URGENT" -> "urgent", "2-HIGH" -> "high", "3-MEDIUM" -> "medium",
        "4-NOT SPECIFIED" -> "notspec", "5-LOW" -> "low"))
      .orderBy("order_year")

  /**
   * Salted join: split each hot join key across `salts` shuffle
   * partitions by salting the BIG side with a deterministic per-row
   * hash and replicating the dim side once per salt value, joining on
   * (key, salt). The shuffle then distributes a skewed key's rows
   * over `salts` tasks instead of funneling them through one — the
   * manual mitigation for the straggler-task pattern when BOTH sides
   * are too big to broadcast (AQE's skewedJoin does this adaptively
   * at runtime; the explicit form is for stable plans, pre-AQE
   * engines, and skew known ahead of time). Dim-side cost: ×`salts`
   * rows through the shuffle — keep `salts` at the straggler ratio
   * (8–32), not in the hundreds. Result is EXACTLY the plain join.
   */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
      salts: Int, saltBy: Column): DataFrame = {
    require(!big.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin: inputs must not already have a __salt column " +
        "(withColumn would silently overwrite it / collide the join keys)")
    val saltedBig = big.withColumn("__salt", pmod(saltBy, lit(salts)).cast("int"))
    val expl = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(expl, Seq(key, "__salt")).drop("__salt")
  }

  /** q09: skew-mitigated join — events (big, skewable user_id) joined
    * to a customer dim through `saltedJoin` under a sort-merge hint
    * (the no-broadcast regime the pattern exists for), then a 5-group
    * rollup of value per market segment. The oracle is the PLAIN
    * join: salting must be invisible in the result. */
  def q09SkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    saltedJoin(ev.hint("merge"), cust, "user_id",
        salts = 16, saltBy = xxhash64(col("event_id")))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("total_value"))
      .orderBy("c_mktsegment")
  }

  /** e01: sessionization — a new session starts after a >30 min gap.
    * Two stacked windows (lag → gap flag → running sum) keep the whole
    * thing one shuffle on user_id. */
  def e01Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > 1800.0, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("session_value"))
      .orderBy("user_id", "session_id")
  }

  /**
   * Last-touch attribution with a bounded lookback: each 'purchase'
   * attributes to the latest 'click' by the same user at-or-before
   * it and within `windowSec` — the batch shape of the watermarked
   * stream-stream attribution join (StreamingOps). e03's
   * tagged-union trick: ONE user_id window carrying the running
   * last non-null click timestamp — never a range join, so there is
   * no per-user click×purchase cross product at any scale (the
   * streaming variant bounds its state by the watermark the same
   * way).
   */
  def attribution(events: DataFrame, windowSec: Long): DataFrame = {
    // explicit ROWS frame: Spark's default is RANGE-to-current-row,
    // which treats order-key peers as one unit — the oracle runs ROWS
    // UNBOUNDED PRECEDING, and the two agree only while (ts, event_id)
    // happens to be unique. Pin ROWS so duplicates can't diverge.
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("click_ts", when(col("event_type") === "click", col("ts")))
      .withColumn("last_click_ts", last("click_ts", ignoreNulls = true).over(byUser))
      .filter(col("event_type") === "purchase")
      .withColumn("lag_sec",
        col("ts").cast("double") - col("last_click_ts").cast("double"))
      .withColumn("attributed",
        col("last_click_ts").isNotNull && col("lag_sec") <= windowSec)
      // no nullable TIMESTAMP output: pandas renders a null ts as
      // int64-min NaT, the one shape the driver's hash gate can't
      // normalize (the q12 lesson) — lag_sec + attributed carry it
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
        when(col("attributed"), round(col("lag_sec"), 4)).as("lag_sec"),
        col("attributed"))
  }

  /** e08: last-touch attribution, 1-hour lookback. */
  def e08Attribution(spark: SparkSession, dir: String): DataFrame =
    attribution(Tables.events(spark, dir), windowSec = 3600L)
      .orderBy("event_id")

  /** e05: sessionization via Spark's NATIVE session_window — the same
    * >30 min gap semantics as e01's lag+cumsum, expressed as the
    * operator Structured Streaming uses for stateful session aggs
    * (events merge while each arrives within the gap of the previous;
    * window.start = the session's first event time). One shuffle on
    * the grouping keys; oracle shared with e01's session derivation.
    * Gap is 30 min + 1 µs, NOT "30 minutes": session_window starts a
    * NEW session when next_start >= prev_ts + gap, so a plain 30-min
    * gap would split a pair exactly 1800.000000 s apart — which e01
    * and the shared oracle (`gap > 1800.0`, strict) keep together. At
    * µs timestamp resolution the +1 µs makes the split condition
    * exactly "gap > 1800 s", aligning the boundary semantics. */
  def e05SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "1800000001 microseconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("session_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start")

  /** q11: CDC/upsert compaction — keep only the LATEST record per key
    * (row_number over (key, ts desc) = 1), the standard change-log →
    * current-state collapse. One shuffle on the key; ties broken on
    * event_id so the result is deterministic under concurrent
    * timestamps. */
  def q11LatestByKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .orderBy("user_id")
  }

  /** e06: event funnel (view → click → purchase): per user, the first
    * view, the first click AT OR AFTER it, the first purchase at or
    * after that — stage reached = how deep the ordered chain goes.
    * Three STACKED windows on the same user_id partitioning: Catalyst
    * reuses the exchange, so the whole funnel is ONE shuffle of the
    * events (the e01 pattern), not one join per stage. */
  def e06Funnel(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    Tables.events(spark, dir)
      .withColumn("first_view",
        min(when(col("event_type") === "view", col("ts"))).over(byUser))
      .withColumn("first_click",
        min(when(col("event_type") === "click" && col("ts") >= col("first_view"),
          col("ts"))).over(byUser))
      .withColumn("first_purchase",
        min(when(col("event_type") === "purchase" && col("ts") >= col("first_click"),
          col("ts"))).over(byUser))
      .groupBy("user_id")
      .agg(min("first_view").as("first_view"),
        (max(when(col("first_purchase").isNotNull, 3)
          .when(col("first_click").isNotNull, 2)
          .when(col("first_view").isNotNull, 1).otherwise(0))).as("funnel_stage"))
      .select(col("user_id"), col("funnel_stage"), col("first_view"))
      .orderBy("user_id")
  }

  /** e07: weekly cohort retention — the product-analytics matrix
    * (cohort week × week offset → distinct users). Weeks come from
    * INTEGER epoch-microsecond division (no FP, engine-exact); the
    * per-user cohort week is one window min on the user_id exchange;
    * the distinct-count aggregate is Catalyst's two-level partial
    * expand. The offset-0 slice (cohort sizes) is output-bounded
    * (#cohorts rows), so its join back for the retention ratio
    * broadcasts. */
  def e07Retention(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    val cohorts = Tables.events(spark, dir)
      .withColumn("week", expr("unix_micros(ts) div 604800000000"))
      .withColumn("cohort_week", min("week").over(byUser))
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
    val base = cohorts.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    cohorts.join(broadcast(base), "cohort_week")
      .withColumn("retention_pct",
        Norm.r4(col("n_users").cast("double") / col("cohort_size")))
      .orderBy("cohort_week", "week_offset")
  }

  /** q12: SCD type-2 from a change log — each record becomes a
    * validity interval [valid_from, valid_to) closed by the NEXT
    * change of the same key; the current version carries the
    * warehouse "high date" sentinel (kept < 2262 so downstream
    * ns-resolution readers can hold it). ONE window on the key
    * partitioning; ties broken on event_id like q11 so concurrent
    * timestamps stay deterministic. The dimension-history pattern:
    * change log in, queryable history out, one shuffle. */
  def q12Scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val highDate = lit("2100-01-01 00:00:00").cast("timestamp")
    Tables.events(spark, dir)
      .withColumn("next_ts", lead("ts", 1).over(w))
      .withColumn("is_current", col("next_ts").isNull)
      .select(col("user_id"), col("event_id"), col("value"),
        col("ts").as("valid_from"),
        coalesce(col("next_ts"), highDate).as("valid_to"),
        col("is_current"))
      .orderBy("user_id", "valid_from", "event_id")
  }

  /**
   * q20: TIME-TRAVEL READ — "the state of every entity AS OF T",
   * the reproducibility primitive a training pipeline needs to
   * rebuild yesterday's feature table exactly (and the query shape
   * behind Delta/Iceberg's `VERSION AS OF`): q12's SCD2 intervals
   * filtered to valid_from ≤ T < valid_to — ONE interval row per
   * entity with history at T, entities born after T absent. T is
   * derived from the data as the exact integer-µs midpoint of the
   * event span ((min+max) div 2, a 1-row broadcast) so the oracle
   * computes the identical instant; the containment filter and age
   * are pure i64 comparisons. Cost = q12's one window + a pushed
   * filter; zero-length intervals (equal-ts chains) can never
   * contain T (from ≤ T < to is unsatisfiable when from = to).
   */
  def timeTravel(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val highDate = lit("2100-01-01 00:00:00").cast("timestamp")
    val scd = events
      .withColumn("next_ts", lead("ts", 1).over(w))
      .select(col("user_id"), col("event_id"), col("value"),
        col("ts").as("valid_from"),
        coalesce(col("next_ts"), highDate).as("valid_to"))
    val t = events.agg(
      expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").as("t_us"))
    scd.crossJoin(broadcast(t))
      .filter(unix_micros(col("valid_from")) <= col("t_us") &&
        unix_micros(col("valid_to")) > col("t_us"))
      .select(col("user_id"), col("event_id"), col("value"),
        (col("t_us") - unix_micros(col("valid_from"))).as("age_us"))
      .orderBy("user_id")
  }

  /** q20: the event stream's per-user state at the span midpoint. */
  def q20TimeTravel(spark: SparkSession, dir: String): DataFrame =
    timeTravel(Tables.events(spark, dir)
      .select("user_id", "event_id", "ts", "value"))

  /** q14: MERGE/upsert — apply a compacted change batch to a base
    * snapshot: latest-per-key on each side (q11's one-window
    * compaction), then ONE full-outer join on the key with
    * delta-wins coalescing. The incremental-refresh shape every
    * warehouse table maintenance job runs; both windows and the join
    * share the key partitioning, and nothing passes through the
    * driver. */
  def q14MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    def latest(df: DataFrame): DataFrame =
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val base = latest(ev.filter(col("event_id") < 5000)).select(
      col("user_id"), col("event_id").as("b_event_id"),
      col("ts").as("b_ts"), col("value").as("b_value"))
    val delta = latest(ev.filter(col("event_id") >= 5000)).select(
      col("user_id"), col("event_id").as("d_event_id"),
      col("ts").as("d_ts"), col("value").as("d_value"))
    base.join(delta, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("d_event_id"), col("b_event_id")).as("event_id"),
        coalesce(col("d_ts"), col("b_ts")).as("ts"),
        coalesce(col("d_value"), col("b_value")).as("value"),
        col("d_event_id").isNotNull.as("updated"))
      .orderBy("user_id")
  }

  /** q13: semi-structured extraction — pull a typed field out of a
    * JSON string column (`get_json_object`, codegen'd, no UDF) and
    * aggregate on it. The extraction is a pure projection fused into
    * the scan stage, so schema-on-read over 100 TB of raw JSON logs
    * costs one pass + one map-side-combined aggregate — the
    * ELT-without-a-staging-table shape. */
  def q13Json(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        Norm.r4(avg("k")).as("avg_k"),
        max("k").as("max_k"),
        sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_high"))
      .orderBy("event_type")

  /** e02: tumbling-window event aggregate — the batch plan equivalent
    * of the Structured Streaming query in graft.streaming (same
    * grouping; streaming variant adds a watermark). */
  def e02StreamWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
      .orderBy("window_start", "event_type")

  /**
   * e25: HOPPING (sliding) window aggregate — the overlapping-window
   * shape dashboards and rate monitors actually use ("last hour,
   * refreshed every 15 min"), which e02's tumbling windows cannot
   * express: window(1 h, 15 min) assigns every event to hop/slide = 4
   * overlapping windows. Spark expands the window set IN-ROW
   * (explode of 4 window structs) and partial-aggregates map-side
   * BEFORE the shuffle, so the exchange carries 4·|windows|·|types|
   * grouped cells — never 4·|events| rows; at 100 TB the fan-out is
   * absorbed entirely by the map-side combine. Same streaming twin
   * story as e02 (add a watermark, run incrementally).
   */
  def e25HoppingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes")
          .getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
      .orderBy("window_start", "event_type")

  /**
   * e09: windowed top-k — "what's trending each hour": per tumbling
   * window, the k most frequent event types with counts and rank.
   * ONE partial/final aggregate on (window, type) then a rank window
   * PARTITIONED BY the time window (state per partition = |types|
   * rows — never user- or event-proportional); ties break on the
   * type name. The batch shape of a streaming trending dashboard —
   * the same aggregate runs under a watermark incrementally.
   */
  def windowedTopK(events: DataFrame, windowDur: String, k: Int): DataFrame = {
    val counts = events
      .groupBy(window(col("ts"), windowDur).getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("window_start")
      .orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("window_start", "rnk", "event_type", "n")
  }

  def e09WindowedTopK(spark: SparkSession, dir: String): DataFrame =
    windowedTopK(Tables.events(spark, dir), "6 hours", k = 3)
      .orderBy("window_start", "rnk")

  /**
   * e14: burst detection — per event type, flag tumbling windows
   * whose event count sits more than `zThresh` population standard
   * deviations above that type's own mean window count (the
   * monitoring/alerting shape of e02's aggregate: "this hour is
   * anomalous for this stream"). Both moments (Σcnt, Σcnt²) are
   * exact INTEGER sums over the per-window count table — a bounded
   * model-state relation (windows × types, never event-proportional)
   * — so the one FP step (mean/variance/z, written with an identical
   * operand order in the oracle) runs on identical integers in both
   * engines. The |types|-row stats side broadcasts; zero-variance
   * types (a perfectly steady stream has no bursts) are excluded
   * before the division. The unrounded z feeds the threshold compare
   * in BOTH engines, so the flag set can't split on rounding.
   */
  def burstDetect(events: DataFrame, windowDur: String, zThresh: Double): DataFrame = {
    val cnt = events
      .groupBy(window(col("ts"), windowDur).getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = cnt.groupBy("event_type").agg(
      count(lit(1)).as("nw"), sum("n").as("s1"),
      sum(col("n") * col("n")).as("s2"))
    val mean = col("s1") / col("nw")
    val variance = col("s2") / col("nw") - (col("s1") / col("nw")) * (col("s1") / col("nw"))
    val z = (col("n") - col("s1") / col("nw")) / sqrt(variance)
    cnt.join(broadcast(stats), Seq("event_type"))
      .filter(variance > 0 && z > zThresh)
      .select(col("event_type"), col("window_start"), col("n"),
        (round(mean, 4) + lit(0)).as("mean_n"),
        (round(z, 4) + lit(0)).as("z"))
  }

  def e14Burst(spark: SparkSession, dir: String): DataFrame =
    burstDetect(Tables.events(spark, dir), "1 hour", zThresh = 2.0)
      .orderBy("event_type", "window_start")

  /**
   * q17: equi-width histogram quantile SKETCH — two corpus scans
   * (per-group min/max/count, then per-(group, bin) integer counts)
   * and every later relation bounded by bins × |groups| rows; the
   * single-pass-state answer to p11's exact sort-based quantiles,
   * completing the production sketch family (HLL q15, CMS t16, Bloom
   * d14). Estimate: first bin whose running count reaches rank
   * r = ceil(p·n), linearly interpolated at (r − cum_prev)/cnt into
   * the bin. The bin index and the estimate are DOUBLE expressions
   * mirrored operand-for-operand in the oracle (width = (mx−mn)/B,
   * identical division order), the running count is over ≤B rows per
   * group (a bounded window, never row-proportional), and the
   * degenerate constant group short-circuits to bin 0 before the
   * zero-width divide.
   */
  def histQuantiles(df: DataFrame, grpCol: String, valCol: String,
      bins: Int, ps: Seq[Double]): DataFrame = {
    require(bins >= 2 && bins <= 100000, s"histQuantiles: bins in [2,1e5], got $bins")
    val w = (col("mx") - col("mn")) / lit(bins.toDouble)
    val stats = df.groupBy(col(grpCol).as("g")).agg(
      min(valCol).as("mn"), max(valCol).as("mx"), count(lit(1)).as("n_rows"))
    val binned = df.select(col(grpCol).as("g"), col(valCol).as("x"))
      .join(broadcast(stats), Seq("g"))
      .select(col("g"),
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(floor((col("x") - col("mn")) / w), lit(bins - 1L)))
          .as("bin"))
      .groupBy("g", "bin").agg(count(lit(1)).as("cnt"))
    val cum = binned
      .withColumn("cum", sum("cnt").over(Window.partitionBy("g").orderBy("bin")))
      .withColumn("cum_prev", col("cum") - col("cnt"))
    val targets = stats.select(col("g"), col("n_rows"), col("mn"), col("mx"),
        explode(array(ps.map(p => lit(p)): _*)).as("p"))
      .withColumn("r", ceil(col("p") * col("n_rows")).cast("long"))
    cum.join(broadcast(targets), Seq("g"))
      .filter(col("cum") >= col("r"))
      .groupBy(col("g"), col("p"), col("r"), col("n_rows"), col("mn"), col("mx"))
      .agg(min(struct(col("bin"), col("cum_prev"), col("cnt"))).as("s"))
      .select(col("g").as(grpCol), col("p"), col("n_rows"),
        (round(when(col("mx") === col("mn"), col("mn"))
          .otherwise(col("mn") + w *
            (col("s.bin") + (col("r") - col("s.cum_prev")) / col("s.cnt"))), 4)
          + lit(0)).as("q_est"))
  }

  /**
   * q18: MERGEABLE PARTIAL AGGREGATES — the incremental-rollup
   * contract a 100 TB warehouse runs daily: yesterday's snapshot and
   * today's delta are each pre-aggregated to per-key partial state
   * (count, sum, min, max), and the combined rollup is produced by
   * MERGING the partials algebraically — the raw fact rows are never
   * rescanned. Here the two "snapshots" are the even/odd l_orderkey
   * halves of lineitem; the merge is a full-outer join on the key
   * with the combine functions (count/sum add under coalesce,
   * min/max via least/greatest — both engines ignore nulls there, so
   * a key absent from one snapshot inherits the other's extrema) and
   * the finalizer (avg = merged sum / merged count) runs ONLY on
   * merged state. Keyed on l_suppkey: partial state is |suppliers|
   * rows per snapshot, so merge cost is independent of fact
   * cardinality — the property that makes the pattern worth having
   * at scale.
   */
  def q18PartialMerge(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def partial(half: DataFrame, tag: String): DataFrame =
      half.groupBy("l_suppkey").agg(
        count(lit(1)).as(s"cnt_$tag"),
        sum("l_quantity").as(s"s_qty_$tag"),
        min("l_quantity").as(s"mn_$tag"),
        max("l_quantity").as(s"mx_$tag"),
        sum("l_extendedprice").as(s"s_price_$tag"))
    val a = partial(li.filter(col("l_orderkey") % 2 === 0), "a")
    val b = partial(li.filter(col("l_orderkey") % 2 === 1), "b")
    a.join(b, Seq("l_suppkey"), "full_outer")
      .select(col("l_suppkey"),
        (coalesce(col("cnt_a"), lit(0L)) + coalesce(col("cnt_b"), lit(0L))).as("cnt"),
        (coalesce(col("s_qty_a"), lit(0.0)) + coalesce(col("s_qty_b"), lit(0.0))).as("s_qty"),
        least(col("mn_a"), col("mn_b")).as("mn_qty"),
        greatest(col("mx_a"), col("mx_b")).as("mx_qty"),
        (coalesce(col("s_price_a"), lit(0.0)) + coalesce(col("s_price_b"), lit(0.0))).as("s_price"))
      .select(col("l_suppkey"), col("cnt"), round(col("s_qty"), 4).as("s_qty"),
        col("mn_qty"), col("mx_qty"),
        round(col("s_qty") / col("cnt"), 4).as("avg_qty"),
        round(col("s_price"), 4).as("s_price"))
      .orderBy("l_suppkey")
  }

  /**
   * q19: SNAPSHOT DIFF — the change-data-capture primitive between
   * two versions of a keyed table: full-outer join on the key,
   * compare the payload, classify added / deleted / changed (the
   * unchanged majority is filtered out — at 100 TB the diff report
   * is delta-sized, not snapshot-sized, and the filter runs before
   * the output shuffle). Here v1/v2 are deterministic variants of
   * orders (keys % 11 missing from v1, % 13 from v2, % 7 repriced in
   * v2); production swaps in yesterday's and today's snapshot scans
   * — both sides are pushed-filter parquet scans and the comparison
   * generalizes to a row-hash for wide payloads.
   */
  def q19SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val v1 = o.filter(col("o_orderkey") % 11 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice").as("price1"))
    // +1000.0, not a multiplicative reprice: adding an exact constant
    // to a ~1e5-magnitude double is FP-exact in both engines, where
    // round(x*1.1, 2) disagreed across engines on a 2-dp tie row
    val v2 = o.filter(col("o_orderkey") % 13 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1000.0)
          .otherwise(col("o_totalprice")).as("price2"))
    v1.join(v2, Seq("o_orderkey"), "full_outer")
      .withColumn("status",
        when(col("price1").isNull, "added")
          .when(col("price2").isNull, "deleted")
          .when(col("price1") =!= col("price2"), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select(col("o_orderkey"), col("status"),
        round(col("price1"), 4).as("price1"), round(col("price2"), 4).as("price2"))
      .orderBy("o_orderkey")
  }

  /** q17: p50/p90/p99 of l_extendedprice per return flag via a
    * 256-bin histogram sketch. */
  def q17HistQuantiles(spark: SparkSession, dir: String): DataFrame =
    histQuantiles(
      Tables.lineitem(spark, dir).select(col("l_returnflag"),
        col("l_extendedprice").cast("double").as("l_extendedprice")),
      "l_returnflag", "l_extendedprice", bins = 256, ps = Seq(0.5, 0.9, 0.99))
      .orderBy("l_returnflag", "p")

  /** HLL geometry: m registers, rho from a 22-bit hash window.
    * alpha is the standard HyperLogLog bias constant for m = 256,
    * PRE-computed and embedded as the same literal in the oracle so
    * both engines scale with an identical double. */
  private[graft] val HllM = 256
  private[graft] val HllAlpha = 0.7213 / (1.0 + 1.079 / 256)
  private[graft] val HllWBits = 22

  /**
   * q15: approximate distinct counting via a deterministic
   * HyperLogLog — the sketch that answers "how many distinct
   * users/URLs/sessions per group" over 100 TB in ONE pass with
   * m=256 integers of state per group (exact countDistinct re-scans
   * or holds every key; the sketch never does). Register index and
   * rank come from the c01 xor-fold + LCG integer hashes (not an
   * RNG), rho = position of the lowest set bit in a 22-bit window —
   * every step integer arithmetic both engines compute identically,
   * and Σ2^(−M_j) is a sum of exact binary fractions spanning < 53
   * mantissa bits, so even the FP reduction is ORDER-INDEPENDENT:
   * the estimate is bit-reproducible at any partition count and
   * replays verbatim in the DuckDB oracle. Small-range correction
   * (E ≤ 2.5m with empty registers → m·ln(m/V)) matches the
   * published algorithm; the 32-bit large-range branch is out of
   * hash range here and documented away.
   */
  def hllDistinct(df: DataFrame, groupCol: String, idCol: String): DataFrame = {
    val m = HllM
    val p = lit(1000000007L)
    val folded = col(idCol).bitwiseXOR(shiftright(col(idCol), 31))
    val base = pmod(pmod(folded, p) * lit(2654435761L), p)
    val h2 = pmod(base * lit(1103515245L) + lit(12345L), p)
    // SQUARE before the register/window modulos: the raw LCG values
    // step arithmetically with consecutive ids (zero register
    // collisions -> linear counting overestimates ~27%); squaring mod
    // P breaks the progression (the polyHyperplanes mixing rule) and
    // lands the empirical error inside HLL's 1.04/sqrt(m) envelope
    val regs = df
      .select(col(groupCol),
        pmod(pmod(base * base, p), lit(m.toLong)).as("j"),
        pmod(pmod(h2 * h2, p), lit(1L << HllWBits)).as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit((HllWBits + 1).toDouble))
          .otherwise(lit(1.0) + floor(log2(col("w").bitwiseAND(-col("w"))))))
      .groupBy(groupCol, "j").agg(max("rho").as("mj"))
    val raw = lit(HllAlpha) * m * m /
      (col("s_present") + (lit(m) - col("present")))
    val v = lit(m) - col("present") // empty registers
    regs.groupBy(groupCol).agg(
        sum(pow(lit(2.0), -col("mj"))).as("s_present"),
        count(lit(1)).as("present"))
      .select(col(groupCol),
        round(when(raw <= 2.5 * m && v > 0, lit(m.toDouble) * log(lit(m.toDouble) / v))
          .otherwise(raw), 4).as("hll_distinct"),
        v.cast("long").as("empty_registers"))
  }

  /** q15: approximate distinct users per event type. */
  def q15HllDistinct(spark: SparkSession, dir: String): DataFrame =
    hllDistinct(Tables.events(spark, dir), "event_type", "user_id")
      .orderBy("event_type")

  /**
   * q16: GROUPING SETS — the general form rollup (q07) and cube (q10)
   * are special cases of: an explicit list of grouping combinations
   * evaluated in ONE pass over the fact table (Catalyst expands the
   * sets and shares the scan; the alternative — one query per
   * combination UNION ALL'd — reads the 100 TB input once per set).
   * The three sets here are deliberately NOT a rollup prefix chain:
   * (returnflag, linestatus) for the detail matrix, (ship_year) for
   * an orthogonal time marginal, and () for the grand total.
   */
  def q16GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("ship_year", year(col("l_shipdate")).cast("string"))
    li.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("ship_year")), Seq()),
        col("l_returnflag"), col("l_linestatus"), col("ship_year"))
      .agg(round(sum("l_quantity"), 4).as("sum_qty"), count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        coalesce(col("ship_year"), lit("ALL")).as("ship_year"),
        col("sum_qty"), col("n_rows"))
      .orderBy("l_returnflag", "l_linestatus", "ship_year")
  }

  /**
   * e12: behavioral transition matrix — first-order Markov counts
   * P(next event type | current) from per-user ordered event
   * sequences. One `lead` window PARTITIONED BY user (state bounded
   * by a single user's history, never the corpus), then a
   * map-side-combined (from, to) count; the row-normalizing
   * denominator is a second window over the |types|² count table, so
   * nothing row-proportional is re-scanned. The input shape of churn
   * prediction / next-action models over 100 TB of clickstream.
   */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String): DataFrame = {
    val seq = Window.partitionBy(userCol).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("to_type", lead(col(typeCol), 1).over(seq))
      .filter(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy("from_type")
    pairs.withColumn("prob", Norm.r4(col("n") / sum("n").over(byFrom)))
  }

  /** e12: event-type transition matrix over the events table. */
  def e12Transitions(spark: SparkSession, dir: String): DataFrame =
    transitionMatrix(Tables.events(spark, dir), "user_id", "event_type")
      .orderBy("from_type", "to_type")

  /** Compacted CDC state for one key: final liveness + value, applied
    * op counts, the anomaly count (ops that arrived against the wrong
    * state), and the last op's µs timestamp. */
  final case class CdcRow(
      user_id: Long, final_live: Boolean, final_value: Option[Double],
      n_ins: Long, n_upd: Long, n_del: Long, n_anom: Long, n_unknown: Long,
      last_ts_us: Long)

  /**
   * e29: ORDERED CDC REPLAY / COMPACTION — the table-maintenance fold
   * every lakehouse runs: a change log replays per key in (ts,
   * event_id) order with STRICT op semantics — signup INSERTs (or
   * re-inserts) the row, click/view/purchase UPDATE its value only
   * while the row is live, error DELETEs a live row — and an op
   * against the wrong state (update/delete on a dead row) is counted
   * as an ANOMALY, not silently applied; that distinguishes this from
   * q14's single-batch upsert and q11's latest-by-key, which are
   * last-writer-wins with no state machine. Emits per key the final
   * liveness/value, applied-op counts, anomaly count and last op µs.
   *
   * Scale shape: ONE hash shuffle on the key with a secondary sort
   * (`repartition` + `sortWithinPartitions` — Spark's
   * sort-merge machinery, spill-safe at any log size), then a
   * STREAMING fold over each partition's key runs: state is one
   * (live, value, 5 counters) record — constant memory per run, no
   * window buffers, no collect. This is exactly how a 100 TB CDC
   * compaction wants to run: the log streams through executors once.
   */
  def cdcApply(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val sorted = events.select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        col("event_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Option[Double])]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("tsu"), col("event_id"))
    sorted.mapPartitions { it =>
      new scala.collection.AbstractIterator[CdcRow] {
        private var out: CdcRow = _
        private var open = false
        private var cur = 0L
        private var live = false
        private var vv: Option[Double] = None
        private var ni, nu, nd, na, nk, lt = 0L
        private def finish(): CdcRow = {
          open = false
          CdcRow(cur, live, if (live) vv else None, ni, nu, nd, na, nk, lt)
        }
        private def start(k: Long): Unit = {
          cur = k; open = true; live = false; vv = None
          ni = 0; nu = 0; nd = 0; na = 0; nk = 0; lt = 0
        }
        private def step(tsu: Long, et: String, v: Option[Double]): Unit = {
          lt = tsu
          et match {
            case "signup" => live = true; vv = v; ni += 1
            case "error" => if (live) { live = false; nd += 1 } else na += 1
            case "click" | "view" | "purchase" =>
              if (live) { vv = v; nu += 1 } else na += 1
            // quarantine, don't throw: one malformed row must not kill a
            // 100 TB compaction — the a38 engine-boundary convention.
            // The row leaves state untouched and surfaces in n_unknown.
            case _ => nk += 1
          }
        }
        @annotation.tailrec
        private def pump(): Unit =
          if (out == null) {
            if (!it.hasNext) { if (open) out = finish() }
            else {
              val (k, tsu, _, et, v) = it.next()
              if (open && k != cur) {
                out = finish()
                start(k); step(tsu, et, v)
              } else {
                if (!open) start(k)
                step(tsu, et, v)
                pump()
              }
            }
          }
        def hasNext: Boolean = { pump(); out != null }
        def next(): CdcRow = {
          pump()
          if (out == null) throw new NoSuchElementException
          val r = out; out = null; r
        }
      }
    }.toDF()
  }

  /** e29: the CDC fold over the events change log. */
  def e29CdcApply(spark: SparkSession, dir: String): DataFrame =
    cdcApply(Tables.events(spark, dir)).orderBy("user_id")

  /**
   * e30: EVENT-TIME LATENESS PROFILE — the measurement a streaming
   * team runs BEFORE choosing a watermark delay: for every event,
   * lateness = (max event time among earlier ARRIVALS) − its own
   * event time, i.e. how far behind the stream-global watermark
   * frontier the event lands; the (event_type × minute-bin)
   * histogram of that is exactly the "what delay covers 99.9% of my
   * late data" curve, and a bin's max is the state-retention bound a
   * mis-set watermark would drop. The events table is stored
   * time-ordered, so arrival order is SYNTHESIZED as a BOUNDED
   * disorder (±300 s hash jitter on the event's own timestamp — the
   * bounded-disorder model watermarks assume; the m-family rule:
   * synthesized input, real plumbing) — both engines replay the same
   * closed-form jitter.
   *
   * Shape: a range-partitioned sort on arrival, then the running
   * watermark by the TWO-PASS per-partition-max scan (pass 1: one
   * max per partition, collected; pass 2: parallel per-partition
   * fold from the carried frontier) — never a single-partition
   * window; the global running max costs |partitions| driver values
   * at any stream size. The histogram is a map-side-combined
   * aggregate over ≤ |types| · bins groups.
   */
  /** The per-event lateness stream (event_type, late_sec) behind e30
    * and e31 — the two-pass running-watermark scan documented at
    * [[latenessProfile]]. */
  private def latenessRaw(events: DataFrame, jitterSec: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val jit = (Corpus.hashBucket(col("event_id"), (2 * jitterSec + 1).toLong)
      - lit(jitterSec.toLong)) * lit(1000000L)
    val typed = events.select(
        unix_micros(col("ts")).as("tsu"), col("event_id"),
        col("event_type"), (unix_micros(col("ts")) + jit).as("arr"))
      .as[(Long, Long, String, Long)]
    val sorted = typed.orderBy(col("arr"), col("event_id")).rdd
    sorted.localCheckpoint() // two passes below; don't re-sort
    val partMax = sorted.mapPartitionsWithIndex { (pi, it) =>
      var m = Long.MinValue
      it.foreach(r => m = math.max(m, r._1))
      Iterator((pi, m))
    }.collect().toMap
    val nParts = sorted.getNumPartitions
    val carry = new Array[Long](math.max(nParts, 1))
    carry(0) = Long.MinValue
    var pi = 1
    while (pi < nParts) {
      carry(pi) = math.max(carry(pi - 1), partMax.getOrElse(pi - 1, Long.MinValue))
      pi += 1
    }
    val bc = spark.sparkContext.broadcast(carry)
    sorted.mapPartitionsWithIndex { (p, it) =>
      var wm = bc.value(p)
      it.map { case (tsu, _, et, _) =>
        // MinValue is the "no frontier yet" sentinel — subtracting
        // from it would wrap; the first-ever arrival is never late
        val late = if (wm == Long.MinValue) 0L
          else math.max(0L, wm - tsu) / 1000000L
        wm = math.max(wm, tsu)
        (et, late)
      }
    }.toDF("event_type", "late_sec")
  }

  def latenessProfile(events: DataFrame, jitterSec: Int = 300): DataFrame =
    latenessRaw(events, jitterSec)
      .groupBy(col("event_type"), expr("late_sec div 60").cast("int").as("late_bin"))
      .agg(count(lit(1)).as("n_events"), max("late_sec").as("max_late_sec"))
      .orderBy("event_type", "late_bin")

  /** e30: the ±300 s bounded-disorder lateness histogram over events. */
  def e30LatenessProfile(spark: SparkSession, dir: String): DataFrame =
    latenessProfile(Tables.events(spark, dir))

  /**
   * e31: WATERMARK CHOICE — e30's decision table: per event type, the
   * EXACT lateness quantiles on the coverage definition a watermark
   * actually uses ("the smallest delay d such that ≥ q of events are
   * ≤ d late" — F(d) ≥ q, so configuring delay = p999_sec drops at
   * most 0.1% of that type). Quantile selection is pure INTEGER
   * arithmetic (cum·1000 ≥ 999·n, never a float rank), so the table
   * is engine- and partitioning-exact. The heavy input is the same
   * two-pass watermark scan as e30; the quantile stage runs on the
   * (type, late_sec) COUNT table — bounded by |types| · distinct
   * lateness seconds (≤ 2·jitter), a few thousand rows at ANY stream
   * size, where a window cumsum is free.
   */
  def watermarkChoice(events: DataFrame, jitterSec: Int = 300): DataFrame = {
    val counts = latenessRaw(events, jitterSec)
      .groupBy("event_type", "late_sec").agg(count(lit(1)).as("c"))
    val byType = Window.partitionBy("event_type").orderBy("late_sec")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum("c").over(byType))
      .withColumn("n", sum("c").over(Window.partitionBy("event_type")))
    def qSel(num: Int, den: Int): Column =
      min(when(col("cum") * den >= col("n") * num, col("late_sec")))
    cum.groupBy("event_type")
      .agg(max("n").as("n_events"),
        (round(sum(when(col("late_sec") > 0, col("c")).otherwise(0L))
          / max("n").cast("double"), 4) + lit(0.0)).as("share_late"),
        qSel(1, 2).as("p50_sec"),
        qSel(99, 100).as("p99_sec"),
        qSel(999, 1000).as("p999_sec"),
        max("late_sec").as("max_sec"))
      .orderBy("event_type")
  }

  /** e31: the watermark-delay table over events at ±300 s disorder. */
  def e31WatermarkChoice(spark: SparkSession, dir: String): DataFrame =
    watermarkChoice(Tables.events(spark, dir))

  /**
   * q21: COLUMN PROFILE TABLE — the `df.describe` a warehouse
   * actually ships (data-quality dashboards, ingestion contracts,
   * drift baselines): per numeric column, row/null counts, mean, std,
   * min, max in ONE pass. The FP trap in a cross-engine std is the
   * summation ORDER of Σx² — doubles drift with partitioning; here
   * every value lands on the `grid` integer lattice first
   * (round(x·grid), exact for data stored at ≤ grid precision) and
   * the two moments accumulate as DECIMAL(38,0)/HUGEINT integers —
   * order-independent, partition-exact — before ONE double conversion
   * per aggregate on each side. Melt-first keeps the plan a single
   * scan: the stack is a projection, and map-side combine collapses
   * each partition to ≤ |cols| rows before the 1-shuffle aggregate.
   */
  def profileStats(df: DataFrame, cols: Seq[String], grid: Int = 100): DataFrame = {
    require(cols.nonEmpty && grid >= 1)
    val stackExpr = s"stack(${cols.length}, " +
      cols.map(c => s"'$c', cast($c as double)").mkString(", ") + ") as (column, x)"
    // first moment fits a LONG for any |x| ≤ ~9e16/(grid·rows); only
    // the second moment needs DECIMAL(38,0) headroom (q² ~ 1e14/row)
    val ql = round(col("x") * grid).cast("long")
    val q = ql.cast("decimal(38,0)")
    val g = lit(grid.toDouble)
    df.select(expr(stackExpr))
      .groupBy("column")
      .agg(count(lit(1)).as("n_rows"), count(col("x")).as("n_nonnull"),
        sum(ql).cast("decimal(38,0)").as("s1"), sum(q * q).as("s2"),
        min(ql).as("qmin"), max(ql).as("qmax"))
      .select(col("column"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_null"),
        round(col("s1").cast("double") / g / col("n_nonnull"), 4).as("mean"),
        round(sqrt((col("s2").cast("double") * col("n_nonnull")
            - col("s1").cast("double") * col("s1").cast("double"))
          / (col("n_nonnull").cast("double") * (col("n_nonnull") - 1))) / g, 4)
          .as("std"),
        round(col("qmin").cast("double") / g, 4).as("min"),
        round(col("qmax").cast("double") / g, 4).as("max"))
      .orderBy("column")
  }

  /** q21: the lineitem numeric-column profile. */
  def q21ProfileStats(spark: SparkSession, dir: String): DataFrame =
    profileStats(Tables.lineitem(spark, dir),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
}
