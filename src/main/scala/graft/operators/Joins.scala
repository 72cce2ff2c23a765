package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/**
 * Time-series joins Spark lacks as built-ins, re-expressed as
 * shuffle-bounded Catalyst plans (no custom physical operator needed —
 * composition covers the semantics, preference (a) of the design
 * rules):
 *
 *  - `asofJoin`: for every left row, the latest right row at or before
 *    it — via a tagged UNION + one per-key running window instead of a
 *    join: ONE shuffle, partitioned by the join key, state is a single
 *    running struct per key. No range-cross-product, no broadcast
 *    requirement; skew is bounded by the hottest key exactly like any
 *    per-key window.
 *  - `rangeJoinPairs`: same-key pairs within a time window — epoch
 *    time bucketed by the window width, each row duplicated into its
 *    own and the next bucket, equi-join on (key, bucket), exact filter
 *    after. Shuffle ∝ 2·rows; candidates ∝ true pairs + boundary
 *    near-misses — never a per-key cartesian. This is the standard
 *    interval-join decomposition (Flink's window-join and Trino's
 *    spatial-partitioned joins use the same bucketing idea).
 */
object Joins {

  /**
   * As-of join: for each row of `left`, the most recent row of `right`
   * with `right.time <= left.time` and the same `key`. Returns all
   * left columns plus an `asof` struct of the requested right-side
   * `payload` columns (null when no right row precedes).
   *
   * Ties: a right row at exactly the left row's time matches (the
   * ASOF `>=` convention); multiple right rows at the same (key, time)
   * resolve deterministically by payload struct order.
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: Seq[String]): DataFrame = {
    val r2 = right.select(col(key).as("__k"), col(time).as("__t"), lit(1).as("__r"),
      struct(payload.map(col): _*).as("__p"))
    val pType = r2.schema("__p").dataType
    val l2 = left.select(col(key).as("__k"), col(time).as("__t"), lit(0).as("__r"),
      lit(null).cast(pType).as("__p"), struct(left.columns.map(col): _*).as("__l"))
    val lType = l2.schema("__l").dataType
    val u = l2.unionByName(r2.withColumn("__l", lit(null).cast(lType)))
    // right rows sort BEFORE left rows at equal time (__r desc) so an
    // exactly-simultaneous right row is visible to the left row
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__r").desc, col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__asof", last("__p", ignoreNulls = true).over(w))
      .filter(col("__r") === 0)
      .select(left.columns.map(c => col(s"__l.$c").as(c)) :+ col("__asof").as("asof"): _*)
  }

  /**
   * FORWARD as-of join — polars `join_asof(strategy="forward")`: for
   * every left row, the EARLIEST right row at or after it (the
   * time-to-next-event shape: click → next purchase, symptom → next
   * diagnosis). Same union + one-windowed-pass design as the backward
   * [[asofJoin]], mirrored: the frame runs [current, ∞) and takes the
   * FIRST non-null payload; at equal time the right row sorts AFTER
   * the left (__r asc) so a simultaneous right row is visible, and
   * equal-time right rows tie-break on the ascending payload struct
   * (deterministic in both engines — the oracle's LATERAL orders by
   * (ts, payload) the same way). One shuffle on the key, no join.
   */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      time: String, payload: Seq[String]): DataFrame = {
    val r2 = right.select(col(key).as("__k"), col(time).as("__t"), lit(1).as("__r"),
      struct(payload.map(col): _*).as("__p"))
    val pType = r2.schema("__p").dataType
    val l2 = left.select(col(key).as("__k"), col(time).as("__t"), lit(0).as("__r"),
      lit(null).cast(pType).as("__p"), struct(left.columns.map(col): _*).as("__l"))
    val lType = l2.schema("__l").dataType
    val u = l2.unionByName(r2.withColumn("__l", lit(null).cast(lType)))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__r").asc, col("__p"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u.withColumn("__asof", first("__p", ignoreNulls = true).over(w))
      .filter(col("__r") === 0)
      .select(left.columns.map(c => col(s"__l.$c").as(c)) :+ col("__asof").as("asof"): _*)
  }

  /**
   * NEAREST as-of join — polars `join_asof(strategy="nearest")`: for
   * every left row, whichever of its backward and forward matches is
   * closer in time, ties to the backward side (the row that already
   * happened). BOTH directions come from the same unioned frame in
   * one shuffle — two window passes (one ordered each way) over the
   * same key partitioning, then the pick is a projection on the two
   * candidates' exact microsecond gaps. Returns the chosen payload
   * plus `side` ('b'/'f') so the decision is auditable.
   */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
      time: String, payload: Seq[String]): DataFrame = {
    val r2 = right.select(col(key).as("__k"), col(time).as("__t"), lit(1).as("__r"),
      struct(payload.map(col): _*).as("__p"))
    val pType = r2.schema("__p").dataType
    val l2 = left.select(col(key).as("__k"), col(time).as("__t"), lit(0).as("__r"),
      lit(null).cast(pType).as("__p"), struct(left.columns.map(col): _*).as("__l"))
    val lType = l2.schema("__l").dataType
    val u = l2.unionByName(r2.withColumn("__l", lit(null).cast(lType)))
      // the right TIME rides beside the payload so the distance rule
      // needs no payload-schema knowledge
      .withColumn("__tp", when(col("__r") === 1,
        struct(col("__t").as("t"), col("__p").as("p"))))
    val wb = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__r").desc, col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__r").asc, col("__p"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val gb = unix_micros(col("__t")) - unix_micros(col("__b.t"))
    val gf = unix_micros(col("__f.t")) - unix_micros(col("__t"))
    u.withColumn("__b", last("__tp", ignoreNulls = true).over(wb))
      .withColumn("__f", first("__tp", ignoreNulls = true).over(wf))
      .filter(col("__r") === 0)
      .withColumn("__side",
        when(col("__f").isNull, lit("b"))
          .when(col("__b").isNull, lit("f"))
          .when(gb <= gf, lit("b")).otherwise(lit("f")))
      .select(left.columns.map(c => col(s"__l.$c").as(c)) ++ Seq(
        when(col("__side") === "b", col("__b.p")).otherwise(col("__f.p")).as("asof"),
        col("__side").as("side")): _*)
  }

  /**
   * Same-key row pairs within `windowSec` seconds of each other.
   * Output: one row per unordered pair — key, id1 < id2 (by `id`),
   * gap_us (absolute time distance in microseconds, exact integers).
   */
  def rangeJoinPairs(df: DataFrame, key: String, time: String, id: String,
      windowSec: Long): DataFrame = {
    val wUs = windowSec * 1000000L
    val base = df.select(col(key).as("__k"), col(id).as("__id"),
      unix_micros(col(time)).as("__t"))
    // "early" side lands in its own bucket and the next one, so a
    // "late" row up to one window away is always an equi-match
    val early = base.withColumn("__b",
      explode(array(floor(col("__t") / wUs), floor(col("__t") / wUs) + 1)))
    val late = base.select(col("__k"), col("__id").as("__id2"), col("__t").as("__t2"),
      floor(col("__t") / wUs).as("__b"))
    early.join(late, Seq("__k", "__b"))
      .filter((col("__t2") - col("__t")).between(0L, wUs) &&
        (col("__t") < col("__t2") ||
          (col("__t") === col("__t2") && col("__id") < col("__id2"))))
      .select(col("__k").as(key),
        least(col("__id"), col("__id2")).as("id1"),
        greatest(col("__id"), col("__id2")).as("id2"),
        (col("__t2") - col("__t")).as("gap_us"))
  }

  // ------------------------------------------------------------ queries

  /** e03: purchase→click attribution — for every purchase event, the
    * user's most recent click at or before it. Oracle: DuckDB ASOF
    * LEFT JOIN. gap_us stays exact integer microseconds so the hash
    * compare needs no rounding. */
  def e03AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    asofJoin(purchases, clicks, "user_id", "ts", Seq("event_id", "ts"))
      .select(col("event_id"), col("user_id"),
        col("asof.event_id").as("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof.ts"))).as("gap_us"))
      .orderBy("event_id")
  }

  /** e20: click → NEXT purchase per user (forward as-of) —
    * time-to-conversion. Oracle: LATERAL top-1 with the same
    * (ts, event_id) ascending tie-break as the window's payload
    * order; gap_us exact integer microseconds. */
  def e20AsofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id")
    asofJoinForward(clicks, purchases, "user_id", "ts", Seq("event_id", "ts"))
      .select(col("event_id"), col("user_id"),
        col("asof.event_id").as("purchase_id"),
        (unix_micros(col("asof.ts")) - unix_micros(col("ts"))).as("gap_us"))
      .orderBy("event_id")
  }

  /** e21: click → NEAREST purchase per user (either direction, ties
    * backward) — the polars strategy="nearest" surface; `side`
    * reports which direction won, gap_us the absolute distance. */
  def e21AsofNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id")
    asofJoinNearest(clicks, purchases, "user_id", "ts", Seq("event_id", "ts"))
      .select(col("event_id"), col("user_id"),
        col("asof.event_id").as("purchase_id"), col("side"),
        when(col("side") === "b",
          unix_micros(col("ts")) - unix_micros(col("asof.ts")))
          .otherwise(unix_micros(col("asof.ts")) - unix_micros(col("ts")))
          .as("gap_us"))
      .orderBy("event_id")
  }

  /**
   * As-of join with a TOLERANCE horizon — the last piece of the
   * polars `join_asof` surface (`tolerance=`): the backward match
   * only counts when `left.time − right.time ≤ tolUs`; a staler
   * match nulls out. Semantics follow polars exactly: the candidate
   * is STILL the latest preceding right row (any earlier row is even
   * farther, so tolerance can only null, never substitute). Same
   * union + one-window design as [[asofJoin]] with the right TIME
   * riding beside the payload (the nearest-join trick) so the gap
   * check needs no payload-schema knowledge; one shuffle on the key.
   */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
      time: String, payload: Seq[String], tolUs: Long): DataFrame = {
    require(tolUs >= 0, s"asofJoinTolerance: tolUs must be >= 0, got $tolUs")
    val r2 = right.select(col(key).as("__k"), col(time).as("__t"), lit(1).as("__r"),
      struct(payload.map(col): _*).as("__p"))
    val pType = r2.schema("__p").dataType
    val l2 = left.select(col(key).as("__k"), col(time).as("__t"), lit(0).as("__r"),
      lit(null).cast(pType).as("__p"), struct(left.columns.map(col): _*).as("__l"))
    val lType = l2.schema("__l").dataType
    val u = l2.unionByName(r2.withColumn("__l", lit(null).cast(lType)))
      .withColumn("__tp", when(col("__r") === 1,
        struct(col("__t").as("t"), col("__p").as("p"))))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__r").desc, col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap = unix_micros(col("__t")) - unix_micros(col("__b.t"))
    u.withColumn("__b", last("__tp", ignoreNulls = true).over(w))
      .filter(col("__r") === 0)
      .select(left.columns.map(c => col(s"__l.$c").as(c)) :+
        when(col("__b").isNotNull && gap <= tolUs, col("__b.p")).as("asof"): _*)
  }

  /** e26: purchase ← most recent click within 30 min (tolerance
    * as-of) — e03's attribution query with the polars `tolerance`
    * horizon: stale clicks no longer claim the purchase. */
  def e26AsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    asofJoinTolerance(purchases, clicks, "user_id", "ts",
        Seq("event_id", "ts"), tolUs = 1800000000L)
      .select(col("event_id"), col("user_id"),
        col("asof.event_id").as("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof.ts"))).as("gap_us"))
      .orderBy("event_id")
  }

  /**
   * Regular-grid RESAMPLE + FORWARD FILL — the time-series alignment
   * primitive (feature tables want one row per (entity, day), sensor
   * and metric streams arrive irregularly): per entity, a daily grid
   * spans its observation range (`sequence` explode — fan-out is
   * days-per-entity, never a cross join), the last observation of
   * each day wins deterministically (ts desc, event_id desc), and
   * gaps carry the previous day's value via `last(..., ignoreNulls)`
   * over an entity-partitioned running frame. Every window
   * partitions by the entity — parallelism = |entities|, the e-family
   * contract. The first grid day is an observation day by
   * construction, so no entity has leading nulls.
   */
  def resampleFfill(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("d", to_date(col("ts")))
    val span = ev.groupBy("user_id").agg(min("d").as("d0"), max("d").as("d1"))
    val grid = span.select(col("user_id"),
      explode(expr("sequence(d0, d1, interval 1 day)")).as("gd"))
    val wLast = Window.partitionBy("user_id", "d")
      .orderBy(col("ts").desc, col("event_id").desc)
    val lastDay = ev.withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("d").as("gd"), col("value"))
    val wFfill = Window.partitionBy("user_id").orderBy("gd")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastDay, Seq("user_id", "gd"), "left")
      .withColumn("is_observed", col("value").isNotNull)
      .withColumn("value_ffill",
        round(last(col("value"), ignoreNulls = true).over(wFfill), 4) + lit(0.0))
      .select(col("user_id"), date_format(col("gd"), "yyyy-MM-dd").as("grid_day"),
        col("value_ffill"), col("is_observed"))
      .orderBy("user_id", "grid_day")
  }

  /** e23: daily resample + ffill of each user's event value stream. */
  def e23ResampleFfill(spark: SparkSession, dir: String): DataFrame =
    resampleFfill(Tables.events(spark, dir))

  /**
   * e28: regular-grid resample + LINEAR INTERPOLATION — e23's
   * numeric sibling (ffill repeats stale sensor values across gaps;
   * a numeric feature usually wants the straight line between the
   * bracketing observations):
   *   v(gd) = v_prev + (v_next − v_prev)·(gd − d_prev)/(d_next − d_prev)
   * with integer day gaps, over the same grid/last-of-day machinery
   * as [[resampleFfill]]. Both brackets always exist — the grid spans
   * min..max OBSERVATION days, so the first and last grid days are
   * observed (the no-next arm is defensive only). The bracketing observations come from two
   * IGNORE-NULLS windows over the SAME entity partitioning (running
   * last + running first) — the struct is wrapped in
   * when(value.isNotNull, …) so null grid days don't smuggle
   * non-null structs past ignoreNulls. Parallelism = |entities|.
   */
  def resampleInterp(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("d", to_date(col("ts")))
    val span = ev.groupBy("user_id").agg(min("d").as("d0"), max("d").as("d1"))
    val grid = span.select(col("user_id"),
      explode(expr("sequence(d0, d1, interval 1 day)")).as("gd"))
    val wLast = Window.partitionBy("user_id", "d")
      .orderBy(col("ts").desc, col("event_id").desc)
    val lastDay = ev.withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("d").as("gd"), col("value"))
    val wPrev = Window.partitionBy("user_id").orderBy("gd")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("user_id").orderBy("gd")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obs = when(col("value").isNotNull,
      struct(col("gd").as("d"), col("value").as("v")))
    grid.join(lastDay, Seq("user_id", "gd"), "left")
      .withColumn("is_observed", col("value").isNotNull)
      .withColumn("p", last(obs, ignoreNulls = true).over(wPrev))
      .withColumn("nx", first(obs, ignoreNulls = true).over(wNext))
      .withColumn("v_interp",
        when(col("nx").isNull, col("p.v"))
          .when(col("p.d") === col("nx.d"), col("p.v"))
          .otherwise(col("p.v") + (col("nx.v") - col("p.v")) *
            datediff(col("gd"), col("p.d")).cast("double") /
            datediff(col("nx.d"), col("p.d")).cast("double")))
      .select(col("user_id"),
        date_format(col("gd"), "yyyy-MM-dd").as("grid_day"),
        Norm.r4(col("v_interp")).as("value_interp"),
        col("is_observed"))
      .orderBy("user_id", "grid_day")
  }

  /** e28: daily resample + linear interpolation per user. */
  def e28ResampleInterp(spark: SparkSession, dir: String): DataFrame =
    resampleInterp(Tables.events(spark, dir))

  /** e04: same-user event pairs within 10 minutes — the bucketed
    * interval self-join. Oracle: plain inequality self-join (fine at
    * sf0.01; the bucketing is the part that scales). */
  def e04RangeJoin(spark: SparkSession, dir: String): DataFrame =
    rangeJoinPairs(Tables.events(spark, dir), "user_id", "ts", "event_id", 600L)
      .orderBy("id1", "id2")

  // --------------------------------------------------------- oracle SQL

  val oracleSql: Map[String, String] = Map(
    // e23: same grid/last-of-day/ffill arithmetic; generate_series
    // over the per-user date span, IGNORE NULLS running last
    "e23_resample_ffill" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        |  FROM events
        |), span AS (
        |  SELECT user_id, min(d) AS d0, max(d) AS d1 FROM ev GROUP BY 1
        |), grid AS (
        |  SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS gd
        |  FROM span
        |), lastday AS (
        |  SELECT user_id, d AS gd, value FROM (
        |    SELECT user_id, d, value,
        |      row_number() OVER (PARTITION BY user_id, d
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM ev) WHERE rn = 1
        |), j AS (
        |  SELECT g.user_id, g.gd, l.value,
        |    l.value IS NOT NULL AS is_observed
        |  FROM grid g LEFT JOIN lastday l
        |    ON g.user_id = l.user_id AND g.gd = l.gd
        |)
        |SELECT user_id, strftime(gd, '%Y-%m-%d') AS grid_day,
        |  round(last_value(value IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY gd ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
        |    + 0 AS value_ffill,
        |  is_observed
        |FROM j ORDER BY user_id, grid_day""".stripMargin,
    // e28: e23's grid/last-of-day CTEs + bracketing via two
    // IGNORE-NULLS struct windows mirrored as separate value/day
    // windows; same operand-order interpolation arithmetic
    "e28_resample_interp" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        |  FROM events
        |), span AS (
        |  SELECT user_id, min(d) AS d0, max(d) AS d1 FROM ev GROUP BY 1
        |), grid AS (
        |  SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS gd
        |  FROM span
        |), lastday AS (
        |  SELECT user_id, d AS gd, value FROM (
        |    SELECT user_id, d, value,
        |      row_number() OVER (PARTITION BY user_id, d
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM ev) WHERE rn = 1
        |), j AS (
        |  SELECT g.user_id, g.gd, l.value,
        |    l.value IS NOT NULL AS is_observed,
        |    CASE WHEN l.value IS NOT NULL THEN g.gd END AS od
        |  FROM grid g LEFT JOIN lastday l
        |    ON g.user_id = l.user_id AND g.gd = l.gd
        |), w AS (
        |  SELECT user_id, gd, is_observed,
        |    last_value(value IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY gd ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(od IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY gd ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        |    first_value(value IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY gd ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(od IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY gd ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        |  FROM j
        |)
        |SELECT user_id, strftime(gd, '%Y-%m-%d') AS grid_day,
        |  round(CASE WHEN nd IS NULL THEN pv
        |    WHEN pd = nd THEN pv
        |    ELSE pv + (nv - pv)
        |      * CAST(date_diff('day', pd, gd) AS DOUBLE)
        |      / CAST(date_diff('day', pd, nd) AS DOUBLE) END, 4) + 0
        |    AS value_interp,
        |  is_observed
        |FROM w ORDER BY user_id, grid_day""".stripMargin,
    // e26: the e03 ASOF join + a tolerance CASE — the latest
    // preceding click is STILL the candidate; beyond 30 min it nulls
    "e26_asof_tolerance" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
        |p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT max(event_id) AS click_id, user_id AS cu, ts AS cts
        |      FROM ev WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT p.event_id, p.user_id,
        |  CASE WHEN epoch_us(p.ts) - epoch_us(c.cts) <= 1800000000
        |    THEN c.click_id END AS click_id,
        |  CASE WHEN epoch_us(p.ts) - epoch_us(c.cts) <= 1800000000
        |    THEN epoch_us(p.ts) - epoch_us(c.cts) END AS gap_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.cu AND p.ts >= c.cts
        |ORDER BY p.event_id""".stripMargin,
    "e03_asof_join" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
        |p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
        |-- collapse same-(user, ts) click ties to the max event_id BEFORE
        |-- the ASOF join: DuckDB's pick among equal-time right rows is
        |-- unspecified, while asofJoin deterministically takes the max
        |-- payload struct — after the collapse both yield the same row
        |c AS (SELECT max(event_id) AS click_id, user_id AS cu, ts AS cts
        |      FROM ev WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT p.event_id, p.user_id, c.click_id,
        |  epoch_us(p.ts) - epoch_us(c.cts) AS gap_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.cu AND p.ts >= c.cts
        |ORDER BY p.event_id""".stripMargin,
    // e20/e21: LATERAL top-1 per click with explicit tie-breaks that
    // mirror the window payload orders (forward: min (ts, event_id);
    // backward: max ts then max event_id)
    "e20_asof_forward" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
        |c AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, event_id FROM ev WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, m.pid AS purchase_id,
        |  CAST(epoch_us(m.pts) - epoch_us(c.ts) AS BIGINT) AS gap_us
        |FROM c LEFT JOIN LATERAL (
        |  SELECT p.event_id AS pid, p.ts AS pts FROM p
        |  WHERE p.user_id = c.user_id AND p.ts >= c.ts
        |  ORDER BY p.ts, p.event_id LIMIT 1
        |) m ON TRUE
        |ORDER BY c.event_id""".stripMargin,
    "e21_asof_nearest" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
        |c AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, event_id FROM ev WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT c.event_id, c.user_id, c.ts,
        |    b.pid AS bid, b.pts AS bts, f.pid AS fid, f.pts AS fts
        |  FROM c
        |  LEFT JOIN LATERAL (
        |    SELECT p.event_id AS pid, p.ts AS pts FROM p
        |    WHERE p.user_id = c.user_id AND p.ts <= c.ts
        |    ORDER BY p.ts DESC, p.event_id DESC LIMIT 1
        |  ) b ON TRUE
        |  LEFT JOIN LATERAL (
        |    SELECT p.event_id AS pid, p.ts AS pts FROM p
        |    WHERE p.user_id = c.user_id AND p.ts >= c.ts
        |    ORDER BY p.ts, p.event_id LIMIT 1
        |  ) f ON TRUE
        |), s AS (
        |  SELECT *, CASE WHEN fid IS NULL THEN 'b' WHEN bid IS NULL THEN 'f'
        |    WHEN epoch_us(ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(ts)
        |      THEN 'b' ELSE 'f' END AS side
        |  FROM j
        |)
        |SELECT event_id, user_id,
        |  CASE WHEN side = 'b' THEN bid ELSE fid END AS purchase_id, side,
        |  CAST(CASE WHEN side = 'b' THEN epoch_us(ts) - epoch_us(bts)
        |    ELSE epoch_us(fts) - epoch_us(ts) END AS BIGINT) AS gap_us
        |FROM s ORDER BY event_id""".stripMargin,
    "e04_range_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events
        |)
        |SELECT a.user_id, a.event_id AS id1, b.event_id AS id2,
        |  abs(b.t - a.t) AS gap_us
        |FROM ev a JOIN ev b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(b.t - a.t) <= 600000000
        |ORDER BY id1, id2""".stripMargin,
  )
}
