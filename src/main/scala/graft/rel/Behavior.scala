package graft.rel

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Behavioral event analytics (SURVEY §2 addendum): funnel conversion and
  * cohort retention over the events stream — the two queries every product
  * analytics deployment runs daily at full-corpus scale.
  *
  * Scale notes: both operators reduce events to per-user scalars first
  * (min-timestamp aggregates with map-side partials), so the expensive
  * shuffles are all keyed on user_id and AQE can reuse the partitioning;
  * nothing materializes per-event state. Time math is integer epoch-millis
  * (`ts_ms`), exact in both engines (graft-round2 lesson: no IEEE hazards).
  */
object Behavior {

  /** 2024-01-01T00:00:00Z in epoch millis — the cohort grid origin. */
  private val epoch0 = 1704067200000L
  private val weekMs = 7L * 86400000L

  def defs: Seq[QueryDef] = Seq(

    // Ordered funnel: first view → first click at-or-after it → first
    // purchase at-or-after that, per user; output per-stage reach counts.
    // Three aggregates chained by two user-keyed joins — the canonical
    // "sequence of conditional firsts" shape. The per-stage tables are one
    // row per user, so at 100 TB the joins are user-cardinality, not
    // event-cardinality, and every aggregate combines map-side.
    QueryDef(
      "funnel_conversion",
      Some(
        "WITH e AS (SELECT user_id, event_type, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms FROM events), " +
          "v AS (SELECT user_id, min(ts_ms) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id), " +
          "c AS (SELECT e.user_id, min(ts_ms) AS t2 FROM e JOIN v ON e.user_id = v.user_id " +
          "WHERE event_type = 'click' AND ts_ms >= t1 GROUP BY e.user_id), " +
          "p AS (SELECT e.user_id, min(ts_ms) AS t3 FROM e JOIN c ON e.user_id = c.user_id " +
          "WHERE event_type = 'purchase' AND ts_ms >= t2 GROUP BY e.user_id) " +
          "SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view, " +
          "CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click, " +
          "CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase"),
      (s, d) => {
        val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms")
        val v = e.where(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts_ms")).as("t1"))
        val c = e.where(col("event_type") === "click")
          .join(v, "user_id").where(col("ts_ms") >= col("t1"))
          .groupBy("user_id").agg(min(col("ts_ms")).as("t2"))
        val p = e.where(col("event_type") === "purchase")
          .join(c, "user_id").where(col("ts_ms") >= col("t2"))
          .groupBy("user_id").agg(min(col("ts_ms")).as("t3"))
        // One global aggregate over the union of per-stage user rows instead
        // of joining three single-row counts: no join at all (the round-3
        // form planned BroadcastNestedLoopJoin), and the stage indicator
        // sums combine map-side. coalesce guards the empty-stage case where
        // sum yields NULL but the oracle's count yields 0.
        v.select(lit(1L).as("sv"), lit(0L).as("sc"), lit(0L).as("sp"))
          .unionAll(c.select(lit(0L).as("sv"), lit(1L).as("sc"), lit(0L).as("sp")))
          .unionAll(p.select(lit(0L).as("sv"), lit(0L).as("sc"), lit(1L).as("sp")))
          .agg(coalesce(sum(col("sv")), lit(0L)).as("n_view"),
            coalesce(sum(col("sc")), lit(0L)).as("n_click"),
            coalesce(sum(col("sp")), lit(0L)).as("n_purchase"))
      }),

    // Cohort retention: users grouped by first-activity week, counted in
    // each later week they return — the retention triangle. One per-user
    // min aggregate, one user-keyed join back to events, one
    // (cohort, offset) distinct-count; week arithmetic is integer floor
    // division on epoch millis so the grid is engine-exact.
    QueryDef(
      "retention_cohort",
      Some(
        "WITH e AS (SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms FROM events), " +
          s"f AS (SELECT user_id, (min(ts_ms) - $epoch0) // $weekMs AS cohort_week FROM e GROUP BY user_id) " +
          s"SELECT cohort_week, (e.ts_ms - $epoch0) // $weekMs - cohort_week AS week_offset, " +
          "CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active " +
          "FROM e JOIN f ON e.user_id = f.user_id " +
          "GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset"),
      (s, d) => {
        val e = Tables.events(s, d).select("user_id", "ts_ms")
        val f = e.groupBy("user_id")
          .agg(expr(s"(min(ts_ms) - ${epoch0}L) DIV ${weekMs}L").as("cohort_week"))
        e.join(f, "user_id")
          .groupBy(col("cohort_week"),
            expr(s"(ts_ms - ${epoch0}L) DIV ${weekMs}L - cohort_week").as("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .orderBy("cohort_week", "week_offset")
      }))
}
