"""Sessionization: gap-based user sessions over the events stream.

Batch form: the classic two-window formulation — flag rows whose gap from
the previous event exceeds the timeout, running-sum the flags into a
session index, aggregate per (user, session).  All JVM-side window
functions; one shuffle on user_id that both windows and the final
aggregation reuse (same partitioning ⇒ no second exchange).

Timestamps compare on second-truncated epochs in both engines, so the
nanos-vs-micros encoding difference cannot flip a gap decision.

The true-streaming form of this operator (arbitrary stateful processing
with ``applyInPandasWithState``) lives in
:mod:`ringo_spark.streaming.sessionize`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SESSION_GAP_SECONDS = 1800


def sessionize_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import load_catalog
    from ..testbed import EVENTS

    ev = (load_catalog(spark, sf_dir, [EVENTS])["events"]
          .select("user_id",
                  F.unix_timestamp("ts").alias("sec"),
                  F.col("value").cast("decimal(18,2)").alias("value")))
    w = Window.partitionBy("user_id").orderBy("sec", "value")
    new_session = F.when(
        (F.col("sec") - F.lag("sec").over(w)) > SESSION_GAP_SECONDS, 1) \
        .when(F.lag("sec").over(w).isNull(), 1).otherwise(0)
    with_idx = (ev.withColumn("new_s", new_session)
                .withColumn("session_idx",
                            F.sum("new_s").over(
                                w.rowsBetween(Window.unboundedPreceding, 0))))
    return (with_idx.groupBy("user_id", "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("sec").alias("session_start_sec"),
                 F.max("sec").alias("session_end_sec"),
                 F.sum("value").cast("double").alias("value_sum"))
            .select("user_id", F.col("session_idx").cast("long"),
                    "n_events", "session_start_sec", "session_end_sec",
                    (F.col("session_end_sec") - F.col("session_start_sec"))
                    .alias("duration_sec"), "value_sum"))


SESSIONIZE_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         CAST(value AS DECIMAL(18,2)) AS value
  FROM events),
flagged AS (
  SELECT user_id, sec, value,
         CASE WHEN lag(sec) OVER w IS NULL THEN 1
              WHEN sec - lag(sec) OVER w > {SESSION_GAP_SECONDS} THEN 1
              ELSE 0 END AS new_s
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY sec, value)),
indexed AS (
  SELECT user_id, sec, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY sec, value
                          ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       min(sec) AS session_start_sec,
       max(sec) AS session_end_sec,
       max(sec) - min(sec) AS duration_sec,
       CAST(sum(value) AS DOUBLE) AS value_sum
FROM indexed
GROUP BY 1, 2
"""

def sessionize_native_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's BUILT-IN ``session_window`` — the
    Catalyst-native twin of :func:`sessionize_df`: one aggregation with
    in-engine session merging instead of two analytic windows + a
    re-aggregation.  Same single user_id shuffle, less window machinery,
    and the identical operator works under Structured Streaming with a
    watermark (state store session merge).

    Boundary semantics at exactly the gap (verified empirically at
    sf0.1, r15 — the sf0.001/0.01 corpora have no pair landing exactly
    on the boundary, so only the full-registry sf0.1 sweep caught the
    earlier mis-documentation): ``session_window`` MERGES touching
    windows — an event arriving exactly ``gap`` after the previous one
    extends the session ([t, t+gap) intervals that touch end-to-start
    coalesce), i.e. a new session starts only when the gap is STRICTLY
    greater, the same rule as the two-window form.  The oracle encodes
    that (>) rule.  ``session_end_sec`` is the window's exclusive end =
    last event + gap."""
    from ..catalog import load_catalog
    from ..testbed import EVENTS

    ev = (load_catalog(spark, sf_dir, [EVENTS])["events"]
          .select("user_id",
                  F.timestamp_seconds(F.unix_timestamp("ts")).alias("t"),
                  F.col("value").cast("decimal(18,2)").alias("value")))
    sw = F.session_window("t", f"{SESSION_GAP_SECONDS} seconds")
    return (ev.groupBy("user_id", sw.alias("sw"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").cast("double").alias("value_sum"))
            .select("user_id",
                    F.unix_timestamp("sw.start").alias("session_start_sec"),
                    F.unix_timestamp("sw.end").alias("session_end_sec"),
                    "n_events", "value_sum"))


SESSIONIZE_NATIVE_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         CAST(value AS DECIMAL(18,2)) AS value
  FROM events),
flagged AS (
  SELECT user_id, sec, value,
         CASE WHEN lag(sec) OVER w IS NULL THEN 1
              WHEN sec - lag(sec) OVER w > {SESSION_GAP_SECONDS} THEN 1
              ELSE 0 END AS new_s
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY sec)),
indexed AS (
  SELECT user_id, sec, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY sec
                          ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged)
SELECT user_id,
       min(sec) AS session_start_sec,
       max(sec) + {SESSION_GAP_SECONDS} AS session_end_sec,
       count(*) AS n_events,
       CAST(sum(value) AS DOUBLE) AS value_sum
FROM indexed
GROUP BY user_id, session_idx
"""

def retention_cohorts_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention-cohort matrix — the classic activation analytic:
    users grouped by their FIRST active week (the cohort), counted in
    every later week they return, with retention as a fraction of the
    cohort's size.

    Scale shape: one distinct over (user, week) — the only corpus-sized
    shuffle, with map-side partial dedup; the per-user min rides the
    same user partitioning (no second exchange); the (cohort, offset)
    rollup shuffles tiny distinct rows; the cohort-size self-join is
    against a weeks-count-sized aggregate (unhinted — AQE broadcasts
    it).  Pure integer week arithmetic; the retention fraction is one
    double division rounded at the end."""
    from ..catalog import load_catalog
    from ..testbed import EVENTS

    ev = (load_catalog(spark, sf_dir, [EVENTS])["events"]
          .where(F.col("user_id").isNotNull())
          .select("user_id",
                  F.floor(F.unix_timestamp("ts") / F.lit(604800))
                  .cast("long").alias("wk")))
    act = ev.distinct()
    first = act.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    counts = (act.join(first, "user_id")
              .groupBy("cohort_wk",
                       (F.col("wk") - F.col("cohort_wk"))
                       .alias("week_offset"))
              .agg(F.count(F.lit(1)).alias("active_users")))
    size = (counts.where(F.col("week_offset") == 0)
            .select("cohort_wk",
                    F.col("active_users").alias("cohort_size")))
    return (counts.join(size, "cohort_wk")
            .select("cohort_wk", "week_offset", "active_users",
                    "cohort_size",
                    F.round(F.col("active_users") / F.col("cohort_size"), 6)
                    .alias("retention")))


RETENTION_COHORTS_SQL = """
WITH act AS (
  SELECT DISTINCT user_id,
         CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS wk
  FROM events WHERE user_id IS NOT NULL),
first AS (
  SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY 1),
counts AS (
  SELECT cohort_wk, wk - cohort_wk AS week_offset,
         count(*) AS active_users
  FROM act JOIN first USING (user_id)
  GROUP BY 1, 2),
size AS (
  SELECT cohort_wk, active_users AS cohort_size
  FROM counts WHERE week_offset = 0)
SELECT cohort_wk, week_offset, active_users, cohort_size,
       round(active_users / CAST(cohort_size AS DOUBLE), 6) AS retention
FROM counts JOIN size USING (cohort_wk)
"""


ROLLING_WINDOW_DAYS = 7


def active_users_rolling_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling active-user rollup (DAU / trailing-7-day WAU /
    stickiness) — the standard engagement dashboard trio.

    A rolling COUNT DISTINCT cannot ride a frame window (distinct is
    not a mergeable frame aggregate) and a day-grid range join goes
    nested-loop; the scale shape is the EXPLODE-FANOUT: each distinct
    (user, day) pair emits the 7 grid days it is visible to (map-side
    ``sequence`` explode, bounded ×7), then one hash aggregation per
    grid day counts distinct users.  Corpus-sized work is the one
    (user, day) distinct; everything after runs on the deduplicated
    pair set.  Grid days outside observed activity drop in the final
    DAU join (both engines identically)."""
    from ..catalog import load_catalog
    from ..testbed import EVENTS

    ud = (load_catalog(spark, sf_dir, [EVENTS])["events"]
          .where(F.col("user_id").isNotNull())
          .select("user_id",
                  F.floor(F.unix_timestamp("ts") / F.lit(86400))
                  .cast("long").alias("day"))
          .distinct())
    visible = ud.select(
        "user_id",
        F.explode(F.sequence(
            F.col("day"),
            F.col("day") + (ROLLING_WINDOW_DAYS - 1))).alias("g_day"))
    wau = (visible.groupBy(F.col("g_day").alias("day"))
           .agg(F.countDistinct("user_id").alias("wau")))
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return (dau.join(wau, "day")
            .select("day", "dau", "wau",
                    F.round(F.col("dau") / F.col("wau"), 6)
                    .alias("stickiness")))


ACTIVE_USERS_ROLLING_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day
  FROM events WHERE user_id IS NOT NULL),
vis AS (
  SELECT user_id, day + o AS g_day
  FROM ud CROSS JOIN generate_series(0, {ROLLING_WINDOW_DAYS - 1}) s(o)),
wau AS (
  SELECT g_day AS day, count(DISTINCT user_id) AS wau FROM vis GROUP BY 1),
dau AS (
  SELECT day, count(*) AS dau FROM ud GROUP BY 1)
SELECT day, dau, wau,
       round(dau / CAST(wau AS DOUBLE), 6) AS stickiness
FROM dau JOIN wau USING (day)
"""


FUNNEL_STEPS = ("view", "click", "purchase")


def event_funnel_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: how many users performed each step
    STRICTLY AFTER their earliest completion of the previous one
    (view → click → purchase).  The classic decorrelated formulation:
    step N is a filtered min-timestamp aggregate joined to step N−1
    with a strict ``sec > prev`` residual — never a per-user sequence
    collect, so no user's history ever materializes as one row.

    Scale shape: every step aggregate and every join keys on user_id,
    so the whole chain shares ONE hash partitioning (the later steps'
    inputs shrink monotonically); the final counts are 1-row aggregates
    unioned and the conversion divides against the broadcast step-1
    count.  Strictly-later semantics make sec ties inert in both
    engines — no ordering tie-break is needed at all."""
    from ..catalog import load_catalog
    from ..testbed import EVENTS

    ev = (load_catalog(spark, sf_dir, [EVENTS])["events"]
          .where(F.col("user_id").isNotNull()
                 & F.col("event_type").isin(*FUNNEL_STEPS))
          .select("user_id", F.unix_timestamp("ts").alias("sec"),
                  "event_type"))
    prev = None
    step_counts = []
    for i, step in enumerate(FUNNEL_STEPS):
        cur = ev.where(F.col("event_type") == step)
        if prev is not None:
            cur = (cur.join(prev, "user_id")
                   .where(F.col("sec") > F.col("prev_sec")))
        reached = cur.groupBy("user_id").agg(F.min("sec").alias("prev_sec"))
        step_counts.append(
            reached.agg(F.count(F.lit(1)).alias("users_reached"))
            .select(F.lit(i + 1).alias("step_idx"),
                    F.lit(step).alias("step"), "users_reached"))
        prev = reached
    out = step_counts[0]
    for sc in step_counts[1:]:
        out = out.unionByName(sc)
    first = (step_counts[0]
             .select(F.col("users_reached").alias("step1_users")))
    return (out.crossJoin(F.broadcast(first))
            .select("step_idx", "step", "users_reached",
                    F.round(F.col("users_reached") / F.col("step1_users"), 6)
                    .alias("conversion_pct")))


def _funnel_sql() -> str:
    steps = FUNNEL_STEPS
    ctes = [f"""ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type
  FROM events
  WHERE user_id IS NOT NULL
    AND event_type IN ({", ".join(f"'{s}'" for s in steps)}))"""]
    for i, s in enumerate(steps):
        join = (f"JOIN t{i} USING (user_id) WHERE event_type = '{s}' "
                f"AND sec > t{i}.prev_sec") if i else \
               f"WHERE event_type = '{s}'"
        ctes.append(f"""t{i + 1} AS (
  SELECT user_id, min(sec) AS prev_sec FROM ev {join} GROUP BY 1)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT {i + 1} AS step_idx, '{s}' AS step, "
        f"count(*) AS users_reached FROM t{i + 1}"
        for i, s in enumerate(steps))
    cte_block = ",\n".join(ctes)
    return f"""
WITH {cte_block},
counts AS ({unions}),
first AS (SELECT users_reached AS step1_users FROM counts WHERE step_idx = 1)
SELECT step_idx, step, users_reached,
       round(users_reached / CAST(step1_users AS DOUBLE), 6)
         AS conversion_pct
FROM counts CROSS JOIN first
"""


EVENT_FUNNEL_SQL = _funnel_sql()


SESSION_QUERIES = {
    "sessionize": (sessionize_df, SESSIONIZE_SQL),
    # the built-in session_window twin (touching windows MERGE: a new
    # session starts only STRICTLY past the gap — the r15 sf0.1 lesson,
    # same rule as the lag-based form above)
    "sessionize_native": (sessionize_native_df, SESSIONIZE_NATIVE_SQL),
    # weekly activation cohorts: distinct (user, week) -> first-week
    # cohort -> offset rollup -> retention fraction
    "retention_cohorts": (retention_cohorts_df, RETENTION_COHORTS_SQL),
    # ordered conversion funnel: decorrelated strict-min chain on user_id
    "event_funnel": (event_funnel_df, EVENT_FUNNEL_SQL),
    # DAU / trailing-WAU / stickiness via the explode-fanout (a rolling
    # COUNT DISTINCT has no frame-window form; a grid range join goes
    # nested-loop)
    "active_users_rolling": (active_users_rolling_df,
                             ACTIVE_USERS_ROLLING_SQL),
}
