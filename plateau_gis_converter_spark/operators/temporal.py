"""Temporal joins Spark lacks as built-ins: as-of join and interval
(range) join, both expressed as compositions of existing DataFrame ops
(one keyed shuffle each, zero Python) so Catalyst/Tungsten keep the whole
plan in codegen.

The reference engine has no temporal joins (it is a batch file converter);
these are engine additions for the web-pipeline side of the graft —
joining crawl events to the most recent fetch-rate mark (as-of), or crawl
timestamps to campaign/maintenance windows (interval containment) — the
same operators a TSDB calls ASOF JOIN / range join.

Scale notes (100 TB):

* ``asof_join`` is the union+ordered-window formulation: tag right rows
  seq=0 and left rows seq=1, sort-within-key once, carry the last non-null
  right payload forward. ONE shuffle on the join key (the window), no
  per-row Python, no point-vs-point inequality join (which Spark would
  execute as a broadcast nested loop). Skewed keys behave like any window
  skew (salt upstream if one key dominates).
* ``interval_join_points`` bins both sides on a fixed time grid whose
  width must be >= the longest interval, so every interval overlaps at
  most 2 bins; the join becomes a plain equi-join on the bin id (AQE
  handles residual bin skew) instead of the O(n*m) inequality join. Each
  (interval, bin) row is unique and a point belongs to exactly one bin, so
  containment needs no post-dedup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              values: Sequence[str] = (), direction: str = "backward",
              tolerance_us: int | None = None,
              suffix: str = "_asof") -> DataFrame:
    """For each left row, attach the payload of the nearest right row at or
    before (``backward``) / at or after (``forward``) the left timestamp,
    per join key. Inclusive on ties (left ts == right ts matches), matching
    DuckDB/pandas ``merge_asof(allow_exact_matches=True)``.

    Returns all left columns plus, per ``values`` column ``v``, a column
    ``v + suffix``, plus ``matched_ts + suffix`` (timestamp of the matched
    right row; null when no match or outside ``tolerance_us``).

    Right rows should be unique per (key, right_ts); with duplicates the
    row with the largest ordering position wins (make it deterministic by
    pre-aggregating the right side).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    lcols = left.columns
    # union frame: join keys + event time + seq tag + right payload
    rsel = [*on, F.col(right_ts).alias("__ts"), F.lit(0).alias("__seq")]
    rsel += [F.lit(None).cast(left.schema[c].dataType).alias(c)
             for c in lcols if c not in on]
    rsel += [F.col(v).alias(f"__v_{v}") for v in values]
    lsel = [*on, F.col(left_ts).alias("__ts"), F.lit(1).alias("__seq")]
    lsel += [F.col(c) for c in lcols if c not in on]
    lsel += [F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{v}")
             for v in values]
    unioned = right.select(*rsel).unionByName(left.select(*lsel))

    # backward: ascending scan, right-before-left on equal ts so equal ts
    # matches (inclusive). forward: descending scan, same tag order.
    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__seq").asc()]
    else:
        order = [F.col("__ts").desc(), F.col("__seq").asc()]
    w = (Window.partitionBy(*on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    matched_ts = F.last(F.when(F.col("__seq") == 0, F.col("__ts")),
                        ignorenulls=True).over(w)
    carried = {v: F.last(F.col(f"__v_{v}"), ignorenulls=True).over(w)
               for v in values}

    out = (unioned
           .withColumn("__mts", matched_ts)
           .withColumns({f"__c_{v}": c for v, c in carried.items()})
           .where(F.col("__seq") == 1))

    if tolerance_us is not None:
        gap = F.abs(F.unix_micros(F.col("__ts")) -
                    F.unix_micros(F.col("__mts")))
        ok = F.col("__mts").isNotNull() & (gap <= F.lit(int(tolerance_us)))
    else:
        ok = F.col("__mts").isNotNull()

    proj = [F.col(c) for c in on]
    proj += [F.col("__ts").alias(left_ts)]
    proj += [F.col(c) for c in lcols if c not in on and c != left_ts]
    proj += [F.when(ok, F.col(f"__c_{v}")).alias(f"{v}{suffix}")
             for v in values]
    proj += [F.when(ok, F.col("__mts")).alias(f"matched_ts{suffix}")]
    return out.select(*proj)


def explode_interval_bins(intervals: DataFrame, start: str, end: str,
                          bin_width_us: int) -> DataFrame:
    """One row per (interval, covered time bin); ``end`` exclusive.

    ``bin_width_us`` must be >= max interval length so each interval covers
    at most 2 bins (asserted per-row: a longer interval raises at runtime
    via element_at on an oversized sequence being allowed — we instead fail
    fast with a filter+raise_error guard).
    """
    s_us = F.unix_micros(F.col(start))
    e_us = F.unix_micros(F.col(end))
    w = F.lit(int(bin_width_us))
    too_long = e_us - s_us > w
    # end-exclusive: last covered bin is floor((end-1)/w). The guard lives
    # INSIDE the consumed expression (a dangling projection would be pruned
    # by Catalyst and never evaluated).
    bins = F.when(too_long, F.raise_error(F.format_string(
        "interval longer than bin_width_us: %d us", e_us - s_us))
        .cast("array<bigint>")).otherwise(
        F.sequence(F.floor(s_us / w), F.floor((e_us - F.lit(1)) / w)))
    return intervals.withColumn("bin", F.explode(bins))


def interval_join_points(points: DataFrame, intervals: DataFrame,
                         pt_ts: str = "ts", start: str = "start_ts",
                         end: str = "end_ts", bin_width_us: int = 3_600_000_000,
                         keys: Sequence[str] = ()) -> DataFrame:
    """Inner containment join: point rows matched to every interval with
    ``start <= pt_ts < end`` (and equal ``keys`` if given), via the binned
    equi-join described in the module docstring. Output: all interval
    columns + all point columns (join keys once).
    """
    keys = list(keys)
    iv = explode_interval_bins(intervals, start, end, int(bin_width_us))
    # prefix the point side so both sides may derive from the SAME scan
    # (e.g. marks vs non-marks of one events table) without tripping
    # Spark's ambiguous-self-join detection
    pts = points.select(
        *[F.col(c).alias(f"__pt_{c}") for c in points.columns])
    pt_bin = F.floor(F.unix_micros(F.col(f"__pt_{pt_ts}")) /
                     F.lit(int(bin_width_us)))
    pts = pts.withColumn("__pt_bin", pt_bin)
    cond = F.col("bin") == F.col("__pt_bin")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__pt_{k}"))
    joined = iv.join(pts, cond, "inner").where(
        (F.col(f"__pt_{pt_ts}") >= F.col(start)) &
        (F.col(f"__pt_{pt_ts}") < F.col(end)))
    proj = [F.col(c) for c in intervals.columns]
    proj += [F.col(f"__pt_{c}").alias(c)
             for c in points.columns if c not in keys]
    return joined.select(*proj)


def funnel_stages(events: DataFrame, steps: Sequence[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel analysis (the web-analytics staple Spark has no
    built-in for; ClickHouse calls it windowFunnel, BigQuery sells it as
    a funnel template): for each user, how far through the ordered step
    list did they get, with arbitrary other events allowed in between?

    Semantics: stage k is reached iff there exist events e1 < e2 < ... <
    ek (STRICTLY increasing ts) with types steps[0..k-1]. Computed by
    the earliest-completion recurrence t_i = min ts of a step-i event
    with ts > t_{i-1} — greedy-earliest is optimal here (taking the
    earliest possible step-i event never forecloses a later step), so
    the recurrence decides exactly the existence semantics above.

    Output: one row per user seen in ``events`` — (user, stage,
    completed_ts_us) where stage in [0, len(steps)] and completed_ts_us
    is the epoch-microsecond timestamp of the LAST completed step (NULL
    at stage 0).

    Scale: len(steps) is a small constant (3-6 in practice); each step
    is one filtered scan + one equi-join + one partial-agg min, all
    keyed by user — no window over all events, no per-user state, no
    Python. At 10^12 events the per-step relations shrink monotonically
    (only users who reached step i-1 join step i's events).
    """
    if not steps:
        raise ValueError("funnel_stages: steps must be non-empty")
    out = events.select(user_col).distinct()
    cur = None
    tcols = []
    for i, s in enumerate(steps, 1):
        ev = (events.where(F.col(type_col) == s)
              .select(user_col, F.col(ts_col).alias("_t")))
        if cur is not None:
            ev = ev.join(cur, user_col).where(F.col("_t") > F.col("_prev"))
        cur = ev.groupBy(user_col).agg(F.min("_t").alias("_prev"))
        tc = f"_t{i}"
        tcols.append(tc)
        out = out.join(cur.select(user_col, F.col("_prev").alias(tc)),
                       user_col, "left")
    stage = sum(F.when(F.col(tc).isNotNull(), 1).otherwise(0)
                for tc in tcols)
    final_ts = F.coalesce(*[F.col(tc) for tc in reversed(tcols)])
    return out.select(user_col, stage.cast("bigint").alias("stage"),
                      F.unix_micros(final_ts).alias("completed_ts_us"))


def cohort_retention(events: DataFrame, ts_col: str = "ts",
                     user_col: str = "user_id") -> DataFrame:
    """Weekly cohort-retention matrix — the standard growth-analytics
    rollup over an event stream: cohort(u) = the Monday-truncated week
    of u's FIRST event; for every (cohort_week, week_offset) count the
    distinct cohort members active that week. Row (c, 0) is the cohort
    size; retention rate is n_users / cohort size, derived outside the
    gate (integer counts only cross the engine boundary).

    Scale shape: first-seen is one partial-agg min keyed by user;
    activity is one distinct over (user, week) — the same user-keyed
    shuffle, so under AQE the join back is co-partitioned; the matrix
    is one final partial-agg groupBy. State never exceeds
    O(users + user-weeks); no window over the raw stream.
    """
    u, ts = F.col(user_col), F.col(ts_col)
    first = (events.where(u.isNotNull())
             .groupBy(u.alias("__u"))
             .agg(F.date_trunc("week", F.min(ts)).alias("cohort_week")))
    active = (events.where(u.isNotNull())
              .select(u.alias("__u"),
                      F.date_trunc("week", ts).alias("__w"))
              .distinct())
    return (active.join(first, "__u")
            .groupBy("cohort_week",
                     F.expr("datediff(__w, cohort_week) div 7")
                     .cast("bigint").alias("week_offset"))
            .agg(F.countDistinct("__u").alias("n_users")))


def session_transitions(events: DataFrame, gap_us: int = 1800_000_000,
                        ts_col: str = "ts", user_col: str = "user_id",
                        state_col: str = "event_type",
                        tiebreak_col: str = "event_id") -> DataFrame:
    """First-order Markov transition counts between consecutive events
    inside a session — the navigation-pattern summary (which state
    follows which) clickstream warehouses derive from sessionized logs.

    Sessions are gap-based (same rule as the sessionize gate: a new
    session starts after ``gap_us`` microseconds of inactivity), ordered
    deterministically by (ts, tiebreak). Two windows over the SAME
    (user) partitioning — Catalyst plans one Exchange and sorts once —
    then a single partial-agg groupBy on the (prev, next) pair. The
    per-source totals reuse a window over the tiny aggregated relation,
    so no second pass over the events. prob_ppm is integer-exact
    (10^6 * n // total).

    Output: (prev_state, next_state, n, prob_ppm).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    # parquet NTZ -> LTZ (UTC session) so unix_micros resolves; a column
    # already in LTZ passes through the cast unchanged
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = t_us - F.lag(t_us).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    sess = events.select(
        F.col(user_col).alias("u"), F.col(ts_col).alias("t"),
        F.col(tiebreak_col).alias("k"), F.col(state_col).alias("state"),
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, 0)).alias("sess_id"))
    w2 = Window.partitionBy("u", "sess_id").orderBy("t", "k")
    trans = (sess.select(F.lag("state").over(w2).alias("prev_state"),
                         F.col("state").alias("next_state"))
             .where(F.col("prev_state").isNotNull())
             .groupBy("prev_state", "next_state")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    wt = Window.partitionBy("prev_state")
    return (trans.withColumn("tot", F.sum("n").over(wt))
            .select("prev_state", "next_state", "n",
                    F.expr("CAST((1000000 * n) DIV tot AS BIGINT)")
                    .alias("prob_ppm")))


def stay_points(track: DataFrame, min_events: int = 2,
                min_duration_us: int = 600_000_000,
                user_col: str = "user_id", ts_col: str = "ts",
                tiebreak_col: str = "event_id",
                cell_cols: tuple[str, str] = ("cx", "cy")) -> DataFrame:
    """Stay-point detection over a located event stream — maximal runs of
    consecutive same-cell events per user, kept when they span at least
    ``min_events`` events and ``min_duration_us`` microseconds. The
    trajectory primitive (Zheng et al., GeoLife) recast relationally:
    where did this user DWELL, as opposed to pass through?

    Same two-window shape as session_transitions (one Exchange on the
    user key, one sort): lag over (ts, tiebreak) flags cell changes, the
    running sum names the run, one partial-agg groupBy aggregates each
    run. Cells come in as integer columns (callers bucket however they
    like — µdeg grid, mercator tile); this operator never touches
    geometry, so it composes with any index.

    Output: (user_id, cx, cy, t_start, t_end, n_events, duration_us).
    """
    cxc, cyc = cell_cols
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    moved = F.when(
        F.lag(cxc).over(w).isNull()
        | (F.lag(cxc).over(w) != F.col(cxc))
        | (F.lag(cyc).over(w) != F.col(cyc)), 1).otherwise(0)
    runs = track.select(
        F.col(user_col).alias("user_id"), F.col(ts_col).alias("t"),
        F.col(tiebreak_col).alias("k"),
        F.col(cxc).alias("cx"), F.col(cyc).alias("cy"),
        F.sum(moved).over(
            w.rowsBetween(Window.unboundedPreceding, 0)).alias("run_id"))
    t_us = F.unix_micros(F.col("t").cast("timestamp"))
    agg = (runs.groupBy("user_id", "run_id", "cx", "cy")
           .agg(F.min("t").alias("t_start"), F.max("t").alias("t_end"),
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                (F.max(t_us) - F.min(t_us)).alias("duration_us")))
    return (agg.where((F.col("n_events") >= int(min_events))
                      & (F.col("duration_us") >= int(min_duration_us)))
            .select("user_id", "cx", "cy", "t_start", "t_end",
                    "n_events", "duration_us"))


def od_matrix(track: DataFrame, user_col: str = "user_id",
              ts_col: str = "ts", tiebreak_col: str = "event_id",
              cell_cols: tuple[str, str] = ("cx", "cy"),
              drop_stationary: bool = True) -> DataFrame:
    """Origin-destination flow matrix over a located event stream: each
    user's consecutive event pair contributes one trip from the earlier
    event's cell to the later one's — the mobility aggregate behind
    commute matrices, inter-ward flow maps, and the geo×web question
    "which district do readers of district X move to next?".

    Same single-Exchange shape as ``stay_points``/``session_transitions``:
    one window keyed by user ordered by (ts, tiebreak) produces the lag
    cell, then one partial-agg count keyed by the OD cell pair. The
    per-user window is bounded by that user's event count, never by
    corpus size; the output is bounded by occupied-cell-pairs, not events.
    ``drop_stationary`` removes same-cell pairs (dwell, not movement —
    ``stay_points`` is the operator for those).

    Output: (o_cx, o_cy, d_cx, d_cy, n_trips).
    """
    cxc, cyc = cell_cols
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    hops = (track.select(
        F.lag(cxc).over(w).alias("o_cx"),
        F.lag(cyc).over(w).alias("o_cy"),
        F.col(cxc).alias("d_cx"), F.col(cyc).alias("d_cy"))
        .where(F.col("o_cx").isNotNull()))
    if drop_stationary:
        hops = hops.where((F.col("o_cx") != F.col("d_cx"))
                          | (F.col("o_cy") != F.col("d_cy")))
    return (hops.groupBy("o_cx", "o_cy", "d_cx", "d_cy")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_trips")))


def daily_state_locf(events: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts", state_col: str = "event_type",
                     order_cols: Sequence[str] = ("ts", "event_id")
                     ) -> DataFrame:
    """Daily last-state snapshot grid with LOCF gap fill — the feature-
    store resample: one row per (key, calendar day) from the key's first
    to last active day, carrying the day's LAST observed state (max by
    ``order_cols`` — latest ts, unique tiebreak) and filling inactive
    days with the most recent prior state (last-observation-carried-
    forward). ``is_gap`` marks filled rows.

    Shape: one partial-agg groupBy (key, day) for the per-day last
    state, one tiny per-key span agg, one map-side ``sequence`` explode
    for the grid (bounded by span days, never a calendar cross join),
    one left join back, and one per-key ordered window for the carry —
    the only shuffle beyond the aggs is the window's hash partition by
    key. Integer/string state keeps it engine-exact.
    """
    day = F.date_trunc("day", F.col(ts_col))
    last_state = (events.groupBy(F.col(key_col).alias("key"),
                                 day.alias("day"))
                  .agg(F.max(F.struct(*[F.col(c) for c in order_cols],
                                      F.col(state_col)))
                       .getField(state_col).alias("state")))
    span = last_state.groupBy("key").agg(F.min("day").alias("d0"),
                                         F.max("day").alias("d1"))
    grid = span.select(
        "key", F.explode(F.sequence(
            "d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"))
    w = (Window.partitionBy("key").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(last_state, ["key", "day"], "left")
            .select("key", "day",
                    F.last("state", ignorenulls=True).over(w)
                    .alias("state"),
                    F.col("state").isNull().alias("is_gap")))


def peak_concurrency(intervals: DataFrame, key_col: str,
                     start_col: str, end_col: str) -> DataFrame:
    """Per-key peak interval concurrency via the classic sweep line:
    each interval contributes (+1 at start, -1 at end); events are
    ordered by (t, delta) — end-exclusive semantics, a departure at t
    applies before an arrival at t — and the running sum's maximum is
    the peak. Output (key, peak, first_peak_ts) with first_peak_ts the
    earliest instant the peak is reached (deterministic: the prefix-sum
    multiset at tied (t, delta) rows is order-invariant, so both the
    max and its first time are engine-exact).

    Shape: one map-side explode to 2 rows per interval + one per-key
    ordered window (hash partition by key) + one partial agg. Capacity
    planning / peak-load sizing over sessions, crawls, connections.
    """
    pts = intervals.select(
        F.col(key_col).alias("key"),
        F.explode(F.array(
            F.struct(F.col(start_col).alias("t"),
                     F.lit(1).alias("delta")),
            F.struct(F.col(end_col).alias("t"),
                     F.lit(-1).alias("delta")))).alias("e")
    ).select("key", F.col("e.t").alias("t"), F.col("e.delta").alias("delta"))
    w = (Window.partitionBy("key").orderBy("t", "delta")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    running = pts.select("key", "t",
                         F.sum("delta").over(w).alias("load"))
    peak = running.withColumn(
        "peak", F.max("load").over(Window.partitionBy("key")))
    return (peak.where(F.col("load") == F.col("peak"))
            .groupBy("key")
            .agg(F.min("peak").cast("bigint").alias("peak"),
                 F.min("t").alias("first_peak_ts")))


def interval_union_time(intervals: DataFrame, key_col: str,
                        start_col: str, end_col: str) -> DataFrame:
    """Per-key UNION length of half-open intervals — true active time
    when sessions/fetches overlap (summing durations double-counts;
    this merges first): chain the intervals in (start, end) order,
    break an island where start > max(end) of everything before
    (half-open: touching intervals merge), then sum island extents.

    Output (key, covered_us, n_islands): covered microseconds of the
    merged union and the merged-interval count — both integer-exact
    (unix_micros), so the oracle replays the identical two windows.

    Shape: one hash partition by key + two ordered windows over it + one
    partial agg. The cumulative-max island trick is O(n log n) per key
    with NO interval self-join (the naive overlap join is quadratic on
    hot keys).
    """
    # cast("timestamp") first: parquet NTZ timestamps reject unix_micros
    # directly; the session is UTC so the epoch read matches DuckDB's
    # epoch_us over the same naive values
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    base = intervals.select(F.col(key_col).alias("key"),
                            s_us.alias("s"), e_us.alias("e"))
    w = Window.partitionBy("key").orderBy("s", "e")
    prev_max = (F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
    flagged = base.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0))
    island = flagged.withColumn(
        "island", F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    per_island = (island.groupBy("key", "island")
                  .agg((F.max("e") - F.min("s")).alias("ext")))
    return (per_island.groupBy("key")
            .agg(F.sum("ext").alias("covered_us"),
                 F.count(F.lit(1)).alias("n_islands")))


def rolling_daily_stats(events: DataFrame, key_col: str = "event_type",
                        ts_col: str = "ts", value_col: str = "value",
                        days: int = 7) -> DataFrame:
    """Trailing ``days``-day rolling activity per key — the
    moving-average freshness/traffic panel (7-day rolling counts and
    value sums per host/event type) every crawl-ops dashboard draws.

    Engine path: this is the one window shape none of the other gates
    exercise — a RANGE frame (``rangeBetween(-(days-1), 0)`` over the
    integer day index), which Spark executes with the sliding
    RangeFrame state in a single window pass, NOT a self-join.  The
    frame slides over the per-(key, day) DAILY relation (days/key rows)
    produced by one partial-agg groupBy — the raw event stream is never
    windowed, so the state per key is bounded by active days, not
    events.  Calendar gaps are handled by the range frame semantics
    (missing days simply contribute nothing), which a rowsBetween frame
    would get wrong.

    Float discipline: ``value`` is quantized per ROW to milli-units
    (floor(value * 1000.0) — one correctly-rounded double multiply,
    identical in both engines) BEFORE any aggregation, so every sum is
    an exact, merge-order-free int64 and the rolling mean is integer
    `div`.  Output: (key, day_num, n_day, v_milli_day, n_win, v_milli_win,
    mean_milli_win).
    """
    day = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) "
                 "div 86400000000")
    v_milli = F.floor(F.col(value_col) * F.lit(1000.0)).cast("bigint")
    daily = (events.select(F.col(key_col).alias("key"),
                           day.alias("day_num"), v_milli.alias("vm"))
             .groupBy("key", "day_num")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_day"),
                  F.sum("vm").cast("bigint").alias("v_milli_day")))
    w = (Window.partitionBy("key").orderBy("day_num")
         .rangeBetween(-(int(days) - 1), 0))
    out = daily.select(
        F.col("key").alias(key_col), "day_num", "n_day", "v_milli_day",
        F.sum("n_day").over(w).cast("bigint").alias("n_win"),
        F.sum("v_milli_day").over(w).cast("bigint").alias("v_milli_win"))
    return out.withColumn(
        "mean_milli_win",
        F.expr("v_milli_win div n_win").cast("bigint"))


def covisit_pairs(events: DataFrame, gap_us: int = 1800_000_000,
                  ts_col: str = "ts", user_col: str = "user_id",
                  item_col: str = "event_type",
                  tiebreak_col: str = "event_id",
                  min_sessions: int = 1) -> DataFrame:
    """Session co-visitation counts — the item-item collaborative-
    filtering primitive ("users who viewed X in a session also viewed
    Y"): unordered item pairs with the number of DISTINCT sessions
    containing both. The set-cooccurrence complement of
    ``session_transitions`` (which counts ordered ADJACENT steps) and
    ``collocations`` (token adjacency): co-visitation sees X and Y
    together even with twenty clicks between them.

    Sessions are the same gap rule as the sessionize gate; items
    dedupe per session BEFORE pairing, so the per-session fan-out is
    bounded by distinct items in the session (squared) — the
    cocitation hub hazard keyed by session instead of source, with the
    session gap itself acting as the natural fan-out cap. One session
    window + one distinct + one self-equi-join keyed by session + one
    partial-agg count.

    Output: (item_a, item_b, n_sessions) with item_a < item_b.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = t_us - F.lag(t_us).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    sess = events.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("item"),
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, 0)).alias("sid"))
    items = sess.select("u", "sid", "item").distinct()
    a = items.select("u", "sid", F.col("item").alias("item_a"))
    b = items.select(F.col("u").alias("u2"), F.col("sid").alias("sid2"),
                     F.col("item").alias("item_b"))
    pairs = a.join(b, (F.col("u") == F.col("u2"))
                   & (F.col("sid") == F.col("sid2"))
                   & (F.col("item_a") < F.col("item_b")))
    return (pairs.groupBy("item_a", "item_b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
            .where(F.col("n_sessions") >= int(min_sessions)))


def rolling_distinct(events: DataFrame, key_col: str = "event_type",
                     ts_col: str = "ts", user_col: str = "user_id",
                     window_days: int = 7) -> DataFrame:
    """EXACT rolling N-day distinct users per key and day — the "7-day
    active users" metric, computed exactly where a naive plan cannot:
    distinct counts do not sum across days, and window COUNT(DISTINCT)
    is unsupported / a per-row set union in most engines.

    The cover trick: a user active on day t is counted in every window
    ENDING t .. t+N-1, so (key, user, active-day) rows — already
    deduplicated, ONE partial agg over the fact — explode to at most N
    covered end-days each (map-side, bounded fan-out), a second
    distinct collapses multi-active users per window, and one count
    finishes. Total work is O(distinct(key, user, day) * N), never a
    per-day rescan; emitted days are clipped to the key's own observed
    span (no trailing ghost windows).

    Output: (key, day, n_users) — day is the window END (epoch day).
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    day = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) "
                 "div 86400000000")
    act = (events.where(F.col(user_col).isNotNull())
           .select(F.col(key_col).alias("k"),
                   F.col(user_col).alias("usr"), day.alias("d"))
           .distinct())
    span = act.groupBy("k").agg(F.max("d").alias("dmax"))
    cover = (act.select(
        "k", "usr",
        F.explode(F.sequence(
            F.col("d"), F.col("d") + F.lit(int(window_days) - 1)))
        .alias("day"))
        .distinct())
    return (cover.join(span, "k")
            .where(F.col("day") <= F.col("dmax"))
            .groupBy(F.col("k").alias(key_col), "day")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users")))


def survival_km(df: DataFrame, duration_col: str = "duration",
                event_col: str = "event",
                group_col: str | None = None) -> DataFrame:
    """Kaplan-Meier survival curve per cohort — retention/churn
    analysis with CENSORING done right (users still active at the
    observation cut are evidence of survival up to their age, not
    events; dropping them biases every naive retention curve).

    Integer discipline: the curve is carried as log-survival in
    micro-nats — each event time's factor ln(1 - d/n) is ONE
    fixed-op-order double floor-quantized to micro BEFORE the
    cumulative sum (the token_entropy rule), so the running sum is an
    exact integer and both engines agree bit-for-bit; s_micro
    re-exponentiates at read with one more fixed-order double. When
    the risk set is exhausted (d = n), survival is exactly 0
    (ln_s_micro NULL, s_micro 0).

    Shape: ONE partial agg to the (group, duration) relation with
    event/censor counts, two cumulative windows over that SMALL
    relation (risk set = N - prior departures; log-survival cumsum) —
    never a row-level window over the fact.

    Output: (group?, t, n_at_risk, d_events, n_censored, ln_s_micro,
    s_micro) — one row per distinct duration with >= 1 event.
    """
    g = [group_col] if group_col else []
    base = (df.where(F.col(duration_col).isNotNull()
                     & F.col(event_col).isNotNull())
            .select(*g, F.col(duration_col).cast("bigint").alias("t"),
                    F.col(event_col).cast("int").alias("e")))
    cells = (base.groupBy(*g, "t")
             .agg(F.count(F.lit(1)).cast("bigint").alias("c_tot"),
                  F.sum("e").cast("bigint").alias("d")))
    part = Window.partitionBy(*g) if g else Window.partitionBy()
    wc = part.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wall = part
    cum = (cells
           .withColumn("gone", F.coalesce(F.sum("c_tot").over(wc),
                                          F.lit(0)))
           .withColumn("n_all", F.sum("c_tot").over(wall))
           .withColumn("n_risk", F.col("n_all") - F.col("gone")))
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.floor(F.log(F.lit(1.0) - F.col("d").cast("double")
                      / F.col("n_risk").cast("double"))
                * F.lit(1e6) + F.lit(0.5))).cast("bigint")
    wlog = part.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    curve = (cum.withColumn("term", term)
             .withColumn("dead",
                         F.max((F.col("d") >= F.col("n_risk"))
                               .cast("int")).over(wlog))
             .withColumn("ln_s",
                         F.when(F.col("dead") == 0,
                                F.sum("term").over(wlog))))
    s = F.when(F.col("ln_s").isNotNull(),
               F.floor(F.exp(F.col("ln_s").cast("double")
                             / F.lit(1e6)) * F.lit(1e6)
                       + F.lit(0.5))).otherwise(F.lit(0))
    out_cols = ([F.col(group_col)] if group_col else []) + [
        F.col("t"),
        F.col("n_risk").cast("bigint").alias("n_at_risk"),
        F.col("d").cast("bigint").alias("d_events"),
        (F.col("c_tot") - F.col("d")).cast("bigint").alias("n_censored"),
        F.col("ln_s").cast("bigint").alias("ln_s_micro"),
        s.cast("bigint").alias("s_micro")]
    return curve.where(F.col("d") > 0).select(*out_cols)


def conversion_attribution(events: DataFrame, conv_type: str,
                           user_col: str = "user_id",
                           ts_col: str = "ts",
                           type_col: str = "event_type",
                           tiebreak_col: str = "event_id",
                           model: str = "last") -> DataFrame:
    """Marketing-style conversion attribution: each conversion event
    credits the LAST (or FIRST) preceding non-conversion touch in the
    user's stream — the channel report every funnel review starts
    from. Conversions with no prior touch credit 'direct'.

    One window per user (the sessionize Exchange), one partial-agg
    count, share over the tiny channel relation. The carried channel
    is last()/first() with ignorenulls over conversion-masked types —
    no self-join, no per-conversion scan.

    Output: (channel, n_conversions, share_ppm).
    """
    if model not in ("last", "first"):
        raise ValueError(f"model must be last|first, got {model!r}")
    w = (Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    touch = F.when(F.col(type_col) != conv_type, F.col(type_col))
    carried = (F.last(touch, ignorenulls=True).over(w)
               if model == "last"
               else F.first(touch, ignorenulls=True).over(w))
    conv = (events.withColumn("__ch", carried)
            .where(F.col(type_col) == conv_type)
            .select(F.coalesce(F.col("__ch"), F.lit("direct"))
                    .alias("channel")))
    counts = conv.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_conversions"))
    wall = Window.partitionBy()
    return (counts
            .withColumn("tot", F.sum("n_conversions").over(wall))
            .select("channel", "n_conversions",
                    F.expr("1000000 * n_conversions div tot")
                    .cast("bigint").alias("share_ppm")))


def bot_scores(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", tiebreak_col: str = "event_id",
               min_events: int = 20,
               max_entropy_micro: int = 500_000) -> DataFrame:
    """Automation detection by inter-event regularity: humans produce
    high-entropy gap distributions, schedulers and scrapers repeat the
    same interval — so a user with many events and near-zero Shannon
    entropy over SECOND-quantized gaps is flagged. The abuse signal
    crawl/analytics pipelines run before counting 'engagement'.

    Entropy uses the token_entropy integer discipline (per-gap-value
    c·ln(c) micro-quantized before the sum — associative); gaps come
    from one per-user lag window; everything after is partial aggs.

    Output: (user, n_events, n_gaps, distinct_gaps, entropy_micro,
    bot) — bot = 1 when n_events >= min_events and entropy <=
    max_entropy_micro.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (events.select(F.col(user_col).alias("u"),
                          t_us.alias("__t"),
                          F.lag(t_us).over(w).alias("__prev"))
            .where(F.col("__prev").isNotNull())
            .select("u", F.expr("(__t - __prev) div 1000000")
                    .cast("bigint").alias("g")))
    cnt = gaps.groupBy("u", "g").agg(F.count(F.lit(1)).cast("bigint")
                                     .alias("c"))
    term = F.floor(F.log(F.col("c").cast("double"))
                   * F.col("c").cast("double") * F.lit(1e6)
                   + F.lit(0.5)).cast("bigint")
    agg = (cnt.groupBy("u")
           .agg(F.sum("c").cast("bigint").alias("n_gaps"),
                F.count(F.lit(1)).cast("bigint").alias("distinct_gaps"),
                F.sum(term).cast("bigint").alias("s")))
    ln_n = F.floor(F.log(F.col("n_gaps").cast("double")) * F.lit(1e6)
                   + F.lit(0.5)).cast("bigint")
    ent = (ln_n - F.expr("s div n_gaps")).cast("bigint")
    out = agg.select(F.col("u").alias(user_col),
                     (F.col("n_gaps") + 1).cast("bigint")
                     .alias("n_events"),
                     "n_gaps", "distinct_gaps",
                     ent.alias("entropy_micro"))
    bot = ((F.col("n_events") >= int(min_events))
           & (F.col("entropy_micro") <= int(max_entropy_micro)))
    return out.withColumn("bot", bot.cast("int"))


def activity_streaks(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Consecutive-day activity streaks per user — the engagement
    metric every product dashboard carries ("7-day streak"), computed
    with the gaps-and-islands trick on the DISTINCT active-day
    relation: within a user, day - row_number(day) is constant exactly
    along a consecutive run, so one window + one groupBy finds every
    streak; a second partial agg summarizes.

    Output: (user, n_active_days, n_streaks, max_streak,
    current_streak) — current_streak is the run touching the user's
    LAST active day (the number the dashboard shows).
    """
    day = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) "
                 "div 86400000000")
    act = (events.where(F.col(user_col).isNotNull())
           .select(F.col(user_col).alias("u"), day.alias("d"))
           .distinct())
    w = Window.partitionBy("u").orderBy("d")
    runs = (act.withColumn("grp", F.col("d") - F.row_number().over(w))
            .groupBy("u", "grp")
            .agg(F.count(F.lit(1)).cast("bigint").alias("len"),
                 F.max("d").alias("d_end")))
    per_user = (runs.groupBy("u")
                .agg(F.sum("len").cast("bigint").alias("n_active_days"),
                     F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
                     F.max("len").cast("bigint").alias("max_streak"),
                     F.max(F.struct(F.col("d_end"),
                                    F.col("len").alias("l")))
                     .alias("last")))
    return per_user.select(
        F.col("u").alias(user_col), "n_active_days", "n_streaks",
        "max_streak",
        F.col("last.l").cast("bigint").alias("current_streak"))


def association_rules(events: DataFrame, gap_us: int = 1800_000_000,
                      ts_col: str = "ts", user_col: str = "user_id",
                      item_col: str = "event_type",
                      tiebreak_col: str = "event_id",
                      min_sessions: int = 2) -> DataFrame:
    """Association rules over sessions (Agrawal & Srikant's market-
    basket classic): for each DIRECTED item pair X→Y the support
    (co-sessions), confidence (P(Y|X) in ppm) and lift
    (P(XY)/(P(X)P(Y)) in milli — >1000 means genuinely associated,
    <1000 anti-associated) — what ``covisit_pairs``' raw counts become
    once normalized by the marginals.

    Same session/dedup shape as covisit; marginals are one extra
    partial agg; the session total folds back as a 1-row broadcast.
    All ratios integer (lift via 1000*n_xy*N div (n_x*n_y)).

    Output: (antecedent, consequent, n_both, n_ante, n_cons,
    confidence_ppm, lift_milli).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = t_us - F.lag(t_us).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    sess = events.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("item"),
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, 0)).alias("sid"))
    items = sess.select("u", "sid", "item").distinct()
    nsess = items.select("u", "sid").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("nn"))
    marg = items.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("nx"))
    a = items.select("u", "sid", F.col("item").alias("ia"))
    b = items.select(F.col("u").alias("u2"), F.col("sid").alias("sid2"),
                     F.col("item").alias("ib"))
    pairs = (a.join(b, (F.col("u") == F.col("u2"))
                    & (F.col("sid") == F.col("sid2"))
                    & (F.col("ia") != F.col("ib")))
             .groupBy("ia", "ib")
             .agg(F.count(F.lit(1)).cast("bigint").alias("nxy"))
             .where(F.col("nxy") >= int(min_sessions)))
    out = (pairs
           .join(marg.select(F.col("item").alias("ia"),
                             F.col("nx").alias("na")), "ia")
           .join(marg.select(F.col("item").alias("ib"),
                             F.col("nx").alias("nc")), "ib")
           .crossJoin(F.broadcast(nsess)))
    return out.select(
        F.col("ia").alias("antecedent"), F.col("ib").alias("consequent"),
        F.col("nxy").alias("n_both"), F.col("na").alias("n_ante"),
        F.col("nc").alias("n_cons"),
        F.expr("1000000 * nxy div na").cast("bigint")
        .alias("confidence_ppm"),
        F.expr("1000 * nxy * nn div (na * nc)").cast("bigint")
        .alias("lift_milli"))


def entry_exit_pages(events: DataFrame, gap_us: int = 1800_000_000,
                     ts_col: str = "ts", user_col: str = "user_id",
                     type_col: str = "event_type",
                     tiebreak_col: str = "event_id") -> DataFrame:
    """Landing/exit report: per session the FIRST and LAST event type
    (the web-analytics entry/exit pages), aggregated to flow counts —
    where journeys start, where they die. Sessions via the shared gap
    rule; first/last picked with min/max(struct(ts, tiebreak, type))
    folds per session (partial-aggregable — no second window), then
    one count per (entry, exit) pair.

    Output: (entry_type, exit_type, n_sessions).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = t_us - F.lag(t_us).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    sess = events.select(
        F.col(user_col).alias("u"), t_us.alias("t"),
        F.col(tiebreak_col).alias("k"), F.col(type_col).alias("ty"),
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, 0)).alias("sid"))
    ends = (sess.groupBy("u", "sid")
            .agg(F.min(F.struct("t", "k", "ty")).alias("fst"),
                 F.max(F.struct("t", "k", "ty")).alias("lst")))
    return (ends.groupBy(F.col("fst.ty").alias("entry_type"),
                         F.col("lst.ty").alias("exit_type"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions")))


def interpolate_daily(events: DataFrame, key_col: str = "event_type",
                      ts_col: str = "ts",
                      value_col: str = "value") -> DataFrame:
    """Linear interpolation of a daily metric over calendar gaps — the
    time-series prep between LOCF (``daily_state_locf``: step
    function) and model-based imputation: a missing day between two
    observed ones gets the exact integer lerp
    prev + (next - prev) * (d - d_prev) div (d_next - d_prev);
    leading/trailing gaps carry the nearest edge (no extrapolation).

    Series = per-key daily SUM of the metric on the zero-filled
    calendar grid (a day with no rows is MISSING, not zero — that is
    the point); two ignorenulls window carries (forward + backward)
    over the small grid relation provide both anchors.

    Output: (key, day, observed, value) — observed 0 rows carry the
    interpolated value.
    """
    day = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) "
                 "div 86400000000")
    daily = (events.where(F.col(value_col).isNotNull())
             .select(F.col(key_col).alias("k"), day.alias("d"),
                     F.col(value_col).cast("bigint").alias("v"))
             .groupBy("k", "d")
             .agg(F.sum("v").cast("bigint").alias("v")))
    span = daily.groupBy("k").agg(F.min("d").alias("d0"),
                                  F.max("d").alias("d1"))
    grid = (span.select("k", F.explode(F.sequence("d0", "d1"))
                        .alias("d"))
            .join(daily, ["k", "d"], "left"))
    wf = (Window.partitionBy("k").orderBy("d")
          .rowsBetween(Window.unboundedPreceding, 0))
    wb = (Window.partitionBy("k").orderBy(F.col("d").desc())
          .rowsBetween(Window.unboundedPreceding, 0))
    pv = F.last(F.when(F.col("v").isNotNull(), F.col("v")),
                ignorenulls=True).over(wf)
    pd_ = F.last(F.when(F.col("v").isNotNull(), F.col("d")),
                 ignorenulls=True).over(wf)
    nv = F.last(F.when(F.col("v").isNotNull(), F.col("v")),
                ignorenulls=True).over(wb)
    nd = F.last(F.when(F.col("v").isNotNull(), F.col("d")),
                ignorenulls=True).over(wb)
    g = (grid.withColumn("pv", pv).withColumn("pd", pd_)
         .withColumn("nv", nv).withColumn("nd", nd))
    lerp = F.when(
        F.col("v").isNotNull(), F.col("v")).when(
        F.col("pv").isNull(), F.col("nv")).when(
        F.col("nv").isNull(), F.col("pv")).otherwise(
        F.col("pv") + F.expr(
            "(nv - pv) * (d - pd) div (nd - pd)"))
    return g.select(F.col("k").alias(key_col),
                    F.col("d").cast("bigint").alias("day"),
                    F.col("v").isNotNull().cast("int").alias("observed"),
                    lerp.cast("bigint").alias("value"))


def new_vs_returning(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Daily new-vs-returning user mix — the acquisition/retention
    split on every product dashboard: a user is NEW on their first
    active day, RETURNING on every later active day. One distinct
    (user, day) partial agg, one per-user min, one co-keyed join,
    one daily count — no windows over the fact.

    Output: (day, n_new, n_returning, new_share_ppm).
    """
    day = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) "
                 "div 86400000000")
    act = (events.where(F.col(user_col).isNotNull())
           .select(F.col(user_col).alias("u"), day.alias("d"))
           .distinct())
    first = act.groupBy("u").agg(F.min("d").alias("fd"))
    out = (act.join(first, "u")
           .groupBy(F.col("d").alias("day"))
           .agg(F.sum((F.col("d") == F.col("fd")).cast("int"))
                .cast("bigint").alias("n_new"),
                F.sum((F.col("d") != F.col("fd")).cast("int"))
                .cast("bigint").alias("n_returning")))
    return out.withColumn(
        "new_share_ppm",
        F.expr("1000000 * n_new div (n_new + n_returning)")
        .cast("bigint")).select(
        F.col("day").cast("bigint").alias("day"), "n_new",
        "n_returning", "new_share_ppm")


def rank_movers(events: DataFrame, key_col: str = "event_type",
                ts_col: str = "ts", period_days: int = 7) -> DataFrame:
    """Week-over-week rank movers — the trending report: per key its
    activity rank in the LAST full period vs the one before, with the
    delta (positive = climbing). Ranks are dense over (count desc,
    key asc) within each period; keys absent from a period rank NULL
    and report a NULL delta (new entrants / dropouts are visible, not
    faked). Period boundaries anchor at the corpus max day so the
    'last week' is always complete-ish.

    Output: (key, n_prev, n_last, rank_prev, rank_last, rank_delta).
    """
    day = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) "
                 "div 86400000000")
    d = events.select(F.col(key_col).alias("k"), day.alias("d"))
    mx = d.agg(F.max("d").alias("dmax"))
    tagged = (d.crossJoin(F.broadcast(mx))
              .withColumn("per", F.expr(
                  f"(dmax - d) div {int(period_days)}"))
              .where(F.col("per") <= 1))
    counts = (tagged.groupBy("k", "per")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    w = Window.partitionBy("per").orderBy(F.col("n").desc(),
                                          F.col("k"))
    ranked = counts.withColumn("r", F.row_number().over(w)
                               .cast("bigint"))
    last = (ranked.where(F.col("per") == 0)
            .select("k", F.col("n").alias("n_last"),
                    F.col("r").alias("rank_last")))
    prev = (ranked.where(F.col("per") == 1)
            .select("k", F.col("n").alias("n_prev"),
                    F.col("r").alias("rank_prev")))
    out = last.join(prev, "k", "full_outer")
    return out.select(
        F.col("k").alias(key_col),
        F.coalesce(F.col("n_prev"), F.lit(0)).cast("bigint")
        .alias("n_prev"),
        F.coalesce(F.col("n_last"), F.lit(0)).cast("bigint")
        .alias("n_last"),
        "rank_prev", "rank_last",
        (F.col("rank_prev") - F.col("rank_last")).cast("bigint")
        .alias("rank_delta"))
