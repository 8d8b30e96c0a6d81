"""Event-time windowing catalog (SURVEY.md section 2B streaming rows).

The reference attaches ``WatermarkStrategy.noWatermarks()`` and never
windows anything (``MSK-S/.../msf/DataStreamJob.java:163``); these queries
declare the engine's event-time surface. They run the *same* window
expressions batch-mode over the ``events`` table so the DuckDB oracle can
verify values; ``plans/streaming_queries.py`` re-runs the identical
aggregations through Structured Streaming micro-batches.

Scale notes:
- tumbling/sliding windows are plain group-bys on a derived bucket key —
  one shuffle, map-side partial aggregation applies as usual;
- a sliding window of length L sliding S duplicates each row L/S times
  (Spark's Expand node); keep L/S small at scale or pre-aggregate into
  S-sized tumbling buckets first and roll them up;
- session windows shuffle once on the session key (user) and sort within
  partitions; skewed users are the hazard, AQE skew-split handles it;
- the interval join is an equi-join on the entity key with the time range
  as a residual predicate — a hash join, never a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .registry import query


@query(
    "w01_tumbling_window",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 6) AS sum_value,
       ROUND(AVG(value), 6) AS avg_value
FROM events
GROUP BY 1, 2
""",
    tags=("window-time", "aggregation"),
    bench=True,
)
def w01_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type. The window is
    just a derived grouping key, so the plan is an ordinary two-phase
    hash aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
            "avg_value",
        )
    )


@query(
    "w02_sliding_window",
    oracle="""
SELECT wstart AS window_start, COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
FROM (
  SELECT e.*,
    unnest([time_bucket(INTERVAL '30 minutes', ts),
            time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS wstart
  FROM events e
)
GROUP BY 1
""",
    tags=("window-time", "aggregation"),
)
def w02_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows, length 1 h sliding 30 min: every event lands in
    exactly 2 windows (Catalyst Expand with factor L/S = 2 — the factor
    to keep small at scale)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


@query(
    "w03_session_window",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, value,
    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 >= INTERVAL '5 minutes'
         THEN 1 ELSE 0 END AS is_new
  FROM events
), sessions AS (
  SELECT user_id, ts, value,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM ordered
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_event,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM sessions GROUP BY user_id, sess_id
""",
    tags=("window-time", "session"),
    bench=True,
)
def w03_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 5-minute inactivity gap, using
    Spark's native session_window (events merge while the gap to the
    previous event is < 5 min; the oracle replays the same gaps-and-
    islands semantics with window functions). One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select("user_id", "session_start", "last_event", "n_events", "sum_value")
    )


@query(
    "w04_interval_join",
    oracle="""
SELECT e.event_id, COUNT(c.event_id) AS n_clicks_10m
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = e.user_id
 AND c.ts >= e.ts - INTERVAL '10 minutes' AND c.ts <= e.ts
GROUP BY e.event_id
""",
    tags=("window-time", "join", "interval-join"),
)
def w04_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join: for each error, clicks by the same user
    in the preceding 10 minutes. The equi key (user_id) hashes; the time
    band is a residual predicate inside each bucket — the batch twin of
    a stream-stream interval join with watermarked state."""
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id"), F.col("user_id"), F.col("ts")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event_id"),
    )
    return (
        err.join(
            clk,
            (F.col("c_user_id") == F.col("user_id"))
            & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("c_ts") <= F.col("ts")),
            "left",
        )
        .groupBy("event_id")
        .agg(F.count("c_event_id").alias("n_clicks_10m"))
    )


@query(
    "w05_windowed_topk_users",
    oracle="""
SELECT window_start, user_id, n, rn FROM (
  SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start, user_id,
         COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY time_bucket(INTERVAL '6 hours', ts)
                            ORDER BY COUNT(*) DESC, user_id) AS rn
  FROM events GROUP BY 1, 2
) WHERE rn <= 3
""",
    tags=("window-time", "window", "topk"),
)
def w05_windowed_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most active users per 6-hour window: windowed aggregation
    feeding a rank — the aggregate shrinks the data before the window
    sort, so the rank shuffle is tiny."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    agg = (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "user_id", "n")
    )
    w = Window.partitionBy("window_start").orderBy(F.desc("n"), "user_id")
    return agg.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


@query(
    "w06_time_weighted_avg",
    oracle="""
WITH seg AS (
  SELECT user_id, value, ts,
    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM events
)
SELECT user_id,
  ROUND(SUM(value * date_diff('millisecond', ts, next_ts))
        / SUM(date_diff('millisecond', ts, next_ts)), 4) AS twa_value,
  COUNT(*) AS n_segments
FROM seg WHERE next_ts IS NOT NULL
GROUP BY user_id
""",
    tags=("window-time", "window", "aggregation"),
)
def w06_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user (TWAP shape): each reading holds
    until the next one, weighted by its duration — lead() to close each
    segment, then one aggregation. The step-function integral that plain
    AVG gets wrong on irregular samples; one shuffle on user_id shared
    by the window and the aggregate."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.withColumn("next_ts", F.lead("ts").over(w)).filter(
        F.col("next_ts").isNotNull()
    )
    ms = F.expr("timestampdiff(MILLISECOND, ts, next_ts)").cast("double")
    return seg.groupBy("user_id").agg(
        F.round(F.sum(F.col("value") * ms) / F.sum(ms), 4).alias("twa_value"),
        F.count(F.lit(1)).alias("n_segments"),
    )


@query(
    "w07_event_funnel",
    oracle="""
WITH s AS (
  SELECT user_id, MIN(ts) AS t_s FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_c
  FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t_s
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_p
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_c
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s) AS n_signup,
       (SELECT COUNT(*) FROM c) AS n_click_after_signup,
       (SELECT COUNT(*) FROM p) AS n_purchase_after_click
""",
    tags=("window-time", "funnel", "aggregation"),
)
def w07_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel: users who signed up, then clicked AFTER the
    signup, then purchased AFTER that click — each stage is a
    conditional-min aggregation joined to the previous stage's
    timestamps, so ordering is enforced, not just co-occurrence. Three
    shuffles on user_id (one per stage); each stage's output shrinks, so
    later joins broadcast at scale."""
    ev = load_table(spark, sf_dir, "events")

    def stage(event_type, prev=None, prev_ts=None):
        e = ev.filter(F.col("event_type") == event_type)
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(prev_ts))
        return e.groupBy("user_id").agg(F.min("ts").alias(f"t_{event_type}"))

    s = stage("signup")
    c = stage("click", s, "t_signup")
    p = stage("purchase", c, "t_click")
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after_signup")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )


_TS_L = 8  # subsequence length
# Query pattern: a rising ramp 1..8, z-normalized on the driver; the
# exact double literals are shared verbatim with the oracle SQL.
_TS_QUERY = [float(i) for i in range(1, _TS_L + 1)]
_TS_MU = sum(_TS_QUERY) / _TS_L
_TS_SD = (sum((x - _TS_MU) ** 2 for x in _TS_QUERY) / _TS_L) ** 0.5
_TS_Z = [(x - _TS_MU) / _TS_SD for x in _TS_QUERY]
_TS_Z_SQL = "[" + ", ".join(repr(x) for x in _TS_Z) + "]"


@query(
    "w08_subsequence_search",
    oracle=f"""
WITH seqs AS (
  SELECT user_id, event_id,
    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN {_TS_L - 1} PRECEDING AND CURRENT ROW) AS seq
  FROM events
), stats AS (
  SELECT user_id, event_id, seq,
    list_reduce(list_prepend(0.0, seq), (a, x) -> a + x) / {_TS_L} AS mu
  FROM seqs WHERE len(seq) = {_TS_L}
), scored AS (
  SELECT user_id, event_id, seq, mu,
    sqrt(list_reduce(list_prepend(0.0,
           list_transform(seq, x -> (x - mu) * (x - mu))),
         (a, x) -> a + x) / {_TS_L}) AS sd
  FROM stats
)
SELECT user_id, event_id,
  ROUND(list_reduce(list_prepend(0.0,
    list_transform(generate_series(1, {_TS_L}), i ->
      ((seq[i] - mu) / sd - ({_TS_Z_SQL})[i])
      * ((seq[i] - mu) / sd - ({_TS_Z_SQL})[i]))),
    (a, x) -> a + x), 6) AS dist
FROM scored WHERE sd > 0
ORDER BY dist, user_id, event_id LIMIT 20
""",
    tags=("window-time", "similarity", "time-series"),
)
def w08_subsequence_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series subsequence similarity search: every length-8 sliding
    window of each user's value series, z-normalized, ranked by squared
    distance to a z-normalized query pattern (a rising ramp) — the
    shape-matching primitive behind motif/anomaly search. One window
    shuffle on user_id builds the subsequences; scoring is per-row
    array arithmetic; top-20 is TakeOrderedAndProject."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_TS_L - 1), 0)
    )
    seqs = ev.withColumn("seq", F.collect_list("value").over(w)).filter(
        F.size("seq") == _TS_L
    )
    mu = (
        F.aggregate("seq", F.lit(0.0), lambda a, x: a + x) / _TS_L
    ).alias("mu")
    stats = seqs.select("user_id", "event_id", "seq", mu)
    sd = F.sqrt(
        F.aggregate(
            F.transform("seq", lambda x: (x - F.col("mu")) * (x - F.col("mu"))),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / _TS_L
    ).alias("sd")
    scored = stats.select("user_id", "event_id", "seq", "mu", sd)
    qz = F.array(*[F.lit(x) for x in _TS_Z])
    dist = F.round(
        F.aggregate(
            F.zip_with(
                "seq",
                qz,
                lambda x, q: ((x - F.col("mu")) / F.col("sd") - q)
                * ((x - F.col("mu")) / F.col("sd") - q),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
        6,
    ).alias("dist")
    return (
        scored.filter(F.col("sd") > 0)
        .select("user_id", "event_id", dist)
        .orderBy("dist", "user_id", "event_id")
        .limit(20)
    )


@query(
    "w10_gap_fill_forward",
    oracle="""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
    COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
  FROM events WHERE user_id < 10 GROUP BY 1, 2
), spans AS (
  SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1
  FROM hourly GROUP BY user_id
), dense AS (
  SELECT s.user_id, unnest(generate_series(s.h0, s.h1, INTERVAL 1 HOUR)) AS hour
  FROM spans s
)
SELECT d.user_id, d.hour,
  CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
  last_value(h.sum_value IGNORE NULLS) OVER (
    PARTITION BY d.user_id ORDER BY d.hour
    ROWS UNBOUNDED PRECEDING) AS carried_sum
FROM dense d LEFT JOIN hourly h
  ON h.user_id = d.user_id AND h.hour = d.hour
""",
    tags=("window-time", "time-series", "gap-fill"),
    bench=True,
)
def w10_gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification + forward fill — the gap-filling
    primitive dashboards and feature pipelines need that plain
    aggregation can't produce (missing hours simply don't exist as
    rows): each user's hourly activity is densified over their own
    [first, last] hour via sequence+explode, absent hours get
    n_events = 0, and the last observed hourly sum is carried forward
    with last(ignorenulls) over an ordered per-user window.

    Scale shape: the densified row count is bounded by users x span
    hours (time, not event volume); the fill is one window per user
    partition — no self-join, no driver loop. DuckDB states the same
    fill as last_value IGNORE NULLS."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    dense = spans.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    joined = dense.join(hourly, ["user_id", "hour"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        F.last("sum_value", ignorenulls=True).over(w).alias("carried_sum"),
    )


_EWMA_SPAN = 8  # observations per truncated EWMA window
_EWMA_DECAY = 0.75  # 1 - alpha; 3/4 is exactly representable in binary


@query(
    "w11_ewma_smoothing",
    oracle=f"""
WITH seqs AS (
  SELECT user_id, event_id, value,
    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN {_EWMA_SPAN - 1} PRECEDING AND CURRENT ROW)
      AS seq
  FROM events WHERE user_id < 10
)
SELECT user_id, event_id, ROUND(value, 6) AS value,
  ROUND(
    list_reduce(list_prepend(0.0,
      list_transform(generate_series(1, len(seq)),
        j -> seq[j] * power({_EWMA_DECAY}, len(seq) - j))),
      (a, x) -> a + x)
    /
    list_reduce(list_prepend(0.0,
      list_transform(generate_series(1, len(seq)),
        j -> power({_EWMA_DECAY}, len(seq) - j))),
      (a, x) -> a + x), 6) AS ewma
FROM seqs
""",
    tags=("window-time", "time-series", "smoothing"),
    bench=True,
)
def w11_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user — the smoothing
    primitive anomaly detectors and rate monitors run over event
    streams. The EWMA recurrence is inherently sequential, so it's
    stated as a TRUNCATED window (last 8 observations, weights
    (3/4)^age, renormalized): the window form is expressible as pure
    array arithmetic over a sliding frame — no recursion, no
    sequential scan — and the dropped tail weight is (3/4)^8 ~ 10.0%.
    Decay 3/4 is exactly representable in binary, so both engines'
    power() calls return identical doubles and the fold order matches
    — bit-for-bit parity without rounding tricks. One window shuffle
    on user_id; scoring is per-row."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_SPAN - 1), 0)
    )
    seqs = ev.withColumn("seq", F.collect_list("value").over(w))
    n = F.size("seq")
    idx = F.sequence(F.lit(1), n)
    weights = F.transform(
        idx, lambda j: F.pow(F.lit(_EWMA_DECAY), (n - j).cast("double"))
    )
    weighted = F.zip_with(
        F.col("seq"), weights, lambda x, wt: x * wt
    )
    s = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)
    return seqs.select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round(s(weighted) / s(weights), 6).alias("ewma"),
    )


@query(
    "w12_rolling_active_users",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM pairs),
dau AS (SELECT day, COUNT(*) AS dau FROM pairs GROUP BY day),
wau AS (
  SELECT d.day, COUNT(DISTINCT p.user_id) AS wau_7d
  FROM days d
  JOIN pairs p ON p.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY d.day
)
SELECT strftime(days.day, '%Y-%m-%d') AS day, dau.dau, wau.wau_7d
FROM days JOIN dau ON dau.day = days.day JOIN wau ON wau.day = days.day
""",
    tags=("window-time", "aggregation", "distinct", "analytics"),
    bench=True,
)
def w12_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct actives — DAU and trailing-7-day WAU per day,
    the product-analytics staple whose naive form (a distinct count per
    overlapping window) re-scans the event log once per window. Here
    events first collapse to DISTINCT (user, day) pairs — one map-side
    combinable aggregate, users x days rows, usually orders of
    magnitude below event count — and each pair then fans out to the
    <= 7 report days it can serve (explode over a 7-element date
    sequence), so the WAU distinct is computed over pair-days, never
    events. The range join lives only in the oracle; the engine side is
    equi-keyed end to end.

    At 100 TB the same query drops the fan-out entirely: keep ONE HLL
    sketch per day (q69's DataSketches surface) and merge 7 sketches
    per report day with hll_union_agg — sketch merge replaces the 7x
    row multiplication at ~2% error. This exact formulation is the
    oracle-checkable twin that validates that pipeline before you trust
    the sketches."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    days = pairs.select("day").distinct()
    dau = pairs.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        pairs.select(
            F.explode(
                F.sequence(F.col("day"), F.date_add("day", 6))
            ).alias("rday"),
            "user_id",
        )
        .distinct()
        .groupBy("rday")
        .agg(F.count(F.lit(1)).alias("wau_7d"))
    )
    return (
        days.join(dau, "day")
        .join(wau, days.day == wau.rday)
        # emit the day as a plain yyyy-MM-dd string: pandas canonicalizes
        # Spark DATE and DuckDB DATE differently (date vs midnight
        # timestamp), and the driver compares rendered values
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau_7d",
        )
    )


@query(
    "w12b_sketch_wau",
    oracle=None,  # sketch estimates; gated by the error-bound test
    tags=("window-time", "aggregation", "sketch", "analytics", "scale"),
    bench=True,
)
def w12b_sketch_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w12's DAU/WAU computed the way the 100-TB deployment runs it —
    the per-day-HLL-merge path w12's docstring promises, as callable
    code: one HLL sketch per day (hll_sketch_agg over raw events — the
    sketch absorbs duplicate users, so no DISTINCT pre-pass and no
    (user, day) shuffle), then each day's SINGLE sketch row fans out to
    the <= 7 report days it serves and hll_union_agg merges 7 sketches
    per day. The fan-out multiplies days x 7 sketch rows (~KB each),
    never user-pair rows — the shuffle is proportional to the calendar,
    not the corpus, at any event volume.

    Estimates, not exact counts (~1.6% standard error at the default
    lgConfigK=12), so there is no engine-portable oracle; the driver
    records rows-only and tests/test_properties.py gates every day's
    dau/wau estimate against w12's exact answer within a 5% relative
    error bound — the operational form of w12's 'exact validation twin'
    claim. Built on the same Spark DataSketches surface as q69/q72
    (binary-compatible with the Apache DataSketches java/C++/Python
    libraries, so downstream consumers can merge these sketches)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    dau = daily.select(
        "day", F.expr("hll_sketch_estimate(sk)").alias("dau_est")
    )
    wau = (
        daily.select(
            F.explode(
                F.sequence(F.col("day"), F.date_add("day", 6))
            ).alias("rday"),
            "sk",
        )
        .groupBy("rday")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("wau_7d_est"))
    )
    return (
        dau.join(wau, dau.day == wau.rday)  # drops rdays past the calendar
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau_est",
            "wau_7d_est",
        )
    )


@query(
    "w13_peak_concurrency",
    oracle="""
WITH pts AS (
  SELECT event_type, ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 5 MINUTE, -1 FROM events
),
run AS (
  SELECT event_type,
    SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                     ROWS UNBOUNDED PRECEDING) AS conc
  FROM pts
)
SELECT r.event_type, CAST(MAX(r.conc) AS BIGINT) AS peak_concurrency,
       CAST(COUNT(*) / 2 AS BIGINT) AS n_events
FROM run r GROUP BY r.event_type
""",
    tags=("window-time", "analytics", "sweep-line"),
    bench=True,
)
def w13_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency per event type — 'how many 5-minute
    event windows were simultaneously open at the worst moment' — via
    the classic SWEEP LINE: every interval becomes a +1 point at its
    start and a -1 point at its end, a running sum over the
    time-ordered points traces the concurrency curve, and its max is
    the peak. This is the algorithmic pattern behind room-occupancy,
    concurrent-session, and connection-pool sizing questions, and the
    one interval aggregation the window family (w01-w12) did not cover:
    the measure is over OVERLAPS, not fixed buckets.

    Determinism at boundaries: points order by (t, delta), so a -1
    (close) at time T sorts before a +1 (open) at the same T —
    end-exclusive intervals; back-to-back windows never double-count.
    Points sharing identical (t, delta) commute through the running
    sum, so the max is order-independent. Scale shape: the sort is
    per-partition within the event-type hash partition (one Exchange,
    one per-partition sort, map-side nothing to combine — a sweep line
    is inherently sequential per key); a single globally-hot key would
    instead use range-bucketed partial sweeps with carry-in offsets,
    the standard two-phase formulation."""
    pts = _sweep_points(load_table(spark, sf_dir, "events"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select("event_type", F.sum("delta").over(w).alias("conc"))
    return run.groupBy("event_type").agg(
        F.max("conc").alias("peak_concurrency"),
        (F.count(F.lit(1)) / 2).cast("long").alias("n_events"),
    )


def _sweep_points(ev: DataFrame) -> DataFrame:
    """(event_type, t, delta) sweep-line points: +1 at each event's
    start, -1 at its end (5-minute windows, end-exclusive)."""
    return ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        ev.select(
            "event_type",
            (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )


def sweep_line_peaks_twophase(pts: DataFrame, n_buckets: int = 32) -> DataFrame:
    """Peak concurrency via RANGE-BUCKETED PARTIAL SWEEPS with carry-in
    offsets — the two-phase formulation for a globally hot key that
    w13's docstring names, as a callable path.

    Identity: split each key's time axis into contiguous range buckets;
    the running sum at any point in bucket k equals (sum of all deltas
    in buckets < k) + (the local prefix sum within bucket k), so
    per-key peak = max over buckets of (carry_in + local_max). Phase 1
    computes local prefix maxima and bucket totals with a window
    partitioned by (key, bucket) — a hot key's sweep spreads over
    n_buckets parallel tasks instead of serializing on one. Phase 2 is
    per-key over n_buckets ROWS (not points): a tiny prefix-sum window
    for the carry-ins, then one aggregate.

    Bucket boundaries are equal-width slices of the key-independent
    global [min_t, max_t] — a 1-row driver read that enters the plan as
    two literals (no shuffle, no per-key pass). Same-t points always
    land in one bucket, so the (t, delta) tie order — and therefore the
    exact peak — is preserved bit-for-bit vs the single-sweep form
    (equality-pinned in tests/test_window_edge_semantics.py and by
    w13b's driver oracle, which is w13's).

    At 100 TB: phase 1's shuffle carries the same (key, t, delta)
    points the one-phase form shuffles, just hashed on (key, bucket);
    phase 2 shuffles keys x n_buckets 4-column rows — negligible. Cost
    of generality: two window passes instead of one, so keep the
    one-phase w13 for well-distributed keys and switch to this when one
    key dominates (the d04 skew-guard pattern, priced in bench.py's
    w13_sweep stress rows)."""
    from pyspark.sql import Window

    # epoch seconds computed engine-side (double cast), so the literal
    # bounds and the per-row expression share one timezone semantics
    lo, hi = pts.agg(
        F.min(F.col("t").cast("timestamp").cast("double")), F.max(F.col("t").cast("timestamp").cast("double"))
    ).collect()[0]
    if lo is None:
        # empty input: any bucketing of zero points works; pick one so
        # the plan builds and (like the one-phase form) returns 0 rows
        lo, hi = 0.0, 1.0
    width = max(hi - lo, 1e-9) / n_buckets
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col("t").cast("timestamp").cast("double") - F.lit(lo)) / F.lit(width)),
    ).cast("int")

    w_local = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = pts.withColumn("bucket", bucket).withColumn(
        "run", F.sum("delta").over(w_local)
    )
    per_bucket = local.groupBy("event_type", "bucket").agg(
        F.max("run").alias("local_max"),
        F.sum("delta").alias("total"),
        F.count(F.lit(1)).alias("n_pts"),
    )
    w_carry = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = per_bucket.withColumn(
        "carry", F.coalesce(F.sum("total").over(w_carry), F.lit(0))
    )
    return carried.groupBy("event_type").agg(
        F.max(F.col("carry") + F.col("local_max")).alias("peak_concurrency"),
        (F.sum("n_pts") / 2).cast("long").alias("n_events"),
    )


@query(
    "w13b_peak_concurrency_twophase",
    oracle="""
WITH pts AS (
  SELECT event_type, ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 5 MINUTE, -1 FROM events
),
run AS (
  SELECT event_type,
    SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                     ROWS UNBOUNDED PRECEDING) AS conc
  FROM pts
)
SELECT r.event_type, CAST(MAX(r.conc) AS BIGINT) AS peak_concurrency,
       CAST(COUNT(*) / 2 AS BIGINT) AS n_events
FROM run r GROUP BY r.event_type
""",
    tags=("window-time", "analytics", "sweep-line", "skew"),
    bench=True,
)
def w13b_peak_concurrency_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w13's peak-concurrency answer computed by the two-phase
    range-bucketed sweep (sweep_line_peaks_twophase) — the hot-key path.
    The oracle is w13's single-sweep SQL verbatim: the driver certifies
    the decomposition is exact, not approximately equal."""
    return sweep_line_peaks_twophase(
        _sweep_points(load_table(spark, sf_dir, "events"))
    )


@query(
    "w14_ohlc_downsample",
    oracle="""
WITH ranked AS (
  SELECT event_type,
    time_bucket(INTERVAL 6 HOUR, ts) AS bucket_start,
    value, ts, event_id,
    ROW_NUMBER() OVER (PARTITION BY event_type, time_bucket(INTERVAL 6 HOUR, ts)
                       ORDER BY ts, event_id) AS rn_first,
    ROW_NUMBER() OVER (PARTITION BY event_type, time_bucket(INTERVAL 6 HOUR, ts)
                       ORDER BY ts DESC, event_id DESC) AS rn_last
  FROM events
)
SELECT event_type, strftime(bucket_start, '%Y-%m-%d %H:%M:%S') AS bucket_start,
  ROUND(MAX(CASE WHEN rn_first = 1 THEN value END), 6) AS open,
  ROUND(MAX(value), 6) AS high,
  ROUND(MIN(value), 6) AS low,
  ROUND(MAX(CASE WHEN rn_last = 1 THEN value END), 6) AS close,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM ranked GROUP BY event_type, bucket_start
""",
    tags=("window-time", "analytics", "downsampling"),
    bench=True,
)
def w14_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open/high/low/close) downsampling per event type and
    6-hour bucket — the candlestick query every time-series store runs
    to compact raw ticks into chart-ready bars. The interesting
    operators are OPEN and CLOSE: value-at-earliest/latest-timestamp
    per bucket, i.e. an argmin/argmax by time. The engine computes them
    as struct-min/max aggregates (min of (ts, event_id, value) structs,
    then extract value) — combinable map-side like any aggregate, so a
    hot bucket never funnels its raw rows through one window reducer;
    the oracle uses the ROW_NUMBER formulation to prove the struct
    trick equals the rank-based definition. Ties on ts break by
    event_id on both engines, so open/close are deterministic even for
    simultaneous events. One hash aggregate; shuffle carries
    (type, bucket) partial bars, never ticks."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.window("ts", "6 hours")
    first = F.min(F.struct("ts", "event_id", "value"))
    last = F.max(F.struct("ts", "event_id", "value"))
    return (
        ev.groupBy("event_type", bucket.alias("w"))
        .agg(
            F.round(first.getField("value"), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(last.getField("value"), 6).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


@query(
    "w15_rolling_zscore_anomaly",
    oracle="""
WITH stats AS (
  SELECT event_id, event_type, value,
    AVG(value) OVER w AS mu,
    STDDEV_SAMP(value) OVER w AS sd,
    COUNT(*) OVER w AS n_prior
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, event_type, ROUND(value, 6) AS value,
       ROUND((value - mu) / sd, 6) AS zscore
FROM stats
WHERE n_prior >= 10 AND sd > 0 AND ABS((value - mu) / sd) >= 2.5
""",
    tags=("window-time", "analytics", "anomaly", "data-quality"),
    bench=True,
)
def w15_rolling_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: flag events whose value sits
    >= 2.5 sample standard deviations from the mean of the PRECEDING 20
    same-type events — the self-calibrating outlier feed a data-quality
    monitor runs over an ingest stream (a fixed threshold drifts; a
    trailing window adapts per event type). The frame excludes the
    current row (20 PRECEDING .. 1 PRECEDING), so an anomaly never
    suppresses its own detection by inflating the window's variance,
    and needs >= 10 prior events before scoring (cold-start guard).
    Determinism: frames order by (ts, event_id) on both engines, so
    simultaneous events don't reshuffle each other's windows. Scale
    shape: ONE shuffle on event_type, then a bounded ROWS frame both
    engines evaluate with running sums — O(n) per partition, state is
    21 rows however long the stream. Per-type sequential evaluation is
    the w13-class hazard; at 100 TB with few event types, range-bucket
    the time axis and replicate each bucket's trailing 20 rows into its
    successor (the w13b carry-in pattern) to restore parallelism
    without changing any frame's contents."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        ev.select(
            "event_id",
            "event_type",
            "value",
            F.avg("value").over(w).alias("mu"),
            F.stddev_samp("value").over(w).alias("sd"),
            F.count(F.lit(1)).over(w).alias("n_prior"),
        )
        .filter(
            (F.col("n_prior") >= 10)
            & (F.col("sd") > 0)
            & (F.abs(z) >= 2.5)
        )
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round(z, 6).alias("zscore"),
        )
    )


@query(
    "w16_windowed_distinct_users",
    oracle="""
SELECT event_type,
       CAST(MAX(du) AS BIGINT) AS max_distinct_50,
       ROUND(AVG(du), 6) AS avg_distinct_50
FROM (
  SELECT event_type,
         COUNT(DISTINCT user_id) OVER (PARTITION BY event_type
               ORDER BY ts, event_id
               ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS du
  FROM events
)
GROUP BY event_type
""",
    tags=("window-time", "analytics", "distinct"),
    bench=True,
)
def w16_windowed_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregation inside a sliding ROWS frame: per event the
    count of distinct users among the trailing 50 same-type events,
    summarized per type (max + mean) — the 'how concentrated is recent
    activity' signal a rate-limiter or abuse monitor reads. Spark has
    no COUNT(DISTINCT) OVER; the engine expresses it as
    size(collect_set(user) OVER frame) — semantically identical (both
    count distinct non-null values in the frame), which the DuckDB
    oracle proves by computing the literal COUNT(DISTINCT) OVER form.
    Determinism: frames order by (ts, event_id). Scale shape: one
    shuffle on event_type + a bounded 50-row frame whose state is the
    frame's user set (<= 50 entries); the per-type summary is a
    combinable aggregate. Per-type serialization is the w13-class
    hazard; the w13b range-bucket + carry-in pattern applies unchanged
    if a single type dominates."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-49, 0)
    )
    return (
        ev.select(
            "event_type",
            F.size(F.collect_set("user_id").over(w)).alias("du"),
        )
        .groupBy("event_type")
        .agg(
            F.max("du").cast("long").alias("max_distinct_50"),
            F.round(F.avg("du"), 6).alias("avg_distinct_50"),
        )
    )


@query(
    "w17_scd2_dimension_join",
    oracle="""
WITH changes AS (
  SELECT user_id, ts AS eff_from, value AS tier,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS eff_to
  FROM events WHERE event_type = 'signup'
),
facts AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id, ROUND(f.value, 6) AS amount,
       ROUND(c.tier, 6) AS tier_at_purchase
FROM facts f JOIN changes c
  ON c.user_id = f.user_id
 AND f.ts >= c.eff_from AND (c.eff_to IS NULL OR f.ts < c.eff_to)
""",
    tags=("join", "scd2", "temporal", "warehouse"),
    bench=True,
)
def w17_scd2_dimension_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build + point-in-time fact
    join — the warehouse staple behind 'what was this user's tier WHEN
    they purchased'. Stage 1 turns a change log (signup events as
    attribute changes) into validity intervals with one LEAD window per
    user: [eff_from, eff_to), the last version open-ended — an
    as-of-join-ready dimension without a single self-join. Stage 2
    joins facts (purchases) to the version valid at fact time: an
    EQUI-join on user_id with the interval test as a residual
    predicate — a hash join whose probe side only range-checks within
    the user's own versions, never a cross product (the w04/q30
    pattern; intervals per user are non-overlapping by construction,
    so each fact matches at most ONE version — output is at most one
    row per fact; facts with no valid version, e.g. a purchase
    timestamped before the user's first signup, are dropped by the
    inner join). Determinism: version order breaks ts ties on
    event_id in both engines. At 100 TB: the dimension build shuffles
    the CHANGE LOG (small) once; the fact join shuffles on user_id or
    goes zero-Exchange when both sides are user-bucketed (p13
    layout); a hot user's versions are still one hash bucket —
    versions per entity is naturally bounded, unlike events per
    entity."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("ts").alias("eff_from"),
            F.col("value").alias("tier"),
            F.lead("ts").over(w).alias("eff_to"),
        )
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("fact_ts"), "value"
    )
    return (
        facts.join(
            changes,
            (facts.user_id == changes.user_id)
            & (F.col("fact_ts") >= F.col("eff_from"))
            & (F.col("eff_to").isNull() | (F.col("fact_ts") < F.col("eff_to"))),
        )
        .select(
            "event_id",
            facts.user_id.alias("user_id"),
            F.round("value", 6).alias("amount"),
            F.round("tier", 6).alias("tier_at_purchase"),
        )
    )


_W18_ASOF = "2024-01-16"


@query(
    "w18_scd2_snapshot",
    oracle=f"""
WITH dim AS (
  SELECT user_id, ts AS eff_from, value AS tier,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS eff_to
  FROM events WHERE event_type = 'signup'
)
SELECT user_id, eff_from, ROUND(tier, 6) AS tier
FROM dim
WHERE eff_from <= TIMESTAMP '{_W18_ASOF}'
  AND (eff_to IS NULL OR eff_to > TIMESTAMP '{_W18_ASOF}')
""",
    tags=("window", "scd2", "time-travel"),
)
def w18_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time snapshot of the w17 SCD2 dimension — 'the table AS
    OF time T', the time-travel read a warehouse serves from the same
    validity intervals w17 builds (one LEAD window over the change log;
    no second copy of history, no log replay). The snapshot predicate
    eff_from <= T < eff_to selects exactly one version per entity that
    existed at T, so output is at most one row per user — the ROW
    FILTER formulation of time travel, which at 100 TB is a pure scan
    over the interval-stored dimension (partition-prunable on eff_from
    if the dim is date-partitioned), versus replaying a changelog
    (p16's job) or snapshotting per query. Completes the slowly-
    changing-dimension family: w17 joins facts to versions, w18 reads
    the dimension at an instant, p15/p16 diff and apply the changelogs
    between snapshots."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("eff_from"),
        F.col("value").alias("tier"),
        F.lead("ts").over(w).alias("eff_to"),
    )
    t = F.lit(_W18_ASOF).cast("timestamp")
    return dim.filter(
        (F.col("eff_from") <= t) & (F.col("eff_to").isNull() | (F.col("eff_to") > t))
    ).select("user_id", "eff_from", F.round("tier", 6).alias("tier"))


_W19_WINDOW_S = 7 * 24 * 3600  # 7-day attribution lookback


@query(
    "w19_purchase_attribution",
    oracle=f"""
WITH touched AS (
  SELECT user_id, ts, event_id, event_type, value,
    LAST_VALUE(CASE WHEN event_type IN ('click', 'view', 'signup')
                    THEN ts END IGNORE NULLS)
      OVER w AS touch_ts,
    LAST_VALUE(CASE WHEN event_type IN ('click', 'view', 'signup')
                    THEN event_type END IGNORE NULLS)
      OVER w AS touch_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT
  CASE WHEN touch_ts IS NOT NULL
        AND date_diff('second', touch_ts, ts) <= {_W19_WINDOW_S}
       THEN touch_type ELSE 'none' END AS attributed_type,
  COUNT(*) AS n_purchases,
  CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(25, 6))) AS DOUBLE)
    AS total_value
FROM touched
WHERE event_type = 'purchase'
GROUP BY 1
""",
    tags=("window", "attribution", "behavioral"),
)
def w19_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH ATTRIBUTION: each purchase is credited to the user's
    most recent preceding touch event (click/view/signup) within a
    7-day lookback, else 'none' — the marketing-analytics workhorse
    that completes the behavioral family (w07 asks 'did the funnel
    complete', w09 'did the user return'; this asks 'what gets credit
    for the conversion'). Shape: ONE pass — an IGNORE-NULLS last_value
    over the per-user event sequence carries the latest touch's
    (ts, type) forward (two columns over the SAME frame, so they come
    from the same touch row), and the lookback is a pure row predicate;
    the report is a <=4-group combinable aggregate. No self-join of
    purchases against touches (the naive as-of formulation — a second
    shuffle plus a range join), no Expand. At 100 TB: one shuffle on
    user_id, linear state per user inside the sort-based window, and
    the same plan serves first-touch (first_value) or any-touch
    (count over the frame) by swapping the window function. Value sums
    in exact DECIMAL (the p18 discipline) so the group totals are
    order-independent."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    is_touch = F.col("event_type").isin("click", "view", "signup")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = ev.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    # WHOLE-SECOND age, matching the oracle's date_diff('second')
    # boundary-count semantics exactly: both sides truncate to the
    # second BEFORE differencing (a raw fractional epoch difference
    # disagrees with date_diff at the 7-day boundary whenever the two
    # sub-second fractions differ — a latent cross-engine hash flake).
    age_s = F.date_trunc("second", F.col("ts")).cast("timestamp").cast(
        "double"
    ) - F.date_trunc("second", F.col("touch_ts")).cast("timestamp").cast("double")
    attributed = F.when(
        F.col("touch_ts").isNotNull() & (age_s <= _W19_WINDOW_S),
        F.col("touch_type"),
    ).otherwise(F.lit("none"))
    return (
        touched.filter(F.col("event_type") == "purchase")
        .groupBy(attributed.alias("attributed_type"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.round(F.col("value"), 6).cast("decimal(25,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@query(
    "w20_event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n AS n_transitions,
  ROUND(CAST(n AS DOUBLE)
        / SUM(n) OVER (PARTITION BY prev_type), 6) AS p_transition
FROM pairs
""",
    tags=("window", "behavioral", "markov"),
    bench=True,
)
def w20_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov TRANSITION MATRIX over per-user event
    sequences: for every consecutive (prev -> next) event-type pair in
    a user's (ts, event_id)-ordered history, the transition count and
    the row-normalized probability — the behavioral-analytics
    summary under next-action prediction, funnel drop-off diagnosis,
    and bot detection (bots have near-deterministic rows; humans
    don't). Complements the w-family's funnel (w07, fixed expected
    path) by measuring ALL observed paths at once.

    Scale shape: ONE shuffle on user_id for the lag window (at 100 TB,
    pre-bucketing events by user_id makes it zero-Exchange — the p13
    contract), then a map-side-combinable count whose post-combine
    cardinality is |event types|^2 — 36 rows here, bounded by the type
    vocabulary at any corpus size; the probability normalization is a
    window over that tiny aggregate, never over events. Probabilities
    round at 1e-6 from an exact integer ratio, so the hash cannot
    drift."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(wseq).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wnorm = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wnorm),
            6,
        ).alias("p_transition"),
    )


@query(
    "w21_time_to_conversion",
    oracle="""
WITH firsts AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS purchase_ts
  FROM events GROUP BY user_id
),
lat AS (
  SELECT user_id,
    date_diff('second', signup_ts, purchase_ts) AS latency_s
  FROM firsts
  WHERE signup_ts IS NOT NULL AND purchase_ts IS NOT NULL
    AND purchase_ts >= signup_ts
)
SELECT
  CAST(FLOOR(latency_s / 86400) AS BIGINT) AS days_to_convert,
  COUNT(*) AS n_users,
  MIN(latency_s) AS min_latency_s,
  MAX(latency_s) AS max_latency_s
FROM lat GROUP BY 1
""",
    tags=("window", "behavioral", "funnel"),
    bench=True,
)
def w21_time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-CONVERSION distribution: per user, the latency from
    FIRST signup to FIRST subsequent purchase, bucketed into whole
    days — the funnel-latency histogram behind activation dashboards
    and cohort health checks (w07 asks "did the funnel complete"; this
    asks "how fast"). Latencies are whole-second integers (both
    engines truncate to the second before differencing — the w19
    boundary discipline), so buckets, counts and min/max are exact and
    the hash cannot drift.

    Scale shape: ONE map-side-combinable groupBy on user_id computes
    both firsts as conditional MINs in the same pass (no self-join, no
    window); the bucket rollup's post-combine cardinality is the day
    vocabulary. At 100 TB: one shuffle on user_id, then a
    tens-of-rows aggregate."""
    firsts = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("ts"))
            ).alias("signup_ts"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("purchase_ts"),
        )
        .filter(
            F.col("signup_ts").isNotNull()
            & F.col("purchase_ts").isNotNull()
            & (F.col("purchase_ts") >= F.col("signup_ts"))
        )
    )
    latency = (
        F.date_trunc("second", F.col("purchase_ts")).cast("timestamp").cast("double")
        - F.date_trunc("second", F.col("signup_ts")).cast("timestamp").cast("double")
    ).cast("long")
    return (
        firsts.select("user_id", latency.alias("latency_s"))
        .groupBy(
            F.floor(F.col("latency_s") / 86400)
            .cast("bigint")
            .alias("days_to_convert")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("latency_s").alias("min_latency_s"),
            F.max("latency_s").alias("max_latency_s"),
        )
    )


_W22_T = 500  # alarm when cumulative excess over the mean exceeds this
# many value-units (scaled: threshold = n * 1e6 * T in integer space)


@query(
    "w22_cusum_drift",
    oracle=f"""
WITH scaled AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 1000000) AS BIGINT) AS v
  FROM events
),
stats AS (
  SELECT event_type, COUNT(*) AS n, SUM(v) AS total
  FROM scaled GROUP BY event_type
),
walk AS (
  SELECT s.event_type, s.ts, s.event_id, st.n,
    SUM(CAST(st.n AS HUGEINT) * s.v - st.total) OVER w AS r
  FROM scaled s JOIN stats st USING (event_type)
  WINDOW w AS (PARTITION BY s.event_type ORDER BY s.ts, s.event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cusum AS (
  SELECT event_type, n,
    r - LEAST(CAST(0 AS HUGEINT), MIN(r) OVER w) AS s
  FROM walk
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type,
  CAST(n AS BIGINT) AS n_events,
  CAST(COUNT(*) FILTER (s >= CAST(n AS HUGEINT) * 1000000 * {_W22_T})
       AS BIGINT) AS n_alarms,
  ROUND(CAST(MAX(s) AS DOUBLE) / (n * 1000000.0), 6) AS max_excess
FROM cusum GROUP BY event_type, n
""",
    tags=("window", "anomaly", "drift", "data-quality"),
    bench=True,
)
def w22_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detector per event type (Page 1954): the
    cumulative-sum statistic S_i = max(0, S_{i-1} + (x_i - mu))
    alarms when a SUSTAINED upward shift accumulates — the detector
    family for slow drifts that w15/st21's pointwise z-score
    structurally cannot see (each point individually in-band, the
    mean quietly up 1%). The recursion is not a SQL window function,
    but the classical reflection identity
    S_i = R_i - min(0, min_j<=i R_j) (R = running sum of deviations)
    turns it into TWO stock windows — running sum, then running min —
    so the whole detector stays in Catalyst codegen with no UDF and
    no iteration.

    Exactness: deviations are computed in count-scaled integer space
    (n*x_i - total, with x scaled to BIGINT at 1e-6) so the random
    walk, the reflection, and the alarm comparison are exact integer
    arithmetic — no float-summation drift, hash-stable; the single
    float division happens in the final per-type summary. The walk is
    carried as DECIMAL(38,0) / HUGEINT because count-scaling inflates
    terms by n: a BIGINT prefix sum wraps silently around 9.2e18,
    which a billion-row event type with |value| ~ 1e3 reaches.

    Scale shape: one shuffle on event_type for the ordered windows
    (the same partitioning serves both passes — Catalyst reuses the
    Exchange), a broadcast-joined per-type stats row, and a
    group-cardinality-sized summary. At 100 TB the windows are the
    cost: per-type ordered scans parallelize across types, and a
    deployment with few huge types would range-chunk the walk (the
    st24 carry-in pattern) — documented, not needed at catalog
    scale."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v"),
    )
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the count-scaled walk lives in DECIMAL(38,0) (DuckDB: HUGEINT):
    # single terms are n * v, so a BIGINT walk would wrap silently at
    # n * max|v| * n ~ 9.2e18 — well inside the 100 TB regime the
    # docstring claims. DECIMAL(38,0) carries n <= ~1e12 rows/type at
    # |value| <= 1e6 exactly; past ITS ceiling Spark yields NULL (loud)
    # rather than a wrapped wrong answer.
    dev = (
        F.col("n").cast("decimal(38,0)") * F.col("v") - F.col("total")
    ).cast("decimal(38,0)")
    walk = (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("r", F.sum(dev).over(wcum))
    )
    cusum = walk.withColumn(
        "s",
        (
            F.col("r")
            - F.least(F.lit(0).cast("decimal(38,0)"), F.min("r").over(wcum))
        ).cast("decimal(38,0)"),
    )
    thresh = (
        F.col("n").cast("decimal(38,0)") * F.lit(1_000_000) * _W22_T
    ).cast("decimal(38,0)")
    return cusum.groupBy("event_type", "n").agg(
        F.sum(F.when(F.col("s") >= thresh, 1).otherwise(0))
        .cast("bigint")
        .alias("n_alarms"),
        F.round(
            F.max("s").cast("double") / (F.col("n") * 1_000_000.0), 6
        ).alias("max_excess"),
    ).select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        "n_alarms",
        "max_excess",
    )


@query(
    "w23_state_dwell_time",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts,
    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM events
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_dwells,
  CAST(SUM(date_diff('second', ts, next_ts)) AS BIGINT) AS total_dwell_s,
  CAST(MAX(date_diff('second', ts, next_ts)) AS BIGINT) AS max_dwell_s,
  ROUND(CAST(SUM(date_diff('second', ts, next_ts)) AS DOUBLE)
        / COUNT(*), 6) AS avg_dwell_s
FROM seq WHERE next_ts IS NOT NULL
GROUP BY event_type
""",
    tags=("window", "behavioral", "dwell-time"),
    bench=True,
)
def w23_state_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATE DWELL-TIME analysis: treating each user's event stream as
    a state machine (their current state = last event type), how long
    do users SIT in each state before the next transition? The
    engagement metric behind "time on step" funnels and abandonment
    diagnosis — w20 counts the transitions, this prices them in
    seconds. Dwell of an event = whole seconds to the user's NEXT
    event (one LEAD window; the final open-ended state is excluded —
    its dwell is right-censored, which a survival analysis would model
    and a sum must not fake). Whole-second integers via the w19/w21
    truncate-before-difference discipline, so sums and the hash are
    exact; avg is the one final float division.

    Scale shape: one user_id shuffle for the LEAD window (bucketing on
    user_id makes it zero-Exchange — the p13 contract), then a
    map-side-combinable per-type aggregate of type-vocabulary
    cardinality."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dwell = (
        F.date_trunc("second", F.lead("ts").over(wseq))
        .cast("timestamp")
        .cast("double")
        - F.date_trunc("second", F.col("ts")).cast("timestamp").cast("double")
    ).cast("long")
    seq = ev.select("user_id", "event_type", "ts", "event_id").withColumn(
        "dwell_s", dwell
    )
    return (
        seq.filter(F.col("dwell_s").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_dwells"),
            F.sum("dwell_s").cast("bigint").alias("total_dwell_s"),
            F.max("dwell_s").alias("max_dwell_s"),
            F.round(
                F.sum("dwell_s").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_dwell_s"),
        )
    )
