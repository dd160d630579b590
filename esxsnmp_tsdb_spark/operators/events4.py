"""Event-analytics surface, batch 4 (EXT): behavioral reports over the
`events` stream — session-duration distribution, top user journeys,
activity concentration bands, and the inter-event gap histogram.

Determinism: every window orders by (tse, event_id) (the house total
order); durations/gaps/counts are exact int64; ratios are half-up
integer micro-units or doubles derived from exact integer sums; band
thresholds come from the established `percentile` ≡ `quantile_cont`
DOUBLE parity and are broadcast, never re-derived per row.

Scale posture: all windows partition by user (or user × day) — bounded
per-key state, no global window (the plan-audit invariant); the journey
top-k reduces through `ranked_topk` (TakeOrderedAndProject); the
concentration bands avoid a global NTILE by classifying against
broadcast quantile thresholds — two aggregates and a 1-row broadcast
instead of a single-task global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esxsnmp_tsdb_spark.functions.topk import ranked_topk
from esxsnmp_tsdb_spark.functions.exact import half_up_div
from esxsnmp_tsdb_spark.registry import op
from esxsnmp_tsdb_spark.sources import register_views

SESSION_GAP_SEC = 1800  # same gap as relational2.ts_sessionize
JOURNEY_LEN = 3
JOURNEY_TOP = 20

# DuckDB twin of the per-user event prep (keep in lockstep with _ev below).
EV_CTE = """ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tse,
         event_id, event_type
  FROM events
)"""


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return register_views(spark, sf_dir)["events"].select(
        "user_id",
        F.unix_timestamp("ts").alias("tse"),
        "event_id",
        "event_type",
    )


@op(
    "session_duration_stats",
    oracle=f"""
WITH {EV_CTE},
m AS (
  SELECT user_id, tse, event_id,
         CASE WHEN lag(tse) OVER w IS NULL
                OR tse - lag(tse) OVER w > {SESSION_GAP_SEC}
              THEN 1 ELSE 0 END AS new_s
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tse, event_id)
),
sid AS (
  SELECT user_id, tse,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY tse, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
),
sess AS (
  SELECT user_id, sid, max(tse) - min(tse) AS dur,
         CAST(count(*) AS BIGINT) AS n_ev
  FROM sid GROUP BY user_id, sid
),
b AS (
  SELECT CASE WHEN dur < 60 THEN 'a_lt1m'
              WHEN dur < 300 THEN 'b_1to5m'
              WHEN dur < {SESSION_GAP_SEC} THEN 'c_5to30m'
              ELSE 'd_ge30m' END AS bucket,
         dur, n_ev
  FROM sess
)
SELECT bucket, count(*) AS n_sessions,
       CAST(sum(n_ev) AS BIGINT) AS n_events,
       round(CAST(sum(dur) AS DOUBLE) / count(*), 6) AS avg_dur_sec,
       round(CAST(sum(n_ev) AS DOUBLE) / count(*), 6) AS avg_events
FROM b GROUP BY bucket
""",
)
def session_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-duration distribution: gap-based sessionization (a new
    session after {SESSION_GAP_SEC}s of silence — `ts_sessionize`'s rule
    at user grain), rolled into duration buckets with per-bucket event
    and length averages — the engagement-shape report.

    Two per-user windows (boundary flag, then running session id — both
    partition-bounded), one aggregate per session, one per bucket.
    Durations are exact integer seconds; the averages divide exact int
    sums, so the only float op is one division per output row."""
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("tse", "event_id")
    m = ev.select(
        "user_id",
        "tse",
        "event_id",
        F.when(
            F.lag("tse").over(w).isNull()
            | (F.col("tse") - F.lag("tse").over(w) > SESSION_GAP_SEC),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sid = m.select(
        "user_id",
        "tse",
        F.sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    sess = sid.groupBy("user_id", "sid").agg(
        (F.max("tse") - F.min("tse")).alias("dur"),
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
    )
    bucket = (
        F.when(F.col("dur") < 60, "a_lt1m")
        .when(F.col("dur") < 300, "b_1to5m")
        .when(F.col("dur") < SESSION_GAP_SEC, "c_5to30m")
        .otherwise("d_ge30m")
    )
    return (
        sess.select(bucket.alias("bucket"), "dur", "n_ev")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_ev").cast("bigint").alias("n_events"),
            F.round(
                F.sum("dur").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_dur_sec"),
            F.round(
                F.sum("n_ev").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_events"),
        )
    )


@op(
    "user_journey_top_paths",
    oracle=f"""
WITH {EV_CTE},
m AS (
  SELECT user_id, tse // 86400 AS day, event_type,
         row_number() OVER (PARTITION BY user_id, tse // 86400
                            ORDER BY tse, event_id) AS rn
  FROM ev
),
j AS (
  SELECT user_id, day,
         string_agg(event_type, '>' ORDER BY rn) AS journey
  FROM m WHERE rn <= {JOURNEY_LEN} GROUP BY user_id, day
),
c AS (SELECT journey, count(*) AS n FROM j GROUP BY journey)
SELECT journey, n, rank FROM (
  SELECT journey, n,
         row_number() OVER (ORDER BY n DESC, journey) AS rank
  FROM c
) WHERE rank <= {JOURNEY_TOP}
""",
)
def user_journey_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top opening journeys: each (user, day)'s first {JOURNEY_LEN} event
    types in arrival order, concatenated into a path string and ranked by
    frequency — the onboarding-funnel discovery query (`event_funnel`
    checks a KNOWN sequence; this one finds the common sequences).

    The per-(user, day) window is partition-bounded; journeys reduce to a
    journey-keyed count whose cardinality is ≤ |event types|^{JOURNEY_LEN}
    (tiny), and the final top-{JOURNEY_TOP} rides `ranked_topk`
    (TakeOrderedAndProject — per-partition heaps, no global sort)."""
    ev = _ev(spark, sf_dir)
    day = F.expr("tse div 86400")
    m = ev.select(
        "user_id",
        day.alias("day"),
        "event_type",
        F.row_number().over(
            Window.partitionBy("user_id", day).orderBy("tse", "event_id")
        ).alias("rn"),
    )
    j = (
        m.filter(F.col("rn") <= JOURNEY_LEN)
        .groupBy("user_id", "day")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda x: x.event_type,
                ),
                ">",
            ).alias("journey")
        )
    )
    c = j.groupBy("journey").agg(F.count(F.lit(1)).alias("n"))
    return ranked_topk(
        c, JOURNEY_TOP, [F.col("n").desc(), F.col("journey")]
    ).select("journey", "n", "rank")


@op(
    "user_activity_concentration",
    oracle="""
WITH u AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
thr AS (
  SELECT quantile_cont(CAST(n AS DOUBLE), 0.5) AS p50,
         quantile_cont(CAST(n AS DOUBLE), 0.9) AS p90
  FROM u
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM u),
cls AS (
  SELECT CASE WHEN n >= p90 THEN 'heavy'
              WHEN n >= p50 THEN 'mid'
              ELSE 'light' END AS band, n
  FROM u CROSS JOIN thr
)
SELECT band, count(*) AS n_users, CAST(sum(n) AS BIGINT) AS n_events,
       CAST(""" + half_up_div("sum(n)", "t", mul=1_000_000, idiv="//") + """ AS BIGINT) AS share_micro
FROM cls CROSS JOIN tot GROUP BY band, t
""",
)
def user_activity_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration: users banded as heavy (≥ p90 of events per
    user), mid (≥ p50) or light, with each band's share of total events —
    the "10% of users generate X% of traffic" report behind capacity and
    abuse planning.

    Deliberately NOT a global NTILE (that plans as a single-partition
    window): the band thresholds are one exact-percentile aggregate
    broadcast back over the per-user counts, so the heavy lift is two
    hash aggregates at any scale.  Ties go to the higher band (>=), which
    is deterministic without needing a user_id tiebreak; shares are
    half-up integer micro-units."""
    ev = register_views(spark, sf_dir)["events"]
    u = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    thr = u.agg(
        F.expr("percentile(CAST(n AS DOUBLE), 0.5)").alias("p50"),
        F.expr("percentile(CAST(n AS DOUBLE), 0.9)").alias("p90"),
    )
    tot = u.agg(F.sum("n").cast("bigint").alias("t"))
    cls = u.crossJoin(F.broadcast(thr)).select(
        F.when(F.col("n") >= F.col("p90"), "heavy")
        .when(F.col("n") >= F.col("p50"), "mid")
        .otherwise("light")
        .alias("band"),
        "n",
    )
    return (
        cls.crossJoin(F.broadcast(tot))
        .groupBy("band", "t")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n").cast("bigint").alias("n_events"),
            F.expr(
                f"CAST({half_up_div('sum(n)', 't', mul=1_000_000)} AS BIGINT)"
            ).alias("share_micro"),
        )
        .drop("t")
    )


@op(
    "event_markov_transition",
    oracle=f"""
WITH {EV_CTE},
t AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY tse, event_id) AS to_type
  FROM ev
),
c AS (
  SELECT from_type, to_type, count(*) AS n
  FROM t WHERE to_type IS NOT NULL GROUP BY from_type, to_type
),
tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS t FROM c GROUP BY from_type)
SELECT c.from_type, c.to_type, c.n,
       CAST({half_up_div('c.n', 't', mul=1_000_000, idiv='//')} AS BIGINT) AS prob_ppm
FROM c JOIN tot ON c.from_type = tot.from_type
""",
)
def event_markov_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types: for each
    (from → to) pair of consecutive same-user events, the transition
    count and its row-normalized probability — `event_bigrams` turned
    into the conditional-probability matrix that powers next-action
    prediction and journey simulation.

    One per-user lead window (partition-bounded), one aggregate on the
    ≤|types|² key, and the per-state normalizer joins back on the tiny
    from_type key.  Probabilities are half-up integer ppm so each
    matrix row sums to 1e6 within quantization."""
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("tse", "event_id")
    t = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = t.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("from_type").agg(F.sum("n").cast("bigint").alias("t"))
    return c.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.expr(
            f"CAST({half_up_div('n', 't', mul=1_000_000)} AS BIGINT)"
        ).alias("prob_ppm"),
    )


@op(
    "inter_event_gap_histogram",
    oracle=f"""
WITH {EV_CTE},
g AS (
  SELECT tse - lag(tse) OVER (PARTITION BY user_id
                              ORDER BY tse, event_id) AS gap
  FROM ev
)
SELECT CASE WHEN gap < 10 THEN 'a_lt10s'
            WHEN gap < 100 THEN 'b_lt100s'
            WHEN gap < 1000 THEN 'c_lt1ks'
            WHEN gap < 10000 THEN 'd_lt10ks'
            WHEN gap < 100000 THEN 'e_lt100ks'
            ELSE 'f_ge100ks' END AS bucket,
       count(*) AS n,
       CAST(min(gap) AS BIGINT) AS min_gap,
       CAST(max(gap) AS BIGINT) AS max_gap
FROM g WHERE gap IS NOT NULL GROUP BY 1
""",
)
def inter_event_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap histogram per user on decade buckets — the
    think-time distribution that picks the session gap
    ({SESSION_GAP_SEC}s here) empirically instead of by folklore, and the
    poll-interval sanity check on the TSDB side.

    One per-user lag window (partition-bounded), one aggregate on a
    6-value key.  Gaps are exact integer seconds and bucket edges are
    integer compares — nothing to drift."""
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("tse", "event_id")
    g = ev.select((F.col("tse") - F.lag("tse").over(w)).alias("gap")).filter(
        F.col("gap").isNotNull()
    )
    bucket = (
        F.when(F.col("gap") < 10, "a_lt10s")
        .when(F.col("gap") < 100, "b_lt100s")
        .when(F.col("gap") < 1000, "c_lt1ks")
        .when(F.col("gap") < 10000, "d_lt10ks")
        .when(F.col("gap") < 100000, "e_lt100ks")
        .otherwise("f_ge100ks")
    )
    return g.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("gap").cast("bigint").alias("min_gap"),
        F.max("gap").cast("bigint").alias("max_gap"),
    )


@op(
    "event_lift_matrix",
    oracle=f"""
WITH {EV_CTE},
b AS (SELECT DISTINCT user_id, tse // 86400 AS day, event_type FROM ev),
nb AS (SELECT count(*) AS n_baskets
       FROM (SELECT DISTINCT user_id, day FROM b)),
s AS (SELECT event_type, count(*) AS n_t FROM b GROUP BY event_type),
p AS (
  SELECT a.event_type AS type_a, b2.event_type AS type_b,
         count(*) AS n_ab
  FROM b a JOIN b b2 ON a.user_id = b2.user_id AND a.day = b2.day
                    AND a.event_type < b2.event_type
  GROUP BY a.event_type, b2.event_type
)
SELECT type_a, type_b, n_ab,
       round(n_ab * n_baskets * 1.0 / (sa.n_t * sb.n_t), 6) AS lift
FROM p
JOIN s sa ON sa.event_type = p.type_a
JOIN s sb ON sb.event_type = p.type_b
CROSS JOIN nb
""",
)
def event_lift_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association lift between event types over (user, day) baskets:
    lift(a,b) = P(a∧b) / (P(a)·P(b)) — >1 means the pair co-occurs
    beyond chance (the market-basket measure, here on behavioral
    sessions instead of orders; `event_markov_transition` is the
    ORDERED counterpart, this is the unordered one).  The ratio is
    integer-exact in the numerator (n_ab · n_baskets) and rounded to 6
    on both engines.

    Scale: baskets are the DISTINCT (user, day, type) aggregate; the
    pair join is equi on the (user, day) basket key, so its output is
    bounded by types²-per-basket, never corpus²; the per-type totals
    and the basket count broadcast onto the pair table (types² rows).
    One shuffle for the distinct, one for the pair count."""
    ev = _ev(spark, sf_dir)
    b = ev.select(
        "user_id",
        F.expr("tse div 86400").alias("day"),
        "event_type",
    ).distinct()
    nb = b.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    s = b.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a = b.alias("a")
    b2 = b.alias("b2")
    p = (
        a.join(
            b2,
            (F.col("a.user_id") == F.col("b2.user_id"))
            & (F.col("a.day") == F.col("b2.day"))
            & (F.col("a.event_type") < F.col("b2.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b2.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sa = F.broadcast(s).alias("sa")
    sb = F.broadcast(s).alias("sb")
    return (
        p.join(sa, F.col("type_a") == F.col("sa.event_type"))
        .join(sb, F.col("type_b") == F.col("sb.event_type"))
        .crossJoin(F.broadcast(nb))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(
                F.col("n_ab")
                * F.col("n_baskets")
                / (F.col("sa.n_t") * F.col("sb.n_t")),
                6,
            ).alias("lift"),
        )
    )
