"""Events analytics, batch 3 (EXT): SCD2 dimension-history build and
linear (multi-touch) attribution — the warehouse-history and marketing-
credit patterns next to ``events2``'s last-touch/DAU reports.

Determinism: validity ranges are integer epoch-days (no raw timestamps
in output, per the house rule); attribution credit is value/n_touches
with the division deferred until after integer counts, and the final
per-channel sums round at 6 on both sides.

Scale posture: SCD2 is one lead() window per business key — the history
build rides a single shuffle on the key; linear attribution is one
range self-join per purchase bounded by the lookback window, then a
channel rollup of the (tiny) credited set."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esxsnmp_tsdb_spark.operators.events2 import _EV_CTE, _ev
from esxsnmp_tsdb_spark.registry import op
from esxsnmp_tsdb_spark.sources import register_views

LOOKBACK = 86400  # attribution window: touches within 1 day before purchase


@op(
    "scd2_history_build",
    oracle="""
WITH src AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS day
  FROM orders
),
v AS (
  SELECT o_custkey AS custkey, o_orderkey AS orderkey,
         round(o_totalprice, 2) AS totalprice, day AS valid_from,
         lead(day) OVER (PARTITION BY o_custkey
                         ORDER BY day, o_orderkey) - 1 AS valid_to,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY day, o_orderkey) AS version
  FROM src
)
SELECT custkey, orderkey, totalprice, valid_from,
       valid_to, valid_to IS NULL AS is_current, version
FROM v
""",
)
def scd2_history_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an event-style
    source: each change becomes a version row with [valid_from,
    valid_to] epoch-day bounds, open-ended (and flagged current) on the
    latest version — built with one lead() window per business key.

    This is THE warehouse history-build: at 100 TB it is one shuffle on
    the key and a linear window pass, with no self-join against the
    existing history (append + rebuild-partition beats merge-per-row at
    scale)."""
    orders = register_views(spark, sf_dir)["orders"]
    day = (F.unix_timestamp("o_orderdate") / 86400).cast("bigint")
    src = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round("o_totalprice", 2).alias("totalprice"),
        day.alias("valid_from"),
    )
    w = Window.partitionBy("custkey").orderBy("valid_from", "orderkey")
    v = src.select(
        "custkey",
        "orderkey",
        "totalprice",
        "valid_from",
        (F.lead("valid_from").over(w) - 1).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
    )
    return v.select(
        "custkey",
        "orderkey",
        "totalprice",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        "version",
    )


@op(
    "attribution_linear",
    oracle=f"""
WITH {_EV_CTE},
purchases AS (
  SELECT user_id, tse AS ptse, event_id AS pid, value
  FROM ev WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id, event_type, tse, event_id
  FROM ev WHERE event_type <> 'purchase'
),
credited AS (
  SELECT p.pid, p.value, t.event_type,
         count(*) OVER (PARTITION BY p.pid) AS n_touches
  FROM purchases p JOIN touches t
    ON t.user_id = p.user_id
   AND t.tse >= p.ptse - {LOOKBACK} AND t.tse < p.ptse
)
SELECT event_type AS channel,
       count(DISTINCT pid) AS n_purchases,
       round(sum(value / n_touches), 6) AS credited_value
FROM credited GROUP BY event_type
""",
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every touch in the day before a
    purchase shares the purchase value equally — the fairness-spread
    counterpart to `attribution_last_touch`'s winner-takes-all.

    One bounded range self-join (purchase × its ≤1-day touch window,
    co-partitioned on user) and a per-purchase count window over the
    already-joined subset; the corpus-wide rollup then touches only
    credited rows.  The division happens once per credited row from an
    exact integer count, and the channel sums round at 6 on both
    sides."""
    ev = _ev(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("tse").alias("ptse"),
        F.col("event_id").alias("pid"),
        "value",
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("event_type").alias("channel"), "tse"
    )
    joined = p.join(
        t,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("tse") >= F.col("ptse") - LOOKBACK)
        & (F.col("tse") < F.col("ptse")),
    )
    credited = joined.withColumn(
        "n_touches", F.count(F.lit(1)).over(Window.partitionBy("pid"))
    )
    return credited.groupBy("channel").agg(
        F.countDistinct("pid").alias("n_purchases"),
        F.round(F.sum(F.col("value") / F.col("n_touches")), 6).alias(
            "credited_value"
        ),
    )


HALFLIFE = 21600  # time-decay half-life: 6h -> 4 dyadic steps in the window


@op(
    "attribution_time_decay",
    oracle=f"""
WITH {_EV_CTE},
purchases AS (
  SELECT user_id, tse AS ptse, event_id AS pid, value
  FROM ev WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id, event_type, tse, event_id
  FROM ev WHERE event_type <> 'purchase'
),
weighted AS (  -- dyadic integer weight: w = 2^(steps_remaining)
  SELECT p.pid, p.value, t.event_type,
         CAST(1 AS BIGINT)
           << CAST(({LOOKBACK} // {HALFLIFE} - 1)
                   - (p.ptse - t.tse - 1) // {HALFLIFE} AS INT) AS w
  FROM purchases p JOIN touches t
    ON t.user_id = p.user_id
   AND t.tse >= p.ptse - {LOOKBACK} AND t.tse < p.ptse
),
sw AS (
  SELECT *, CAST(sum(w) OVER (PARTITION BY pid) AS BIGINT) AS w_total
  FROM weighted
)
SELECT event_type AS channel,
       count(DISTINCT pid) AS n_purchases,
       CAST(sum(w) AS BIGINT) AS weight_sum,
       round(sum(value * w / w_total), 6) AS credited_value
FROM sw GROUP BY event_type
""",
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution: a touch's credit halves every
    HALFLIFE before the purchase — recency-weighted, completing the
    attribution family (last-touch winner / linear equal / decay).

    Determinism: weights are EXACT dyadic integers (1 << steps_remaining
    via integer floor-division of the age — never pow() on doubles,
    whose last-ulp differs between libm and the JVM), the per-purchase
    normalizer is an integer window sum, and only the final credit
    division touches floats, rounded at 6 on both sides.  Same bounded
    range self-join + per-purchase window shape as
    `attribution_linear`."""
    ev = _ev(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("tse").alias("ptse"),
        F.col("event_id").alias("pid"),
        "value",
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("event_type").alias("channel"), "tse"
    )
    steps = LOOKBACK // HALFLIFE - 1
    joined = p.join(
        t,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("tse") >= F.col("ptse") - LOOKBACK)
        & (F.col("tse") < F.col("ptse")),
    ).withColumn(
        "w",
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST({steps} - (ptse - tse - 1) div {HALFLIFE} AS INT))"
        ),
    )
    sw = joined.withColumn(
        "w_total", F.sum("w").over(Window.partitionBy("pid"))
    )
    return sw.groupBy("channel").agg(
        F.countDistinct("pid").alias("n_purchases"),
        F.sum("w").cast("bigint").alias("weight_sum"),
        F.round(
            F.sum(F.col("value") * F.col("w") / F.col("w_total")), 6
        ).alias("credited_value"),
    )


@op(
    "scd2_point_in_time_join",
    oracle=f"""
WITH {_EV_CTE},
e AS (
  SELECT user_id, tse, event_id, event_type, tse // 86400 AS day FROM ev
),
vd AS (
  SELECT user_id, day,
         arg_min(event_type, tse * 10000000 + event_id) AS first_type
  FROM e GROUP BY user_id, day
),
dim AS (
  SELECT user_id, day AS valid_from,
         lead(day) OVER (PARTITION BY user_id ORDER BY day) - 1
           AS valid_to,
         row_number() OVER (PARTITION BY user_id ORDER BY day) AS version,
         first_type
  FROM vd
),
j AS (
  SELECT d.user_id, d.version, d.valid_from, d.valid_to, d.first_type
  FROM e JOIN dim d ON d.user_id = e.user_id
     AND e.day >= d.valid_from
     AND (d.valid_to IS NULL OR e.day <= d.valid_to)
)
SELECT user_id, version, valid_from, valid_to, first_type,
       count(*) AS n_events
FROM j GROUP BY user_id, version, valid_from, valid_to, first_type
""",
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) join against a type-2 dimension: facts land
    on the version whose [valid_from, valid_to] window contains the
    fact's event day — the query EVERY warehouse with an SCD2 dimension
    (`scd2_history_build`) runs daily, and the one that silently
    corrupts when someone joins on the key alone and double-counts
    across versions.  The dimension here is each user's activity-day
    version history (attribute = that day's first event type, chosen by
    the composite tse·10⁷+event_id key so both engines pick the same
    row); every fact matches EXACTLY one version by construction, which
    the row counts prove.

    Scale: the join is equi on the business key with the validity
    window as a residual range predicate — per-key fan-out is bounded
    by that key's version count, never |facts|×|versions|.  At 100 TB
    both sides bucket by the key (`storage_bucketed_join` layout) and
    the PIT join runs shuffle-free inside buckets."""
    ev = _ev(spark, sf_dir).withColumn("day", F.expr("tse div 86400"))
    vd = ev.groupBy("user_id", "day").agg(
        F.min_by(
            "event_type", F.col("tse") * 10000000 + F.col("event_id")
        ).alias("first_type")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    dim = vd.select(
        "user_id",
        F.col("day").alias("valid_from"),
        (F.lead("day").over(w) - 1).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
        "first_type",
    )
    d = dim.alias("d")
    e = ev.alias("e")
    j = e.join(
        d,
        (F.col("e.user_id") == F.col("d.user_id"))
        & (F.col("e.day") >= F.col("d.valid_from"))
        & (
            F.col("d.valid_to").isNull()
            | (F.col("e.day") <= F.col("d.valid_to"))
        ),
    )
    return j.groupBy(
        F.col("d.user_id").alias("user_id"),
        "version",
        "valid_from",
        "valid_to",
        "first_type",
    ).agg(F.count(F.lit(1)).alias("n_events"))
