"""Event-log analytics, batch 2 (EXT): marketing-style last-touch
attribution, active-user curves (DAU/WAU/MAU), and signup→purchase
conversion timing.

Same determinism discipline as ``events_analytics.py``: the time axis is
floor-epoch seconds (``unix_timestamp`` ≡ ``floor(epoch(ts))``) with
``event_id`` as the total-order tiebreak, so both engines sequence
same-second events identically; every reported float is rounded on both
sides.

Scale posture:

* ``attribution_last_touch`` is one running IGNORE-NULLS window per
  user (state = a single carried value) — one shuffle on ``user_id``,
  then a per-channel rollup of the already-tiny purchase subset.
* ``dau_wau_mau`` reduces raw events to distinct (user, day) FIRST —
  at 100 TB that's the difference between shuffling every event and
  shuffling one short row per user-day.  The trailing windows then
  expand each user-day into the ≤30 future days it keeps the user
  active in (JVM-side ``sequence``+``explode``) and re-distinct — the
  blowup happens on the reduced set, never on raw events, and is the
  standard exact formulation (a HLL-sketch variant would trade
  exactness for one less shuffle; ``approx_distinct`` shows that path).
* ``funnel_time_to_convert`` is the event_funnel windowing pattern
  (unordered per-user min-windows, ONE exchange) plus a per-cohort
  rollup that rides the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esxsnmp_tsdb_spark.registry import op
from esxsnmp_tsdb_spark.sources import register_views

DAY = 86400

# DuckDB twin of the floor-epoch event projection (keep in lockstep with
# _ev below — same contract as events_analytics._ev).
_EV_CTE = """ev AS (
  SELECT user_id, event_type, event_id, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS tse
  FROM events
)"""


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return register_views(spark, sf_dir)["events"].select(
        "user_id",
        "event_type",
        "event_id",
        "value",
        F.unix_timestamp("ts").alias("tse"),
    )


@op(
    "attribution_last_touch",
    oracle=f"""
WITH {_EV_CTE},
tagged AS (
  SELECT user_id, event_type, tse, event_id, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY tse, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS channel
  FROM ev
)
SELECT coalesce(channel, 'unattributed') AS channel,
       count(*) AS n_purchases,
       round(sum(value), 4) AS attributed_value
FROM tagged WHERE event_type = 'purchase'
GROUP BY 1
""",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: credit each purchase to the user's most
    recent preceding non-purchase event (view/click/signup/error), or
    'unattributed' if the purchase is the user's first event — the
    standard marketing attribution census, per channel with summed
    purchase value.

    The carried channel is a running IGNORE-NULLS ``last`` over
    (tse, event_id) — O(1) state per user, one shuffle on ``user_id``.
    The frame ends at 1 PRECEDING so a purchase never attributes to
    itself even when another event shares its second.  The per-channel
    rollup sees only purchase rows (~20% of events) and 5 distinct
    keys, so the second exchange is negligible."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("tse", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = _ev(spark, sf_dir).withColumn(
        "channel",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("unattributed")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("attributed_value"),
        )
    )


@op(
    "dau_wau_mau",
    oracle=f"""
WITH {_EV_CTE},
ud AS (SELECT DISTINCT user_id, tse // {DAY} AS day FROM ev),
spine AS (SELECT DISTINCT day FROM ud),
dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
wau AS (
  SELECT s.day, count(DISTINCT ud.user_id) AS wau
  FROM spine s JOIN ud ON ud.day BETWEEN s.day - 6 AND s.day
  GROUP BY s.day
),
mau AS (
  SELECT s.day, count(DISTINCT ud.user_id) AS mau
  FROM spine s JOIN ud ON ud.day BETWEEN s.day - 29 AND s.day
  GROUP BY s.day
)
SELECT dau.day, dau.dau, wau.wau, mau.mau
FROM dau JOIN wau ON dau.day = wau.day JOIN mau ON dau.day = mau.day
""",
)
def dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily / weekly / monthly active users per epoch-day — the
    top-line engagement curve (WAU = distinct users active in the
    trailing 7 days, MAU trailing 30).

    Raw events reduce to distinct (user, day) in the FIRST shuffle —
    everything after runs on that drastically smaller set.  The
    trailing counts come from expanding each user-day into the days it
    covers (``sequence``+``explode``, JVM-side, ×7/×30 on the reduced
    set) and re-distincting, which is the exact, skew-free equivalent
    of a windowed COUNT DISTINCT (Spark has no such window, and the
    expansion shuffles short integer rows only).  The oracle states the
    same thing as a range join against the day spine.  Days outside the
    observed spine are clipped with a broadcast semi-join."""
    ud = (
        _ev(spark, sf_dir)
        .select("user_id", (F.col("tse") / DAY).cast("bigint").alias("day"))
        .distinct()
    )
    spine = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))

    def trailing(n: int, name: str) -> DataFrame:
        covered = ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + (n - 1))
            ).alias("day"),
        ).distinct()
        return (
            covered.join(F.broadcast(spine), "day", "left_semi")
            .groupBy("day")
            .agg(F.count(F.lit(1)).alias(name))
        )

    return (
        dau.join(trailing(7, "wau"), "day")
        .join(trailing(30, "mau"), "day")
        .select("day", "dau", "wau", "mau")
    )


@op(
    "funnel_time_to_convert",
    oracle=f"""
WITH {_EV_CTE},
s AS (
  SELECT user_id, min(tse) AS t_signup
  FROM ev WHERE event_type = 'signup' GROUP BY user_id
),
b AS (
  SELECT e.user_id, s.t_signup, min(e.tse) AS t_buy
  FROM ev e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.tse > s.t_signup
  GROUP BY e.user_id, s.t_signup
),
j AS (
  SELECT s.user_id, s.t_signup // {DAY} AS cohort_day,
         b.t_buy - s.t_signup AS delta
  FROM s LEFT JOIN b ON s.user_id = b.user_id
)
SELECT cohort_day,
       count(*) AS n_signups,
       count(delta) AS n_converted,
       round(count(delta) * 1.0 / count(*), 6) AS conv_ratio,
       round(avg(delta), 4) AS avg_sec_to_convert,
       round(quantile_cont(CAST(delta AS DOUBLE), 0.5), 4)
         AS median_sec_to_convert
FROM j GROUP BY cohort_day
""",
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion timing per signup cohort day: how many
    signups convert at all, and the mean/median seconds from first
    signup to first subsequent purchase.

    Both "first signup" and "first purchase after it" are per-user min
    aggregates on the same ``user_id`` key, so the whole per-user phase
    is one shuffle reused across both aggregates and the join; the
    cohort rollup then shuffles one short row per signup user.  Median
    is exact linear-interpolation percentile (Spark ``percentile`` ≡
    DuckDB ``quantile_cont`` on DOUBLE — the ts_billing_p95 precedent),
    rounded on both sides."""
    ev = _ev(spark, sf_dir)
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("tse").alias("t_signup"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("tse") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("tse").alias("t_buy"))
    )
    j = s.join(b, "user_id", "left").select(
        "user_id",
        (F.col("t_signup") / DAY).cast("bigint").alias("cohort_day"),
        (F.col("t_buy") - F.col("t_signup")).alias("delta"),
    )
    return j.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_signups"),
        F.count("delta").alias("n_converted"),
        F.round(F.count("delta") / F.count(F.lit(1)), 6).alias("conv_ratio"),
        F.round(F.avg("delta"), 4).alias("avg_sec_to_convert"),
        F.round(F.expr("percentile(CAST(delta AS DOUBLE), 0.5)"), 4).alias(
            "median_sec_to_convert"
        ),
    )
