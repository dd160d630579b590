"""Shared constants + the DuckDB-side obs mapping.

The Spark engine and the DuckDB oracle must derive the identical obs layout
from the `events` fixture (see ``functions.tsdb.obs_from_events``).  The CTE
below is the oracle twin of that function — keep the two in lockstep.

Integer-counter discipline: synthetic counters are built from
``CAST(floor(value*100) AS BIGINT)`` — floor (not cast) because Spark's
double→bigint cast truncates while DuckDB's rounds; floor agrees everywhere
and keeps counter math exact (no float accumulation).
"""

from __future__ import annotations

# Slot / consolidation parameters (reference: per-var STEP/HEARTBEAT metadata †).
STEP = 300  # base slot width, seconds
BUCKET = 3600  # consolidation bucket (1h aggregate level)
FINE = 300  # fine aggregate level for the cascade (5m)
HEARTBEAT = 900  # max gap before rates are invalid
SYNTH_WRAP = 100_000  # synthetic counter modulus (fixture-scale Counter32 stand-in)

# Fixture time window (events spans 2024-01-01 .. 2024-01-30 UTC).
T_JAN01 = 1704067200
T_JAN10 = 1704844800
T_JAN11 = 1704931200
T_JAN15_NOON = 1705320000
T_JAN20 = 1705708800
T_FEB01 = 1706745600

# DuckDB twin of functions.tsdb.obs_from_events (keep in lockstep!).
OBS_CTE = """obs AS (
  SELECT concat_ws('/', user_id, event_type) AS path,
         CAST(floor(epoch(ts)) AS BIGINT) AS tse,
         CAST(value AS DOUBLE) AS value,
         CASE WHEN event_id % 10 = 0 THEN 0 ELSE 1 END AS flags,
         event_id
  FROM events
)"""

# DuckDB twin of the synthetic monotonic counter (cumulative sum of
# integer-scaled gauge readings, per series in ingest order).
CNT_CTE = f"""cnt AS (
  SELECT path, tse, event_id,
         SUM(CAST(floor(value * 100) AS BIGINT)) OVER (
           PARTITION BY path ORDER BY tse, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS counter
  FROM obs
)"""
