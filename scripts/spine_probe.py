#!/usr/bin/env python
"""Pin `ts_time_spine`'s broadcast-degradation claim with measurements.

At fixture scale AQE broadcasts the exploded dense grid into the
left-outer spine join (docs/SHUFFLE_r09.json recorded 16.9 MB).  The
helper's docstring promises size-based degradation to the co-partitioned
(path, slot) shuffle join once the series axis outgrows the broadcast
threshold — this probe turns that prose into an artifact: replicate
`events` 10×/100× along the SERIES axis (scaling_probe.build_scaled_dir —
more paths, same window, the 100 TB growth direction), execute the op at
each scale, and record

  - the join strategy actually chosen (BroadcastHashJoin vs
    SortMergeJoin, read from the final adaptive plan),
  - broadcast bytes / shuffle bytes / exchange counts (shuffle_audit
    SQLMetrics extraction),
  - warm wall time,

so the expected story — broadcast at 1×, flip to shuffle join with
~linear wire volume by 10×/100×, no exchange-count blow-up — is measured,
not asserted.

    python scripts/spine_probe.py                # factors 10 and 100
    python scripts/spine_probe.py --factors 10

One JSON line to stdout; the round commits it as docs/SPINE_r{N}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esxsnmp_tsdb_spark import registry
from esxsnmp_tsdb_spark.session import get_session
from scripts.scaling_probe import BASE_SF, build_scaled_dir
from scripts.shuffle_audit import audit


def _join_strategy(df) -> str:
    """Name of the spine join in the FINAL adaptive plan (AQE may replan
    the static SortMergeJoin into a broadcast at runtime, so the static
    explain string is not evidence)."""
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    found = [
        name
        for name in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
        if name in plan
    ]
    return "+".join(found) if found else "none"


def probe(spark, sf_dir: str, key: str = "ts_time_spine") -> dict:
    fn = registry.QUERIES[key]
    strategy = _join_strategy(fn(spark, sf_dir))
    t0 = time.time()
    stats = audit(fn(spark, sf_dir))  # executes JVM-side, warm
    stats["warm_sec"] = round(time.time() - t0, 3)
    stats["join"] = strategy
    return stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="10,100")
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",") if f]

    registry.load_all()
    spark = get_session("spine_probe")
    out = {"op": "ts_time_spine", "base_sf": BASE_SF, "scales": {}}
    out["scales"]["1x"] = probe(spark, BASE_SF)
    for f in factors:
        scaled = build_scaled_dir(spark, f)
        out["scales"][f"{f}x"] = probe(spark, scaled)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
