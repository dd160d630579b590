#!/usr/bin/env python
"""Dump .explain("formatted") for the headline queries to plans/<round>/.

Usage: python scripts/dump_plans.py <suffix> [key ...]
Round dir from $SPARK_GRAFT_PLANS_ROUND (default r14).
Writes plans/<round>/<key>_<suffix>.txt for each headline key (or the given
keys).  Plan-only — nothing is executed, so it is safe to run while other
work shares the host.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esxsnmp_tsdb_spark import registry
from esxsnmp_tsdb_spark.session import get_session


def main() -> None:
    suffix = sys.argv[1]
    import bench

    keys = sys.argv[2:] or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("dump_plans")
    queries = registry.queries()
    for key in keys:
        df = queries[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{key}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print("wrote", key)


if __name__ == "__main__":
    main()
