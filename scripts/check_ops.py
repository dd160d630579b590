#!/usr/bin/env python
"""Ad-hoc oracle check for a list of op keys (or a key prefix).

    python scripts/check_ops.py [--sf DIR] key1 key2 ...
    python scripts/check_ops.py --prefix ts_ --sf /root/testdata/sf0.01

Runs the registered Spark query and DuckDB oracle side by side through
tests/oracle_harness.py's driver-equivalent compare and prints pass/fail
per key.  Exits nonzero on any failure.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf = "/root/testdata/sf0.001"
    keys: list[str] = []
    prefix = None
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf = next(it)
        elif a == "--prefix":
            prefix = next(it)
        else:
            keys.append(a)

    from esxsnmp_tsdb_spark import registry
    from esxsnmp_tsdb_spark.session import get_session
    from tests.oracle_harness import duck_connection, run_op

    registry.load_all()
    if prefix:
        keys += [k for k in registry.QUERIES if k.startswith(prefix)]
    spark = get_session()
    con = duck_connection(sf)
    failures = 0
    for key in keys:
        fn = registry.QUERIES[key]
        if key not in registry.ORACLE:
            n = fn(spark, sf).count()
            print(f"{key}: rows-only, {n} rows")
            continue
        try:
            problems = run_op(spark, con, fn, registry.ORACLE[key], sf, key)
        except Exception as exc:  # noqa: BLE001 — report and continue
            problems = [f"{key}: EXCEPTION {type(exc).__name__}: {exc}"]
        if problems:
            failures += 1
            for p in problems:
                print("FAIL", p)
        else:
            n = fn(spark, sf).count()
            print(f"PASS {key} ({n} rows)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
