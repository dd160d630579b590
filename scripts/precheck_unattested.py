#!/usr/bin/env python
"""Pre-run the driver's exact sf0.01 oracle comparison and write the
results to ``docs/PARITY_PRECHECK.json``.

Default scope: every op no CORRECTNESS_r*.json has attested yet (freshly
added operators waiting for an official row).  ``--window N`` scopes to
the FIRST N keys of ``registry.queries()`` order instead — the exact set
the driver's next CORRECTNESS window will hash, so a round can pre-verify
its re-attestation queue + stalest-cohort rotation before the driver runs:

    python scripts/precheck_unattested.py --window 50

The driver attests only 50 ops per round, so freshly-added operators wait
one or two rounds for an official row.  This script closes the evidence
gap in the meantime: it runs the IDENTICAL comparison (row count + column
set + dtype + order-insensitive value hash vs the DuckDB oracle,
``tests/oracle_harness.run_op``) at the driver's sf=0.01 for exactly the
not-yet-attested keys, so a reviewer can re-run one command instead of
hand-replicating the harness:

    python scripts/precheck_unattested.py
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.environ.get(
    "SPARK_GRAFT_PRECHECK_OUT", os.path.join(ROOT, "docs", "PARITY_PRECHECK.json")
)


def main() -> int:
    import argparse

    from esxsnmp_tsdb_spark import registry
    from esxsnmp_tsdb_spark.session import get_session
    from tests.oracle_harness import duck_connection, run_op

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--window",
        type=int,
        default=None,
        metavar="N",
        help="scope to the FIRST N keys of registry.queries() (the exact "
        "set the driver's next CORRECTNESS window hashes) instead of the "
        "not-yet-attested set",
    )
    args = ap.parse_args()

    registry.load_all()
    if args.window is not None:
        todo = list(registry.queries())[: args.window]
        print(f"driver-window head: {len(todo)} ops; sf_dir={SF_DIR}")
    else:
        todo = [k for k in registry.QUERIES if k not in registry._ATTESTED]
        print(f"{len(todo)} not-yet-attested ops; sf_dir={SF_DIR}")

    spark = get_session("precheck")
    spark.sparkContext.setLogLevel("ERROR")
    duck = duck_connection(SF_DIR)

    results: dict[str, dict] = {}
    n_pass = n_rows_only = n_fail = 0
    for k in (todo if args.window is not None else sorted(todo)):
        fn = registry.QUERIES[k]
        try:
            if k in registry.ORACLE:
                problems = run_op(spark, duck, fn, registry.ORACLE[k], SF_DIR, k)
                ok = not problems
                results[k] = {
                    "mode": "oracle",
                    "pass": ok,
                    "problems": problems or None,
                }
                n_pass += ok
                n_fail += not ok
            else:
                n = fn(spark, SF_DIR).count()
                results[k] = {"mode": "rows_only", "pass": True, "rows": n}
                n_rows_only += 1
        except Exception as e:  # record, keep sweeping
            results[k] = {
                "mode": "error",
                "pass": False,
                "problems": f"{type(e).__name__}: {e}"[:300],
            }
            n_fail += 1
        print(f"  {k}: {'OK' if results[k]['pass'] else 'FAIL'}")

    doc = {
        "sf_dir": SF_DIR,
        "n_ops": len(todo),
        "n_oracle_pass": n_pass,
        "n_rows_only": n_rows_only,
        "n_fail": n_fail,
        "results": results,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}: {n_pass} oracle-pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
