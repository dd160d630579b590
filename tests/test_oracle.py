"""Oracle parity: every registered op with an oracle must match DuckDB at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from esxsnmp_tsdb_spark import registry
from tests.conftest import SF_ORACLE
from tests.oracle_harness import duck_connection, run_op

registry.load_all()
KEYS = sorted(k for k in registry.QUERIES if k in registry.ORACLE)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("key", KEYS)
def test_oracle_parity(spark, duck, key):
    problems = run_op(
        spark, duck, registry.QUERIES[key], registry.ORACLE[key], SF_ORACLE, key
    )
    assert not problems, "\n".join(problems)


def test_all_queries_have_entry_or_rows_check(spark):
    # Ops without an oracle must at least run and return a DataFrame.
    for key, fn in registry.QUERIES.items():
        if key not in registry.ORACLE:
            df = fn(spark, SF_ORACLE)
            assert df.columns, f"{key} returned no columns"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
