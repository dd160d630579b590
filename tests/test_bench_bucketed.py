"""The bucketed-vs-flat bench variants (operators/bench_bucketed.py) are
trustworthy only if (1) each variant computes EXACTLY its registered op —
same values, not just same shape — and (2) the bucketed layout actually
removes every exchange.  Both are pinned here at sf0.001 so a drifted
mirror or a layout regression fails CI instead of silently mis-labelling
the per-round bench numbers."""

import pytest

from esxsnmp_tsdb_spark import registry
from esxsnmp_tsdb_spark.operators.bench_bucketed import (
    OBS_PARAMETRIC,
    bucketed_variant,
)
from esxsnmp_tsdb_spark.plans import plan_str
from esxsnmp_tsdb_spark.session import get_session

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    registry.load_all()
    return get_session()


@pytest.mark.parametrize("key", sorted(OBS_PARAMETRIC))
def test_variant_matches_registered_op(spark, key):
    flat = registry.QUERIES[key](spark, SF).toPandas()
    bkt = bucketed_variant(spark, SF, key).toPandas()
    cols = sorted(flat.columns)
    assert cols == sorted(bkt.columns)
    a = flat.reindex(cols, axis=1).astype(str).sort_values(cols).reset_index(drop=True)
    b = bkt.reindex(cols, axis=1).astype(str).sort_values(cols).reset_index(drop=True)
    assert a.equals(b), f"{key}: bucketed variant drifted from the registered op"


@pytest.mark.parametrize("key", sorted(OBS_PARAMETRIC))
def test_variant_plans_zero_exchanges(spark, key):
    plan = plan_str(bucketed_variant(spark, SF, key), "simple")
    assert plan.count("Exchange") == 0, plan
