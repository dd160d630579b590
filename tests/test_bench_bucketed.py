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
    import numpy as np
    from pandas.api.types import is_float_dtype

    flat = registry.QUERIES[key](spark, SF).toPandas()
    bkt = bucketed_variant(spark, SF, key).toPandas()
    cols = sorted(flat.columns)
    assert cols == sorted(bkt.columns)
    # sort on ALL columns (keys first): where key columns repeat
    # (ts_bin_split has several deltas per (path, bucket)) the float
    # sort aligns near-equal rows.  Floats sort on a 5-decimal ROUNDED
    # key (coarser than the 2e-6 comparison atol, ADVICE r9): raw-float
    # sorting could swap two rows that near-tie on an EARLIER float
    # column but differ on a later one — the swap is tolerance-bounded
    # only on the column sorted on, so the later column would fail
    # spuriously.  Rounding collapses near-ties to equal sort keys in
    # both frames; rows still distinct after rounding differ by more
    # than the atol and sort identically.
    keys = [c for c in cols if not is_float_dtype(flat[c])]
    floats = [c for c in cols if c not in keys]

    def sortable(df):
        out = df.reindex(cols, axis=1).copy()
        for c in floats:
            out[f"__sk_{c}"] = out[c].round(5)
        return (
            out.sort_values(keys + [f"__sk_{c}" for c in floats])
            .drop(columns=[f"__sk_{c}" for c in floats])
            .reset_index(drop=True)
        )

    a = sortable(flat)
    b = sortable(bkt)
    assert len(a) == len(b), key
    for c in cols:
        if is_float_dtype(flat[c]):
            assert np.allclose(
                a[c].to_numpy(dtype=float),
                b[c].to_numpy(dtype=float),
                rtol=0,
                atol=2e-6,
                equal_nan=True,
            ), f"{key}.{c}: bucketed variant drifted beyond rounding"
        else:
            assert a[c].astype(str).equals(b[c].astype(str)), (
                f"{key}.{c}: bucketed variant drifted from the registered op"
            )


@pytest.mark.parametrize("key", sorted(OBS_PARAMETRIC))
def test_variant_plans_zero_exchanges(spark, key):
    plan = plan_str(bucketed_variant(spark, SF, key), "simple")
    assert plan.count("Exchange") == 0, plan
