"""Property tests for functions/exact.py — the shared half-up idiom.

Three properties, each on both engines (the builders emit plain SQL that
Spark and DuckDB must agree on, since one side feeds the value hash and
the other the oracle):

* half_up_div == round-half-up of mul*num/den for num >= 0;
* half_up_div_signed == round-half-away-from-zero for any sign;
* the documented overflow headroom bound holds: inputs inside the bound
  never wrap (checked at the BIGINT extreme), and the decimal_sum
  promotion keeps exactness where BIGINT would overflow.
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from esxsnmp_tsdb_spark.functions.exact import (
    decimal_sum,
    half_up_div,
    half_up_div_signed,
)


def _py_half_up(num: int, den: int, mul: int) -> int:
    """Reference: round(mul*num/den) half-away-from-zero, in exact
    rational arithmetic."""
    q = Fraction(mul * num, den)
    sign = -1 if q < 0 else 1
    return sign * int(abs(q) + Fraction(1, 2))


@given(
    num=st.integers(min_value=0, max_value=10**12),
    den=st.integers(min_value=1, max_value=10**9),
    mul=st.sampled_from([1, 100, 10**4, 10**6]),
)
@settings(max_examples=300, deadline=None)
def test_half_up_div_matches_reference_duckdb(num, den, mul):
    expr = half_up_div("n", "d", mul, idiv="//")
    (got,) = duckdb.sql(
        f"SELECT {expr} FROM (SELECT CAST({num} AS BIGINT) n, CAST({den} AS BIGINT) d)"
    ).fetchone()
    assert got == _py_half_up(num, den, mul)


@given(
    num=st.integers(min_value=-(10**12), max_value=10**12),
    den=st.integers(min_value=1, max_value=10**9),
    mul=st.sampled_from([1, 100, 10**4, 10**6]),
)
@settings(max_examples=300, deadline=None)
def test_half_up_div_signed_matches_reference_duckdb(num, den, mul):
    expr = half_up_div_signed("n", "d", mul, idiv="//")
    (got,) = duckdb.sql(
        f"SELECT {expr} FROM (SELECT CAST({num} AS BIGINT) n, CAST({den} AS BIGINT) d)"
    ).fetchone()
    assert got == _py_half_up(num, den, mul)


def test_engines_agree_on_ties_and_edges(spark):
    """The exact cells where a double-path round() would flip: .5 ties at
    every grid, both signs, degenerate den=1, and the BIGINT headroom
    extreme 2*mul*num + den < 2^63."""
    mul = 10**6
    bound_num = (2**63 - 10**9) // (2 * mul)  # documented headroom bound
    cases = [
        (1, 2, 1),  # 0.5 -> 1
        (-1, 2, 1),  # -0.5 -> -1 (away from zero)
        (3, 2, 1),  # 1.5 -> 2
        (5, 4, 100),  # 125.0 tie-free sanity
        (1, 8, 10**4),  # 1250.0
        (125, 1000, 100),  # 12.5 -> 13
        (-125, 1000, 100),  # -12.5 -> -13
        (7, 1, 10**6),
        (bound_num, 10**9, mul),  # at the headroom edge: no wrap
    ]
    for n, d, m in cases:
        e_duck = half_up_div_signed("n", "d", m, idiv="//")
        e = half_up_div_signed("n", "d", m)
        (dd,) = duckdb.sql(
            f"SELECT {e_duck} FROM (SELECT CAST({n} AS BIGINT) n, CAST({d} AS BIGINT) d)"
        ).fetchone()
        (ss,) = (
            spark.sql(
                f"SELECT {e} AS v FROM (SELECT CAST({n} AS BIGINT) n, CAST({d} AS BIGINT) d)"
            )
            .collect()[0]
        )
        want = _py_half_up(n, d, m)
        assert dd == ss == want, (n, d, m, dd, ss, want)
        assert want >= 0 or n < 0  # sanity: no silent wrap at the edge


def test_decimal_sum_exceeds_bigint_headroom(spark):
    """Where a BIGINT sum would overflow (1e5 rows of ~1e14), the decimal
    promotion stays exact and both engines agree with Python int math."""
    n, v = 100_000, 10**14
    want = n * v
    expr = decimal_sum("v")
    (dd,) = duckdb.sql(
        f"SELECT {expr} FROM (SELECT CAST({v} AS BIGINT) v FROM range({n}))"
    ).fetchone()
    (ss,) = spark.sql(
        f"SELECT {expr} AS s FROM (SELECT CAST({v} AS BIGINT) v FROM range({n}))"
    ).collect()[0]
    assert int(dd) == int(ss) == want


def test_half_up_over_big_sums_composes(spark):
    """The promoted-sum + half-up composition (the ts_capacity_forecast
    pattern): round(sum/n) on sums past BIGINT range — Spark promotes via
    decimal_sum, the DuckDB oracle side rides its native HUGEINT sum
    (decimal_sum's docstring rule).  Exercise a genuine .5 remainder too:
    sum = n*v + n/2 → round half-up = v+1 on both engines."""
    n, v = 10_000, 10**15 + 7
    # exact case (remainder 0)
    q_spark = (
        f"SELECT CAST({half_up_div(decimal_sum('v'), str(n), 1)} AS BIGINT) AS r "
        f"FROM (SELECT CAST({v} AS BIGINT) v FROM range({n}))"
    )
    q_duck = (
        f"SELECT CAST({half_up_div('sum(v)', str(n), 1, idiv='//')} AS BIGINT) AS r "
        f"FROM (SELECT CAST({v} AS BIGINT) v FROM range({n}))"
    )
    (dd,) = duckdb.sql(q_duck).fetchone()
    (ss,) = spark.sql(q_spark).collect()[0]
    assert dd == ss == v
    # .5-remainder case: add 1 to half the rows -> sum = n*v + n/2
    q_spark_tie = (
        f"SELECT CAST({half_up_div(decimal_sum('v'), str(n), 1)} AS BIGINT) AS r "
        f"FROM (SELECT CAST({v} AS BIGINT) + CAST(id % 2 AS BIGINT) AS v "
        f"FROM range({n}))"
    )
    q_duck_tie = (
        f"SELECT CAST({half_up_div('sum(v)', str(n), 1, idiv='//')} AS BIGINT) AS r "
        f"FROM (SELECT CAST({v} AS BIGINT) + CAST(range % 2 AS BIGINT) AS v "
        f"FROM range({n}))"
    )
    (ddt,) = duckdb.sql(q_duck_tie).fetchone()
    (sst,) = spark.sql(q_spark_tie).collect()[0]
    assert ddt == sst == v + 1


def test_duckdb_decimal_floordiv_hazard_is_real(spark):
    """Documents WHY decimal_sum must not be mirrored into oracles: DuckDB
    ``//`` on DECIMAL rounds the quotient before flooring, so the half-up
    numerator trick lands one high at exact .5 remainders.  If DuckDB
    ever fixes this, this test fails and the docstring rule can relax."""
    n, v = 10_000, 10**15 + 7
    q = (
        f"SELECT CAST({half_up_div(decimal_sum('v'), str(n), 1, idiv='//')} AS BIGINT) "
        f"FROM (SELECT CAST({v} AS BIGINT) v FROM range({n}))"
    )
    (got,) = duckdb.sql(q).fetchone()
    assert got == v + 1  # off-by-one: the hazard the rule guards against
