"""Semantic invariants for the curation + analytics modules (SURVEY.md
§5.2) — properties the DuckDB oracle can't express (determinism across
runs, bounds, monotonicity), checked on the smoke fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from esxsnmp_tsdb_spark import registry
from tests.conftest import SF_SMOKE

registry.load_all()
Q = registry.QUERIES


def test_split_is_exhaustive_and_deterministic(spark):
    rows = {r.split: r for r in Q["split_train_test"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"train", "val", "test"}
    assert abs(sum(r.share for r in rows.values()) - 1.0) < 1e-6
    # hash-based, so a second run returns the identical assignment
    again = {r.split: r for r in Q["split_train_test"](spark, SF_SMOKE).collect()}
    assert {k: v.n_docs for k, v in rows.items()} == {
        k: v.n_docs for k, v in again.items()
    }


def test_stratified_sample_preserves_strata(spark):
    out = Q["sample_stratified"](spark, SF_SMOKE).collect()
    assert sum(r.n_total for r in out) == 500
    for r in out:
        # every stratum sampled at roughly 1/5 (hash-mod), never emptied
        assert 0 < r.n_sample < r.n_total
        assert 0.05 <= r.sample_ratio <= 0.40


def test_funnel_is_monotone(spark):
    out = sorted(
        Q["quality_filter_funnel"](spark, SF_SMOKE).collect(),
        key=lambda r: r.stage_ord,
    )
    counts = [r.n_docs for r in out]
    assert counts[0] == 500
    assert counts == sorted(counts, reverse=True)  # each stage only drops


def test_histogram_cdf_reaches_total(spark):
    out = sorted(
        Q["doc_length_histogram"](spark, SF_SMOKE).collect(),
        key=lambda r: r.bucket,
    )
    assert sum(r.n_docs for r in out) == 500
    assert out[-1].cum_docs == 500
    cums = [r.cum_docs for r in out]
    assert cums == sorted(cums)  # cumulative is nondecreasing


def test_quantize_respects_int8_bounds(spark):
    df = Q["embedding_quantize"](spark, SF_SMOKE)
    bad = df.filter(
        (F.col("q_min") < -127) | (F.col("q_max") > 127) | (F.col("scale") <= 0)
    )
    assert bad.count() == 0
    # symmetric quantization always hits the max magnitude somewhere
    hit = df.filter((F.col("q_max") == 127) | (F.col("q_min") == -127))
    assert hit.count() == df.count()


def test_top_talkers_ranked_by_volume(spark):
    out = sorted(Q["ts_top_talkers"](spark, SF_SMOKE).collect(), key=lambda r: r.rank)
    vols = [r.volume for r in out]
    assert vols == sorted(vols, reverse=True)
    assert len(out) == 10 and out[0].rank == 1


def test_interpolate_fills_within_observed_range(spark):
    out = Q["ts_interpolate"](spark, SF_SMOKE)
    # observed slots keep their value; filled slots (when interpolable) lie
    # within the path's observed [min, max] — linear interp never overshoots.
    obs_rng = (
        out.filter(F.col("filled") == 0)
        .groupBy("path")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    bad = (
        out.filter((F.col("filled") == 1) & F.col("value").isNotNull())
        .join(obs_rng, "path")
        .filter((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
    )
    assert bad.count() == 0


def test_billing_p95_bounded_by_slot_extremes(spark):
    out = Q["ts_billing_p95"](spark, SF_SMOKE)
    assert out.filter(F.col("p95_rate") < 0).count() == 0
    assert out.filter(F.col("n_slots") <= 0).count() == 0


def test_merge_upsert_overlap_semantics(spark):
    from esxsnmp_tsdb_spark.operators._shared import T_JAN10, T_JAN15_NOON

    out = Q["ts_merge_upsert"](spark, SF_SMOKE).collect()
    seen = set()
    for r in out:
        assert (r.path, r.slot) not in seen  # MERGE never duplicates a key
        seen.add((r.path, r.slot))
        if r.slot < T_JAN10:
            assert r.src == "base"  # before the update window: untouched
        elif r.slot < T_JAN15_NOON:
            assert r.src == "update"  # overlap: update always wins
        else:
            assert r.src == "update"  # beyond base: pure inserts


def test_seasonal_baseline_buckets(spark):
    out = Q["ts_seasonal_baseline"](spark, SF_SMOKE).collect()
    assert all(0 <= r.hod <= 23 for r in out)
    assert {r.day_type for r in out} == {"weekday", "weekend"}
    per_path = {}
    for r in out:
        per_path.setdefault(r.path, set()).add((r.day_type, r.hod))
    assert all(len(v) <= 48 for v in per_path.values())


def test_repetition_ratios_bounded(spark):
    from esxsnmp_tsdb_spark import registry

    df = registry.QUERIES["text_repetition_stats"](spark, SF_SMOKE)
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 < r.top_token_ratio <= 1.0
        assert 0 <= r.dup_bigram_ratio < 1.0
        assert r.n_tokens >= 2  # docs with bigrams only


def test_decontaminate_never_flags_eval_docs(spark):
    from esxsnmp_tsdb_spark import registry
    from esxsnmp_tsdb_spark.operators.curation import EVAL_MOD

    df = registry.QUERIES["decontaminate_ngram"](spark, SF_SMOKE)
    rows = df.collect()
    assert rows  # the fixture corpus has overlapping boilerplate
    for r in rows:
        assert r.doc_id % EVAL_MOD != 0
        assert r.n_shared_shingles >= 1


def test_centroid_counts_match_label_sizes(spark):
    from esxsnmp_tsdb_spark import registry
    from esxsnmp_tsdb_spark.sources import register_views

    df = registry.QUERIES["embedding_centroid_per_label"](spark, SF_SMOKE)
    per_label = {
        r.label: r.cnt
        for r in register_views(spark, SF_SMOKE)["embeddings"]
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    dims = set()
    for r in df.collect():
        assert r.n_vectors == per_label[r.label]
        dims.add(r.dim)
    assert dims == set(range(1, 65))  # every dimension covered exactly
