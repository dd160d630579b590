"""Behavioral invariants for the round-5 operator batches (analytics6,
events4, curation7, storage3/ingest3/streaming_ops3) — semantics the
oracle hash can't state directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from esxsnmp_tsdb_spark.operators import analytics6, curation7, events4
from esxsnmp_tsdb_spark.operators.ingest3 import DLQ_MOD, ingest_dlq_quarantine
from esxsnmp_tsdb_spark.operators.storage3 import storage_file_skipping_manifest
from esxsnmp_tsdb_spark.operators.streaming_ops3 import (
    stream_replay_exactly_once,
)
from esxsnmp_tsdb_spark.sources import register_views
from tests.conftest import SF_SMOKE


def test_availability_bounded_by_day(spark):
    """hours_present ∈ [1, 24] and the micro ratio matches it exactly."""
    rep = analytics6.ts_availability_report(spark, SF_SMOKE).cache()
    assert rep.filter(
        (F.col("hours_present") < 1) | (F.col("hours_present") > 24)
    ).count() == 0
    bad = rep.filter(
        F.col("availability_micro")
        != F.expr(
            "CAST((2 * hours_present * 1000000 + 24) div 48 AS BIGINT)"
        )
    )
    assert bad.count() == 0


def test_error_budget_burn_is_scaled_error_rate(spark):
    """burn_micro == error rate / allowance (both half-up): a class-day
    with zero violations burns zero; n_bad never exceeds n."""
    rep = analytics6.ts_error_budget_burn(spark, SF_SMOKE).cache()
    assert rep.filter(F.col("n_bad") > F.col("n")).count() == 0
    assert rep.filter(
        (F.col("n_bad") == 0) & (F.col("burn_micro") != 0)
    ).count() == 0
    # burn is monotone in the error rate: recompute from the row's own ints
    bad = rep.filter(
        F.col("burn_micro")
        != F.expr(
            "CAST((2 * n_bad * 1000000 * 1000000 + n * 10000)"
            " div (2 * n * 10000) AS BIGINT)"
        )
    )
    assert bad.count() == 0


def test_autocorr_in_unit_interval(spark):
    rep = analytics6.ts_autocorr_lag(spark, SF_SMOKE).cache()
    assert rep.filter(
        (F.col("autocorr") < -1.000001) | (F.col("autocorr") > 1.000001)
    ).count() == 0
    assert rep.filter(F.col("n") < analytics6.AUTOCORR_MIN_PAIRS).count() == 0


def test_percentile_bands_ordered(spark):
    rep = analytics6.ts_percentile_bands(spark, SF_SMOKE)
    assert rep.filter(
        (F.col("p10") > F.col("p50")) | (F.col("p50") > F.col("p90"))
    ).count() == 0


def test_sessions_partition_events(spark):
    """Session-bucket event counts sum to the fixture's event count."""
    ev = register_views(spark, SF_SMOKE)["events"]
    rep = events4.session_duration_stats(spark, SF_SMOKE)
    assert rep.agg(F.sum("n_events")).first()[0] == ev.count()


def test_journeys_cover_user_days(spark):
    """Journey counts over ALL journeys equal the number of (user, day)
    groups; every journey has at most JOURNEY_LEN hops."""
    ev = register_views(spark, SF_SMOKE)["events"]
    n_user_days = (
        ev.select(
            "user_id",
            F.expr("unix_timestamp(ts) div 86400").alias("day"),
        )
        .distinct()
        .count()
    )
    top = events4.user_journey_top_paths(spark, SF_SMOKE).cache()
    # top-k can't exceed the group count, and hop count is bounded
    assert top.count() <= min(20, n_user_days)
    assert top.filter(
        F.size(F.split("journey", ">")) > events4.JOURNEY_LEN
    ).count() == 0


def test_concentration_partitions_users_and_events(spark):
    ev = register_views(spark, SF_SMOKE)["events"]
    rep = events4.user_activity_concentration(spark, SF_SMOKE).cache()
    assert rep.agg(F.sum("n_users")).first()[0] == (
        ev.select("user_id").distinct().count()
    )
    assert rep.agg(F.sum("n_events")).first()[0] == ev.count()
    # heavy band's per-user average exceeds light band's
    rows = {r["band"]: r for r in rep.collect()}
    if "heavy" in rows and "light" in rows:
        heavy = rows["heavy"]["n_events"] / rows["heavy"]["n_users"]
        light = rows["light"]["n_events"] / rows["light"]["n_users"]
        assert heavy > light


def test_gap_histogram_counts_all_successors(spark):
    """Every event except each user's first contributes one gap."""
    ev = register_views(spark, SF_SMOKE)["events"]
    n_users = ev.select("user_id").distinct().count()
    rep = events4.inter_event_gap_histogram(spark, SF_SMOKE)
    assert rep.agg(F.sum("n")).first()[0] == ev.count() - n_users


def test_importance_sampling_hits_target(spark):
    """Achieved keep rate lands near target (hash uniformity) and the
    en stratum keeps everything."""
    rep = curation7.sample_importance_weighted(spark, SF_SMOKE).cache()
    en = rep.filter(F.col("lang") == "en").first()
    assert en["n_kept"] == en["n_docs"]
    # |achieved - target| within 25 points of ppm-million on small strata
    assert rep.filter(
        F.abs(F.col("achieved_ppm") - F.col("target_ppm")) > 250_000
    ).count() == 0


def test_cross_source_matrix_is_upper_triangle(spark):
    rep = curation7.dedup_cross_source_matrix(spark, SF_SMOKE).cache()
    assert rep.filter(F.col("source_a") >= F.col("source_b")).count() == 0
    assert rep.filter(F.col("n_doc_pairs") < F.col("n_fingerprints")).count() == 0


def test_hybrid_rank_dense_and_bounded(spark):
    rep = curation7.rag_hybrid_retrieval(spark, SF_SMOKE).cache()
    ranks = sorted(r["rank"] for r in rep.collect())
    assert ranks == list(range(1, len(ranks) + 1))
    assert len(ranks) <= curation7.HYBRID_TOP


def test_fertility_at_least_one(spark):
    """BPE pieces per word >= 1 (every word is at least one piece)."""
    rep = curation7.tokenizer_fertility_by_lang(spark, SF_SMOKE)
    assert rep.filter(F.col("fertility_ppm") < 1_000_000).count() == 0


def test_markov_rows_normalize_to_one(spark):
    """Each from-state's transition probabilities sum to 1e6 within
    half-up quantization (±|row| ppm)."""
    rep = events4.event_markov_transition(spark, SF_SMOKE).cache()
    rows = (
        rep.groupBy("from_type")
        .agg(
            F.sum("prob_ppm").alias("s"), F.count(F.lit(1)).alias("k")
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["s"] - 1_000_000) <= r["k"]


def test_change_contributors_rank_bounded_per_class(spark):
    from esxsnmp_tsdb_spark.operators import analytics7

    rep = analytics7.ts_topk_change_contributors(spark, SF_SMOKE).cache()
    assert rep.filter(F.col("rank") > analytics7.CONTRIB_TOP).count() == 0
    assert rep.filter(
        F.col("delta_cents") != F.col("d2_cents") - F.col("d1_cents")
    ).count() == 0
    # one class delta per class, consistent across its rows
    assert (
        rep.select("event_type", "class_delta_cents").distinct().count()
        == rep.select("event_type").distinct().count()
    )


def test_flap_counts_bounded_by_slots(spark):
    from esxsnmp_tsdb_spark.operators import analytics7

    rep = analytics7.ts_alert_flap_detect(spark, SF_SMOKE).cache()
    assert rep.filter(
        F.col("n_transitions") >= F.col("n_slots")
    ).count() == 0
    assert rep.filter(
        F.col("n_breach_slots") > F.col("n_slots")
    ).count() == 0
    assert rep.filter(
        F.col("n_transitions") < analytics7.FLAP_MIN
    ).count() == 0


def test_manifest_scan_equals_direct_scan(spark):
    """The pruned read returns exactly what an unpruned filtered scan
    does (the assert inside the op already proves files were skipped)."""
    from esxsnmp_tsdb_spark.functions import tsdb
    from esxsnmp_tsdb_spark.operators._shared import T_JAN10, T_JAN15_NOON

    got = {
        r["day"]: (r["n"], r["cents"])
        for r in storage_file_skipping_manifest(spark, SF_SMOKE).collect()
    }
    obs = tsdb.obs_from_events(register_views(spark, SF_SMOKE)["events"])
    want = {
        r["day"]: (r["n"], r["cents"])
        for r in obs.filter(
            (F.col("tse") >= T_JAN10) & (F.col("tse") < T_JAN15_NOON)
        )
        .groupBy(F.expr("tse div 86400").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )
        .collect()
    }
    assert got == want


def test_dlq_quarantines_exactly_the_corrupt_rows(spark):
    ev = register_views(spark, SF_SMOKE)["events"]
    n_corrupt = ev.filter(F.col("event_id") % DLQ_MOD == 0).count()
    rep = ingest_dlq_quarantine(spark, SF_SMOKE).cache()
    dlq = rep.filter(F.col("class") == "_dlq").first()
    assert dlq["n"] == n_corrupt
    assert dlq["sum_value"] is None
    assert rep.agg(F.sum("n")).first()[0] == ev.count()


def test_replay_store_has_no_duplicates(spark):
    """Per-path counts equal the batch fixture's — a duplicated replay
    would double every count (also asserted inside the op)."""
    ev = register_views(spark, SF_SMOKE)["events"]
    rep = stream_replay_exactly_once(spark, SF_SMOKE)
    assert rep.agg(F.sum("n")).first()[0] == ev.count()
