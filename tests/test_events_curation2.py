"""Semantic invariants for the events-analytics and curation-batch-2
modules — properties the DuckDB oracle can't express (monotonicity,
bounds, conservation), checked on the smoke fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from esxsnmp_tsdb_spark import registry
from esxsnmp_tsdb_spark.operators.curation2 import BLOCK, QUOTA
from esxsnmp_tsdb_spark.sources import register_views
from tests.conftest import SF_SMOKE

registry.load_all()
Q = registry.QUERIES


def test_funnel_is_monotone_decreasing(spark):
    rows = {r.step: r for r in Q["event_funnel"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"step1_view", "step2_click", "step3_purchase"}
    n1, n2, n3 = (
        rows["step1_view"].n_users,
        rows["step2_click"].n_users,
        rows["step3_purchase"].n_users,
    )
    assert n1 >= n2 >= n3  # each step requires the previous one, strictly after
    assert n1 > 0
    assert abs(rows["step1_view"].conv_from_first - 1.0) < 1e-9


def test_retention_cohort_day_zero_covers_all_users(spark):
    out = Q["retention_cohort"](spark, SF_SMOKE).collect()
    assert all(r.offset_days >= 0 for r in out)
    # every user is active on their own cohort day, so summing day-0 rows
    # across cohorts must count every distinct user exactly once
    day0_users = sum(r.n_users for r in out if r.offset_days == 0)
    total_users = (
        register_views(spark, SF_SMOKE)["events"].select("user_id").distinct().count()
    )
    assert day0_users == total_users


def test_event_bigrams_counts_consecutive_pairs(spark):
    out = Q["event_bigrams"](spark, SF_SMOKE).collect()
    assert out
    ev = register_views(spark, SF_SMOKE)["events"]
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # limit-20 can truncate, so the total is at most (transitions overall)
    assert sum(r.n for r in out) <= n_events - n_users
    assert all(r.n > 0 for r in out)


def test_domain_quota_caps_every_source(spark):
    out = Q["domain_quota_sample"](spark, SF_SMOKE).collect()
    for r in out:
        assert r.n_kept <= QUOTA
        assert r.n_kept <= r.n_total
        if r.n_total <= QUOTA:
            assert r.n_kept == r.n_total  # quota only truncates, never drops


def test_seq_packing_conserves_tokens(spark):
    out = Q["seq_packing"](spark, SF_SMOKE).collect()
    for r in out:
        # ceil division: blocks cover all tokens with less than one block spare
        assert (r.n_blocks - 1) * BLOCK < r.tot_tokens <= r.n_blocks * BLOCK
        assert 0 <= r.n_straddling < r.n_docs


def test_ngram_topk_is_sorted_and_bounded(spark):
    out = Q["ngram_topk"](spark, SF_SMOKE).collect()
    assert len(out) == 25
    counts = [r.n for r in out]
    assert counts == sorted(counts, reverse=True)
    assert all(" " in r.bigram for r in out)  # really two tokens


def test_exact_substring_flags_are_symmetric(spark):
    # a shared chunk involves >= 2 docs, so the flagged set can never be 1 doc
    out = Q["exact_substring_dedup"](spark, SF_SMOKE).collect()
    assert len(out) != 1
    for r in out:
        assert 1 <= r.n_shared <= r.n_chunks
        assert 0 < r.shared_ratio <= 1.0


def test_norm_outliers_are_rare_and_extreme(spark):
    out = Q["embedding_norm_outliers"](spark, SF_SMOKE).collect()
    total = register_views(spark, SF_SMOKE)["embeddings"].count()
    assert len(out) < total * 0.1  # >2 sigma should be a small minority
    assert all(abs(r.zscore) > 2.0 for r in out)
    assert all(r.vnorm > 0 for r in out)


def test_gap_report_bounds(spark):
    from esxsnmp_tsdb_spark.operators._shared import HEARTBEAT

    out = Q["ts_gap_report"](spark, SF_SMOKE).collect()
    assert out
    for r in out:
        assert r.max_gap >= r.avg_gap > 0
        assert 0 <= r.n_heartbeat_gaps <= r.n_intervals
        if r.max_gap <= HEARTBEAT:
            assert r.n_heartbeat_gaps == 0


def test_bm25_ranked_and_positive(spark):
    out = Q["bm25_topdocs"](spark, SF_SMOKE).collect()
    assert len(out) == 10
    scores = [r.bm25 for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_pagerank_mass_and_determinism(spark):
    out = Q["doc_pagerank"](spark, SF_SMOKE).collect()
    assert out
    # damped PageRank over a connected-enough graph: mass stays near 1
    total = sum(r.pagerank for r in out)
    assert 0.5 < total <= 1.5
    assert all(r.pagerank > 0 for r in out)
    again = Q["doc_pagerank"](spark, SF_SMOKE).collect()
    assert [(r.doc_id, r.pagerank) for r in out] == [
        (r.doc_id, r.pagerank) for r in again
    ]


def test_percentile_downsample_ordering(spark):
    out = Q["ts_downsample_percentile"](spark, SF_SMOKE).collect()
    assert out
    for r in out:
        assert r.p50 <= r.p95
        assert r.n >= 1


def test_retention_drops_only_old_days(spark):
    from esxsnmp_tsdb_spark.operators._shared import T_JAN10

    out = Q["storage_retention_expire"](spark, SF_SMOKE).collect()
    assert out
    cutoff_day = T_JAN10 // 86400
    assert all(r.day_num >= cutoff_day for r in out)


def test_replay_dedup_matches_single_ingest(spark):
    # the replayed (doubled) store must aggregate to the same slot counts
    # a single ingest of the range produces
    from esxsnmp_tsdb_spark.functions import tsdb
    from esxsnmp_tsdb_spark.operators._shared import STEP, T_JAN10, T_JAN15_NOON
    from esxsnmp_tsdb_spark.sources import load_events_range

    out = {
        (r.path, r.slot): r.n_raw
        for r in Q["ingest_replay_idempotent"](spark, SF_SMOKE).collect()
    }
    obs = tsdb.obs_from_events(
        load_events_range(spark, SF_SMOKE, T_JAN10, T_JAN15_NOON)
    )
    direct = {
        (r.path, r.slot): r.n
        for r in obs.groupBy(
            "path", tsdb.slot_of(F.col("tse"), STEP).alias("slot")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == direct


def test_batch_ann_matches_single_query_for_vec0(spark):
    # query vec 0 is in the batch (0 % 97 != 3 -> actually 3 % 97 == 3);
    # instead check internal consistency: each qid has exactly top-5,
    # ranks 1..5, cos non-increasing
    rows = Q["sim_search_batch"](spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert by_q
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        cs = [r.cos for r in rs]
        assert all(a >= b for a, b in zip(cs, cs[1:]))
        assert all(r.vec_id != qid for r in rs)


def test_minhash_estimate_bounds(spark):
    rows = Q["minhash_jaccard_estimate"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 < r.exact_jaccard <= 1.0  # candidates share >= 1 shingle
        # abs_err rounds the unrounded difference; recomputing from the
        # independently-rounded columns can differ by one rounding unit
        assert abs(r.abs_err - abs(r.est_jaccard - r.exact_jaccard)) < 2e-6
        assert r.doc_a < r.doc_b


def test_nearest_asof_never_farther_than_backward(spark):
    near = {
        r.purchase_id: r.near_gap
        for r in Q["asof_join_nearest"](spark, SF_SMOKE).collect()
        if r.near_gap is not None
    }
    back = {
        r.purchase_id: r.purchase_tse - r.click_tse
        for r in Q["asof_join"](spark, SF_SMOKE).collect()
        if r.click_tse is not None
    }
    assert near and back
    for pid, bgap in back.items():
        assert near[pid] <= bgap  # nearest can only improve on backward-only


def test_rfm_segments_partition_customers(spark):
    rows = Q["customer_rfm"](spark, SF_SMOKE).collect()
    n_cust = (
        register_views(spark, SF_SMOKE)["orders"]
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    assert all(len(r.rfm) == 6 and r.rfm[0] == "R" for r in rows)


def test_basket_pairs_canonical_and_bounded(spark):
    rows = Q["market_basket_pairs"](spark, SF_SMOKE).collect()
    assert rows
    n_orders = (
        register_views(spark, SF_SMOKE)["orders"].select("o_orderkey").count()
    )
    for r in rows:
        assert r.part_a < r.part_b
        assert 1 <= r.n_orders <= n_orders


def test_linear_trend_r2_bounds(spark):
    rows = Q["ts_linear_trend"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r.r2 is not None:
            assert -1e-9 <= r.r2 <= 1.0 + 1e-9
        assert r.n >= 1


def test_invalid_reason_shares_sum_to_one(spark):
    rows = Q["ts_rate_invalid_reasons"](spark, SF_SMOKE).collect()
    assert {r.reason for r in rows} <= {"first", "flagged", "heartbeat", "decrease", "ok"}
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-6
