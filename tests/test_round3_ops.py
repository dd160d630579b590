"""Behavioral invariants for the round-3 operator batches (similarity2,
analytics4, text3) — semantics the oracle hash can't state directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from esxsnmp_tsdb_spark.operators import analytics4, similarity2, text3
from esxsnmp_tsdb_spark.operators.similarity import sim_search_topk
from tests.conftest import SF_SMOKE


def test_stl_reconstruction_and_seasonal_constancy(spark):
    df = analytics4.ts_stl_decompose(spark, SF_SMOKE).cache()
    # additive identity holds after rounding
    bad = df.filter(
        F.abs(F.col("x") - (F.col("trend") + F.col("seasonal") + F.col("resid")))
        > 1e-5
    ).count()
    assert bad == 0
    # seasonal is constant per (path, hour-of-day)
    per_bucket = (
        df.groupBy("path", F.expr("CAST((slot % 86400) div 3600 AS INT)"))
        .agg(F.countDistinct("seasonal").alias("k"))
        .agg(F.max("k"))
        .first()[0]
    )
    assert per_bucket == 1


def test_mad_flags_exceed_cut(spark):
    df = analytics4.ts_anomaly_mad(spark, SF_SMOKE)
    assert df.filter(F.col("score") <= analytics4.MAD_CUT).count() == 0


def test_capacity_forecast_bounds(spark):
    df = analytics4.ts_capacity_forecast(spark, SF_SMOKE).cache()
    assert df.filter(F.col("slope") <= 0).count() == 0
    assert (
        df.filter(
            (F.col("eta_hours") < 0) | (F.col("eta_hours") > analytics4.CAP_ETA_MAX)
        ).count()
        == 0
    )
    assert (
        df.filter(
            (F.col("current") >= analytics4.CAP_THRESH) & (F.col("eta_hours") != 0)
        ).count()
        == 0
    )


def test_seasonal_naive_mae_dominates_bias(spark):
    rows = analytics4.ts_forecast_seasonal_naive(spark, "/root/testdata/sf0.01").collect()
    assert rows  # holdout day joins non-empty at sf0.01
    for r in rows:
        assert r.mae >= abs(r.bias) - 1e-9


def test_pii_scrub_masks_exactly_the_staged_tokens(spark):
    df = text3.pii_scrub_stats(spark, SF_SMOKE).cache()
    assert df.filter(F.col("n_emails") != 1).count() == 0
    assert df.filter(F.col("n_ips") != 1).count() == 0


def test_bigram_perplexity_positive_and_total(spark):
    df = text3.bigram_lm_perplexity(spark, SF_SMOKE).cache()
    assert df.count() == 500
    assert df.filter(F.col("perplexity") <= 0).count() == 0
    assert df.filter(F.col("avg_logp") >= 0).count() == 0  # log-probs < 0


def test_lang_confusion_shares_sum_to_one(spark):
    rows = (
        text3.lang_id_confusion(spark, SF_SMOKE)
        .groupBy("lang")
        .agg(F.sum("share").alias("s"))
        .collect()
    )
    for r in rows:
        assert abs(r.s - 1.0) < 1e-4


def test_pq_adc_rank_order_and_quality(spark):
    pq = similarity2.vector_pq_adc(spark, SF_SMOKE).orderBy("rank").collect()
    assert [r.rank for r in pq] == list(range(1, len(pq) + 1))
    dists = [r.adc for r in pq]
    assert dists == sorted(dists)
    # Lossy-index quality: the TRUE cosine of PQ's picks must beat the
    # corpus mean true cosine (top-k overlap is too noisy a bar on a
    # near-orthogonal random fixture — expected overlap < 1 even for a
    # decent quantizer).
    from esxsnmp_tsdb_spark.functions.vector import cosine
    from esxsnmp_tsdb_spark.sources import register_views

    e = register_views(spark, SF_SMOKE)["embeddings"]
    q = e.filter(F.col("vec_id") == similarity2.QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    dbl = lambda c: F.transform(c, lambda x: x.cast("double"))
    scored = (
        e.filter(F.col("vec_id") != similarity2.QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", cosine(dbl(F.col("embedding")), dbl(F.col("qv"))).alias("c")
        )
        .cache()
    )
    corpus_mean = scored.agg(F.avg("c")).first()[0]
    pick_ids = [r.vec_id for r in pq]
    picks_mean = (
        scored.filter(F.col("vec_id").isin(pick_ids)).agg(F.avg("c")).first()[0]
    )
    assert picks_mean > corpus_mean


def test_range_search_respects_tau(spark):
    df = similarity2.sim_search_range(spark, SF_SMOKE)
    assert df.filter(F.col("cos") < similarity2.RANGE_TAU).count() == 0


def test_ann_recall_bounds(spark):
    r = similarity2.ann_recall_eval(spark, SF_SMOKE).first()
    assert 0.0 <= r.recall <= 1.0
    assert r.hits <= r.k


def test_band_sensitivity_monotone(spark):
    from esxsnmp_tsdb_spark.operators import curation4

    rows = sorted(
        curation4.minhash_band_sensitivity(spark, SF_SMOKE).collect(),
        key=lambda r: r.n_bands,
    )
    cands = [r.n_candidates for r in rows]
    recalls = [r.recall for r in rows]
    assert cands == sorted(cands)  # more bands -> more candidates
    assert recalls == sorted(recalls)  # ... and at least as much recall
    assert rows[-1].recall > 0.9  # 8 bands catch nearly all near-dups


def test_threshold_sweep_monotone(spark):
    from esxsnmp_tsdb_spark.operators import curation4

    rows = sorted(
        curation4.dedup_threshold_sweep(spark, SF_SMOKE).collect(),
        key=lambda r: r.tau,
    )
    pairs = [r.n_pairs for r in rows]
    assert pairs == sorted(pairs, reverse=True)  # higher tau -> fewer pairs
    assert pairs[0] > 0


def test_cdc_merge_key_uniqueness_and_sources(spark):
    from esxsnmp_tsdb_spark.operators import ingest2

    df = ingest2.ingest_cdc_merge(spark, SF_SMOKE).cache()
    total = df.count()
    assert df.select("path", "slot").distinct().count() == total
    srcs = {r.src for r in df.select("src").distinct().collect()}
    assert srcs <= {"base", "insert", "update"}
    assert "update" in srcs  # overlap window guarantees updates exist


def test_locf_fill_carries_only_backward(spark):
    from esxsnmp_tsdb_spark.operators import aggregator2

    df = aggregator2.ts_gap_fill_locf(spark, SF_SMOKE).cache()
    # observed rows are exactly their own value; filled never null after
    # the first observation of a series
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("path")
        .orderBy("slot")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = df.withColumn("seen", F.max(F.col("observed").cast("int")).over(w))
    assert flagged.filter((F.col("seen") == 1) & F.col("filled").isNull()).count() == 0
    assert flagged.filter((F.col("seen") == 0) & F.col("filled").isNotNull()).count() == 0
