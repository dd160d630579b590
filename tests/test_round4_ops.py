"""Behavioral invariants for the round-4 operator batches (curation6,
analytics5, relational3, ingest2/streaming additions) — semantics the
oracle hash can't state directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from esxsnmp_tsdb_spark.operators import analytics5, curation6, relational3
from esxsnmp_tsdb_spark.operators.ingest2 import ingest_late_data_report
from esxsnmp_tsdb_spark.sources import register_views
from tests.conftest import SF_SMOKE


def test_gopher_funnel_is_additive(spark):
    """First-failing-rule attribution partitions the corpus: per-source
    verdict counts sum back to the source's document count."""
    docs = register_views(spark, SF_SMOKE)["documents"]
    per_source = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    funnel = curation6.quality_gopher_rules(spark, SF_SMOKE)
    got = {
        r["source"]: r["total"]
        for r in funnel.groupBy("source")
        .agg(F.sum("n_docs").alias("total"))
        .collect()
    }
    assert got == per_source
    verdicts = {r["verdict"] for r in funnel.select("verdict").distinct().collect()}
    assert verdicts <= {
        "pass",
        "word_count",
        "mean_word_len",
        "stopword_ratio",
        "type_token_ratio",
    }


def test_blocklist_counts_every_doc(spark):
    """Zero-hit docs re-enter through the left join: n_docs covers the
    whole corpus and flags never exceed it."""
    docs = register_views(spark, SF_SMOKE)["documents"]
    rep = curation6.blocklist_filter(spark, SF_SMOKE).cache()
    assert rep.agg(F.sum("n_docs")).first()[0] == docs.count()
    assert rep.filter(F.col("n_flagged") > F.col("n_docs")).count() == 0
    assert rep.filter(F.col("avg_hit_frac") < 0).count() == 0


def test_kl_divergence_nonnegative(spark):
    """KL(P_source || P_corpus) >= 0 up to micro-log quantization; token
    totals sum to the corpus total."""
    kl = curation6.source_divergence_kl(spark, SF_SMOKE).cache()
    # micro-log rounding can dip a hair below zero; bound the dip
    assert kl.filter(F.col("kl_divergence") < -1e-4).count() == 0
    docs = register_views(spark, SF_SMOKE)["documents"]
    total = docs.agg(F.sum(F.size(F.split("text", " ")))).first()[0]
    assert kl.agg(F.sum("n_tokens")).first()[0] == total


def test_mix_report_shares_sum_to_one(spark):
    mix = curation6.corpus_mix_report(spark, SF_SMOKE).cache()
    s = mix.agg(F.sum("token_share")).first()[0]
    assert abs(s - 1.0) < 1e-3  # 6-dp per-cell rounding
    # rank 1 exists in every language present
    langs = mix.select("lang").distinct().count()
    assert mix.filter(F.col("rank_in_lang") == 1).count() == langs


def test_dim_stats_moments_consistent(spark):
    stats = curation6.embedding_dim_stats(spark, SF_SMOKE).cache()
    emb = register_views(spark, SF_SMOKE)["embeddings"]
    n = emb.count()
    assert stats.filter(F.col("n_vecs") != n).count() == 0
    assert stats.filter(F.col("std_val") < 0).count() == 0
    assert stats.filter(
        (F.col("mean_val") < F.col("min_val")) | (F.col("mean_val") > F.col("max_val"))
    ).count() == 0


def test_utilization_thresholds_nest(spark):
    rep = analytics5.ts_utilization_report(spark, SF_SMOKE).cache()
    assert rep.filter(F.col("n_over100") > F.col("n_over80")).count() == 0
    assert rep.filter(F.col("n_over80") > F.col("n_samples")).count() == 0
    assert rep.filter(F.col("util_max") < F.col("util_avg")).count() == 0


def test_hierarchy_rollup_device_is_path_prefix(spark):
    roll = analytics5.ts_hierarchy_rollup(spark, SF_SMOKE)
    # each (device, slot) aggregates at most the 5 event-type series
    assert roll.filter(F.col("n_series") > 5).count() == 0
    assert roll.filter(F.col("n_series") < 1).count() == 0


def test_late_data_report_bounds(spark):
    rep = ingest_late_data_report(spark, SF_SMOKE).cache()
    assert rep.filter(F.col("n_late") > F.col("n_events")).count() == 0
    assert rep.filter(F.col("max_lateness_s") < 0).count() == 0
    assert rep.filter(
        (F.col("n_late") == 0) & (F.col("max_lateness_s") != 0)
    ).count() == 0


def test_ntile_deciles_balanced(spark):
    d = relational3.window_ntile(spark, SF_SMOKE).cache()
    # NTILE bucket sizes within a partition differ by at most 1
    spread = (
        d.groupBy("c_nationkey")
        .agg((F.max("n_customers") - F.min("n_customers")).alias("spread"))
        .agg(F.max("spread"))
        .first()[0]
    )
    assert spread <= 1
    # decile boundaries are monotone: decile k's max <= decile k+1's min
    a = d.alias("a")
    b = d.alias("b")
    bad = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.decile") + 1 == F.col("b.decile")),
        )
        .filter(F.col("a.max_bal") > F.col("b.min_bal"))
        .count()
    )
    assert bad == 0


def test_grouped_mode_is_argmax(spark):
    c = register_views(spark, SF_SMOKE)["customer"]
    counts = c.groupBy("c_mktsegment", "c_nationkey").count()
    top = {
        r["c_mktsegment"]: r["m"]
        for r in counts.groupBy("c_mktsegment").agg(F.max("count").alias("m")).collect()
    }
    mode = relational3.grouped_mode(spark, SF_SMOKE)
    for r in mode.collect():
        assert r["n_customers"] == top[r["c_mktsegment"]]


def test_aggregate_row_field_consistency(spark):
    from esxsnmp_tsdb_spark.operators.aggregator2 import ts_aggregate_row

    df = ts_aggregate_row(spark, SF_SMOKE).cache()
    assert df.filter(F.col("vmin") > F.col("vmax")).count() == 0
    assert df.filter(
        (F.col("average") < F.col("vmin")) | (F.col("average") > F.col("vmax"))
    ).count() == 0
    assert df.filter(
        (F.col("last") < F.col("vmin")) | (F.col("last") > F.col("vmax"))
    ).count() == 0
    # delta = last - first, both inside [vmin, vmax] => |delta| <= range
    assert df.filter(
        F.abs(F.col("delta")) > F.col("vmax") - F.col("vmin") + 1e-9
    ).count() == 0


def test_wrap_eta_poll_rule(spark):
    from esxsnmp_tsdb_spark.operators._shared import STEP
    from esxsnmp_tsdb_spark.operators.aggregator2 import ts_wrap_eta

    df = ts_wrap_eta(spark, SF_SMOKE).cache()
    assert df.filter(F.col("avg_cps") <= 0).count() == 0
    assert df.filter(F.col("secs_to_wrap") < 0).count() == 0
    assert df.filter(F.col("secs_to_wrap") > F.col("wrap_period_s")).count() == 0
    # poll_ok is exactly the wrap_period/2 >= STEP rule
    bad = df.filter(
        (F.col("wrap_period_s") / 2 >= STEP) != (F.col("poll_ok") == 1)
    ).count()
    assert bad == 0


def test_vocab_coverage_training_source_has_zero_oov(spark):
    from esxsnmp_tsdb_spark.operators.curation6 import (
        VOCAB_SOURCE,
        tokenizer_vocab_coverage,
    )

    df = tokenizer_vocab_coverage(spark, SF_SMOKE).cache()
    row = df.filter(F.col("source") == VOCAB_SOURCE).first()
    assert row is not None and row["n_oov"] == 0
    assert df.filter(F.col("n_oov") > F.col("n_tokens")).count() == 0


def test_context_chunks_arithmetic(spark):
    from esxsnmp_tsdb_spark.operators.curation6 import (
        CTX_S,
        CTX_W,
        doc_sliding_context_chunks,
    )

    df = doc_sliding_context_chunks(spark, SF_SMOKE).cache()
    # emitted tokens = sequences * W exactly; duplication factor >= ~W/n cap
    assert df.filter(
        F.col("tokens_emitted") != F.col("n_sequences") * CTX_W
    ).count() == 0
    assert df.filter(F.col("duplication_factor") <= 0).count() == 0
    # overlap can duplicate at most W/S per token (long docs) plus padding
    assert CTX_W / CTX_S < 2


def test_phash_band_counts_nest(spark):
    from esxsnmp_tsdb_spark.operators.multimodal import (
        PHASH_BAND_BITS,
        PHASH_BLOCKS,
        multimodal_phash_dedup,
    )

    df = multimodal_phash_dedup(spark, SF_SMOKE).cache()
    assert df.count() == PHASH_BLOCKS // PHASH_BAND_BITS
    assert df.filter(F.col("n_confirmed") > F.col("n_candidate_pairs")).count() == 0
    assert df.filter(F.col("n_buckets") <= 0).count() == 0


def test_attribution_decay_weights_are_dyadic(spark):
    from esxsnmp_tsdb_spark.operators.events3 import attribution_time_decay

    df = attribution_time_decay(spark, SF_SMOKE).cache()
    assert df.filter(F.col("credited_value") < 0).count() == 0
    assert df.filter(F.col("weight_sum") <= 0).count() == 0


def test_snapshot_time_travel_isolation(spark):
    from esxsnmp_tsdb_spark.operators.storage2 import (
        SNAP_CHANGED,
        storage_snapshot_time_travel,
    )

    df = storage_snapshot_time_travel(spark, SF_SMOKE).cache()
    # unchanged days are bit-identical across snapshots
    assert df.filter(
        (F.col("changed") == 0)
        & (
            (F.col("n_v1") != F.col("n_v2"))
            | (F.col("cents_v1") != F.col("cents_v2"))
        )
    ).count() == 0
    # the rewritten day differs in exactly the doubled-value way
    row = df.filter(F.col("day") == SNAP_CHANGED).first()
    if row is not None:
        assert row["n_v1"] == row["n_v2"]
        assert row["cents_v2"] >= 2 * row["cents_v1"] - row["n_v1"]
        assert row["cents_v2"] <= 2 * row["cents_v1"] + row["n_v1"]


def test_salted_join_matches_plain_join(spark):
    from esxsnmp_tsdb_spark.operators.relational3 import salted_skew_join

    t = register_views(spark, SF_SMOKE)
    plain = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .count()
    )
    salted = salted_skew_join(spark, SF_SMOKE)
    got = {r["o_orderpriority"]: r["n_items"] for r in salted.collect()}
    want = {r["o_orderpriority"]: r["count"] for r in plain.collect()}
    assert got == want
