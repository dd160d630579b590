#!/usr/bin/env python
"""Scale probe (r11, re-run r12 against the PRODUCTION helper —
evidence for the two-tier edge layout in operators/dedup.py ·
min_label_components): does pre-partitioning + caching the static edge
side of the CC loop beat the plain localCheckpoint layout once the edge
exchange is big enough to see?  Synthetic deterministic graph: 64-node
chains welded to hot stars (mixed diameter + hub shape).

r12 change: the probe now drives ``min_label_components`` itself with
``_EDGE_REPARTITION_THRESHOLD`` monkeypatched to force each tier (r11's
probe timed an inline copy of the then-current loop; after the r12
round-shape fold — self-loop flagged edges, fused round 1, one action
per round — a copy would drift from the code under test).  Walls are
FULL-helper (layout setup included), which is what the tier decision
actually trades off.

Measured 2026-08-16 (local[32]), full-helper wall, 7 rounds per scale:

    edges      A plain-ckpt   B cached-part   B/A   label diffs
    0.20M         12.11s         10.18s       0.84      0
    1.98M         26.17s         23.43s       0.90      0
    19.8M        182.45s        116.90s       0.64      0

The 20M win GREW under the r12 round shape (0.79 -> 0.64: with one
fewer join per round, the remaining edge exchange is a larger share of
the round).  On this synthetic all-loop graph the cached layout now
edges ahead even at 0.2M, but end-to-end on the sf0.1 fixture graph
(0.35M edges, 5 rounds, min-of-3 interleaved) the small tier still
wins — 2.25s vs 2.34s — because the fixture loop is stage-scheduling-
bound and the setup shuffle never amortizes.  The 5M threshold
therefore stands: below it the tiers are within noise of each other,
above it the cached layout wins outright.  Labels are byte-identical
in every variant at every scale."""
import sys, time
import os
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
from pyspark.sql import functions as F
from esxsnmp_tsdb_spark.session import get_session
from esxsnmp_tsdb_spark.operators import dedup as dedup_mod

spark = get_session("cc-scale-probe")

def make_edges(n_chain_nodes, n_star_leaves, n_stars):
    # chains: i -> i+1 within blocks of 64
    chain = (spark.range(n_chain_nodes)
             .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
             .filter((F.col("id") % 64) != 63))
    # stars: hub h gets leaves offset into a disjoint id space
    base = 10_000_000_000
    leaves = spark.range(n_star_leaves)
    star = leaves.select(
        (base + (F.col("id") % n_stars)).alias("src"),
        (base + n_stars + F.col("id")).alias("dst"))
    e = chain.union(star)
    return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

def run_tier(edges, force_big, tag):
    # Force the tier by moving the threshold past/below the edge count;
    # everything else is the production code path.
    dedup_mod._EDGE_REPARTITION_THRESHOLD = 0 if force_big else 1 << 62
    t0 = time.perf_counter()
    labels, rounds, converged = dedup_mod.min_label_components(
        edges, max_rounds=30)
    labels = labels.localCheckpoint(eager=True)  # materialize inside the wall
    wall = time.perf_counter() - t0
    assert converged, f"{tag}: did not converge in {rounds} rounds"
    print(f"  {tag}: rounds={rounds} helper_wall={wall:.2f}s", flush=True)
    return labels, wall

orig_threshold = dedup_mod._EDGE_REPARTITION_THRESHOLD
try:
    for scale, (cn, sl, ns) in [("1x", (50_000, 50_000, 500)),
                                ("10x", (500_000, 500_000, 5_000)),
                                ("100x", (5_000_000, 5_000_000, 50_000))]:
        raw = make_edges(cn, sl, ns).localCheckpoint(eager=True)
        ne = raw.count()
        print(f"scale {scale}: edges={ne}", flush=True)
        lA, wA = run_tier(raw, False, "A plain-ckpt ")
        lB, wB = run_tier(raw, True, "B cached-part")
        diff = (lA.withColumnRenamed("label", "a")
                .join(lB.withColumnRenamed("label", "b"), "doc")
                .filter("a != b").count())
        cntA, cntB = lA.count(), lB.count()
        assert cntA == cntB, f"node-count mismatch {cntA} != {cntB}"
        print(f"  ratio B/A={wB/wA:.2f} label_diffs={diff} nodes={cntA}",
              flush=True)
        spark.sparkContext._jvm.System.gc()
finally:
    dedup_mod._EDGE_REPARTITION_THRESHOLD = orig_threshold
