#!/usr/bin/env python
"""Scale probe (r11, evidence for the two-tier edge layout in
operators/dedup.py · min_label_components): does pre-partitioning +
caching the static edge side of the CC loop beat the plain
localCheckpoint layout once the edge exchange is big enough to see?
Synthetic deterministic graph: 64-node chains welded to hot stars
(mixed diameter + hub shape), 7 propagation rounds at every scale.

Measured 2026-08-16 (local[32], quiet host), loop wall only — the
cached layout additionally pays ONE up-front edge shuffle, which is why
the production helper only switches tiers above 5M edges:

    edges      A plain-ckpt   B cached-part   B/A   label diffs
    0.20M          9.36s          7.23s       0.77      0
    1.98M         28.39s         25.78s       0.91      0
    19.8M        127.44s        100.96s       0.79      0

End-to-end on the sf0.1 fixture graph (0.35M edges) the unconditional
cached layout LOSES ~0.5-1.5s/op (setup shuffle > loop savings at
stage-scheduling-bound sizes) — hence the size tier, not a blanket
switch.  Labels are byte-identical in every variant at every scale."""
import sys, time
import os
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
from pyspark.sql import functions as F
from esxsnmp_tsdb_spark.session import get_session

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

def loop(edges, tag):
    labels = (edges.select(F.col("src").alias("doc")).distinct()
              .withColumn("label", F.col("doc")).localCheckpoint(eager=True))
    rounds, t0 = 0, time.perf_counter()
    while rounds < 30:
        rounds += 1
        neigh = (edges.join(labels, edges.src == labels.doc)
                 .groupBy(F.col("dst").alias("doc2")).agg(F.min("label").alias("nl")))
        l1 = labels.withColumnRenamed("label", "old").join(
            neigh, F.col("doc") == F.col("doc2"), "left").select(
            "doc", "old", F.least(F.col("old"), F.coalesce("nl", "old")).alias("label"))
        m = l1.select(F.col("doc").alias("p_doc"), F.col("label").alias("p_label"))
        l2 = (l1.join(m, l1.label == m.p_doc, "left")
              .select("doc", "old", F.coalesce("p_label", "label").alias("label"))
              .localCheckpoint(eager=True))
        changed = l2.filter(F.col("label") != F.col("old")).count()
        labels = l2.drop("old")
        if changed == 0:
            break
    wall = time.perf_counter() - t0
    print(f"  {tag}: rounds={rounds} loop_wall={wall:.2f}s", flush=True)
    return labels, wall

for scale, (cn, sl, ns) in [("1x", (50_000, 50_000, 500)),
                            ("10x", (500_000, 500_000, 5_000)),
                            ("100x", (5_000_000, 5_000_000, 50_000))]:
    raw = make_edges(cn, sl, ns)
    ne = raw.count()
    print(f"scale {scale}: edges={ne}", flush=True)
    eA = raw.localCheckpoint(eager=True)
    lA, wA = loop(eA, "A plain-ckpt ")
    eB = raw.repartition("src").persist()
    eB.count()
    lB, wB = loop(eB, "B cached-part")
    diff = (lA.withColumnRenamed("label", "a")
            .join(lB.withColumnRenamed("label", "b"), "doc")
            .filter("a != b").count())
    print(f"  ratio B/A={wB/wA:.2f} label_diffs={diff}", flush=True)
    eB.unpersist(); spark.sparkContext._jvm.System.gc()
