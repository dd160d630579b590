"""§2.5 similarity search, batch 2 (EXT): product-quantization ADC
search, cosine radius (range) search, and a recall@k evaluation of the
LSH index against the exact baseline.

Same determinism discipline as ``similarity.py``: codebooks are drawn
from the corpus itself by a closed-form rule (``vec_id % 25 = 0``, the
IVF centroid trick), distances are left-to-right fold sums identical in
both engines, ties break on vec_id / code id, and every reported float
is rounded on both sides.

Scale posture:

* ``vector_pq_adc`` — the codebook is O(M·K) and broadcast; encoding is
  a map-only pass (N·K·M fold evaluations, K and M constants); ADC
  lookup joins the (tiny) per-query distance table against the code
  column.  At 100 TB the codes are 4 bytes/vector stored at ingest —
  the scan reads codes, not vectors, which is the whole point of PQ.
* ``sim_search_range`` — map-only score + filter; no top-k tail at all,
  output size is data-dependent (the radius), not corpus-sized.
* ``ann_recall_eval`` — joins two k-row results; everything after the
  two searches touches 2k rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esxsnmp_tsdb_spark.functions.topk import ranked_topk
from esxsnmp_tsdb_spark.functions.vector import cosine, norm
from esxsnmp_tsdb_spark.operators.similarity import (
    DOT_SQL,
    QUERY_VEC_ID,
    TOP_K,
    _dbl,
    _lsh_oracle,
    sim_search_ann_lsh,
    sim_search_topk,
)
from esxsnmp_tsdb_spark.registry import op
from esxsnmp_tsdb_spark.sources import register_views

PQ_M = 8  # subspaces (64-dim fixture → 8 dims each)
PQ_SUB = 8  # dims per subspace
RANGE_TAU = 0.35  # cosine radius (fixture-tuned: selective but non-empty)

# Σᵢ (a[off+i] − b[off+i])² over one subspace, i = 1..PQ_SUB (1-based).
# Written as (x−y)*(x−y) — NOT pow(x−y, 2) — so both engines evaluate the
# identical multiply and the fold stays bit-deterministic.
_SUB_L2_SQL = f"""list_sum(list_transform(range(1, {PQ_SUB} + 1),
    i -> (CAST({{a}}[{{off}} + i] AS DOUBLE) - CAST({{b}}[{{off}} + i] AS DOUBLE)) *
         (CAST({{a}}[{{off}} + i] AS DOUBLE) - CAST({{b}}[{{off}} + i] AS DOUBLE))))"""


def _sub_l2(a, b, m):
    """Spark twin of ``_SUB_L2_SQL``: fold over element_at with the same
    1-based offsets and the same left-to-right order."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(PQ_SUB)),
        F.lit(0.0),
        lambda acc, i: acc
        + (
            F.element_at(a, m * PQ_SUB + i).cast("double")
            - F.element_at(b, m * PQ_SUB + i).cast("double")
        )
        * (
            F.element_at(a, m * PQ_SUB + i).cast("double")
            - F.element_at(b, m * PQ_SUB + i).cast("double")
        ),
    )


def _t(spark: SparkSession, sf_dir: str):
    return register_views(spark, sf_dir)


_NORM_SQL = """list_transform({v}, x -> CAST(x AS DOUBLE) /
    sqrt(list_sum(list_transform({v}, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))"""


@op(
    "vector_pq_adc",
    oracle=f"""
WITH en AS (  -- unit-normalized corpus: sub-L2² then ranks like cosine
  SELECT vec_id, label, {_NORM_SQL.format(v='embedding')} AS nv FROM embeddings
),
cb AS (SELECT vec_id AS cid, nv AS cv FROM en WHERE vec_id % 25 = 0),
ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
enc AS (  -- per (vector, subspace): nearest code
  SELECT vec_id, label, m, cid AS code FROM (
    SELECT e.vec_id, e.label, ms.m, cb.cid,
           row_number() OVER (
             PARTITION BY e.vec_id, ms.m
             ORDER BY {_SUB_L2_SQL.format(a='e.nv', b='cb.cv', off='ms.m * ' + str(PQ_SUB))},
                      cb.cid) AS rn
    FROM en e CROSS JOIN ms CROSS JOIN cb
  ) WHERE rn = 1
),
qd AS (  -- ADC table: query subvector ↔ every code, per subspace
  SELECT ms.m, cb.cid,
         {_SUB_L2_SQL.format(a='q.nv', b='cb.cv', off='ms.m * ' + str(PQ_SUB))} AS d2
  FROM (SELECT nv FROM en WHERE vec_id = {QUERY_VEC_ID}) q
  CROSS JOIN ms CROSS JOIN cb
),
adc AS (
  SELECT enc.vec_id, enc.label, SUM(qd.d2) AS dist
  FROM enc JOIN qd ON enc.m = qd.m AND enc.code = qd.cid
  WHERE enc.vec_id != {QUERY_VEC_ID}
  GROUP BY enc.vec_id, enc.label
)
SELECT vec_id, label, round(dist, 6) AS adc, rank FROM (
  SELECT *, row_number() OVER (ORDER BY dist, vec_id) AS rank FROM adc
) WHERE rank <= {TOP_K}
""",
)
def vector_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization search with asymmetric distance computation.

    Index side: each vector is encoded as M=8 code ids — per subspace,
    the nearest codebook entry by sub-L2 (codebook = every 25th corpus
    vector, the same closed-form rule as the IVF centroids).  Query
    side: one M×K distance table between the query's subvectors and the
    codebook; a vector's approximate distance is the sum of M table
    lookups on its codes (never a full-dim computation per vector at
    query time).

    Vectors are unit-normalized before encoding, so sub-L2² sums rank
    exactly like cosine (‖a−b‖² = 2−2cos on the unit sphere) and the op
    approximates the same metric as `sim_search_topk`.

    The codes come from the ingest-persisted index (`build_ivf_pq_index`
    — one corpus pass per session, M small ints per vector stored), so
    the QUERY plan touches only index artifacts: broadcast M×K distance
    table against the codebook artifact, posexplode of the stored codes
    (full-corpus scan here — the cell-pruned variant is
    `sim_search_ivf_pq_indexed`), sum of M lookups per vector, heap
    top-k.  Per-vector encoding is independent of the cell layout, so
    the oracle's inline-encode formulation matches code for code."""
    root = build_ivf_pq_index(spark, sf_dir)
    e = _t(spark, sf_dir)["embeddings"]
    nrm = norm(_dbl(F.col("embedding")))
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.transform(F.col("embedding"), lambda x: x.cast("double") / nrm).alias(
            "qv"
        )
    )
    cbq = spark.read.parquet(os.path.join(root, "codebook"))
    ms = spark.range(PQ_M).select(F.col("id").cast("int").alias("qm"))
    qd = (
        q.crossJoin(F.broadcast(ms))
        .crossJoin(F.broadcast(cbq))
        .select(
            "qm",
            F.col("cid").alias("qcid"),
            _sub_l2(F.col("qv"), F.col("cv"), F.col("qm")).alias("d2"),
        )
    )
    enc = (
        spark.read.parquet(os.path.join(root, "codes"))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", F.posexplode("codes").alias("m", "code"))
    )
    adc = (
        enc.join(
            F.broadcast(qd),
            (F.col("m") == F.col("qm")) & (F.col("code") == F.col("qcid")),
        )
        .groupBy("vec_id", "label")
        .agg(F.sum("d2").alias("dist"))
    )
    return ranked_topk(adc, TOP_K, [F.col("dist"), F.col("vec_id")]).select(
        "vec_id", "label", F.round("dist", 6).alias("adc"), "rank"
    )


@op(
    "sim_search_range",
    oracle=f"""
WITH q AS (SELECT embedding AS qv, len(embedding) AS d FROM embeddings
           WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, label, round(cos, 6) AS cos FROM (
  SELECT e.vec_id, e.label,
         {DOT_SQL.format(d='q.d', a='e.embedding', b='q.qv')} /
         (sqrt({DOT_SQL.format(d='q.d', a='e.embedding', b='e.embedding')}) *
          sqrt({DOT_SQL.format(d='q.d', a='q.qv', b='q.qv')})) AS cos
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != {QUERY_VEC_ID}
) WHERE cos >= {RANGE_TAU}
""",
)
def sim_search_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) search: every vector within cosine ≥ τ of the query
    — the 'find all near-duplicates of X' primitive, vs top-k's 'find the
    k nearest'.

    Map-only: broadcast 1-row query, score in codegen, filter.  No
    ranking tail of any kind — the result is as parallel as the scan, so
    this is the cheapest similarity op at any scale (and the kernel the
    LSH/IVF-pruned variants run per bucket)."""
    e = _t(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .withColumn("cos_raw", cosine(_dbl(F.col("embedding")), _dbl(F.col("qv"))))
        .filter(F.col("cos_raw") >= RANGE_TAU)
        .select("vec_id", "label", F.round("cos_raw", 6).alias("cos"))
    )


_EXACT_TOPK_CTE = f"""
exact AS (
  SELECT vec_id FROM (
    SELECT e.vec_id,
           row_number() OVER (ORDER BY
             {DOT_SQL.format(d='q.d', a='e.embedding', b='q.qv')} /
             (sqrt({DOT_SQL.format(d='q.d', a='e.embedding', b='e.embedding')}) *
              sqrt({DOT_SQL.format(d='q.d', a='q.qv', b='q.qv')})) DESC, e.vec_id)
             AS rank
    FROM embeddings e
    CROSS JOIN (SELECT embedding AS qv, len(embedding) AS d FROM embeddings
                WHERE vec_id = {QUERY_VEC_ID}) q
    WHERE e.vec_id != {QUERY_VEC_ID}
  ) WHERE rank <= {TOP_K}
)"""


@op(
    "ann_recall_eval",
    oracle=f"""
WITH {_EXACT_TOPK_CTE},
ann AS (
  SELECT vec_id FROM ({_lsh_oracle("b.bucket = q.qbucket")})
)
SELECT {TOP_K} AS k,
       (SELECT count(*) FROM ann) AS n_ann,
       (SELECT count(*) FROM exact JOIN ann USING (vec_id)) AS hits,
       round((SELECT count(*) FROM exact JOIN ann USING (vec_id)) * 1.0
             / {TOP_K}, 6) AS recall
""",
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the single-probe LSH index against the exact
    brute-force baseline — the evaluation loop every ANN deployment
    needs before trusting an index.

    Both searches end at k rows, so the comparison join touches 2k rows
    regardless of corpus size; the measurement costs exactly one exact
    search + one ANN search."""
    exact = sim_search_topk(spark, sf_dir).select("vec_id")
    ann = sim_search_ann_lsh(spark, sf_dir).select("vec_id")
    # ONE action (r13, guide §1.2 "don't compute things twice"): the old
    # shape ran `exact⋈ann.count()` then `ann.count()` — two jobs, and
    # the second re-executed the whole ANN search lineage.  A left join
    # from ann onto the (≤k-row) exact set yields both tallies in one
    # aggregate: count(*) = |ann|, count(hit) = |ann ∩ exact|.
    n_ann, hits = (
        # .distinct() on the ≤k-row build side (ADVICE r13): the fold
        # assumes exact's vec_id set is duplicate-free (a duplicate would
        # fan the left join out and inflate both tallies) — vec_ids ARE
        # unique by construction; the invariant is now explicit for the
        # cost of a dedup over ≤k rows.
        ann.join(
            exact.distinct().withColumn("hit", F.lit(1)), "vec_id", "left"
        )
        .agg(F.count(F.lit(1)), F.count("hit"))
        .first()
    )
    return spark.createDataFrame(
        [(TOP_K, n_ann, hits, round(hits / TOP_K, 6))],
        "k int, n_ann bigint, hits bigint, recall double",
    )


_NDOT_SQL = """list_sum(list_transform(range(1, len({a}) + 1),
    i -> {a}[i] * {b}[i]))"""


# Shared by sim_search_ivf_pq (inline build) and sim_search_ivf_pq_indexed
# (ingest-persisted index): PQ codes are a per-vector property of the global
# codebook, so probing the same cell yields identical ADC ranks either way.
_IVF_PQ_ORACLE = f"""
WITH en AS (
  SELECT vec_id, label, {_NORM_SQL.format(v='embedding')} AS nv FROM embeddings
),
ivfc AS (SELECT vec_id AS icid, nv AS icv FROM en WHERE vec_id % 50 = 0),
assigned AS (
  SELECT vec_id, label, nv, icid AS cell FROM (
    SELECT e.vec_id, e.label, e.nv, c.icid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_NDOT_SQL.format(a='e.nv', b='c.icv')} DESC, c.icid) AS rn
    FROM en e CROSS JOIN ivfc c
  ) WHERE rn = 1
),
qrow AS (SELECT cell, nv AS qv FROM assigned WHERE vec_id = {QUERY_VEC_ID}),
cand AS (
  SELECT a.vec_id, a.label, a.nv
  FROM assigned a JOIN qrow ON a.cell = qrow.cell
  WHERE a.vec_id != {QUERY_VEC_ID}
),
cb AS (SELECT vec_id AS cid, nv AS cv FROM en WHERE vec_id % 25 = 0),
ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
enc AS (
  SELECT vec_id, label, m, cid AS code FROM (
    SELECT d.vec_id, d.label, ms.m, cb.cid,
           row_number() OVER (
             PARTITION BY d.vec_id, ms.m
             ORDER BY {_SUB_L2_SQL.format(a='d.nv', b='cb.cv', off='ms.m * ' + str(PQ_SUB))},
                      cb.cid) AS rn
    FROM cand d CROSS JOIN ms CROSS JOIN cb
  ) WHERE rn = 1
),
qd AS (
  SELECT ms.m, cb.cid,
         {_SUB_L2_SQL.format(a='q.qv', b='cb.cv', off='ms.m * ' + str(PQ_SUB))} AS d2
  FROM qrow q CROSS JOIN ms CROSS JOIN cb
),
adc AS (
  SELECT enc.vec_id, enc.label, SUM(qd.d2) AS dist
  FROM enc JOIN qd ON enc.m = qd.m AND enc.code = qd.cid
  GROUP BY enc.vec_id, enc.label
)
SELECT vec_id, label, round(dist, 6) AS adc, rank FROM (
  SELECT *, row_number() OVER (ORDER BY dist, vec_id) AS rank FROM adc
) WHERE rank <= {TOP_K}
"""


@op("sim_search_ivf_pq", oracle=_IVF_PQ_ORACLE)
def sim_search_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the production ANN composition (the FAISS default): the
    IVF coarse quantizer prunes the corpus to the query's cell, then PQ
    codes rank the survivors by asymmetric distance.  Neither stage
    touches full vectors at query time beyond the probed cell.

    At 100 TB both index sides persist at ingest (cell id = partition
    key, 8 PQ codes = 8 small ints per vector); a query broadcasts one
    M×K distance table and reads one cell's codes — I/O is corpus/cells
    compressed ~d·4/M bytes per vector.  Here both stages run inline so
    one oracle proves the composition end-to-end; every piece (cell
    assignment, codebooks, ADC) reuses the deterministic closed forms of
    `sim_search_ivf` and `vector_pq_adc`."""
    e = _t(spark, sf_dir)["embeddings"]
    nrm = norm(_dbl(F.col("embedding")))
    en = e.select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double") / nrm).alias(
            "nv"
        ),
    )
    ivfc = en.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("icid"), F.col("nv").alias("icv")
    )
    ndot = F.aggregate(
        F.zip_with(F.col("nv"), F.col("icv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wassign = Window.partitionBy("vec_id").orderBy(
        F.col("ndot").desc(), F.col("icid")
    )
    assigned = (
        en.crossJoin(F.broadcast(ivfc))
        .withColumn("ndot", ndot)
        .withColumn("rn", F.row_number().over(wassign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "nv", F.col("icid").alias("cell"))
    )
    qrow = assigned.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("cell").alias("qcell"), F.col("nv").alias("qv")
    )
    cand = (
        assigned.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qrow), F.col("cell") == F.col("qcell"))
        .select("vec_id", "label", "nv")
    )
    cb = en.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("cid"), F.col("nv").alias("cv")
    )
    ms = spark.range(PQ_M).select(F.col("id").cast("int").alias("m"))
    enc = (
        cand.crossJoin(F.broadcast(ms))
        .crossJoin(F.broadcast(cb))
        .withColumn("d2", _sub_l2(F.col("nv"), F.col("cv"), F.col("m")))
        .groupBy("vec_id", "label", "m")
        .agg(F.min_by("cid", F.struct(F.col("d2"), F.col("cid"))).alias("code"))
    )
    qd = (
        qrow.crossJoin(F.broadcast(ms.select(F.col("m").alias("qm"))))
        .crossJoin(F.broadcast(cb))
        .select(
            "qm",
            F.col("cid").alias("qcid"),
            _sub_l2(F.col("qv"), F.col("cv"), F.col("qm")).alias("d2"),
        )
    )
    adc = (
        enc.join(
            F.broadcast(qd),
            (F.col("m") == F.col("qm")) & (F.col("code") == F.col("qcid")),
        )
        .groupBy("vec_id", "label")
        .agg(F.sum("d2").alias("dist"))
    )
    return ranked_topk(adc, TOP_K, [F.col("dist"), F.col("vec_id")]).select(
        "vec_id", "label", F.round("dist", 6).alias("adc"), "rank"
    )


IVF_MOD = 50  # every 50th corpus vector is an IVF centroid (same rule as
# sim_search_ivf / sim_search_ivf_pq — keep in lockstep with the oracle)


def build_ivf_pq_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per session per corpus) the ingest-persisted IVF-PQ
    index and return its directory.  Three artifacts:

    * ``codes/`` — one row per vector: (vec_id, label, codes array<int>),
      **partitioned by the IVF cell id** so a query's probe is a
      partition-pruned scan of exactly one cell directory;
    * ``centroids/`` — the C coarse centroids (O(C) rows);
    * ``codebook/`` — the K PQ codewords (O(K) rows).

    The build is the one corpus-wide pass (assign cell, encode M codes)
    that `sim_search_ivf_pq` previously re-ran inline per query; here it
    runs at ingest and the query path reads only index artifacts.  At
    100 TB the codes table is ~M·4 bytes + key per vector (the d·4/M
    compression that makes PQ worth storing), and cell = partition key
    means adding a day of vectors appends new files without touching old
    cells.  Idempotent: a ready-marker skips the rebuild, so repeated
    bench/driver invocations in one session pay the build once."""
    from esxsnmp_tsdb_spark.operators._workdirs import op_dir

    root = op_dir("ivf_pq_index__" + sf_dir.strip("/").replace("/", "_"),
                  fresh=False)
    marker = os.path.join(root, "_INDEX_READY")
    if os.path.exists(marker):
        return root
    e = _t(spark, sf_dir)["embeddings"]
    nrm = norm(_dbl(F.col("embedding")))
    en = e.select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double") / nrm).alias(
            "nv"
        ),
    )
    ivfc = en.filter(F.col("vec_id") % IVF_MOD == 0).select(
        F.col("vec_id").alias("icid"), F.col("nv").alias("icv")
    )
    cb = en.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("cid"), F.col("nv").alias("cv")
    )
    ndot = F.aggregate(
        F.zip_with(F.col("nv"), F.col("icv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wassign = Window.partitionBy("vec_id").orderBy(
        F.col("ndot").desc(), F.col("icid")
    )
    assigned = (
        en.crossJoin(F.broadcast(ivfc))
        .withColumn("ndot", ndot)
        .withColumn("rn", F.row_number().over(wassign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "nv", F.col("icid").alias("cell"))
    )
    ms = spark.range(PQ_M).select(F.col("id").cast("int").alias("m"))
    codes = (
        assigned.crossJoin(F.broadcast(ms))
        .crossJoin(F.broadcast(cb))
        .withColumn("d2", _sub_l2(F.col("nv"), F.col("cv"), F.col("m")))
        .groupBy("vec_id", "label", "cell", "m")
        .agg(F.min_by("cid", F.struct(F.col("d2"), F.col("cid"))).alias("code"))
        .groupBy("vec_id", "label", "cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
    )
    (
        codes.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(root, "codes"))
    )
    ivfc.write.mode("overwrite").parquet(os.path.join(root, "centroids"))
    cb.write.mode("overwrite").parquet(os.path.join(root, "codebook"))
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return root


@op("sim_search_ivf_pq_indexed", oracle=_IVF_PQ_ORACLE)
def sim_search_ivf_pq_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ answered from the ingest-persisted index — the production
    shape `sim_search_ivf_pq`'s docstring promises, in code: the corpus
    pass (cell assignment + PQ encoding) ran once at ingest
    (`build_ivf_pq_index`); the query path touches ONLY index artifacts.

    Query cost, independent of corpus size: (1) route the query — one
    dot product against the O(C) broadcast centroid table (the single
    collected scalar is the cell id, the bounded IVF routing decision);
    (2) build the M×K ADC table against the O(K) codebook; (3) scan the
    probed cell's codes — a **partition-pruned** read (``cell = <q>``
    lands in PartitionFilters, asserted in tests/test_plans.py), join
    the broadcast ADC table, TakeOrdered the top k.  Same oracle as the
    inline op: persistence must not change a single rank."""
    root = build_ivf_pq_index(spark, sf_dir)
    e = _t(spark, sf_dir)["embeddings"]
    nrm = norm(_dbl(F.col("embedding")))
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.transform(F.col("embedding"), lambda x: x.cast("double") / nrm).alias(
            "qv"
        )
    )
    cents = spark.read.parquet(os.path.join(root, "centroids"))
    qcell = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "icid",
            F.aggregate(
                F.zip_with(F.col("qv"), F.col("icv"), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("ndot"),
        )
        .orderBy(F.col("ndot").desc(), F.col("icid"))
        .first()
        .icid
    )
    cbq = spark.read.parquet(os.path.join(root, "codebook"))
    ms = spark.range(PQ_M).select(F.col("id").cast("int").alias("qm"))
    qd = (
        q.crossJoin(F.broadcast(ms))
        .crossJoin(F.broadcast(cbq))
        .select(
            "qm",
            F.col("cid").alias("qcid"),
            _sub_l2(F.col("qv"), F.col("cv"), F.col("qm")).alias("d2"),
        )
    )
    cand = (
        spark.read.parquet(os.path.join(root, "codes"))
        .filter(F.col("cell") == qcell)
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id", "label", F.posexplode("codes").alias("m", "code")
        )
    )
    adc = (
        cand.join(
            F.broadcast(qd),
            (F.col("m") == F.col("qm")) & (F.col("code") == F.col("qcid")),
        )
        .groupBy("vec_id", "label")
        .agg(F.sum("d2").alias("dist"))
    )
    return ranked_topk(adc, TOP_K, [F.col("dist"), F.col("vec_id")]).select(
        "vec_id", "label", F.round("dist", 6).alias("adc"), "rank"
    )


def build_lsh_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per session per corpus) the ingest-persisted LSH index:
    the corpus with its random-hyperplane bucket id, written PARTITIONED
    BY the bucket — the layout `sim_search_ann_lsh`'s docstring promises
    at 100 TB, where a probe reads ~1/2^planes of the data as a
    partition-pruned scan.  Embeddings ride along in the index because
    LSH rescoring is exact cosine on the survivors (unlike PQ, which
    rescans codes)."""
    from esxsnmp_tsdb_spark.operators._workdirs import op_dir
    from esxsnmp_tsdb_spark.operators.similarity import (
        _emb_dim,
        _lsh_bucket_expr,
    )

    root = op_dir(
        "lsh_index__" + sf_dir.strip("/").replace("/", "_"), fresh=False
    )
    marker = os.path.join(root, "_INDEX_READY")
    if os.path.exists(marker):
        return root
    e = _t(spark, sf_dir)["embeddings"]
    bucketed = e.select(
        "vec_id",
        "label",
        "embedding",
        _lsh_bucket_expr(_emb_dim(spark, sf_dir)).alias("bucket"),
    )
    (
        bucketed.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(root, "buckets"))
    )
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return root


@op("sim_search_lsh_indexed", oracle=_lsh_oracle("b.bucket = q.qbucket"))
def sim_search_lsh_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-probe LSH answered from the ingest-persisted bucket index
    (`build_lsh_index`) — the second ANN family with its promised layout
    made real (the first is `sim_search_ivf_pq_indexed`): the query's
    bucket id is one O(planes·d) fold over the query row, and the probe
    is a statically partition-pruned scan of that one bucket directory,
    brute-forced exactly and TakeOrdered to k.  Same oracle as
    `sim_search_ann_lsh`: the index changes the physics, not one rank.
    Multiprobe at scale is the same index with an IN-list of bucket ids —
    (planes+1) pruned partitions instead of one."""
    from esxsnmp_tsdb_spark.operators.similarity import (
        _emb_dim,
        _lsh_bucket_expr,
    )

    root = build_lsh_index(spark, sf_dir)
    e = _t(spark, sf_dir)["embeddings"]
    qrow = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(
            "embedding",
            _lsh_bucket_expr(_emb_dim(spark, sf_dir)).alias("qbucket"),
        )
        .first()
    )
    cand = (
        spark.read.parquet(os.path.join(root, "buckets"))
        .filter(F.col("bucket") == qrow.qbucket)
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            "label",
            cosine(
                _dbl(F.col("embedding")), _dbl(F.lit(qrow.embedding))
            ).alias("cos_raw"),
        )
    )
    return ranked_topk(
        cand, TOP_K, [F.col("cos_raw").desc(), F.col("vec_id")]
    ).select("vec_id", "label", F.round("cos_raw", 6).alias("cos"), "rank")


@op(
    "ann_recall_eval_ivfpq",
    oracle=f"""
WITH {_EXACT_TOPK_CTE},
ann AS (
  SELECT vec_id FROM ({_IVF_PQ_ORACLE})
)
SELECT {TOP_K} AS k,
       (SELECT count(*) FROM ann) AS n_ann,
       (SELECT count(*) FROM exact JOIN ann USING (vec_id)) AS hits,
       round((SELECT count(*) FROM exact JOIN ann USING (vec_id)) * 1.0
             / {TOP_K}, 6) AS recall
""",
)
def ann_recall_eval_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the INDEXED IVF-PQ path against the exact brute-force
    baseline — `ann_recall_eval` for the second index family, measured on
    the production query path (`sim_search_ivf_pq_indexed`, persisted
    cells + codes) rather than the inline composition, so the number is
    the recall a user of the stored index actually gets.  Comparison
    cost: two k-row results joined."""
    exact = sim_search_topk(spark, sf_dir).select("vec_id")
    ann = sim_search_ivf_pq_indexed(spark, sf_dir).select("vec_id")
    # ONE action (r13): same fold as `ann_recall_eval` — the old second
    # `.count()` re-executed the whole indexed-ANN lineage.
    n_ann, hits = (
        # .distinct() on the ≤k-row build side (ADVICE r13): the fold
        # assumes exact's vec_id set is duplicate-free (a duplicate would
        # fan the left join out and inflate both tallies) — vec_ids ARE
        # unique by construction; the invariant is now explicit for the
        # cost of a dedup over ≤k rows.
        ann.join(
            exact.distinct().withColumn("hit", F.lit(1)), "vec_id", "left"
        )
        .agg(F.count(F.lit(1)), F.count("hit"))
        .first()
    )
    return spark.createDataFrame(
        [(TOP_K, n_ann, hits, round(hits / TOP_K, 6))],
        "k int, n_ann bigint, hits bigint, recall double",
    )
