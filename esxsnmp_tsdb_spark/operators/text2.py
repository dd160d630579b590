"""Text-analysis ops, batch 2 (EXT): repetition filtering, per-document
word entropy, and Heaps-law vocabulary growth.

These extend ``text.py``'s quality family with the remaining filters a
pretraining pipeline runs before tokenisation: repetition screens (the
Gopher-style "fraction of duplicate words / dominance of one n-gram"
rules, adapted to the single-line fixture documents), information
density (unigram entropy), and the corpus-level vocabulary growth curve
used to sanity-check crawl snapshots against Heaps' law.

Determinism: ratios compare rounded values so keep/drop decisions agree
across engines; entropy uses natural log on DOUBLE (Spark ``ln`` ≡
DuckDB ``ln`` at round-6, the text_unigram_logprob precedent); the
growth curve is integer counts plus one final rounded ratio.

Scale posture:

* ``text_repetition_filter``: words and bigrams explode JVM-side and
  reduce per doc_id immediately — one shuffle on doc_id carrying only
  (hash, count) partials, never the text.
* ``text_word_entropy``: one explode + one (doc, word) aggregate + one
  doc rollup, all on the doc_id key.
* ``vocab_growth_heaps``: the corpus-sized work is "first doc that ever
  used each word" — a word-keyed min aggregate (the first-touch trick
  cumulative_distinct_users uses on users).  Everything after runs on a
  FIXED 20-bucket frame: per-bucket news, running totals via
  ``bounded_running`` (audit-safe bounded window).  The bucket edges
  come from max(doc_id) as a broadcast 1-row scalar — never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esxsnmp_tsdb_spark.functions.topk import bounded_running
from esxsnmp_tsdb_spark.registry import op
from esxsnmp_tsdb_spark.sources import register_views

DUP_RATIO_MAX = 0.6  # keep docs whose duplicate-word fraction <= this
TOP_BIGRAM_MAX = 0.05  # and whose most frequent bigram share <= this
GROWTH_BUCKETS = 20  # fixed bucket count for the vocab growth curve


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return register_views(spark, sf_dir)["documents"]


@op(
    "text_repetition_filter",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
w AS (SELECT doc_id, unnest(tk) AS word, len(tk) AS n FROM toks),
per AS (
  SELECT doc_id, any_value(n) AS n_words,
         count(DISTINCT word) AS n_distinct
  FROM w GROUP BY doc_id
),
bg AS (
  SELECT doc_id, md5(concat(tk[s.s], ' ', tk[s.s + 1])) AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(tk), 1)) AS s) s
  WHERE len(tk) >= 2
),
bgc AS (
  SELECT doc_id, max(c) AS top_bigram_n, CAST(sum(c) AS BIGINT) AS n_bigrams
  FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2)
  GROUP BY doc_id
)
SELECT per.doc_id, per.n_words,
       round(1.0 - per.n_distinct * 1.0 / per.n_words, 6) AS dup_word_ratio,
       round(bgc.top_bigram_n * 1.0 / bgc.n_bigrams, 6) AS top_bigram_frac,
       round(1.0 - per.n_distinct * 1.0 / per.n_words, 6) <= {DUP_RATIO_MAX}
         AND round(bgc.top_bigram_n * 1.0 / bgc.n_bigrams, 6)
             <= {TOP_BIGRAM_MAX} AS keep
FROM per JOIN bgc ON per.doc_id = bgc.doc_id
""",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition screen (Gopher-rule shape, adapted to the one-line
    fixture docs): duplicate-word fraction and the corpus share of the
    single most frequent bigram, plus the keep/drop decision — the
    filter that catches boilerplate and keyboard-mash documents.

    Words and bigrams are JVM-side (`split`, `transform`+`sequence`,
    md5 of the pair); both paths aggregate per doc_id immediately, so
    the shuffle carries count partials keyed by doc_id, never text.
    Both ratios are rounded BEFORE the threshold compare so the keep
    flag is bit-identical across engines."""
    toks = _docs(spark, sf_dir).select("doc_id", F.split("text", " ").alias("tk"))
    w = toks.select("doc_id", F.size("tk").alias("n"), F.explode("tk").alias("word"))
    per = w.groupBy("doc_id").agg(
        F.first("n").cast("bigint").alias("n_words"),
        F.countDistinct("word").alias("n_distinct"),
    )
    bigrams = F.expr(
        "transform(sequence(1, size(tk) - 1), i -> md5(concat(tk[i - 1], ' ', tk[i])))"
    )
    bg = (
        toks.filter(F.size("tk") >= 2)
        .select("doc_id", F.explode(bigrams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bgc = bg.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_n"),
        F.sum("c").cast("bigint").alias("n_bigrams"),
    )
    dup = F.round(1.0 - F.col("n_distinct") / F.col("n_words"), 6)
    topf = F.round(F.col("top_bigram_n") / F.col("n_bigrams"), 6)
    return per.join(bgc, "doc_id").select(
        "doc_id",
        "n_words",
        dup.alias("dup_word_ratio"),
        topf.alias("top_bigram_frac"),
        ((dup <= DUP_RATIO_MAX) & (topf <= TOP_BIGRAM_MAX)).alias("keep"),
    )


@op(
    "text_word_entropy",
    oracle="""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
c AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY doc_id)
SELECT c.doc_id, any_value(n.n) AS n_words,
       round(-sum((c.c * 1.0 / n.n) * ln(c.c * 1.0 / n.n)), 6) AS entropy_nats
FROM c JOIN n ON c.doc_id = n.doc_id
GROUP BY c.doc_id
""",
)
def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram (word) entropy in nats — the information-
    density score: near-zero for degenerate repeated-token docs, high
    for diverse vocabulary.  Complements the repetition screen with a
    single scalar quality feature.

    One explode, a (doc, word) count, and a doc rollup — every stage
    keyed by doc_id, so Spark plans ONE exchange and reuses it.  The
    entropy sum is rounded at 6 on both sides (ln-parity across JVM and
    libm is established by text_unigram_logprob)."""
    w = _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    c = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    n = c.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        c.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.first("n").alias("n_words"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy_nats"),
        )
    )


@op(
    "vocab_growth_heaps",
    oracle=f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
mx AS (SELECT max(doc_id) + 1 AS n_docs FROM documents),
first_use AS (SELECT word, min(doc_id) AS first_doc FROM w GROUP BY word),
tok AS (
  SELECT (doc_id * {GROWTH_BUCKETS}) // mx.n_docs AS bucket,
         count(*) AS n_tokens
  FROM w, mx GROUP BY 1
),
voc AS (
  SELECT (first_doc * {GROWTH_BUCKETS}) // mx.n_docs AS bucket,
         count(*) AS new_words
  FROM first_use, mx GROUP BY 1
),
b AS (
  SELECT tok.bucket, tok.n_tokens, coalesce(voc.new_words, 0) AS new_words
  FROM tok LEFT JOIN voc ON tok.bucket = voc.bucket
),
r AS (
  SELECT bucket, new_words,
         CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
         CAST(sum(new_words) OVER w AS BIGINT) AS cum_vocab
  FROM b WINDOW w AS (ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT bucket, new_words, cum_tokens, cum_vocab,
       round(ln(cum_vocab) / ln(cum_tokens), 6) AS heaps_beta
FROM r
""",
)
def vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: sweep the corpus in doc_id order
    (bucketed into {N} fixed slices), tracking cumulative token count,
    cumulative distinct vocabulary, and the implied Heaps exponent
    ln(V)/ln(N) per slice — the curve that flags a crawl snapshot whose
    vocabulary grows too fast (spam/gibberish) or too slow (dedup bug).

    Cumulative distinct-over-a-sweep is the first-touch trick: each
    word contributes at its min(doc_id), a word-keyed aggregate that
    shuffles one short row per distinct word; no windowed COUNT
    DISTINCT ever runs.  Bucket edges scale by max(doc_id) as a
    broadcast 1-row scalar, so the curve has exactly {N} points at any
    corpus size and the running totals ride ``bounded_running`` (a
    bounded, audit-safe window over {N} rows)."""
    w = _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    mx = _docs(spark, sf_dir).agg((F.max("doc_id") + 1).alias("n_docs"))

    def bucket_of(col):
        # floor-then-cast is the engine-agnostic integer division (a
        # bare double→bigint cast truncates here but ROUNDS in DuckDB).
        return F.floor(col * GROWTH_BUCKETS / F.col("n_docs")).cast("bigint")

    tok = (
        w.crossJoin(F.broadcast(mx))
        .groupBy(bucket_of(F.col("doc_id")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )
    first_use = w.groupBy("word").agg(F.min("doc_id").alias("first_doc"))
    voc = (
        first_use.crossJoin(F.broadcast(mx))
        .groupBy(bucket_of(F.col("first_doc")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("new_words"))
    )
    b = tok.join(voc, "bucket", "left").select(
        "bucket",
        "n_tokens",
        F.coalesce("new_words", F.lit(0)).alias("new_words"),
    )
    run = bounded_running(F.col("bucket"), [F.col("bucket")])
    r = b.select(
        "bucket",
        "new_words",
        F.sum("n_tokens").over(run).cast("bigint").alias("cum_tokens"),
        F.sum("new_words").over(run).cast("bigint").alias("cum_vocab"),
    )
    return r.select(
        "bucket",
        "new_words",
        "cum_tokens",
        "cum_vocab",
        F.round(F.log(F.col("cum_vocab")) / F.log(F.col("cum_tokens")), 6).alias(
            "heaps_beta"
        ),
    )
