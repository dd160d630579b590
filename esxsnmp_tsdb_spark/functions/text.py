"""Text-analysis column helpers for the LLM-pipeline ops (SURVEY.md §2.5):
tokenization, quality stats, fingerprinting.  Built-ins only — these run in
whole-stage codegen, which is what makes them viable over 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenizer matching the fixtures' space-separated word soup.
TOKEN_SPLIT_RE = r"\s+"


def tokens(text: Column) -> Column:
    """Split into non-empty whitespace-delimited tokens."""
    return F.filter(F.split(F.trim(text), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def normalized_text(text: Column) -> Column:
    """Dedup normalization: lowercase, trim, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def content_hash(text: Column) -> Column:
    """Deterministic 256-bit content fingerprint of the normalized text."""
    return F.sha2(normalized_text(text), 256)


def shingles(text: Column, k: int) -> Column:
    """k-token shingles (distinct), the unit set for MinHash/Jaccard."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    return F.when(F.size(toks) >= k,
                  F.array_distinct(
                      F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))))
                  ).otherwise(F.array(F.concat_ws(" ", toks)))
