"""Property-based invariants (hypothesis) for the dedup/curation tier.

Spark jobs are slow per example, so each property draws a SMALL number of
diverse corpora (max_examples=8, no shrinking deadline pressure) and
asserts structural invariants that must hold for EVERY input — the
complement of the example-based tests and the DuckDB parity sweep.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from taxi_aws_data_pipeline_spark.ext import dedup as X
from taxi_aws_data_pipeline_spark.ext import text as TX

# short word-ish tokens so duplicate lines/shingles actually occur
_WORD = st.sampled_from("alpha beta gamma delta spark shuffle plan".split())
_LINE = st.lists(_WORD, min_size=1, max_size=5).map(" ".join)
_DOC = st.lists(_LINE, min_size=0, max_size=6).map("\n".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=8)

_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, corpus):
    return spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )


@given(corpus=_CORPUS)
@_SLOW
def test_paragraph_dedup_invariants(spark, corpus):
    """(1) kept lines across the corpus == distinct non-empty lines;
    (2) per doc, kept ≤ total lines; (3) no kept line repeats anywhere."""
    out = X.paragraph_dedup(_df(spark, corpus)).collect()
    all_lines = [
        ln for d in corpus for ln in d.split("\n") if ln and d is not None
    ]
    assert sum(r.n_kept for r in out) == len(set(all_lines))
    assert all(r.n_kept <= r.n_lines for r in out)
    kept = [
        ln for r in out if r.text_dedup for ln in r.text_dedup.split("\n")
    ]
    assert len(kept) == len(set(kept))


@given(corpus=_CORPUS)
@_SLOW
def test_exact_dedup_partitions_the_corpus(spark, corpus):
    """Dedup groups partition the docs: copies sum to the corpus size,
    keepers are distinct docs, one keeper per group."""
    out = X.exact_dedup_groups(_df(spark, corpus)).collect()
    assert sum(r.copies for r in out) == len(corpus)
    keepers = [r.keeper_id for r in out]
    assert len(keepers) == len(set(keepers))


@given(corpus=_CORPUS, n=st.integers(min_value=1, max_value=3))
@_SLOW
def test_top_ngram_fraction_bounded(spark, corpus, n):
    """The repetition fraction is always in [0, 1] — count x gram length
    can never exceed the doc length it's divided by."""
    out = TX.add_top_ngram_fraction(_df(spark, corpus), n).collect()
    col = f"top_{n}gram_char_frac"
    assert all(0.0 <= r[col] <= 1.0 for r in out)


@given(corpus=_CORPUS)
@_SLOW
def test_fingerprint_is_formatting_invariant(spark, corpus):
    """Whitespace-normalized fingerprints must not change when the same
    text is re-spaced — the invariant exact dedup relies on."""
    df = _df(spark, corpus)
    noisy = df.withColumn(
        "text", F.regexp_replace(F.col("text"), " ", "  ")
    )
    a = {r.doc_id: r.fingerprint for r in TX.add_fingerprint(df).collect()}
    b = {r.doc_id: r.fingerprint for r in TX.add_fingerprint(noisy).collect()}
    assert a == b
