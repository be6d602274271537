"""Extension-operator catalog entries (dedup / similarity / text analysis)
with DuckDB oracle twins generated from the SAME constants as the Spark
plans (ext/dedup.py coefficient table, ext/text.py stopword lists), so the
two dialects cannot drift.

Cross-engine anchors verified empirically (see tests/test_oracle_parity):

- base hash: ``conv(substr(md5(s),1,8),16,10)`` ≡ DuckDB
  ``CAST('0x'||substr(md5(s),1,8) AS BIGINT)``;
- MinHash terms: ``(a·H+b) % p`` with a < 2^30 (int64-overflow-safe in
  both engines);
- cosine: Spark ``zip_with``+``aggregate`` left-fold ≡ DuckDB
  ``list_reduce(list_transform(list_zip(...)))`` (NOT list_dot_product,
  which accumulates in float32);
- DuckDB regexp_replace needs the explicit ``'g'`` flag to match Spark's
  replace-all default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ext import dedup as X
from ..ext import similarity as S
from ..ext import text as TX
from ..tables import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# shared DuckDB SQL fragments (single source: the ext module constants)
# ---------------------------------------------------------------------------

SQL_H = "CAST('0x' || substr(md5({s}), 1, 8) AS BIGINT)"
SQL_WORDS = "string_split_regex(lower({t}), '\\s+')"


def sql_shingles(t: str, n: int = 3) -> str:
    w = SQL_WORDS.format(t=t)
    return (
        f"CASE WHEN len({w}) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len({w}) - {n - 2}), "
        f"i -> array_to_string(({w})[i:i+{n - 1}], ' '))) "
        f"ELSE [array_to_string({w}, ' ')] END"
    )


def sql_minhash(col_hs: str, a: int, b: int) -> str:
    return (
        f"list_min(list_transform({col_hs}, "
        f"h -> (h * {a} + {b}) % {X.MINHASH_PRIME}))"
    )


SQL_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), z -> z[1]*z[2]), "
    "(acc, x) -> acc + x)"
)


def sql_cosine(a: str, b: str) -> str:
    return (
        f"{SQL_DOT.format(a=a, b=b)} / "
        f"(sqrt({SQL_DOT.format(a=a, b=a)}) * sqrt({SQL_DOT.format(a=b, b=b)}))"
    )


def _sql_stopword_score(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in TX.STOPWORDS[lang])
    return (
        f"len(list_filter({SQL_WORDS.format(t='text')}, t -> t IN ({words})))"
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_LANGS = sorted(TX.STOPWORDS)
_LANG_CASE = " ".join(
    f"WHEN {_sql_stopword_score(lang)} = _best THEN '{lang}'" for lang in _LANGS
)
_LANG_ORACLE = f"""
    WITH scored AS (
        SELECT doc_id, text,
               greatest({", ".join(_sql_stopword_score(lang) for lang in _LANGS)})
                   AS _best
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN _best <= 0 THEN 'und' {_LANG_CASE} END AS lang_pred
    FROM scored
"""


@register(
    "x1_lang_id_stopword_vote",
    "Extension: language ID by stopword voting (deterministic heuristic, "
    "lexicographic tie-break, 'und' when no stopword hits). Native lambda "
    "filter over the token array — projection-only, no shuffle.",
    oracle=_LANG_ORACLE,
    tags=("ext", "text"),
)
def x1_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return TX.add_language_id(docs).select("doc_id", "lang_pred")


_QUALITY_ORACLE = """
    SELECT doc_id,
           len(string_split_regex(lower(text), '\\s+'))       AS word_count,
           CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()-]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1)                    AS punct_ratio,
           CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1)                    AS upper_ratio,
           least(CAST(len(string_split_regex(lower(text), '\\s+')) AS DOUBLE) / 50.0, 1.0)
             * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()-]', '', 'g')) AS DOUBLE)
                            / greatest(length(text), 1) * 4.0, 1.0))
             * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
                            / greatest(length(text), 1) * 4.0, 1.0))
                                                              AS quality_score
    FROM documents
"""


@register(
    "x2_text_quality_signals",
    "Extension: text-quality heuristics (length / punctuation / uppercase "
    "signals + composite score) — the pre-training quality-filter tier, "
    "all regexp/length arithmetic, identical operation order in both "
    "dialects so the doubles hash-match.",
    oracle=_QUALITY_ORACLE,
    tags=("ext", "text"),
)
def x2_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return TX.add_quality_signals(docs).select(
        "doc_id", "word_count", "punct_ratio", "upper_ratio", "quality_score"
    )


@register(
    "x3_token_counts",
    "Extension: whitespace + BPE-ish regex token counting "
    "(regexp_count ≡ len(regexp_extract_all)).",
    oracle=f"""
        SELECT doc_id,
               len(string_split_regex(lower(text), '\\s+')) AS ws_tokens,
               len(regexp_extract_all(text, '{TX.TOKEN_PATTERN}')) AS bpe_tokens
        FROM documents
    """,
    tags=("ext", "text"),
)
def x3_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return TX.add_token_counts(docs).select("doc_id", "ws_tokens", "bpe_tokens")


@register(
    "x4_fingerprint_md5",
    "Extension: document fingerprint = md5 of lowercased whitespace-"
    "collapsed text (the 16-byte dedup shuffle key at scale).",
    oracle="""
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
        FROM documents
    """,
    tags=("ext", "text", "dedup"),
)
def x4_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return TX.add_fingerprint(docs).select("doc_id", "fingerprint")


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


@register(
    "x5_exact_dedup_groups",
    "Extension: exact dedup by content hash — groups with deterministic "
    "keeper (min id) and copy count. Shuffle key is the 16-byte hash, not "
    "the document.",
    oracle="""
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
               min(doc_id) AS keeper_id,
               count(doc_id) AS copies
        FROM documents
        GROUP BY 1
    """,
    tags=("ext", "dedup"),
)
def x5_exact_dedup_groups(spark: SparkSession, sf: str) -> DataFrame:
    return X.exact_dedup_groups(load_table(spark, sf, "documents"))


_JACCARD_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id,
               unnest({sql_shingles('text')}) AS s,
               len({sql_shingles('text')}) AS n_sh
        FROM documents
    ),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS common, any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(common AS DOUBLE) / (n_a + n_b - common) AS jaccard
    FROM common
    WHERE CAST(common AS DOUBLE) / (n_a + n_b - common) >= 0.5
"""


@register(
    "x6_jaccard_near_dup_pairs",
    "Extension: exact word-3-gram Jaccard near-dup pairs, shingle-blocked "
    "(only pairs sharing a shingle are materialized). The exact tool the "
    "MinHash-LSH path approximates.",
    oracle=_JACCARD_ORACLE,
    tags=("ext", "dedup", "join"),
)
def x6_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    return X.jaccard_near_dup_pairs(
        load_table(spark, sf, "documents"), threshold=0.5
    )


_MH_COLS = ",\n               ".join(
    f"{sql_minhash('hs', a, b)} AS mh{i:02d}"
    for i, (a, b) in enumerate(X.MINHASH_COEFFS)
)
_MINHASH_ORACLE = f"""
    WITH hashed AS (
        SELECT doc_id,
               list_transform({sql_shingles('text')}, s -> {SQL_H.format(s='s')}) AS hs
        FROM documents
    )
    SELECT doc_id,
           {_MH_COLS}
    FROM hashed
"""


@register(
    "x7_minhash_signatures",
    "Extension: 16-hash MinHash signatures over word-3-gram shingles — "
    "computed as a pure projection (array_min over transformed shingle "
    "array; zero shuffle). Flattened to 16 columns for hash comparison.",
    oracle=_MINHASH_ORACLE,
    tags=("ext", "dedup", "minhash"),
)
def x7_minhash_signatures(spark: SparkSession, sf: str) -> DataFrame:
    sig = X.minhash_signatures(load_table(spark, sf, "documents"))
    return sig.select(
        "doc_id",
        *[
            F.element_at("signature", i + 1).alias(f"mh{i:02d}")
            for i in range(len(X.MINHASH_COEFFS))
        ],
    )


_ROWS_PER_BAND = len(X.MINHASH_COEFFS) // X.LSH_BANDS
_BAND_SELECTS = "\n        UNION ALL\n".join(
    f"""        SELECT doc_id, {j} AS band,
               md5(concat_ws('_', {j}, {", ".join(f"mh{j * _ROWS_PER_BAND + r:02d}" for r in range(_ROWS_PER_BAND))})) AS band_hash
        FROM sig"""
    for j in range(X.LSH_BANDS)
)
_LSH_ORACLE = f"""
    WITH hashed AS (
        SELECT doc_id,
               list_transform({sql_shingles('text')}, s -> {SQL_H.format(s='s')}) AS hs
        FROM documents
    ),
    sig AS (
        SELECT doc_id, {_MH_COLS}
        FROM hashed
    ),
    bands AS (
{_BAND_SELECTS}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
                AND a.doc_id < b.doc_id
"""


@register(
    "x8_minhash_lsh_candidate_pairs",
    "Extension: MinHash-LSH candidate pairs (4 bands × 4 rows): the "
    "100 TB near-dup path — one shuffle on (band, band-hash), pair joins "
    "only within buckets.",
    oracle=_LSH_ORACLE,
    tags=("ext", "dedup", "minhash", "lsh"),
)
def x8_lsh_candidates(spark: SparkSession, sf: str) -> DataFrame:
    return X.lsh_candidate_pairs(load_table(spark, sf, "documents"))


_AGREE_SQL = " + ".join(
    f"CASE WHEN a.mh{i:02d} = b.mh{i:02d} THEN 1 ELSE 0 END"
    for i in range(len(X.MINHASH_COEFFS))
)
_MH_EST_ORACLE = f"""
    WITH hashed AS (
        SELECT doc_id,
               list_transform({sql_shingles('text')}, s -> {SQL_H.format(s='s')}) AS hs
        FROM documents
    ),
    sig AS (
        SELECT doc_id, {_MH_COLS}
        FROM hashed
    ),
    bands AS (
{_BAND_SELECTS}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
                    AND a.doc_id < b.doc_id
    )
    SELECT cand.doc_a, cand.doc_b,
           CAST({_AGREE_SQL} AS DOUBLE) / {len(X.MINHASH_COEFFS)}.0 AS jaccard_est
    FROM cand
    JOIN sig a ON a.doc_id = cand.doc_a
    JOIN sig b ON b.doc_id = cand.doc_b
"""


@register(
    "x15_minhash_jaccard_estimate",
    "Extension: MinHash Jaccard estimation over the LSH candidates "
    "(agreeing hashes / k) — the end-to-end scale decision path: "
    "signatures are a projection, candidates one bucket shuffle, and "
    "the estimate never rematerializes shingle sets (x6 is the exact "
    "audit tool).",
    oracle=_MH_EST_ORACLE,
    tags=("ext", "dedup", "minhash", "lsh"),
)
def x15_minhash_jaccard_estimate(spark: SparkSession, sf: str) -> DataFrame:
    return X.minhash_jaccard_estimates(load_table(spark, sf, "documents"))


_SIMHASH_BITS_SQL = " + ".join(
    f"""CASE WHEN list_sum(list_transform({SQL_WORDS.format(t='text')},
        t -> CASE WHEN ({SQL_H.format(s='t')} >> {bit}) & 1 = 1 THEN 1 ELSE -1 END)) > 0
        THEN {1 << bit} ELSE 0 END"""
    for bit in range(X.SIMHASH_BITS)
)


@register(
    "x9_simhash_signatures",
    "Extension: 16-bit SimHash signatures (per-bit ±1 token votes, "
    "projection-only). Near-dups = small Hamming distance; nibble-LSH "
    "blocking lives in ext.dedup.simhash_near_dup_pairs.",
    oracle=f"""
        SELECT doc_id, CAST({_SIMHASH_BITS_SQL} AS BIGINT) AS simhash16
        FROM documents
    """,
    tags=("ext", "dedup", "simhash"),
)
def x9_simhash_signatures(spark: SparkSession, sf: str) -> DataFrame:
    return X.simhash_signatures(load_table(spark, sf, "documents"))


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_COS_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    p AS (
        SELECT vec_id AS probe_id, v AS pv FROM c WHERE vec_id < 8
    ),
    scored AS (
        SELECT probe_id, c.vec_id AS neighbor_id,
               {sql_cosine('pv', 'v')} AS cos_sim
        FROM c CROSS JOIN p
        WHERE c.vec_id <> probe_id
    )
    SELECT probe_id, neighbor_id, cos_sim, rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored
    )
    WHERE rank <= 3
"""


@register(
    "x10_cosine_topk_bruteforce",
    "Extension: exact cosine top-3 per probe (vec_id<8) by brute force — "
    "the ANN ground-truth baseline. Probe side broadcast; double "
    "left-fold accumulation is bit-identical across engines.",
    oracle=_COS_ORACLE,
    tags=("ext", "similarity", "ann"),
)
def x10_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    return S.brute_force_topk(emb, emb.filter(F.col("vec_id") < 8), k=3)


@register(
    "x11_lsh_ann_topk",
    "Extension: approximate top-3 via random-hyperplane sign-bit LSH "
    "with multi-probe (distance-1 bucket flips — the scale path; recall "
    "vs x10 is the quality metric, checked in tests). Hyperplanes are "
    "md5-derived at plan build; not practically SQL-expressible → "
    "rows-only check.",
    oracle=None,
    tags=("ext", "similarity", "ann", "lsh"),
)
def x11_lsh_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    return S.lsh_topk(emb, emb.filter(F.col("vec_id") < 8), k=3, probe_flips=1)


@register(
    "x14_ivf_ann_topk",
    "Extension: approximate top-3 via an IVF index (deterministic coarse "
    "quantizer, nprobe=2) — the partition-by-cell ANN scale path "
    "complementing the sign-bit LSH of x11. Centroid list is collected at "
    "plan build; rows-only check.",
    oracle=None,
    tags=("ext", "similarity", "ann", "ivf"),
)
def x14_ivf_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    return S.ivf_topk(emb, emb.filter(F.col("vec_id") < 8), k=3)


@register(
    "x12_embedding_near_dup_pairs",
    "Extension: embedding-cosine near-duplicate pairs (cos ≥ 0.9), "
    "LSH-bucketed so only same-bucket pairs are scored. Rows-only check "
    "(hyperplane constants live in the plan).",
    oracle=None,
    tags=("ext", "similarity", "dedup"),
)
def x12_embedding_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    return S.embedding_near_dup_pairs(
        load_table(spark, sf, "embeddings"), threshold=0.9
    )


@register(
    "x13_rolling_hash_fingerprint",
    "Extension: Karp-Rabin polynomial rolling hash via the aggregate "
    "higher-order function (order-dependent scan without a UDF). "
    "Rows-only: ascii() on non-ASCII codepoints is engine-specific.",
    oracle=None,
    tags=("ext", "text"),
)
def x13_rolling_hash(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return TX.add_rolling_hash(docs).select("doc_id", "rolling_hash")


@register(
    "x16_deterministic_hash_sample",
    "Reproducible corpus sampling: keep the ~1/8 of documents whose "
    "md5(doc_id) starts with '0' or '1'. Hash-based sampling is THE "
    "training-data sampling primitive — deterministic across runs, "
    "cluster-size-independent, composable (re-running with a wider prefix "
    "set strictly grows the sample), and embarrassingly parallel: a pure "
    "projection+filter with no shuffle, unlike rand()-based sampling which "
    "is irreproducible across retries/speculative tasks.",
    oracle="""
        SELECT doc_id, length(text) AS text_len
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
    tags=("sampling", "deterministic", "text"),
)
def x16_deterministic_hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
    ).select("doc_id", F.length("text").alias("text_len"))


@register(
    "x17_decontaminate_anti_join",
    "Benchmark decontamination: drop every document whose exact content "
    "fingerprint appears in a held-out 'benchmark' set (here: the 10 "
    "longest docs, tie-broken by doc_id — a stand-in for a real eval set). "
    "The benchmark side is tiny by construction, so the plan is a broadcast "
    "LEFT ANTI join on md5(text): the 100 TB corpus side never shuffles, "
    "each partition just probes the broadcast fingerprint set. Null texts "
    "are excluded up front so NOT-IN/anti-join null semantics agree.",
    oracle="""
        WITH benchmark AS (
            SELECT md5(text) AS fp
            FROM documents WHERE text IS NOT NULL
            ORDER BY length(text) DESC, doc_id
            LIMIT 10
        )
        SELECT d.doc_id, md5(d.text) AS fp
        FROM documents d
        WHERE d.text IS NOT NULL
          AND md5(d.text) NOT IN (SELECT fp FROM benchmark)
    """,
    tags=("decontamination", "anti-join", "broadcast", "dedup"),
)
def x17_decontaminate_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    benchmark = (
        docs.orderBy(F.length("text").desc(), "doc_id")
        .limit(10)
        .select(F.md5("text").alias("fp"))
    )
    corpus = docs.select("doc_id", F.md5("text").alias("fp"))
    return corpus.join(F.broadcast(benchmark), on="fp", how="left_anti").select(
        "doc_id", "fp"
    )
