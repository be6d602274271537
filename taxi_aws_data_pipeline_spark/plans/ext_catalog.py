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
- double LITERALS in DuckDB must carry an exponent (``0.5e0``): a bare
  decimal literal parses as DECIMAL and converts via int128 / 10^scale,
  which is NOT correctly rounded — measured one ULP off Spark's strtod
  (x162's NDCG discounts), and an explicit CAST(... AS DOUBLE) does not
  help because the DECIMAL parse already happened.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ext import dedup as X
from ..ext import similarity as S
from ..ext import text as TX
from ..tables import load_table
from .catalog import fin, finite_vec, register, sparksql_finite, sql_finite, sql_finite_vec

def _ephemeral_ckpt(prefix: str) -> str:
    """Throwaway checkpoint dir for the one-shot streaming REPLAY
    entries (s9/s10/s11), on memory-backed storage when the host has it
    (r12, guide §6): the state store fsyncs per-partition delta files
    at every micro-batch commit purely to honor the restart contract,
    and a replay that exists to be hash-compared once never restarts —
    those fsyncs are pure disk latency in the verified path (A/B: s9
    1.76 -> 1.54 s min-of-6). Durable pipelines (S7 ingest etc.) keep
    caller-provided checkpoint locations; this helper is only for
    self-contained verification replays whose checkpoint is garbage
    the moment the sink table is read."""
    import tempfile

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)


# ---------------------------------------------------------------------------
# shared DuckDB SQL fragments (single source: the ext module constants)
# ---------------------------------------------------------------------------

SQL_H = "CAST('0x' || substr(md5({s}), 1, 8) AS BIGINT)"
SQL_WORDS = "string_split_regex(lower({t}), '\\s+')"


def sql_shingles(t: str, n: int = 3) -> str:
    # NULL text → NULL shingles (round 11, the text-NULL convention —
    # exact twin of ext/dedup.word_shingles): without the leading arm,
    # the ELSE branch wraps NULL into the one-element list [NULL]
    w = SQL_WORDS.format(t=t)
    return (
        f"CASE WHEN {t} IS NULL THEN NULL "
        f"WHEN len({w}) >= {n} THEN "
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


def _dot(a: str, b: str) -> str:
    return SQL_DOT.format(a=a, b=b)


def _km_assign(name: str, cents: str, src: str = "e") -> str:
    """One Lloyd assignment round: nearest centroid by squared L2
    (expanded to ||c||^2 - 2 x.c, the same algebra the Spark projection
    codegens), tie-break on the lower cell index."""
    return f"""
    {name} AS (
        SELECT vec_id, cell FROM (
            SELECT {src}.vec_id, c.cell,
                   row_number() OVER (PARTITION BY {src}.vec_id ORDER BY
                       {_dot('c.c', 'c.c')} - 2.0 * {_dot(f'{src}.v', 'c.c')},
                       c.cell) AS rn
            FROM {src} CROSS JOIN {cents} c
        ) WHERE rn = 1
    )"""


def _km_update(a: str, s: str, u: str, prev: str, cur: str, src: str = "e") -> str:
    """One Lloyd update round: fixed-point integer component sums ->
    double centroids; empty cells keep the previous centroid."""
    return f"""
    {s} AS (
        SELECT a.cell, t.pos,
               sum(CAST(floor(t.val * 1000000) AS BIGINT)) AS qsum,
               count(*) AS n
        FROM (SELECT vec_id, unnest(v) AS val,
                     unnest(range(0, len(v))) AS pos FROM {src}) t
        JOIN {a} a USING (vec_id)
        GROUP BY a.cell, t.pos
    ),
    {u} AS (
        SELECT cell, list(qsum / (1000000.0 * n) ORDER BY pos) AS c
        FROM {s} GROUP BY cell
    ),
    {cur} AS (
        SELECT p.cell, COALESCE(u.c, p.c) AS c
        FROM {prev} p LEFT JOIN {u} u USING (cell)
    )"""


def _km_rounds_sql(src: str, k: int, rounds: int, prefix: str) -> str:
    """``rounds`` unrolled Lloyd iterations over CTE ``src`` (vec_id, v):
    lowest-vec_id seeds, assignment + fixed-point update per round.
    Emits CTE fragments; the final centroids land in
    ``{prefix}cent`` (cell, c) and the final assignment against them in
    ``{prefix}code`` (vec_id, cell)."""
    parts = [
        f"""
    {prefix}seeds AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
               v AS c
        FROM (SELECT vec_id, v FROM {src} ORDER BY vec_id LIMIT {k})
    )"""
    ]
    prev = f"{prefix}seeds"
    for r in range(1, rounds + 1):
        a = f"{prefix}a{r}"
        cur = f"{prefix}c{r}"
        parts.append(_km_assign(a, prev, src))
        parts.append(
            _km_update(a, f"{prefix}s{r}", f"{prefix}u{r}", prev, cur, src)
        )
        prev = cur
    parts.append(f"{prefix}cent AS (SELECT cell, c FROM {prev})")
    parts.append(_km_assign(f"{prefix}code", f"{prefix}cent", src))
    return ",".join(parts)


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
           CASE WHEN text IS NULL THEN NULL ELSE
           least(CAST(len(string_split_regex(lower(text), '\\s+')) AS DOUBLE) / 50.0, 1.0)
             * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()-]', '', 'g')) AS DOUBLE)
                            / greatest(length(text), 1) * 4.0, 1.0))
             * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
                            / greatest(length(text), 1) * 4.0, 1.0))
           END                                                AS quality_score
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


# Same semantics as ext/dedup.jaccard_near_dup_pairs: candidates blocked on
# shingles with doc-frequency ≤ MAX_SHINGLE_DF, Jaccard exact. The oracle
# recomputes |A∩B| from the full shingle lists per pair (simplest correct
# SQL); the Spark plan instead counts rare-shared shingles in the blocking
# join's group-by and adds the frequent part from small per-doc arrays —
# same values, no big-array shuffle.
_JACCARD_ORACLE = f"""
    WITH docs AS (
        SELECT doc_id, {sql_shingles('text')} AS shs
        FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest(shs) AS s FROM docs
    ),
    rare AS (
        SELECT s FROM sh GROUP BY s HAVING count(*) <= {X.MAX_SHINGLE_DF}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        WHERE a.s IN (SELECT s FROM rare)
    ),
    scored AS (
        SELECT doc_a, doc_b,
               CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE)
               / (len(x.shs) + len(y.shs) - len(list_intersect(x.shs, y.shs)))
                   AS jaccard
        FROM cand
        JOIN docs x ON cand.doc_a = x.doc_id
        JOIN docs y ON cand.doc_b = y.doc_id
    )
    SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.5
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
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
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


def _sql_lsh_bucket(vec: str) -> str:
    """Sign-bit bucket id over inlined hyperplane literals — generated
    from the SAME deterministic md5-derived constants as the Spark plan
    (ext/similarity.hyperplanes), so the dialects cannot drift."""
    terms = []
    for p, plane in enumerate(S.hyperplanes(8, 64)):
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        dot = SQL_DOT.format(a=vec, b=arr)
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


# probe buckets under multi-probe: the home bucket plus each distance-1 flip
_PROBE_BUCKETS = "\n        UNION ALL\n".join(
    ["        SELECT probe_id, pv, b0 AS probe_bucket FROM p"]
    + [
        f"        SELECT probe_id, pv, xor(b0, {1 << i}) AS probe_bucket FROM p"
        for i in range(8)
    ]
)

_LSH_ANN_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    b AS (
        SELECT vec_id, v, {_sql_lsh_bucket('v')} AS bucket FROM c
    ),
    p AS (
        SELECT vec_id AS probe_id, v AS pv, bucket AS b0 FROM b
        WHERE vec_id < 8
    ),
    pb AS (
{_PROBE_BUCKETS}
    ),
    scored AS (
        SELECT pb.probe_id, b.vec_id AS neighbor_id,
               {sql_cosine('pb.pv', 'b.v')} AS cos_sim
        FROM b JOIN pb
          ON b.bucket = pb.probe_bucket AND b.vec_id <> pb.probe_id
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
    "x11_lsh_ann_topk",
    "Extension: approximate top-3 via random-hyperplane sign-bit LSH "
    "with multi-probe (distance-1 bucket flips — the scale path; recall "
    "vs x10 is the quality metric, checked in tests). Hash-verified: the "
    "oracle inlines the same md5-derived hyperplanes and replays the "
    "9-bucket multi-probe with xor flips.",
    oracle=_LSH_ANN_ORACLE,
    tags=("ext", "similarity", "ann", "lsh"),
)
def x11_lsh_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    return S.lsh_topk(emb, emb.filter(F.col("vec_id") < 8), k=3, probe_flips=1)


# IVF cell ranking: sim = dot/|centroid| (the probe's own norm is
# constant per partition), descending, ties -> HIGHER cell id (Spark's
# reverse(array_sort(struct(sim, cell))) tie order)
_IVF_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    cent AS (
        SELECT vec_id AS cell, v AS cv,
               sqrt(list_reduce(list_transform(v, x -> x * x),
                                (a, b) -> a + b)) AS cnorm
        FROM c
        WHERE vec_id IN (SELECT vec_id FROM c ORDER BY vec_id LIMIT 16)
    ),
    cellsim AS (
        SELECT c.vec_id, c.v, cent.cell,
               {SQL_DOT.format(a='c.v', b='cent.cv')} / cent.cnorm AS sim,
               row_number() OVER (PARTITION BY c.vec_id
                                  ORDER BY {SQL_DOT.format(a='c.v', b='cent.cv')}
                                           / cent.cnorm DESC,
                                           cent.cell DESC) AS rn
        FROM c CROSS JOIN cent
    ),
    assigned AS (
        SELECT vec_id AS neighbor_id, v AS cand_vec, cell
        FROM cellsim WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS probe_id, v AS probe_vec, cell
        FROM cellsim WHERE rn <= 2 AND vec_id < 8
    ),
    scored AS (
        SELECT p.probe_id, a.neighbor_id,
               {sql_cosine('p.probe_vec', 'a.cand_vec')} AS cos_sim
        FROM assigned a JOIN probes p USING (cell)
        WHERE a.neighbor_id <> p.probe_id
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
    "x14_ivf_ann_topk",
    "Extension: approximate top-3 via an IVF index (deterministic coarse "
    "quantizer = 16 lowest-id vectors, nprobe=2) — the partition-by-cell "
    "ANN scale path complementing the sign-bit LSH of x11. Hash-verified: "
    "the quantizer is pure data (no RNG), so the oracle rebuilds the "
    "same cells, cell ranking (dot/|centroid|, ties to the higher cell — "
    "Spark's reverse-sorted struct order), and nprobe fan-out in SQL.",
    oracle=_IVF_ORACLE,
    tags=("ext", "similarity", "ann", "ivf"),
)
def x14_ivf_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    return S.ivf_topk(emb, emb.filter(F.col("vec_id") < 8), k=3)


_EMB_PAIRS_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    b AS (
        SELECT vec_id, v, {_sql_lsh_bucket('v')} AS bucket FROM c
    )
    SELECT x.vec_id AS doc_a, y.vec_id AS doc_b,
           {sql_cosine('x.v', 'y.v')} AS cos_sim
    FROM b x JOIN b y
      ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    WHERE {sql_cosine('x.v', 'y.v')} >= 0.3
"""


@register(
    "x12_embedding_near_dup_pairs",
    "Extension: embedding-cosine near-duplicate pairs, LSH-bucketed so "
    "only same-bucket pairs are scored. Hash-verified against an oracle "
    "that inlines the SAME md5-derived hyperplane constants (the x32 "
    "mechanism); threshold 0.3 is fixture-calibrated (the synthetic "
    "embeddings are near-orthogonal, max same-bucket cosine ~0.49) so "
    "the gate covers real pairs — production corpora use the API "
    "default 0.9.",
    oracle=_EMB_PAIRS_ORACLE,
    tags=("ext", "similarity", "dedup"),
)
def x12_embedding_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    return S.embedding_near_dup_pairs(
        load_table(spark, sf, "embeddings"), threshold=0.3
    )


@register(
    "x13_rolling_hash_fingerprint",
    "Extension: Karp-Rabin polynomial rolling hash via the aggregate "
    "higher-order function (order-dependent scan without a UDF). The "
    "oracle emulates Spark's zero-seeded left fold by prepending 0 to "
    "the codepoint list before list_reduce. Valid because the fixture is "
    "pure ASCII — ascii() on non-ASCII codepoints is engine-specific "
    "(Spark: UTF-16 unit, DuckDB: codepoint), so non-ASCII corpora "
    "should treat this entry as Spark-defined.",
    oracle="""
        SELECT doc_id,
               CASE WHEN text IS NULL THEN NULL ELSE
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(text, ''),
                                      c -> CAST(ascii(c) AS BIGINT))),
                   (acc, x) -> (acc * 257 + x) % 1000000007)
               END AS rolling_hash
        FROM documents
    """,
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


_CLUSTER_ORACLE = f"""
    WITH RECURSIVE pairs AS ({_LSH_ORACLE}
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    walk(node, reach) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT w.node, e.dst
        FROM walk w JOIN edges e ON w.reach = e.src
    )
    SELECT node AS doc_id, LEAST(node, MIN(reach)) AS cluster_id
    FROM walk
    GROUP BY node
"""


@register(
    "x18_near_dup_clusters",
    "Near-dup cluster assignment: connected components over the MinHash-LSH "
    "candidate-pair graph via alternating large-star/small-star rewrites "
    "(Kiveris et al. SoCC'14) — O(log n) rounds at ANY component shape, the "
    "100 TB posture; min-label propagation (O(diameter) rounds, fine for "
    "quasi-cliques) stays available as method='propagation' and is "
    "equivalence-tested against it. This is the step between candidate "
    "PAIRS (x8) and an actual dedup POLICY: keep cluster_id == doc_id, drop "
    "the rest. Oracle: DuckDB recursive CTE reachability over the same "
    "pairs.",
    oracle=_CLUSTER_ORACLE,
    tags=("ext", "dedup", "clustering", "iterative"),
)
def x18_near_dup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    return X.near_dup_clusters(load_table(spark, sf, "documents"))


@register(
    "x19_repetition_signals",
    "Duplicate-line repetition signals (Gopher/MassiveText repetition "
    "filter): per-doc non-empty line count, distinct line count, and "
    "duplicate-line fraction. Pure projection (array ops on split(), no "
    "explode) — one codegen'd map pass at any scale, zero shuffle.",
    oracle="""
        SELECT doc_id,
               len(lines)                AS n_lines,
               len(list_distinct(lines)) AS n_distinct_lines,
               CASE WHEN lines IS NULL THEN NULL
                    WHEN len(lines) > 0
                    THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)
                               / len(lines)
                    ELSE 0.0 END         AS dup_line_ratio
        FROM (
            SELECT doc_id,
                   list_filter(string_split(text, chr(10)),
                               x -> length(x) > 0) AS lines
            FROM documents
        )
    """,
    tags=("ext", "text", "quality", "repetition"),
)
def x19_repetition_signals(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return TX.add_repetition_signals(docs).select(
        "doc_id", "n_lines", "n_distinct_lines", "dup_line_ratio"
    )


@register(
    "x20_stratified_quota_sample",
    "Stratified quota sampling: a deterministic per-language sample of up "
    "to 25 docs, ranked by md5(doc_id) within each language (doc_id as "
    "tie-break). The training-mix primitive — per-stratum quotas with "
    "hash ranking stay reproducible across runs and cluster sizes, unlike "
    "rand()-ordered sampling. One shuffle on the stratum key; for skewed "
    "strata the rank can run over salted sub-strata whose per-salt quotas "
    "are merged (documented scale path).",
    oracle="""
        SELECT doc_id, lang, rn
        FROM (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        )
        WHERE rn <= 25
    """,
    tags=("ext", "sampling", "stratified", "window"),
)
def x20_stratified_quota_sample(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .select("doc_id", "lang", "rn")
    )


@register(
    "x21_embedding_label_centroids",
    "Per-label embedding centroids (the k-means/IVF 'update' step and the "
    "class-prototype primitive): posexplode to (label, pos, val), then a "
    "fixed-point positional mean: components quantize via floor(val*1e6) "
    "to BIGINT (one IEEE multiply + floor — bit-identical in any engine, "
    "unlike float→decimal casts, whose midpoint rounding differs between "
    "Spark's shortest-string BigDecimal path and DuckDB's exact-binary "
    "path), integer-sum exactly (order-free), divide once at the end. "
    "Map-side partial aggregation compresses the exploded rows to "
    "|labels|×dim per partition before the single shuffle, so the explode "
    "never hits the wire at scale. Flattened to one row per (label, pos): "
    "arrays of doubles don't value-hash portably.",
    oracle=f"""
        SELECT label, pos,
               CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * 1000000) AS BIGINT))
                    AS DOUBLE) / (1000000.0 * COUNT(val)) AS centroid,
               COUNT(val)                                 AS n
        FROM (
            SELECT label,
                   generate_subscripts(embedding, 1) - 1 AS pos,
                   unnest(embedding)                     AS val
            FROM embeddings
            WHERE {sql_finite_vec('embedding')}
        )
        GROUP BY label, pos
    """,
    tags=("ext", "embedding", "centroid", "agg"),
)
def x21_embedding_label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    # a vector with any non-finite component is a failed embedding —
    # excluded whole (round-11 NaN convention; a component-level screen
    # would average a half-failed vector's surviving positions)
    emb = load_table(spark, sf, "embeddings").filter(finite_vec("embedding"))
    ex = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    q = F.floor(F.col("val").cast("double") * 1000000)
    return ex.groupBy("label", "pos").agg(
        (
            F.sum(q).cast("double") / (F.lit(1000000.0) * F.count("val"))
        ).alias("centroid"),
        F.count("val").alias("n"),
    )


# Portable across Java regex (Spark) and RE2 (DuckDB): no backrefs, no
# lookaround, explicit character classes only.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


@register(
    "x22_pii_email_redaction",
    "PII scrubbing (training-data compliance tier): count email-shaped "
    "spans and fingerprint the redacted text (md5 after replacing each "
    "span with '<EMAIL>'). Projection-only — regexp_count + "
    "regexp_replace in one codegen'd map pass, no shuffle; the regex is "
    "restricted to the Java-regex ∩ RE2 common dialect so both engines "
    "see identical spans.",
    oracle=f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{_EMAIL_RE}'))      AS email_count,
               md5(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g')) AS redacted_fp
        FROM documents
    """,
    tags=("ext", "text", "pii", "redaction"),
)
def x22_pii_email_redaction(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("email_count"),
        F.md5(F.regexp_replace("text", _EMAIL_RE, "<EMAIL>")).alias("redacted_fp"),
    )


@register(
    "x23_tfidf_top_terms",
    "TF-IDF top-3 terms per document with a RATIONAL idf weight "
    "(N+1)/(df+1) instead of ln() — Java's Math.log and DuckDB's libm ln "
    "disagree in the last ulp, so the portable formulation keeps the "
    "score inside exactly-reproducible IEEE multiply/divide; the ranking "
    "is ln-equivalent because log is monotone. Three shuffles: term "
    "frequency per (doc, term), document frequency per term, and the "
    "per-doc top-k window; ties break on the term string so the k rows "
    "are total-ordered.",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM toks WHERE term <> ''
            GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   tf.tf * (CAST(n.n_docs + 1 AS DOUBLE) / (df.df + 1)) AS tfidf,
                   row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf * (CAST(n.n_docs + 1 AS DOUBLE) / (df.df + 1)) DESC,
                                tf.term
                   ) AS rn
            FROM tf JOIN df USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tfidf, rn
        FROM scored WHERE rn <= 3
    """,
    tags=("ext", "text", "tfidf", "window"),
)
def x23_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf, "documents")
    n_docs = docs.select(F.count("*").alias("n_docs"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * ((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf", "rn")
    )


@register(
    "x24_edit_distance_pairs",
    "Fuzzy (edit-distance) near-match pairs: documents blocked on an "
    "identical 16-char normalized prefix, then levenshtein over the "
    "first 80 chars <= 10. Prefix blocking is the q-gram-style filter "
    "that keeps the quadratic DP off the full cross product — one "
    "shuffle on the block key, DP only within buckets (same shape as "
    "the LSH/simhash blocked self-joins). Both engines implement "
    "classic Levenshtein, so the distances hash-match exactly.",
    oracle="""
        WITH d AS (
            SELECT doc_id,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
            FROM documents WHERE text IS NOT NULL
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               levenshtein(substr(a.norm, 1, 80), substr(b.norm, 1, 80))
                   AS edit_distance
        FROM d a JOIN d b
          ON substr(a.norm, 1, 16) = substr(b.norm, 1, 16)
         AND a.doc_id < b.doc_id
        WHERE levenshtein(substr(a.norm, 1, 80), substr(b.norm, 1, 80)) <= 10
    """,
    tags=("ext", "dedup", "fuzzy", "levenshtein"),
)
def x24_edit_distance_pairs(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    d = docs.select(
        "doc_id",
        F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("norm"),
    ).persist()  # self-join: normalize once per side
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(
        F.substring(F.col("a.norm"), 1, 80), F.substring(F.col("b.norm"), 1, 80)
    )
    return (
        a.join(
            b,
            (
                F.substring(F.col("a.norm"), 1, 16)
                == F.substring(F.col("b.norm"), 1, 16)
            )
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= 10)
    )


_DECON_FUZZY_ORACLE = f"""
    WITH benchmark AS (
        SELECT text FROM documents WHERE text IS NOT NULL
        ORDER BY length(text) DESC, doc_id
        LIMIT 10
    ),
    bg AS (
        SELECT DISTINCT unnest({sql_shingles('text', 5)}) AS g FROM benchmark
    ),
    cg AS (
        SELECT doc_id, unnest({sql_shingles('text', 5)}) AS g
        FROM documents WHERE text IS NOT NULL
    ),
    hits AS (
        SELECT doc_id, count(*) AS shared_grams
        FROM cg WHERE g IN (SELECT g FROM bg)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.shared_grams, 0) AS shared_grams,
           COALESCE(h.shared_grams, 0) = 0 AS clean
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.text IS NOT NULL
"""


@register(
    "x25_ngram_decontamination_fuzzy",
    "Fuzzy benchmark decontamination: per-doc count of distinct word "
    "5-grams shared with the held-out benchmark set (same 10-longest-docs "
    "convention as x17), clean = zero overlap — the GPT-3/C4 '13-gram "
    "decontamination' shape scaled to the fixture. The benchmark gram set "
    "broadcasts (an eval suite is tiny); only gram HITS are shuffled for "
    "the per-doc count, never corpus text. Exact-fingerprint x17 is the "
    "precision tool; this is the recall tool that also catches partial "
    "containment.",
    oracle=_DECON_FUZZY_ORACLE,
    tags=("ext", "decontamination", "ngram", "broadcast"),
)
def x25_ngram_decontamination_fuzzy(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    benchmark = docs.orderBy(F.length("text").desc(), "doc_id").limit(10)
    return X.ngram_overlap_contamination(docs, benchmark, n=5)


# Chunking mirror of ext/dedup.chunk_words(k=10): 1-based list slices in
# DuckDB, 0-based chunk index in both.
_SQL_CHUNKED = (
    "array_to_string(list_transform("
    "range(0, greatest(CAST(ceil(len({w}) / 10.0) AS BIGINT), 1)), "
    "i -> array_to_string(({w})[i*10+1:i*10+10], ' ')), chr(10))"
).format(w=SQL_WORDS.format(t="text"))

_PARA_DEDUP_ORACLE = f"""
    WITH chunked AS (
        SELECT doc_id, {_SQL_CHUNKED} AS text2
        FROM documents WHERE text IS NOT NULL
    ),
    l0 AS (
        SELECT doc_id,
               list_filter(string_split(text2, chr(10)),
                           x -> length(x) > 0) AS ls
        FROM chunked
    ),
    lines AS (
        SELECT doc_id,
               unnest(ls) AS line,
               unnest(range(0, len(ls))) AS ord
        FROM l0
    ),
    keyed AS (
        SELECT doc_id, line, ord, doc_id * 1000000 + ord AS k FROM lines
    ),
    keepers AS (
        SELECT line, min(k) AS min_k FROM keyed GROUP BY line
    ),
    surv AS (
        SELECT doc_id, line, ord
        FROM keyed JOIN keepers USING (line)
        WHERE k = min_k
    ),
    counts AS (
        SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id
    ),
    re AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(line, chr(10) ORDER BY ord) AS text_dedup
        FROM surv GROUP BY doc_id
    )
    SELECT c.doc_id, c.n_lines,
           COALESCE(r.n_kept, 0) AS n_kept,
           COALESCE(r.text_dedup, '') AS text_dedup
    FROM counts c LEFT JOIN re r USING (doc_id)
"""


@register(
    "x26_paragraph_dedup",
    "Corpus-wide paragraph-level exact dedup (Gopher/MassiveText shape): "
    "segment each doc into 10-word 'paragraphs', keep only the globally "
    "first occurrence of each distinct paragraph (min (doc, position) — "
    "deterministic), reassemble docs in original order with counts. The "
    "keeper decision shuffles md5(paragraph) 16-byte keys, not text "
    "(exact_dedup design); reassembly is one groupBy(doc). ~5% of fixture "
    "chunks are cross-doc duplicates, so the hash gate covers real "
    "removals, not a no-op.",
    oracle=_PARA_DEDUP_ORACLE,
    tags=("ext", "dedup", "paragraph", "gopher"),
)
def x26_paragraph_dedup(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    chunked = docs.select("doc_id", X.chunk_words(F.col("text"), 10).alias("text"))
    return X.paragraph_dedup(chunked)


_SQL_FP = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"

_PIPELINE_ORACLE = f"""
    WITH lang AS ({_LANG_ORACLE}),
    q AS ({_QUALITY_ORACLE}),
    fp AS (
        SELECT doc_id, {_SQL_FP} AS fingerprint
        FROM documents WHERE text IS NOT NULL
    ),
    filtered AS (
        SELECT f.doc_id, l.lang_pred, q.quality_score, f.fingerprint
        FROM fp f
        JOIN lang l USING (doc_id)
        JOIN q USING (doc_id)
        WHERE l.lang_pred = 'en' AND q.quality_score >= 0.8
    ),
    dedup AS (
        SELECT f.*
        FROM filtered f
        JOIN (
            SELECT fingerprint, min(doc_id) AS doc_id
            FROM filtered GROUP BY fingerprint
        ) k USING (fingerprint, doc_id)
    ),
    bench AS (
        SELECT {_SQL_FP} AS fingerprint
        FROM documents WHERE text IS NOT NULL
        ORDER BY length(text) DESC, doc_id
        LIMIT 10
    )
    SELECT doc_id, lang_pred, quality_score, fingerprint
    FROM dedup
    WHERE fingerprint NOT IN (SELECT fingerprint FROM bench)
      AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
          IN ('0','1','2','3','4','5','6','7')
"""


@register(
    "x27_training_data_pipeline",
    "The composed end-to-end curation pipeline every stage above exists "
    "for: language filter (x1) → quality filter ≥0.8 (x2) → exact dedup "
    "keep-min (x5) → benchmark decontamination (x17) → deterministic 1/2 "
    "hash sample (x16), in the standard curation order. One declarative "
    "plan: Catalyst fuses the three projection stages into the scan, the "
    "dedup groupBy shuffles 16-byte fingerprints post-filter (never "
    "pre-filter text), the benchmark set broadcasts, and the sample is a "
    "free filter — at 100 TB the only wide op is the one dedup exchange "
    "over the filtered minority of the corpus.",
    oracle=_PIPELINE_ORACLE,
    tags=("ext", "pipeline", "composition", "dedup", "decontamination"),
)
def x27_training_data_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    d = TX.add_quality_signals(TX.add_language_id(docs))
    d = d.filter((F.col("lang_pred") == "en") & (F.col("quality_score") >= 0.8))
    d = TX.add_fingerprint(d).select(
        "doc_id", "lang_pred", "quality_score", "fingerprint"
    )
    # keep-min dedup as a window min (r11 optimization, guide §2.4):
    # the groupBy + left-semi self-join formulation evaluated the whole
    # language/quality/fingerprint projection TWICE (once per join
    # side — profiled as the bulk of x27's exec time) and paid a
    # second exchange for the join; one min-over-fingerprint window is
    # a single pass and a single exchange, and keeps exactly the same
    # rows (doc_id == min(doc_id) per fingerprint group). Skew note
    # (ADVICE r11): a mass-duplicate corpus concentrates one duplicate
    # group in one window task where the aggregate+join form had a
    # partial-aggregable first phase; the megadup stress fixture
    # (tests/test_dedup_stress.py) is the recorded guard for that
    # shape, and AQE skew handling does not split windows — if a real
    # corpus ever tips this, pre-salt the fingerprint and take
    # min-of-mins.
    d = (
        d.withColumn(
            "_min_id", F.min("doc_id").over(Window.partitionBy("fingerprint"))
        )
        .filter(F.col("doc_id") == F.col("_min_id"))
        .drop("_min_id")
    )
    benchmark = (
        docs.orderBy(F.length("text").desc(), "doc_id")
        .limit(10)
        .select(
            F.md5(
                F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
            ).alias("fingerprint")
        )
    )
    d = d.join(F.broadcast(benchmark), "fingerprint", "left_anti")
    d = d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(*"01234567")
    )
    return d.select("doc_id", "lang_pred", "quality_score", "fingerprint")


_SQL_EN_STOPWORDS = ", ".join(f"'{w}'" for w in TX.STOPWORDS["en"])

_GOPHER_ORACLE = f"""
    WITH s AS (
        SELECT doc_id,
               len(w) AS word_count,
               CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE)
                   / greatest(len(w), 1) AS mean_word_len,
               len(list_filter(w, t -> t IN ({_SQL_EN_STOPWORDS})))
                   AS stopword_count,
               CAST(len(list_filter(w, t -> regexp_matches(t, '[a-z]')))
                    AS DOUBLE) / greatest(len(w), 1) AS alpha_word_frac
        FROM (
            SELECT doc_id, {SQL_WORDS.format(t='text')} AS w
            FROM documents WHERE text IS NOT NULL
        )
    )
    SELECT doc_id, word_count, mean_word_len, stopword_count,
           alpha_word_frac,
           word_count BETWEEN 50 AND 100000       AS rule_word_count,
           mean_word_len BETWEEN 3.0 AND 10.0     AS rule_mean_word_len,
           stopword_count >= 2                    AS rule_stopwords,
           alpha_word_frac >= 0.8                 AS rule_alpha_words,
           (word_count BETWEEN 50 AND 100000)
             AND (mean_word_len BETWEEN 3.0 AND 10.0)
             AND stopword_count >= 2
             AND alpha_word_frac >= 0.8           AS gopher_pass
    FROM s
"""


@register(
    "x28_gopher_quality_rules",
    "Gopher/MassiveText document-quality rule gate (Rae et al. 2021 "
    "A1.1.1): word-count bounds [50, 100k], mean-word-length bounds "
    "[3, 10], >=2 English stopwords, >=80% words containing a letter, "
    "plus the conjunction gopher_pass. Pure projection over the token "
    "array (bind_once single split) — the whole gate costs one codegen'd "
    "scan at any corpus size.",
    oracle=_GOPHER_ORACLE,
    tags=("ext", "text", "quality", "gopher"),
)
def x28_gopher_quality_rules(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    return TX.add_gopher_rules(docs).select(
        "doc_id", "word_count", "mean_word_len", "stopword_count",
        "alpha_word_frac", "rule_word_count", "rule_mean_word_len",
        "rule_stopwords", "rule_alpha_words", "gopher_pass",
    )


_LEXDIV_ORACLE = f"""
    WITH base AS (
        SELECT doc_id,
               {SQL_WORDS.format(t='text')} AS w,
               list_filter(string_split(
                   regexp_replace(lower(text), '\\s+', '', 'g'), ''),
                   c -> c <> '') AS cs
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(len(list_distinct(w)) AS DOUBLE)
               / greatest(len(w), 1) AS ttr,
           CAST(len(list_filter(list_distinct(w),
                    t -> len(list_filter(w, x -> x = t)) = 1)) AS DOUBLE)
               / greatest(len(w), 1) AS hapax_frac,
           CAST(COALESCE(list_max(list_transform(list_distinct(cs),
                    c -> len(list_filter(cs, x -> x = c)))), 0) AS DOUBLE)
               / greatest(len(cs), 1) AS top_char_frac
    FROM base
"""


@register(
    "x29_lexical_diversity",
    "Lexical-diversity quality signals: type-token ratio, hapax fraction "
    "(words occurring exactly once), top-character concentration. All "
    "exact rationals by design — entropy-style log measures drift in the "
    "last ulp across engines; these hash identically everywhere. "
    "Projection-only, O(distinct x len) comparisons per row, no shuffle.",
    oracle=_LEXDIV_ORACLE,
    tags=("ext", "text", "quality"),
)
def x29_lexical_diversity(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    return TX.add_lexical_diversity(docs).select(
        "doc_id", "ttr", "hapax_frac", "top_char_frac"
    )


def _sql_top_ngram_frac(n: int) -> str:
    w = SQL_WORDS.format(t="text")
    grams = (
        f"CASE WHEN len({w}) >= {n} THEN "
        f"list_transform(range(1, len({w}) - {n - 2}), "
        f"i -> array_to_string(({w})[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )
    return f"""
        SELECT doc_id,
               CASE WHEN len(grams) = 0 THEN 0.0 ELSE
                   least(CAST(maxc * length(
                       list_min(list_filter(list_distinct(grams),
                           x -> len(list_filter(grams, y -> y = x)) = maxc))
                   ) AS DOUBLE) / greatest(length(text), 1), 1.0)
               END AS frac
        FROM (
            SELECT doc_id, text, grams,
                   list_max(list_transform(list_distinct(grams),
                       x -> len(list_filter(grams, y -> y = x)))) AS maxc
            FROM (
                SELECT doc_id, text, {grams} AS grams
                FROM documents WHERE text IS NOT NULL
            )
        )
    """


_TOP_NGRAM_ORACLE = f"""
    WITH f2 AS ({_sql_top_ngram_frac(2)}),
    f3 AS ({_sql_top_ngram_frac(3)})
    SELECT f2.doc_id,
           f2.frac AS top_2gram_char_frac,
           f3.frac AS top_3gram_char_frac
    FROM f2 JOIN f3 USING (doc_id)
"""


@register(
    "x30_top_ngram_repetition",
    "Gopher repetition signal: fraction of document characters covered by "
    "the most frequent word 2-gram and 3-gram (count x gram length / doc "
    "length, capped at 1.0 for overlapping self-repeats; lexicographic "
    "tie-break so the answer is total-ordered). "
    "Complements x19's duplicate-line ratio — this catches within-line "
    "boilerplate loops. Pure projection: gram lists are array-lambda "
    "counted per row, never exploded into a shuffle.",
    oracle=_TOP_NGRAM_ORACLE,
    tags=("ext", "text", "quality", "repetition", "gopher"),
)
def x30_top_ngram_repetition(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    d = TX.add_top_ngram_fraction(docs, 2)
    d = TX.add_top_ngram_fraction(d, 3)
    return d.select("doc_id", "top_2gram_char_frac", "top_3gram_char_frac")


_LANG_STATS_ORACLE = f"""
    WITH lang AS ({_LANG_ORACLE}),
    d AS (
        SELECT l.lang_pred,
               len({SQL_WORDS.format(t='doc.text')}) AS ws_tokens,
               doc.source
        FROM lang l JOIN documents doc USING (doc_id)
        WHERE doc.text IS NOT NULL
    )
    SELECT lang_pred,
           CAST(count(*) AS BIGINT)            AS n_docs,
           CAST(sum(ws_tokens) AS BIGINT)      AS total_ws_tokens,
           CAST(min(ws_tokens) AS BIGINT)      AS min_ws_tokens,
           CAST(max(ws_tokens) AS BIGINT)      AS max_ws_tokens,
           CAST(sum(ws_tokens) AS DOUBLE) / count(*) AS avg_ws_tokens,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM d
    GROUP BY lang_pred
"""


@register(
    "x31_corpus_language_stats",
    "Corpus composition report: per predicted language, doc count, "
    "whitespace-token totals/min/max/mean, and distinct source count — "
    "the training-mix summary every curation run ends with. One partial-"
    "aggregated shuffle on the (tiny-cardinality) language key; the "
    "token counting itself is fused into the scan projection.",
    oracle=_LANG_STATS_ORACLE,
    tags=("ext", "text", "stats"),
)
def x31_corpus_language_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    d = TX.add_language_id(docs)
    d = d.withColumn("ws_tokens", F.size(TX.words("text")))
    return d.groupBy("lang_pred").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws_tokens").alias("total_ws_tokens"),
        F.min("ws_tokens").alias("min_ws_tokens"),
        F.max("ws_tokens").alias("max_ws_tokens"),
        (F.sum("ws_tokens").cast("double") / F.count("*")).alias(
            "avg_ws_tokens"
        ),
        F.countDistinct("source").alias("n_sources"),
    )


_SEMANTIC_DEDUP_ORACLE = f"""
    WITH RECURSIVE c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    b AS (
        SELECT vec_id, v, {_sql_lsh_bucket('v')} AS bucket FROM c
    ),
    pairs AS (
        SELECT x.vec_id AS doc_a, y.vec_id AS doc_b
        FROM b x JOIN b y
          ON x.bucket = y.bucket AND x.vec_id < y.vec_id
        WHERE {sql_cosine('x.v', 'y.v')} >= 0.3
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    walk(node, reach) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT w.node, e.dst
        FROM walk w JOIN edges e ON w.reach = e.src
    ),
    labels AS (
        SELECT node, LEAST(node, MIN(reach)) AS cluster_id
        FROM walk GROUP BY node
    )
    SELECT c.vec_id,
           COALESCE(l.cluster_id, c.vec_id) AS cluster_id,
           COALESCE(l.cluster_id, c.vec_id) = c.vec_id AS is_representative
    FROM c LEFT JOIN labels l ON c.vec_id = l.node
"""


@register(
    "x32_semantic_dedup",
    "SemDeDup-shaped semantic deduplication (Abbas et al. 2023) end to "
    "end: sign-bit-LSH-bucketed cosine pairs -> connected components "
    "(large-star/small-star) -> one representative (min id) per cluster, "
    "singletons kept. The DECISION layer on top of x12's pairs — at "
    "100 TB only same-bucket pairs are scored, components shuffle "
    "(id,id) edges, and the labeling is one join. Threshold 0.3 is "
    "fixture-calibrated (the synthetic embeddings are near-orthogonal; "
    "max same-bucket cosine ~0.49) so clusters actually form; real "
    "corpora use the API default 0.9. Oracle: recursive-CTE reachability "
    "over the identical inlined-hyperplane bucketing.",
    oracle=_SEMANTIC_DEDUP_ORACLE,
    tags=("ext", "similarity", "dedup", "clustering", "iterative"),
)
def x32_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return S.semantic_dedup(load_table(spark, sf, "embeddings"), threshold=0.3)


_CROSS_CORPUS_ORACLE = f"""
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
    nb AS (SELECT doc_id, band, band_hash FROM bands WHERE doc_id % 2 = 1),
    eb AS (SELECT doc_id, band, band_hash FROM bands WHERE doc_id % 2 = 0),
    m AS (
        SELECT nb.doc_id,
               CAST(count(DISTINCT eb.doc_id) AS BIGINT) AS n_existing_matches,
               min(eb.doc_id) AS min_existing_match
        FROM nb JOIN eb USING (band, band_hash)
        GROUP BY nb.doc_id
    )
    SELECT d.doc_id,
           COALESCE(m.n_existing_matches, 0) AS n_existing_matches,
           m.min_existing_match,
           m.doc_id IS NULL AS is_new_unique
    FROM documents d LEFT JOIN m USING (doc_id)
    WHERE d.doc_id % 2 = 1
"""


@register(
    "x33_cross_corpus_dedup",
    "Incremental-ingest dedup: MinHash-LSH collision check of a NEW batch "
    "(odd doc_ids) against the EXISTING corpus (even doc_ids) — the shape "
    "every recurring crawl runs, deduping the fresh batch against already-"
    "ingested data without re-pairing the existing corpus with itself. "
    "Both sides reduce to (id, band, band_hash) keys before the one "
    "shuffle join; in production the existing side's band keys are a "
    "precomputed table so each increment only signatures the new batch. "
    "Every new doc is reported with its match count, min matched id, and "
    "an is_new_unique verdict.",
    oracle=_CROSS_CORPUS_ORACLE,
    tags=("ext", "dedup", "minhash", "lsh", "incremental"),
)
def x33_cross_corpus_dedup(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    return X.lsh_cross_corpus_matches(new, existing)


@register(
    "x80_incremental_dedup_precomputed",
    "x33's incremental-crawl dedup on the PRODUCTION path: the existing "
    "corpus's (id, band, band_hash) LSH keys are materialized to a "
    "band-partitioned parquet signature table (write_signature_table) "
    "and read back, so the only MinHash computation in the matching plan "
    "is over the new batch — the existing side is a pure parquet scan of "
    "16-byte keys, never re-signatured per increment. Same verdict "
    "columns and oracle as x33 (the stored keys are byte-identical to "
    "recomputed ones); tests/test_plans.py guards that the existing side "
    "of the join plan contains a parquet scan and no md5 signature "
    "expressions.",
    oracle=_CROSS_CORPUS_ORACLE,
    tags=("ext", "dedup", "minhash", "lsh", "incremental", "materialized"),
)
def x80_incremental_dedup_precomputed(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    docs = load_table(spark, sf, "documents")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    path = X.write_signature_table(
        existing, tempfile.mkdtemp(prefix="lsh_sig_") + "/signatures"
    )
    # explicit schema: a known table is never schema-inferred on read (and
    # an empty corpus writes no part files to infer from)
    stored = spark.read.schema(
        "doc_id BIGINT, band_hash STRING, band INT"
    ).parquet(path)
    return X.lsh_cross_corpus_matches(new, existing_signatures=stored)


_BPE_PAIR_ORACLE = f"""
    WITH toks AS (
        SELECT unnest({SQL_WORDS.format(t='text')}) AS t
        FROM documents WHERE text IS NOT NULL
    ),
    pairs AS (
        SELECT unnest(list_transform(range(1, length(t)),
                                     i -> substr(t, i, 2))) AS pair
        FROM toks WHERE length(t) >= 2
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
"""


@register(
    "x34_bpe_pair_counts",
    "Corpus-wide adjacent-character-pair frequencies — the statistic the "
    "first BPE merge step maximizes (tokenizer training's inner loop). "
    "Pairs stay within whitespace tokens (no cross-word merges), counted "
    "with a partial-aggregated shuffle on the tiny pair key space; the "
    "top-20 cut is total-ordered (count desc, pair asc) so the result "
    "set is deterministic in any engine.",
    oracle=_BPE_PAIR_ORACLE,
    tags=("ext", "text", "tokenizer", "stats"),
)
def x34_bpe_pair_counts(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(F.explode(TX.words("text")).alias("t")).filter(
        F.length("t") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("t") - 1),
                lambda i: F.col("t").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


_KMEANS_CELLS_ORACLE = f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
        WHERE (list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)), 'max') < 1e9)
    ),{_km_rounds_sql('e', 8, 3, 'm_')}
    SELECT vec_id, cell FROM m_code
"""


@register(
    "x35_kmeans_cells",
    "Distributed Lloyd k-means at IVF production shape (k=8, THREE "
    "rounds), hash-verified end-to-end: the oracle replays every "
    "iteration in SQL — lowest-id seeds, expanded squared-L2 assignment "
    "with lower-cell tie-break, fixed-point floor(val*1e6) integer "
    "centroid sums, empty-cell carry-over, thrice unrolled (the x83 "
    "pattern at larger k/rounds). The convergence-based production "
    "variant (farthest-point seeds, quantized-signature fixpoint) "
    "remains ext/similarity.kmeans_lloyd, pinned by "
    "tests/test_ext.py — this entry runs the same per-round machinery "
    "with the data-dependent stopping rule pinned shut so the driver "
    "can hash it. Each round is one literal-centroid assignment "
    "projection plus one partial-aggregated (cell, pos) shuffle; "
    "per-round collect is k x dim rows, never data-sized.",
    oracle=_KMEANS_CELLS_ORACLE,
    tags=("ext", "embedding", "clustering", "iterative"),
)
def x35_kmeans_cells(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").filter(finite_vec("embedding"))
    return S.kmeans_fixed_rounds(emb, k=8, rounds=3)


_DUP_NGRAM_N = 5
_SQL_WS = SQL_WORDS.format(t="text")

_INDOC_DUP_NGRAM_ORACLE = f"""
    SELECT doc_id,
           CASE WHEN len(grams) = 0 THEN 0.0 ELSE
               CAST(len(list_distinct(flatten(list_transform(
                   list_filter(range(1, len(grams) + 1),
                       i -> len(list_filter(grams, g -> g = grams[i])) >= 2),
                   s -> range(s, s + {_DUP_NGRAM_N}))))) AS DOUBLE)
               / greatest(nw, 1)
           END AS dup_{_DUP_NGRAM_N}gram_word_frac
    FROM (
        SELECT doc_id, len({_SQL_WS}) AS nw,
               CASE WHEN len({_SQL_WS}) >= {_DUP_NGRAM_N} THEN
                   list_transform(range(1, len({_SQL_WS}) - {_DUP_NGRAM_N - 2}),
                       i -> array_to_string(({_SQL_WS})[i:i+{_DUP_NGRAM_N - 1}], ' '))
               ELSE CAST([] AS VARCHAR[]) END AS grams
        FROM documents
        WHERE text IS NOT NULL
    )
"""


@register(
    "x37_indoc_dup_ngram_fraction",
    "Gopher duplicate-n-gram repetition: fraction of word positions "
    "covered by a word 5-gram occurring at least twice WITHIN the "
    "document, as a true positional union (overlapping repeats never "
    "exceed 1.0). Catches alternating-boilerplate docs that x30's "
    "single-top-gram fraction underrates. Pure projection — array "
    "lambdas per row, no explode, no shuffle at any scale.",
    oracle=_INDOC_DUP_NGRAM_ORACLE,
    tags=("ext", "text", "repetition", "gopher"),
)
def x37_indoc_dup_ngram_fraction(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    return TX.add_dup_ngram_fraction(docs, _DUP_NGRAM_N).select(
        "doc_id", f"dup_{_DUP_NGRAM_N}gram_word_frac"
    )


_DUP_COVERAGE_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, {_SQL_WS} AS ws FROM documents WHERE text IS NOT NULL
    ),
    d AS (SELECT doc_id, len(ws) AS n_words FROM w),
    g0 AS (
        SELECT doc_id, ws,
               unnest(CASE WHEN len(ws) >= {_DUP_NGRAM_N} THEN
                   range(1, len(ws) - {_DUP_NGRAM_N - 2})
               ELSE CAST([] AS BIGINT[]) END) AS pos
        FROM w
    ),
    g AS (
        SELECT doc_id, pos,
               md5(array_to_string(ws[pos:pos+{_DUP_NGRAM_N - 1}], ' ')) AS gh
        FROM g0
    ),
    dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
    hits AS (SELECT doc_id, pos FROM g JOIN dup USING (gh)),
    cov0 AS (
        SELECT doc_id, unnest(range(pos, pos + {_DUP_NGRAM_N})) AS widx
        FROM hits
    ),
    cov AS (
        SELECT doc_id, count(DISTINCT widx) AS dup_words FROM cov0
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           d.n_words,
           COALESCE(cov.dup_words, 0) AS dup_words,
           CAST(COALESCE(cov.dup_words, 0) AS DOUBLE)
               / greatest(d.n_words, 1) AS dup_word_frac
    FROM d LEFT JOIN cov USING (doc_id)
"""


@register(
    "x36_dup_ngram_coverage",
    "Corpus-level duplicated-substring coverage (the distributed shape of "
    "Lee et al. 2022 suffix-array substring dedup): per document, the "
    "count and fraction of word positions covered by a word 5-gram that "
    "occurs >= 2 times anywhere in the corpus (within-doc repeats "
    "included). The global decision shuffles md5(gram) keys, never text; "
    "occurrence counting is a partial-aggregated groupBy; coverage is a "
    "per-doc positional-union array fold, not an n-fold explosion.",
    oracle=_DUP_COVERAGE_ORACLE,
    tags=("ext", "dedup", "substring", "lee2022"),
)
def x36_dup_ngram_coverage(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return X.dup_ngram_coverage(docs, n=_DUP_NGRAM_N)


def _pq_adc_term(j: int, sub: int) -> str:
    """Squared L2 between a probe's j-th subvector and the j-th assigned
    codebook centroid — the same left-fold of squared diffs the Spark
    side codegens (F.aggregate over zip_with, init 0.0; DuckDB's
    list_reduce seeds from the first element, identical under IEEE
    since 0.0 + x == x for the non-negative squares)."""
    lo, hi = j * sub + 1, (j + 1) * sub
    return (
        f"list_reduce(list_transform("
        f"list_zip(p.pv[{lo}:{hi}], b{j}.c), "
        f"z -> (z[1]-z[2])*(z[1]-z[2])), (acc, x) -> acc + x)"
    )


_PQ_ANN_ORACLE = f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
        WHERE (list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)), 'max') < 1e9)
    ),
    {",".join(
        f'e{j} AS (SELECT vec_id, v[{j * 16 + 1}:{(j + 1) * 16}] AS v FROM e)'
        for j in range(4)
    )},{",".join(_km_rounds_sql(f'e{j}', 16, 2, f'q{j}_') for j in range(4))},
    probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 8),
    scored AS (
        SELECT p.probe_id, n.vec_id AS neighbor_id,
               ((({_pq_adc_term(0, 16)})
                 + ({_pq_adc_term(1, 16)}))
                 + ({_pq_adc_term(2, 16)}))
                 + ({_pq_adc_term(3, 16)}) AS adc_dist
        FROM e n
        {"".join(
            f'JOIN q{j}_code k{j} ON k{j}.vec_id = n.vec_id '
            f'JOIN q{j}_cent b{j} ON b{j}.cell = k{j}.cell '
            for j in range(4)
        )}
        CROSS JOIN probes p
        WHERE n.vec_id <> p.probe_id
    )
    SELECT probe_id, neighbor_id, adc_dist, rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY adc_dist, neighbor_id) AS rank
        FROM scored
    )
    WHERE rank <= 3
"""


@register(
    "x38_pq_ann_topk",
    "Product-quantization ANN (Jégou et al. 2011), hash-verified end to "
    "end: per-subspace FIXED-ROUNDS Lloyd codebooks (m=4, k=16, two "
    "rounds over the 64-dim embeddings — pq_train_fixed, the x83 "
    "closed-form trainer per subspace), nearest-centroid code "
    "assignment as a literal-codebook projection, and asymmetric-"
    "distance (ADC) top-3 where candidates are scanned as 4-cell codes "
    "instead of 64 floats — the compressed-corpus memory lever for "
    "100 TB ANN. The oracle REPLAYS all four subspace trainings "
    "(2 unrolled rounds each), the code assignment, and the exact ADC "
    "ranking in SQL, so the driver hash covers training, encoding, and "
    "search. Scale shape: codes-only corpus projection (persisted), "
    "probes broadcast, per-candidate cost m lookups into constant-"
    "folded codebook literals (plan-shape-stable codegen source — the "
    "r6 A/B in BASELINE.md).",
    oracle=_PQ_ANN_ORACLE,
    tags=("ext", "embedding", "ann", "pq"),
)
def x38_pq_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").filter(finite_vec("embedding"))
    books = S.pq_train_fixed(emb, m=4, k=16, rounds=2)
    return S.pq_topk(emb, emb.filter(F.col("vec_id") < 8), books, k=3)


# ---------------------------------------------------------------------------
# training-sequence preparation (normalization / chunking / packing / trim)
# ---------------------------------------------------------------------------

from ..ext import packing as PK  # noqa: E402  (grouped with its tier)

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), "
    "'\\s+', ' ', 'g'))"
)

_NORMALIZE_ORACLE = f"""
    SELECT doc_id,
           {_NORM_SQL} AS text_norm,
           CAST(length({_NORM_SQL}) AS INT) AS n_chars_norm,
           CAST(length(text) - length({_NORM_SQL}) AS DOUBLE)
               / greatest(length(text), 1) AS removed_ratio
    FROM documents WHERE text IS NOT NULL
"""


@register(
    "x39_text_normalization",
    "Canonical text normalization: lowercase, strip non-alphanumeric "
    "characters, collapse whitespace runs, trim — the preprocessing step "
    "before hashing/shingling when formatting noise shouldn't change "
    "dedup keys. Pure regexp-chain projection (whole-stage codegen, no "
    "shuffle); removed_ratio is a per-doc noise signal a quality gate "
    "can threshold.",
    oracle=_NORMALIZE_ORACLE,
    tags=("ext", "text", "normalize"),
)
def x39_text_normalization(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    return TX.add_normalized_text(docs).select(
        "doc_id",
        "text_norm",
        "n_chars_norm",
        "removed_ratio",
    )


_CHUNK_K = 64

_CHUNK_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, {SQL_WORDS.format(t='text')} AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    c AS (
        SELECT doc_id, ws,
               greatest(CAST(ceil(len(ws) / {_CHUNK_K}.0) AS INT), 1) AS nc
        FROM w
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_id,
           array_to_string(ws[i * {_CHUNK_K} + 1 : i * {_CHUNK_K} + {_CHUNK_K}], ' ')
               AS chunk_text,
           CAST(len(ws[i * {_CHUNK_K} + 1 : i * {_CHUNK_K} + {_CHUNK_K}]) AS INT)
               AS n_words
    FROM c, unnest(range(0, nc)) AS t(i)
"""


@register(
    "x40_chunk_documents",
    f"Fixed-window training chunking: explode each document into "
    f"consecutive {_CHUNK_K}-word windows (tail short, never padded) — "
    "the step between curated documents and tokenizer input. Pure "
    "projection + posexplode, zero shuffle at any scale; each output row "
    "carries only its own window of text.",
    oracle=_CHUNK_ORACLE,
    tags=("ext", "text", "chunking"),
)
def x40_chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    return PK.chunk_documents(load_table(spark, sf, "documents"), k=_CHUNK_K)


_PACK_BUDGET = 256

_PACK_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len({SQL_WORDS.format(t='text')}) AS INT) AS n_words
        FROM documents WHERE text IS NOT NULL
    ),
    b AS (
        SELECT source, n_words,
               CAST(floor(
                   (sum(n_words) OVER (PARTITION BY source ORDER BY doc_id)
                    - n_words) / {_PACK_BUDGET}) AS BIGINT) AS bin_id
        FROM t
    )
    SELECT source, bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           sum(n_words) / {_PACK_BUDGET}.0 AS fill_fraction
    FROM b GROUP BY source, bin_id
"""


@register(
    "x41_pack_bin_stats",
    f"Contiguous sequence packing: within each source, documents in id "
    f"order are cut into {_PACK_BUDGET}-word training bins by a running "
    "token total (the distributed approximation of greedy first-fit — "
    "exact first-fit is inherently sequential), then summarized per bin "
    "(doc count, word total, fill fraction). One window per source plus "
    "one partial-aggregated groupBy; at 100 TB the window partitions by "
    "(source, shard) so no single ordered scan exceeds a shard. Budget "
    "is a power of two so fill_fraction division is float-exact across "
    "engines.",
    oracle=_PACK_ORACLE,
    tags=("ext", "text", "packing", "window"),
)
def x41_pack_bin_stats(spark: SparkSession, sf: str) -> DataFrame:
    return PK.pack_bin_stats(
        load_table(spark, sf, "documents"), budget=_PACK_BUDGET
    )


_LENGTH_BAND_ORACLE = """
    WITH r AS (
        SELECT doc_id, lang, n_chars,
               percent_rank() OVER (PARTITION BY lang ORDER BY n_chars)
                   AS length_pr
        FROM documents
    )
    SELECT doc_id, lang, n_chars, length_pr
    FROM r WHERE length_pr >= 0.05 AND length_pr <= 0.95
"""


@register(
    "x42_length_band_filter",
    "Per-language length-percentile trim: keep documents inside the "
    "[p5, p95] band of n_chars within their lang — the outlier gate that "
    "drops fragments and concatenation artifacts. percent_rank is exact "
    "and engine-portable ((rank-1)/(n-1), min-rank ties), one window "
    "shuffle on the group key with O(1) per-row state.",
    oracle=_LENGTH_BAND_ORACLE,
    tags=("ext", "text", "quality", "window"),
)
def x42_length_band_filter(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return TX.length_band_filter(docs).select(
        "doc_id", "lang", "n_chars", "length_pr"
    )


# ---------------------------------------------------------------------------
# corpus statistics (vocabulary / scaling / length distribution)
# ---------------------------------------------------------------------------

_VOCAB_N = 100

_VOCAB_ORACLE = f"""
    WITH toks AS (
        SELECT unnest({SQL_WORDS.format(t='text')}) AS token
        FROM documents WHERE text IS NOT NULL
    ),
    counts AS (
        SELECT token, CAST(count(*) AS BIGINT) AS n
        FROM toks WHERE length(token) > 0 GROUP BY token
    ),
    total AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM counts),
    top AS (
        SELECT token, n,
               CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS INT)
                   AS rank
        FROM counts ORDER BY n DESC, token ASC LIMIT {_VOCAB_N}
    )
    SELECT rank, token, n,
           CAST(n AS DOUBLE) / t AS token_frac,
           CAST(sum(n) OVER (ORDER BY rank) AS DOUBLE) / t AS cum_coverage
    FROM top, total
"""


@register(
    "x43_vocab_coverage",
    f"Corpus vocabulary report: top-{_VOCAB_N} tokens with rank, count, "
    "corpus frequency, and cumulative coverage — the 'how much does a "
    "size-N vocab explain' curve a tokenizer budget reads. Deterministic "
    "total order (count desc, token asc); one partial-aggregated "
    "token-count shuffle (key space = vocabulary, not corpus); the grand "
    "total rides as a 1-row broadcast so fractions are exact integer "
    "divisions.",
    oracle=_VOCAB_ORACLE,
    tags=("ext", "text", "stats", "tokenizer"),
)
def x43_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    return TX.vocab_coverage(load_table(spark, sf, "documents"), _VOCAB_N)


_MINMAX_ORACLE = """
    SELECT doc_id, source, n_chars,
           CASE WHEN mx = mn THEN 0.5
                ELSE CAST(n_chars - mn AS DOUBLE) / (mx - mn) END AS scaled
    FROM (
        SELECT doc_id, source, n_chars,
               min(n_chars) OVER (PARTITION BY source) AS mn,
               max(n_chars) OVER (PARTITION BY source) AS mx
        FROM documents
    )
"""


@register(
    "x44_length_minmax_scaled",
    "Per-source min-max scaling of document length to [0, 1] — the "
    "normalization step before mixing quality/length signals across "
    "corpora with different scales; a constant group scales to the 0.5 "
    "midpoint instead of dividing by zero. Integer min/max keep the one "
    "double division exact across engines. One window shuffle, O(1) "
    "state.",
    oracle=_MINMAX_ORACLE,
    tags=("ext", "text", "stats", "window"),
)
def x44_length_minmax_scaled(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return TX.length_minmax_scaled(docs).select(
        "doc_id", "source", "n_chars", "scaled"
    )


_HISTOGRAM_ORACLE = f"""
    WITH b AS (
        SELECT CAST(length(bin(len({SQL_WORDS.format(t='text')}))) - 1 AS INT)
                   AS log2_bucket
        FROM documents WHERE text IS NOT NULL
    )
    SELECT log2_bucket,
           CAST(pow(2.0, log2_bucket) AS BIGINT) AS lo_words,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM b GROUP BY log2_bucket
"""


@register(
    "x45_token_count_histogram",
    "Log2-bucketed histogram of per-document token counts (the corpus "
    "length-distribution report). floor(log2(n)) is computed EXACTLY as "
    "length-of-binary-representation minus one (Spark conv(n,10,2) ≡ "
    "DuckDB bin(n)) — no libm log, which isn't correctly rounded at "
    "power-of-two edges in every engine. One tiny-key-space aggregation.",
    oracle=_HISTOGRAM_ORACLE,
    tags=("ext", "text", "stats"),
)
def x45_token_count_histogram(spark: SparkSession, sf: str) -> DataFrame:
    return TX.token_count_histogram(load_table(spark, sf, "documents"))


_RP_DIM = 8


def _sql_random_projection() -> str:
    cols = []
    for p, plane in enumerate(S.int_hyperplanes(_RP_DIM, 64)):
        arr = "[" + ", ".join(str(x) for x in plane) + "]"
        fold = (
            f"list_reduce(list_transform(list_zip(v, {arr}), "
            f"z -> CAST(floor(z[1] * {S.RP_SCALE}) AS BIGINT) * z[2]), "
            "(acc, x) -> acc + x)"
        )
        cols.append(f"{fold} / {float(S.RP_SCALE * 1000)!r} AS rp{p:02d}")
    return ",\n           ".join(cols)


_RANDOM_PROJECTION_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE (list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)), 'max') < 1e9)
    )
    SELECT vec_id,
           {_sql_random_projection()}
    FROM c
"""


@register(
    "x46_random_projection",
    f"Signed random projection of the 64-dim embeddings to {_RP_DIM} "
    "dimensions (Johnson-Lindenstrauss reduction; the real-valued stage "
    "the sign-bit LSH quantizes). Projection vectors are the SAME "
    "md5-derived hyperplanes as the LSH tier (integer form), inlined "
    "into the oracle from one source. Arithmetic is fixed-point int64 "
    "(floor(x·2^20) quantization — exact for float32 — times integer "
    "planes), so the fold is associative and bit-identical in any "
    "engine at any parallelism; one constant double division rescales. "
    "Pure projection, no shuffle at any scale.",
    oracle=_RANDOM_PROJECTION_ORACLE,
    tags=("ext", "embedding", "projection"),
)
def x46_random_projection(spark: SparkSession, sf: str) -> DataFrame:
    # failed (non-finite) embeddings are excluded whole (round-11 NaN
    # convention): a NaN component would poison the fixed-point fold
    return S.random_projection(
        load_table(spark, sf, "embeddings").filter(finite_vec("embedding")),
        out_dim=_RP_DIM,
    )


_HYBRID_ORACLE = f"""
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
    lex AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
                    AND a.doc_id < b.doc_id
    ),
    c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    eb AS (
        SELECT vec_id, v, {_sql_lsh_bucket('v')} AS bucket FROM c
    ),
    sem AS (
        SELECT x.vec_id AS doc_a, y.vec_id AS doc_b
        FROM eb x JOIN eb y
          ON x.bucket = y.bucket AND x.vec_id < y.vec_id
        WHERE {sql_cosine('x.v', 'y.v')} >= 0.3
    )
    SELECT COALESCE(l.doc_a, s.doc_a) AS doc_a,
           COALESCE(l.doc_b, s.doc_b) AS doc_b,
           l.doc_a IS NOT NULL AS lexical,
           s.doc_a IS NOT NULL AS semantic
    FROM lex l FULL OUTER JOIN sem s
      ON l.doc_a = s.doc_a AND l.doc_b = s.doc_b
"""


@register(
    "x47_hybrid_near_dup_pairs",
    "Ensemble near-dup detection: union of lexical MinHash-LSH candidate "
    "pairs (x8) and embedding-cosine near-dup pairs (x12, vec ids = doc "
    "ids) with per-method provenance flags — surface edits evade "
    "embeddings, paraphrases evade shingles; review the union, trust the "
    "intersection. Both branches stay bucketed (band join / sign-bit "
    "bucket join, never all-pairs); the ensemble adds one full-outer "
    "join that shuffles only (id, id) pair keys.",
    oracle=_HYBRID_ORACLE,
    tags=("ext", "dedup", "similarity", "ensemble"),
)
def x47_hybrid_near_dup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    return X.hybrid_near_dup_pairs(
        load_table(spark, sf, "documents"),
        load_table(spark, sf, "embeddings"),
        cosine_threshold=0.3,
    )


# ---------------------------------------------------------------------------
# weighted / mixture sampling
# ---------------------------------------------------------------------------

# deterministic per-doc uniform in [0,1): 32-bit md5 prefix / 2^32 — the
# division is by a power of two, so the double is exact in any engine
_SQL_UNIFORM = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"
    " / 4294967296.0"
)

# the x2 composite quality score, as one reusable scalar expression
_SQL_QSCORE = """least(CAST(len(string_split_regex(lower(text), '\\s+')) AS DOUBLE) / 50.0, 1.0)
             * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()-]', '', 'g')) AS DOUBLE)
                            / greatest(length(text), 1) * 4.0, 1.0))
             * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
                            / greatest(length(text), 1) * 4.0, 1.0))"""


def _uniform_col() -> F.Column:
    return X.base_hash(F.col("doc_id").cast("string")) / F.lit(4294967296.0)


_QUALITY_SAMPLE_ORACLE = f"""
    SELECT doc_id,
           {_SQL_QSCORE} AS quality_score,
           {_SQL_UNIFORM} AS u_uniform
    FROM documents
    WHERE {_SQL_UNIFORM} < {_SQL_QSCORE}
"""


@register(
    "x48_quality_weighted_sample",
    "Quality-weighted rejection sampling (the DCLM/FineWeb-style soft "
    "filter): keep each document with probability equal to its composite "
    "quality score, decided by comparing the score against a "
    "deterministic per-doc uniform (md5 32-bit prefix / 2^32 — exact "
    "power-of-two division, identical doubles in every engine). "
    "Reproducible across runs and cluster sizes, strictly monotone in "
    "quality, pure projection+filter with no shuffle.",
    oracle=_QUALITY_SAMPLE_ORACLE,
    tags=("ext", "sampling", "quality", "deterministic"),
)
def x48_quality_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    scored = TX.add_quality_signals(docs)
    u = _uniform_col()
    return (
        scored.withColumn("u_uniform", u)
        .filter(F.col("u_uniform") < F.col("quality_score"))
        .select("doc_id", "quality_score", "u_uniform")
    )


_MIX_REBALANCE_ORACLE = f"""
    WITH c AS (
        SELECT source, CAST(count(*) AS BIGINT) AS cnt
        FROM documents GROUP BY source
    ),
    t AS (SELECT sum(cnt) AS total, count(*) AS k FROM c),
    r AS (
        SELECT source,
               least(1.0, (CAST(total AS DOUBLE) / k) / cnt) AS accept_rate
        FROM c, t
    )
    SELECT d.doc_id, d.source, r.accept_rate,
           {_SQL_UNIFORM} AS u_uniform
    FROM documents d JOIN r USING (source)
    WHERE {_SQL_UNIFORM} < r.accept_rate
"""


@register(
    "x49_source_mix_rebalance",
    "Training-mixture rebalancing: deterministically downsample each "
    "source toward an equal-share target — accept_rate(source) = "
    "min(1, target_count / source_count), decided per doc by the same "
    "md5-uniform as x48 (reproducible, composable with every other "
    "hash-sampling op). Over-represented sources shrink, small sources "
    "pass through whole. The rate table is a tiny per-source aggregate "
    "that broadcasts; the corpus side filters in place — no corpus "
    "shuffle at any scale. Division order (total/k)/cnt is pinned so "
    "doubles agree across engines.",
    oracle=_MIX_REBALANCE_ORACLE,
    tags=("ext", "sampling", "mixture", "deterministic"),
)
def x49_source_mix_rebalance(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("k")
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        "source",
        F.least(
            F.lit(1.0),
            (F.col("total").cast("double") / F.col("k")) / F.col("cnt"),
        ).alias("accept_rate"),
    )
    u = _uniform_col()
    return (
        docs.join(F.broadcast(rates), "source")
        .withColumn("u_uniform", u)
        .filter(F.col("u_uniform") < F.col("accept_rate"))
        .select("doc_id", "source", "accept_rate", "u_uniform")
    )


_LEAK_REPORT_ORACLE = f"""
    WITH benchmark AS (
        SELECT doc_id, text FROM documents WHERE text IS NOT NULL
        ORDER BY length(text) DESC, doc_id
        LIMIT 10
    ),
    bg AS (
        SELECT doc_id AS bench_id, unnest({sql_shingles('text', 5)}) AS g
        FROM benchmark
    ),
    cg AS (
        SELECT doc_id, unnest({sql_shingles('text', 5)}) AS g
        FROM documents WHERE text IS NOT NULL
    ),
    hits AS (
        SELECT bg.bench_id,
               CAST(count(DISTINCT cg.doc_id) AS BIGINT) AS leaking_docs,
               CAST(count(*) AS BIGINT) AS shared_gram_instances
        FROM cg JOIN bg USING (g)
        WHERE cg.doc_id != bg.bench_id
        GROUP BY bg.bench_id
    )
    SELECT b.doc_id AS bench_id,
           COALESCE(h.leaking_docs, 0) AS leaking_docs,
           COALESCE(h.shared_gram_instances, 0) AS shared_gram_instances
    FROM benchmark b LEFT JOIN hits h ON b.doc_id = h.bench_id
"""


@register(
    "x50_benchmark_leak_report",
    "Reverse contamination view: per BENCHMARK item (same 10-longest-docs "
    "convention as x17/x25), how many corpus documents share at least one "
    "word 5-gram with it and how many gram hits in total — the report an "
    "eval owner reads to decide which benchmark rows are burned. x25 "
    "answers 'which corpus docs to drop'; this answers 'which eval items "
    "to distrust'. Benchmark grams broadcast; only hits shuffle; "
    "self-matches excluded.",
    oracle=_LEAK_REPORT_ORACLE,
    tags=("ext", "decontamination", "ngram", "report"),
)
def x50_benchmark_leak_report(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    benchmark = docs.orderBy(F.length("text").desc(), "doc_id").limit(10)
    return X.benchmark_leak_report(docs, benchmark, n=5)


_SESSION_SEQ_ORACLE = """
    WITH flagged AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, event_id, ts, event_type,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS event_seq
    FROM sessions
    GROUP BY user_id, session_seq
"""


@register(
    "x51_session_event_sequences",
    "Behavior-sequence construction: per-user 30-min-gap sessions (the "
    "w2 gaps-and-islands split) rolled up into ORDERED event-type "
    "sequences — the step that turns an event log into sequence-model "
    "training rows. Deterministic order by (ts, event_id); the sequence "
    "is built with array_sort(collect_list(struct)) ≡ string_agg ORDER "
    "BY, one shuffle on user_id, sessions never cross partitions.",
    oracle=_SESSION_SEQ_ORACLE,
    tags=("ext", "events", "sequence", "sessionization"),
)
def x51_session_event_sequences(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    sessions = ev.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ordered_types = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
        lambda s: s.event_type,
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.concat_ws(">", ordered_types).alias("event_seq"),
    )


_LEAKAGE_SPLIT_ORACLE = f"""
    WITH RECURSIVE pairs AS ({_LSH_ORACLE}
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    walk(node, reach) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT w.node, e.dst
        FROM walk w JOIN edges e ON w.reach = e.src
    ),
    labels AS (
        SELECT node AS doc_id, LEAST(node, MIN(reach)) AS cluster_id
        FROM walk GROUP BY node
    ),
    assigned AS (
        SELECT d.doc_id,
               COALESCE(l.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN labels l USING (doc_id)
    )
    SELECT doc_id, cluster_id,
           CASE WHEN CAST('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)
                          AS BIGINT) % 10 < 9
                THEN 'train' ELSE 'val' END AS split
    FROM assigned
"""


@register(
    "x52_leakage_safe_split",
    "Leakage-safe train/val split: documents are assigned to splits by "
    "hashing their near-dup CLUSTER representative (x18's connected "
    "components over MinHash-LSH pairs), never the document itself — so "
    "near-duplicates can never straddle the split and inflate eval "
    "scores, the failure mode naive per-doc splitting guarantees at "
    "scale. Singletons cluster as themselves; ~90/10 via md5-uniform "
    "mod 10. Deterministic, cluster-atomic, reproducible at any "
    "parallelism.",
    oracle=_LEAKAGE_SPLIT_ORACLE,
    tags=("ext", "sampling", "dedup", "split"),
)
def x52_leakage_safe_split(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    clusters = X.near_dup_clusters(docs).select("doc_id", "cluster_id")
    assigned = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    )
    split = F.when(
        X.base_hash(F.col("cluster_id").cast("string")) % 10 < 9, "train"
    ).otherwise("val")
    return assigned.select("doc_id", "cluster_id", split.alias("split"))


_DEDUP_WEIGHTS_ORACLE = f"""
    WITH RECURSIVE pairs AS ({_LSH_ORACLE}
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    walk(node, reach) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT w.node, e.dst
        FROM walk w JOIN edges e ON w.reach = e.src
    ),
    labels AS (
        SELECT node AS doc_id, LEAST(node, MIN(reach)) AS cluster_id
        FROM walk GROUP BY node
    ),
    assigned AS (
        SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN labels l USING (doc_id)
    )
    SELECT cluster_id AS doc_id,
           CAST(count(*) AS BIGINT) AS weight
    FROM assigned
    GROUP BY cluster_id
"""


@register(
    "x53_dedup_with_weights",
    "Count-preserving near-dup dedup: one surviving row per cluster (the "
    "min-id representative) carrying the cluster size as a sampling "
    "weight — train on deduplicated text WITHOUT flattening the natural "
    "frequency distribution (upweight what was common, the standard "
    "alternative to hard dedup). Singletons survive with weight 1. The "
    "weights table is the groupBy of x18's labels; at scale it shuffles "
    "only (cluster_id) keys.",
    oracle=_DEDUP_WEIGHTS_ORACLE,
    tags=("ext", "dedup", "clustering", "weights"),
)
def x53_dedup_with_weights(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    clusters = X.near_dup_clusters(docs).select("doc_id", "cluster_id")
    assigned = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    )
    return assigned.groupBy(F.col("cluster_id").alias("doc_id")).agg(
        F.count("*").alias("weight")
    )


_NOVELTY_ORACLE = f"""
    WITH g AS (
        SELECT doc_id, unnest({sql_shingles('text', 5)}) AS gram
        FROM documents WHERE text IS NOT NULL
    ),
    h AS (SELECT doc_id, md5(gram) AS gh FROM g),
    first_seen AS (
        SELECT gh, min(doc_id) AS first_doc FROM h GROUP BY gh
    ),
    per_doc AS (
        SELECT h.doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN f.first_doc = h.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS novel_grams
        FROM h JOIN first_seen f USING (gh)
        GROUP BY h.doc_id
    )
    SELECT doc_id, n_grams, novel_grams,
           CAST(novel_grams AS DOUBLE) / n_grams AS novelty_frac
    FROM per_doc
"""


@register(
    "x54_ngram_novelty",
    "Incremental-novelty score: per document (in doc_id ingestion order), "
    "the fraction of its distinct word 5-grams whose FIRST corpus "
    "occurrence is this document — 'how much new content does this doc "
    "contribute', the signal an incremental crawl uses to stop ingesting "
    "saturated sources. First-occurrence is a min(doc_id) groupBy over "
    "md5(gram) keys (32-byte hex shuffles, never gram text), then one "
    "hits-join back; short docs contribute their full text as one "
    "shingle so n_grams >= 1 and the fraction is always defined.",
    oracle=_NOVELTY_ORACLE,
    tags=("ext", "dedup", "ngram", "novelty"),
)
def x54_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    h = docs.select(
        "doc_id",
        F.explode(X.word_shingles(F.col("text"), 5)).alias("gram"),
    ).select("doc_id", F.md5("gram").alias("gh"))
    first_seen = h.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        h.join(first_seen, "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("novel_grams"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "novel_grams",
        (F.col("novel_grams").cast("double") / F.col("n_grams")).alias(
            "novelty_frac"
        ),
    )


_DUP_PROVENANCE_ORACLE = """
    WITH keyed AS (
        SELECT doc_id, source,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS content_hash
        FROM documents WHERE text IS NOT NULL
    )
    SELECT content_hash,
           min(doc_id) AS keeper_id,
           CAST(count(*) AS BIGINT) AS copies,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           array_to_string(list_sort(list_distinct(list(source))), ',')
               AS sources_csv
    FROM keyed
    GROUP BY content_hash
    HAVING count(*) >= 2
"""


@register(
    "x55_dup_provenance_report",
    "Duplicate-provenance forensics: for every exact-dup cluster (same "
    "normalized-content md5, >= 2 copies), the keeper, copy count, and "
    "the SORTED distinct set of sources involved — distinguishes "
    "intra-source duplication (a crawler re-fetching) from cross-source "
    "syndication (mirrors), which call for different fixes upstream. "
    "Same 16-byte-hash shuffle as exact dedup; the source set per "
    "cluster is bounded by the number of sources.",
    oracle=_DUP_PROVENANCE_ORACLE,
    tags=("ext", "dedup", "report", "provenance"),
)
def x55_dup_provenance_report(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    normalized = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    keyed = docs.select(
        "doc_id", "source", F.md5(normalized).alias("content_hash")
    )
    return (
        keyed.groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count("*").alias("copies"),
            F.countDistinct("source").alias("n_sources"),
            F.concat_ws(",", F.sort_array(F.collect_set("source"))).alias(
                "sources_csv"
            ),
        )
        .filter(F.col("copies") >= 2)
    )


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")

_PROFILE_ORACLE = "\n    UNION ALL\n".join(
    f"""    SELECT '{c}' AS column_name,
           CAST(count({c}) AS BIGINT) AS n_values,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM documents"""
    for c in _PROFILE_COLS
)


@register(
    "x56_table_profile",
    "Column-profiling report over the documents table (the ANALYZE-style "
    "stats a pipeline collects before planning): per column, non-null "
    "count, null count, and exact distinct count. One aggregation pass "
    "computes every column's stats (3 aggregates per column in a single "
    "agg), then a stack() pivots to one row per column — the scan "
    "happens once regardless of column count. At 100 TB the exact "
    "count(DISTINCT) switches to approx_count_distinct per the same "
    "exactness-vs-sketch policy as quality.py's percentile switch.",
    oracle=_PROFILE_ORACLE,
    tags=("ext", "stats", "profiling"),
)
def x56_table_profile(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"cnt_{c}"),
            (F.count("*") - F.count(c)).alias(f"nul_{c}"),
            F.countDistinct(c).alias(f"dst_{c}"),
        ]
    row = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', cnt_{c}, nul_{c}, dst_{c}" for c in _PROFILE_COLS
    )
    return row.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) "
        "AS (column_name, n_values, n_nulls, n_distinct)"
    )


_FUNNEL_ORACLE = """
    WITH flagged AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, event_id, ts, event_type,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           min(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL
               AS has_view,
           min(CASE WHEN event_type = 'click' THEN ts END) IS NOT NULL
               AS has_click,
           min(CASE WHEN event_type = 'purchase' THEN ts END) IS NOT NULL
               AS has_purchase,
           COALESCE(
               min(CASE WHEN event_type = 'view' THEN ts END)
                   <= min(CASE WHEN event_type = 'click' THEN ts END)
               AND min(CASE WHEN event_type = 'click' THEN ts END)
                   <= min(CASE WHEN event_type = 'purchase' THEN ts END),
               FALSE) AS converted
    FROM sessions
    GROUP BY user_id, session_seq
"""


@register(
    "x57_session_funnel",
    "Funnel analysis over gaps-and-islands sessions: per session, "
    "presence of each funnel stage (view/click/purchase) and whether the "
    "ORDERED conversion happened — first view before first click before "
    "first purchase, all within the session. The canonical product-"
    "analytics operator, one user_id shuffle; stage timestamps are "
    "conditional mins inside the same aggregation (no re-scan per "
    "stage), and the order test NULL-coalesces to false so partial "
    "funnels never count as conversions.",
    oracle=_FUNNEL_ORACLE,
    tags=("ext", "events", "funnel", "sessionization"),
)
def x57_session_funnel(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    sessions = ev.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )

    def stage_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    view_ts, click_ts, buy_ts = stage_ts("view"), stage_ts("click"), stage_ts("purchase")
    return sessions.groupBy("user_id", "session_seq").agg(
        view_ts.isNotNull().alias("has_view"),
        click_ts.isNotNull().alias("has_click"),
        buy_ts.isNotNull().alias("has_purchase"),
        F.coalesce(
            (view_ts <= click_ts) & (click_ts <= buy_ts), F.lit(False)
        ).alias("converted"),
    )


_COHORT_ORACLE = """
    WITH weekly AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS week
        FROM events
    ),
    firsts AS (
        SELECT user_id, min(week) AS cohort_week FROM weekly GROUP BY user_id
    ),
    joined AS (
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week, w.week) / 7 AS BIGINT)
                   AS week_offset,
               w.user_id
        FROM weekly w JOIN firsts f USING (user_id)
    ),
    sizes AS (
        SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
        FROM firsts GROUP BY cohort_week
    )
    SELECT j.cohort_week, j.week_offset,
           CAST(count(DISTINCT j.user_id) AS BIGINT) AS n_active,
           s.cohort_size,
           CAST(count(DISTINCT j.user_id) AS DOUBLE) / s.cohort_size
               AS retention_rate
    FROM joined j JOIN sizes s USING (cohort_week)
    GROUP BY j.cohort_week, j.week_offset, s.cohort_size
"""


@register(
    "x58_cohort_retention",
    "Weekly cohort retention: users are cohorted by their first active "
    "ISO week (date_trunc('week') — Monday in both engines), and each "
    "cohort's share of users still active N weeks later is reported. "
    "The canonical growth-analytics operator. Week offsets divide "
    "exactly (both endpoints week-truncated), retention is an exact "
    "int/int division; the plan is two small groupBys over (user, week) "
    "distinct pairs — activity reduces before anything joins, so the "
    "event table is scanned once and never re-shuffled at event "
    "granularity.",
    oracle=_COHORT_ORACLE,
    tags=("ext", "events", "cohort", "retention"),
)
def x58_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    weekly = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    firsts = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    joined = weekly.join(firsts, "user_id").select(
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
        .cast("long")
        .alias("week_offset"),
        "user_id",
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        joined.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
                "retention_rate"
            ),
        )
    )


_NEXT_EVENT_ORACLE = """
    WITH flagged AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, event_id, ts, event_type,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           CAST(row_number() OVER sw - 1 AS INT) AS prefix_len,
           string_agg(event_type, '>') OVER
               (PARTITION BY user_id, session_seq ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS context_seq,
           event_type AS next_event
    FROM sessions
    WINDOW sw AS (PARTITION BY user_id, session_seq ORDER BY ts, event_id)
    QUALIFY prefix_len >= 1
"""


@register(
    "x59_next_event_training_pairs",
    "Supervised-pair extraction for next-event prediction: every "
    "non-initial event in a session becomes one training row "
    "(context_seq = the '>'-joined events before it, next_event = the "
    "label) — the step that turns sessionized logs into sequence-model "
    "supervision. Context is an ordered-window string_agg ≡ Spark "
    "concat_ws over a collect_list window frame (UNBOUNDED PRECEDING "
    "to 1 PRECEDING), deterministic by (ts, event_id). One user_id "
    "shuffle; per-row context length is bounded by session length, "
    "which the 30-min gap bounds in turn.",
    oracle=_NEXT_EVENT_ORACLE,
    tags=("ext", "events", "sequence", "training-pairs"),
)
def x59_next_event_training_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    sessions = ev.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sw = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    prefix = sw.rowsBetween(Window.unboundedPreceding, -1)
    return (
        sessions.select(
            "user_id",
            "session_seq",
            (F.row_number().over(sw) - 1).alias("prefix_len"),
            F.concat_ws(">", F.collect_list("event_type").over(prefix)).alias(
                "context_seq"
            ),
            F.col("event_type").alias("next_event"),
        )
        .filter(F.col("prefix_len") >= 1)
    )


_KNN_GRAPH_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    b AS (
        SELECT vec_id, v, {_sql_lsh_bucket('v')} AS bucket FROM c
    ),
    scored AS (
        SELECT x.vec_id AS src_id, y.vec_id AS dst_id,
               {sql_cosine('x.v', 'y.v')} AS cos_sim
        FROM b x JOIN b y
          ON x.bucket = y.bucket AND x.vec_id != y.vec_id
    )
    SELECT src_id, dst_id, cos_sim,
           CAST(row_number() OVER (PARTITION BY src_id
                                   ORDER BY cos_sim DESC, dst_id ASC) AS INT)
               AS rank
    FROM scored
    QUALIFY rank <= 3
"""


@register(
    "x60_knn_graph",
    "Approximate k-NN graph (k=3) over the full embedding corpus: top-k "
    "cosine neighbors within each sign-bit LSH bucket, total-ordered "
    "ranking (cos desc, id asc). Unlike the probe-broadcast ANN entries, "
    "every row is a probe here, so the plan is a bucket-keyed SELF-join "
    "— one shuffle per side, no broadcast, the correct 100 TB shape for "
    "graph construction; downstream consumers are graph clustering "
    "(x18/x32's components) and kNN label propagation.",
    oracle=_KNN_GRAPH_ORACLE,
    tags=("ext", "embedding", "ann", "graph"),
)
def x60_knn_graph(spark: SparkSession, sf: str) -> DataFrame:
    return S.knn_graph(load_table(spark, sf, "embeddings"), k=3)


_RANK_QUANTILE_ORACLE = """
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           max(CASE WHEN rk = greatest(CAST(ceil(0.5 * n) AS BIGINT), 1)
                    THEN value END) AS p50,
           max(CASE WHEN rk = greatest(CAST(ceil(0.95 * n) AS BIGINT), 1)
                    THEN value END) AS p95
    FROM ranked
    GROUP BY event_type
"""


@register(
    "x61_exact_quantiles_by_rank",
    "Exact per-group quantiles by RANK SELECTION: p50/p95 = the value at "
    "row ceil(q*n) in (value, event_id) order — no interpolation, no "
    "libm, the value is an actual data point so it hashes identically "
    "anywhere. This is the scalable exact-quantile formulation: a sort "
    "shuffle on the group key with O(1) per-row window state, versus "
    "percentile()'s ObjectHashAggregate which buffers every group value "
    "in executor memory (the a1 plan's documented cost). Same one-pass "
    "group-by recovers both quantiles from conditional aggregates. NULL "
    "values are excluded like any SQL aggregate would (round 11 — also "
    "load-bearing for parity: Spark sorts NULLs first, DuckDB last, so "
    "an unfiltered rank selection is engine-defined).",
    oracle=_RANK_QUANTILE_ORACLE,
    tags=("ext", "stats", "quantile", "window"),
)
def x61_exact_quantiles_by_rank(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wc).alias("n"),
    )

    def at(q: float):
        target = F.greatest(F.ceil(q * F.col("n")).cast("long"), F.lit(1))
        return F.max(F.when(F.col("rk") == target, F.col("value")))

    return ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        at(0.5).alias("p50"),
        at(0.95).alias("p95"),
    )


_TRANSITION_ORACLE = """
    WITH flagged AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, event_id, ts, event_type,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_seq
        FROM flagged
    ),
    pairs AS (
        SELECT lag(event_type) OVER sw AS prev_type, event_type AS next_type
        FROM sessions
        WINDOW sw AS (PARTITION BY user_id, session_seq ORDER BY ts, event_id)
    )
    SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
    FROM pairs WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
"""


@register(
    "x62_event_transition_matrix",
    "Session-scoped event-transition matrix: counts of consecutive "
    "(prev_type -> next_type) pairs within 30-min-gap sessions — the "
    "Markov-bigram statistic behind next-event baselines and anomaly "
    "screens (x59 extracts the training pairs; this is their aggregate "
    "distribution). lag() inside the session window never crosses a "
    "session boundary; the final count shuffles a key space of at most "
    "|event types|^2.",
    oracle=_TRANSITION_ORACLE,
    tags=("ext", "events", "sequence", "markov"),
)
def x62_event_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    sessions = ev.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sw = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    return (
        sessions.select(
            F.lag("event_type").over(sw).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


_PHONE_RE = r"\+?\d[\d\-\s]{7,14}\d"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PII_SWEEP_ORACLE = f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT)
               AS n_phones,
           CAST(len(regexp_extract_all(text, '{_IPV4_RE}')) AS BIGINT)
               AS n_ipv4,
           md5(regexp_replace(regexp_replace(text, '{_PHONE_RE}', '<PHONE>', 'g'),
                              '{_IPV4_RE}', '<IP>', 'g')) AS redacted_fp
    FROM documents WHERE text IS NOT NULL
"""


@register(
    "x63_pii_numeric_sweep",
    "Numeric-PII sweep extending x22's email redaction: per doc, counts "
    "of phone-number-shaped and IPv4-shaped spans plus the md5 of the "
    "redacted text (spans replaced by <PHONE>/<IP> placeholders — the "
    "fingerprint proves redaction happened without shipping the "
    "redacted text through the gate). Pure regexp projection, identical "
    "patterns in both dialects, no shuffle.",
    oracle=_PII_SWEEP_ORACLE,
    tags=("ext", "text", "pii"),
)
def x63_pii_numeric_sweep(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    t = F.col("text")
    redacted = F.regexp_replace(
        F.regexp_replace(t, _PHONE_RE, "<PHONE>"), _IPV4_RE, "<IP>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(_IPV4_RE)).cast("long").alias("n_ipv4"),
        F.md5(redacted).alias("redacted_fp"),
    )


_LANG_AUDIT_ORACLE = f"""
    WITH scored AS (
        SELECT doc_id, source, lang, text,
               greatest({", ".join(_sql_stopword_score(lang) for lang in _LANGS)})
                   AS _best
        FROM documents
    ),
    pred AS (
        SELECT doc_id, source, lang,
               CASE WHEN _best <= 0 THEN 'und' {_LANG_CASE} END AS lang_pred
        FROM scored
    )
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN lang_pred = lang THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree,
           CAST(sum(CASE WHEN lang_pred = 'und' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_undetermined,
           CAST(sum(CASE WHEN lang_pred = lang THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS agreement_rate
    FROM pred
    GROUP BY source, lang
"""


@register(
    "x64_language_label_audit",
    "Label-quality audit: per (source, declared lang), how often the "
    "stopword-vote language ID (x1) AGREES with the metadata label — "
    "the check a curation pipeline runs before trusting upstream lang "
    "tags for mixture decisions. Mislabeled sources surface as low "
    "agreement; 'und' counts expose docs too short/noisy to verify. "
    "One projection plus a tiny (source, lang) aggregate; agreement is "
    "an exact int/int division.",
    oracle=_LANG_AUDIT_ORACLE,
    tags=("ext", "text", "audit", "quality"),
)
def x64_language_label_audit(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    pred = TX.add_language_id(docs)
    agree = F.when(F.col("lang_pred") == F.col("lang"), 1).otherwise(0)
    und = F.when(F.col("lang_pred") == "und", 1).otherwise(0)
    return pred.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(agree).alias("n_agree"),
        F.sum(und).alias("n_undetermined"),
        (F.sum(agree).cast("double") / F.count("*")).alias("agreement_rate"),
    )


# ---------------------------------------------------------------------------
# pipeline audit / evaluation tier: the reports an operator of a 100 TB
# curation pipeline runs BEFORE trusting its own knobs — LSH recall vs the
# exact scorer, per-rule drop attribution, key-skew heavy hitters,
# referential integrity.
# ---------------------------------------------------------------------------

_LSH_RECALL_ORACLE = f"""
    WITH exact AS (
        SELECT * FROM ({_JACCARD_ORACLE})
    ),
    cand AS (
        SELECT * FROM ({_LSH_ORACLE})
    ),
    j AS (
        SELECT (e.doc_a IS NOT NULL) AS is_exact,
               (c.doc_a IS NOT NULL) AS is_cand
        FROM exact e FULL JOIN cand c USING (doc_a, doc_b)
    )
    SELECT CAST(count(*) FILTER (WHERE is_exact) AS BIGINT)
               AS n_true_pairs,
           CAST(count(*) FILTER (WHERE is_cand) AS BIGINT)
               AS n_candidates,
           CAST(count(*) FILTER (WHERE is_exact AND is_cand)
                AS BIGINT) AS n_recalled,
           CASE WHEN count(*) FILTER (WHERE is_exact) > 0 THEN
               CAST(count(*) FILTER (WHERE is_exact AND is_cand)
                    AS DOUBLE)
               / count(*) FILTER (WHERE is_exact) END AS recall,
           CASE WHEN count(*) FILTER (WHERE is_cand) > 0 THEN
               CAST(count(*) FILTER (WHERE is_exact AND is_cand)
                    AS DOUBLE)
               / count(*) FILTER (WHERE is_cand) END AS precision
    FROM j
"""
# ^ count(*) FILTER, not sum(CASE 1/0): over the EMPTY full-outer join
# (no documents) sum reads NULL where Spark's count reads 0
# (empty-input parity, round 10); identical on any non-empty corpus.


@register(
    "x65_lsh_recall_report",
    "Tuning-audit for the near-dup stack: joins the EXACT Jaccard >= 0.5 "
    "pairs (x6) against the MinHash-LSH candidates (x8) and reports "
    "recall (true pairs the bands caught) and precision (candidates that "
    "are true near-dups) in one row. This is the measurement that decides "
    "the band/row configuration before a 100 TB run — run it on a sampled "
    "slice, then ship only the LSH path. Both pair sets are tiny relative "
    "to the corpus, so the full-outer join on pair keys is the cheap "
    "final step after the bucketed generators.",
    oracle=_LSH_RECALL_ORACLE,
    tags=("ext", "dedup", "lsh", "audit", "evaluation"),
)
def x65_lsh_recall_report(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    exact = X.jaccard_near_dup_pairs(docs, threshold=0.5).select(
        "doc_a", "doc_b", F.lit(1).alias("is_exact")
    )
    cand = X.lsh_candidate_pairs(docs).select(
        "doc_a", "doc_b", F.lit(1).alias("is_cand")
    )
    j = exact.join(cand, ["doc_a", "doc_b"], "full_outer")
    n_true = F.count("is_exact")
    n_cand = F.count("is_cand")
    # count(when), not sum(when/otherwise 0): sum over the empty outer
    # join is NULL where the oracle's count(*) FILTER reads 0
    # (empty-input parity, round 10); identical on non-empty input
    n_hit = F.count(
        F.when((F.col("is_exact") == 1) & (F.col("is_cand") == 1), 1)
    )
    return j.agg(
        n_true.alias("n_true_pairs"),
        n_cand.alias("n_candidates"),
        n_hit.cast("long").alias("n_recalled"),
        F.when(n_true > 0, n_hit.cast("double") / n_true).alias("recall"),
        F.when(n_cand > 0, n_hit.cast("double") / n_cand).alias("precision"),
    )


_CASCADE_ORACLE = f"""
    WITH lang AS ({_LANG_ORACLE}),
    q AS ({_QUALITY_ORACLE}),
    base AS (
        SELECT d.doc_id, d.source, d.text, l.lang_pred, q.quality_score,
               CASE WHEN d.text IS NOT NULL THEN {_SQL_FP} END AS fingerprint,
               substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)
                   IN ('0','1','2','3','4','5','6','7') AS in_sample,
               (d.text IS NOT NULL AND l.lang_pred = 'en'
                AND q.quality_score >= 0.8) AS pass12
        FROM documents d
        LEFT JOIN lang l USING (doc_id)
        LEFT JOIN q USING (doc_id)
    ),
    keepers AS (
        SELECT fingerprint, min(doc_id) AS keep_id
        FROM base WHERE pass12 GROUP BY fingerprint
    ),
    bench AS (
        SELECT {_SQL_FP} AS fingerprint
        FROM documents WHERE text IS NOT NULL
        ORDER BY length(text) DESC, doc_id
        LIMIT 10
    ),
    reasons AS (
        SELECT source,
               CASE WHEN text IS NULL THEN 'null_text'
                    WHEN lang_pred <> 'en' THEN 'non_english'
                    WHEN quality_score < 0.8 THEN 'low_quality'
                    WHEN doc_id <> k.keep_id THEN 'duplicate'
                    WHEN fingerprint IN (SELECT fingerprint FROM bench)
                        THEN 'contaminated'
                    WHEN NOT in_sample THEN 'sampled_out'
                    ELSE 'kept' END AS reason
        FROM base b LEFT JOIN keepers k USING (fingerprint)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN reason = 'null_text' THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
           CAST(sum(CASE WHEN reason = 'non_english' THEN 1 ELSE 0 END) AS BIGINT) AS n_non_english,
           CAST(sum(CASE WHEN reason = 'low_quality' THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
           CAST(sum(CASE WHEN reason = 'duplicate' THEN 1 ELSE 0 END) AS BIGINT) AS n_duplicate,
           CAST(sum(CASE WHEN reason = 'contaminated' THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           CAST(sum(CASE WHEN reason = 'sampled_out' THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled_out,
           CAST(sum(CASE WHEN reason = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM reasons
    GROUP BY source
"""


@register(
    "x66_filter_cascade_report",
    "Drop-attribution audit of the x27 curation cascade: every document "
    "is charged to the FIRST rule that rejects it (null text -> language "
    "-> quality -> exact-dup -> contamination -> hash-sample), and the "
    "report gives per-source counts for each reason plus the survivors — "
    "the FineWeb-style ablation table that justifies each filter before "
    "a full-corpus run. Same thresholds and keeper/benchmark definitions "
    "as x27, so sum(n_kept) equals the pipeline's output count exactly. "
    "One fingerprint shuffle (keeper election among rule-1/2 survivors), "
    "broadcast benchmark probe, then a tiny per-source aggregate.",
    oracle=_CASCADE_ORACLE,
    tags=("ext", "pipeline", "audit", "quality", "dedup"),
)
def x66_filter_cascade_report(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    d = TX.add_quality_signals(TX.add_language_id(docs))
    fp = F.when(
        F.col("text").isNotNull(),
        F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))),
    )
    pass12 = (
        F.col("text").isNotNull()
        & (F.col("lang_pred") == "en")
        & (F.col("quality_score") >= 0.8)
    )
    d = d.select(
        "doc_id",
        "source",
        "text",
        "lang_pred",
        "quality_score",
        fp.alias("fingerprint"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        .isin(*"01234567")
        .alias("in_sample"),
        pass12.alias("pass12"),
    )
    bench = (
        docs.filter(F.col("text").isNotNull())
        .orderBy(F.length("text").desc(), "doc_id")
        .limit(10)
        .select(
            F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))).alias(
                "fingerprint"
            ),
            F.lit(1).alias("bench_flag"),
        )
    )
    # keeper election as a window min over pass12 rows (r11, same rework
    # as x27 — guide §2.4): the groupBy + left-join formulation evaluated
    # the language/quality signal chain TWICE (once per join side) and
    # paid a join exchange on top of the groupBy's. min(CASE WHEN pass12
    # THEN doc_id END) over the fingerprint partition is join-equivalent
    # bit for bit: min ignores the non-pass12 NULLs (groups with no
    # keeper yield NULL keep_id, exactly like the unmatched left join,
    # including the NULL-fingerprint group whose rows all fail pass12).
    from pyspark.sql.window import Window

    flagged = d.withColumn(
        "keep_id",
        F.min(F.when(F.col("pass12"), F.col("doc_id"))).over(
            Window.partitionBy("fingerprint")
        ),
    ).join(F.broadcast(bench), "fingerprint", "left")
    reason = (
        F.when(F.col("text").isNull(), "null_text")
        .when(F.col("lang_pred") != "en", "non_english")
        .when(F.col("quality_score") < 0.8, "low_quality")
        .when(F.col("doc_id") != F.col("keep_id"), "duplicate")
        .when(F.col("bench_flag") == 1, "contaminated")
        .when(~F.col("in_sample"), "sampled_out")
        .otherwise("kept")
    )

    def n(label: str):
        return F.sum(F.when(F.col("reason") == label, 1).otherwise(0)).alias(
            f"n_{label}"
        )

    return (
        flagged.select("source", reason.alias("reason"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            n("null_text"),
            n("non_english"),
            n("low_quality"),
            n("duplicate"),
            n("contaminated"),
            n("sampled_out"),
            n("kept"),
        )
    )


_SKEW_ORACLE = """
    WITH counts AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    ),
    tot AS (
        SELECT CAST(sum(n_events) AS BIGINT) AS total_events,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM counts
    ),
    top AS (
        SELECT user_id, n_events,
               CAST(row_number() OVER (ORDER BY n_events DESC, user_id)
                    AS BIGINT) AS rank
        FROM counts
        ORDER BY n_events DESC, user_id
        LIMIT 10
    )
    SELECT t.rank, t.user_id, t.n_events,
           CAST(t.n_events AS DOUBLE) / tot.total_events AS share,
           CAST(sum(t.n_events) OVER (ORDER BY t.rank ROWS UNBOUNDED PRECEDING)
                AS DOUBLE) / tot.total_events AS cum_share,
           (CAST(t.n_events AS DOUBLE) * tot.n_keys) / tot.total_events
               AS skew_vs_mean
    FROM top t, tot
"""


@register(
    "x67_key_skew_report",
    "Shuffle-key skew diagnosis: the top-10 heaviest events.user_id keys "
    "with their absolute counts, share of all rows, cumulative share, and "
    "ratio to the mean key load — the report that decides whether a "
    "downstream groupBy/join needs salting (k1) or AQE skew handling "
    "BEFORE the 100 TB job hits one 400 GB reducer. The per-key count is "
    "an ordinary partial-agg groupBy; top-10 is a TakeOrdered (no global "
    "sort shuffle); the rank/cum-share window runs on 10 rows against a "
    "broadcast 1-row total.",
    oracle=_SKEW_ORACLE,
    tags=("ext", "events", "skew", "audit"),
)
def x67_key_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    tot = counts.agg(
        F.sum("n_events").alias("total_events"),
        F.count("*").alias("n_keys"),
    )
    top = counts.orderBy(F.desc("n_events"), "user_id").limit(10)
    w = Window.orderBy(F.desc("n_events"), F.asc("user_id"))
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    return top.crossJoin(F.broadcast(tot)).select(
        F.row_number().over(w).cast("long").alias("rank"),
        "user_id",
        "n_events",
        (F.col("n_events").cast("double") / F.col("total_events")).alias("share"),
        (
            F.sum("n_events").over(wc).cast("double") / F.col("total_events")
        ).alias("cum_share"),
        (
            (F.col("n_events").cast("double") * F.col("n_keys"))
            / F.col("total_events")
        ).alias("skew_vs_mean"),
    )


_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)

_FK_ORACLE = "\n    UNION ALL\n".join(
    f"""    SELECT '{ct}.{ck}->{pt}.{pk}' AS fk_edge,
           CAST(count(*) AS BIGINT) AS n_child,
           CAST(sum(CASE WHEN {ck} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_keys,
           CAST(sum(CASE WHEN {ck} IS NOT NULL AND {ck} NOT IN
                    (SELECT {pk} FROM {pt} WHERE {pk} IS NOT NULL)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
    FROM {ct}"""
    for ct, ck, pt, pk in _FK_EDGES
)


@register(
    "x68_referential_integrity_audit",
    "Data-quality audit of every foreign-key edge in the star schema: per "
    "edge, child row count, null-key count, and ORPHAN count (child keys "
    "with no parent row) — the pre-flight check that catches partial "
    "loads and dropped dimension files before a join silently shrinks "
    "the fact table. Each edge is one left join of child keys against "
    "distinct parent keys (dimension sides broadcast under AQE; the "
    "lineitem->orders edge shuffles only the two key columns), reduced "
    "to a single counters row; the report is their union.",
    oracle=_FK_ORACLE,
    tags=("ext", "quality", "audit", "join"),
)
def x68_referential_integrity_audit(spark: SparkSession, sf: str) -> DataFrame:
    from functools import reduce

    frames = []
    for ct, ck, pt, pk in _FK_EDGES:
        child = load_table(spark, sf, ct).select(F.col(ck).alias("k"))
        parent = (
            load_table(spark, sf, pt)
            .select(F.col(pk).alias("k"))
            .filter(F.col("k").isNotNull())
            .distinct()
            .withColumn("m", F.lit(1))
        )
        j = child.join(parent, "k", "left")
        frames.append(
            j.agg(
                F.count("*").alias("n_child"),
                F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null_keys"),
                F.sum(
                    F.when(F.col("k").isNotNull() & F.col("m").isNull(), 1).otherwise(0)
                )
                .cast("long")
                .alias("n_orphans"),
            ).select(
                F.lit(f"{ct}.{ck}->{pt}.{pk}").alias("fk_edge"),
                "n_child",
                "n_null_keys",
                "n_orphans",
            )
        )
    return reduce(lambda a, b: a.unionByName(b), frames)


_LATENESS_ORACLE = """
    WITH lat AS (
        SELECT date_diff('second', ts,
                   max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS UNBOUNDED PRECEDING)) AS lateness_s
        FROM events WHERE ts IS NOT NULL
    ),
    hist AS (
        SELECT lateness_s, CAST(count(*) AS BIGINT) AS cnt
        FROM lat GROUP BY lateness_s
    ),
    h2 AS (
        SELECT lateness_s, cnt,
               CAST(sum(cnt) OVER (ORDER BY lateness_s
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER () AS BIGINT) AS tot
        FROM hist
    )
    SELECT CAST(sum(cnt) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN lateness_s > 0 THEN cnt ELSE 0 END) AS BIGINT)
               AS n_late,
           CAST(sum(CASE WHEN lateness_s > 600 THEN cnt ELSE 0 END) AS BIGINT)
               AS n_late_over_10m,
           max(lateness_s) AS max_lateness_s,
           min(CASE WHEN cum >= CAST(ceil(0.95 * tot) AS BIGINT)
                    THEN lateness_s END) AS p95_lateness_s
    FROM h2
"""


@register(
    "x69_event_lateness_profile",
    "Watermark-tuning profile: how late do events arrive relative to the "
    "per-user high-watermark in ingestion (event_id) order? Reports late "
    "counts, the worst case, and the exact p95 lateness in seconds — the "
    "number that directly parameterizes withWatermark() so the streaming "
    "tier (streaming.py) holds just enough state to catch 95% of "
    "stragglers. Exact p95 WITHOUT a global sort: lateness reduces to an "
    "integer-seconds histogram first (bounded cardinality), and the "
    "quantile is read off the cumulative histogram — the scalable "
    "formulation of a global exact quantile, complementing x61's "
    "per-group rank selection.",
    oracle=_LATENESS_ORACLE,
    tags=("ext", "events", "streaming", "audit", "quantile"),
)
def x69_event_lateness_profile(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # TIMESTAMP_NTZ has no direct BIGINT cast in Spark 4; go through
    # TIMESTAMP_LTZ (identity under load_table's pinned UTC session zone),
    # whose long cast is floor-epoch-seconds == DuckDB date_diff('second').
    def epoch_s(c):
        return c.cast("timestamp").cast("long")

    lat = ev.select(
        (epoch_s(F.max("ts").over(w)) - epoch_s(F.col("ts"))).alias("lateness_s")
    )
    hist = lat.groupBy("lateness_s").agg(F.count("*").alias("cnt"))
    # windows over the HISTOGRAM (distinct lateness values), not the events
    cum = F.sum("cnt").over(
        Window.orderBy("lateness_s").rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = F.sum("cnt").over(Window.partitionBy())
    h2 = hist.select(
        "lateness_s", "cnt", cum.alias("cum"), tot.alias("tot")
    )
    target = F.ceil(0.95 * F.col("tot")).cast("long")
    return h2.agg(
        F.sum("cnt").alias("n_events"),
        F.sum(F.when(F.col("lateness_s") > 0, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_late"),
        F.sum(F.when(F.col("lateness_s") > 600, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_late_over_10m"),
        F.max("lateness_s").alias("max_lateness_s"),
        F.min(F.when(F.col("cum") >= target, F.col("lateness_s"))).alias(
            "p95_lateness_s"
        ),
    )


_MIXTURE_ORACLE = f"""
    WITH per_source AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len({SQL_WORDS.format(t='text')})) AS BIGINT)
                   AS n_tokens
        FROM documents
        GROUP BY source
    ),
    tot AS (
        SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST(count(*) AS BIGINT) AS n_sources
        FROM per_source
    )
    SELECT p.source, p.n_docs, p.n_tokens,
           CAST(p.n_tokens AS DOUBLE) / t.total_tokens AS share_now,
           1.0 / t.n_sources AS target_share,
           (2.0 * t.total_tokens) / (t.n_sources * p.n_tokens)
               AS repeat_epochs
    FROM per_source p, tot t
"""


@register(
    "x70_mixture_token_budget_plan",
    "Training-mix planner: per source, token counts, current corpus "
    "share, the uniform target share, and the repeat factor (epochs) "
    "each source needs to fill an equal slice of a 2x-corpus token "
    "budget — the arithmetic behind 'repeat the small high-quality "
    "sources, subsample the crawl' mixture designs (x49 executes a plan "
    "like this; this op derives it). One partial-agg groupBy(source) "
    "whose output is |sources| rows, joined against its own broadcast "
    "1-row total; divisions are fixed-order over exact integer inputs so "
    "both engines produce bit-identical doubles.",
    oracle=_MIXTURE_ORACLE,
    tags=("ext", "text", "sampling", "planning"),
)
def x70_mixture_token_budget_plan(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    per_source = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        # NULL text contributes no tokens, exactly as the oracle's
        # sum(len(NULL)) is a sum-ignored NULL — withOUT the guard,
        # size(NULL) = -1 SUBTRACTS a token per missing doc (round 11)
        F.sum(
            F.when(F.col("text").isNotNull(), F.size(TX.words("text")))
        ).alias("n_tokens"),
    )
    tot = per_source.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count("*").alias("n_sources"),
    )
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("total_tokens")).alias(
            "share_now"
        ),
        (F.lit(1.0) / F.col("n_sources")).alias("target_share"),
        (
            (F.lit(2.0) * F.col("total_tokens"))
            / (F.col("n_sources") * F.col("n_tokens"))
        ).alias("repeat_epochs"),
    )


_VOCAB_GROWTH_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, unnest({SQL_WORDS.format(t='text')}) AS token
        FROM documents WHERE text IS NOT NULL
    ),
    first_seen AS (
        SELECT token, min(doc_id) AS first_doc FROM tok GROUP BY token
    ),
    growth AS (
        SELECT first_doc // 100 AS doc_bucket,
               CAST(count(*) AS BIGINT) AS new_types
        FROM first_seen GROUP BY doc_bucket
    )
    SELECT doc_bucket, new_types,
           CAST(sum(new_types) OVER (ORDER BY doc_bucket
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS vocab_size
    FROM growth
"""


@register(
    "x71_vocab_growth_curve",
    "Heaps'-law vocabulary growth: distinct-token count as the corpus "
    "grows in ingestion order, bucketed per 100 documents — the curve "
    "that says whether a corpus is still contributing new vocabulary or "
    "has gone repetitive (flattening curve = diminishing data value, the "
    "signal behind dedup-before-train decisions). Each token's first "
    "occurrence is a groupBy(token) min — tokens shuffle once as keys — "
    "then the cumulative curve is a window over the tiny bucket "
    "histogram, never over rows.",
    oracle=_VOCAB_GROWTH_ORACLE,
    tags=("ext", "text", "stats", "corpus"),
)
def x71_vocab_growth_curve(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    tok = docs.select(
        "doc_id", F.explode(TX.words("text")).alias("token")
    )
    first_seen = tok.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    growth = (
        first_seen.select(F.expr("first_doc DIV 100").alias("doc_bucket"))
        .groupBy("doc_bucket")
        .agg(F.count("*").alias("new_types"))
    )
    cum = F.sum("new_types").over(
        Window.orderBy("doc_bucket").rowsBetween(Window.unboundedPreceding, 0)
    )
    return growth.select("doc_bucket", "new_types", cum.alias("vocab_size"))


@register(
    "x72_decontaminate_merge_anti",
    "The NON-broadcast decontamination path: same semantics as x17 "
    "(drop corpus docs whose fingerprint appears in the held-out set) "
    "but executed as a shuffle sort-merge LEFT ANTI join — the plan you "
    "need when the held-out side is itself huge (every benchmark + "
    "every eval epoch's prompts, too big to broadcast). Both sides "
    "reduce to 16-byte fingerprints before the exchange, so the shuffle "
    "moves keys, not documents; a plan guard pins SortMergeJoin with "
    "zero broadcast. x17 stays the fast path for small benchmark sets.",
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
    tags=("ext", "decontamination", "anti-join", "shuffle", "dedup"),
)
def x72_decontaminate_merge_anti(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    benchmark = (
        docs.orderBy(F.length("text").desc(), "doc_id")
        .limit(10)
        .select(F.md5("text").alias("fp"))
    )
    corpus = docs.select("doc_id", F.md5("text").alias("fp"))
    return corpus.join(benchmark.hint("merge"), on="fp", how="left_anti").select(
        "doc_id", "fp"
    )


_SYNDICATION_ORACLE = f"""
    WITH pairs AS ({_LSH_ORACLE}
    ),
    src AS (SELECT doc_id, source FROM documents)
    SELECT least(a.source, b.source) AS src_lo,
           greatest(a.source, b.source) AS src_hi,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs p
    JOIN src a ON p.doc_a = a.doc_id
    JOIN src b ON p.doc_b = b.doc_id
    GROUP BY src_lo, src_hi
"""


@register(
    "x73_cross_source_syndication_matrix",
    "Duplicate-provenance at the SOURCE level: the MinHash-LSH candidate "
    "pairs (x8) rolled up into an undirected (source, source) matrix — "
    "diagonal cells are within-source re-crawls, off-diagonal cells are "
    "cross-source syndication (mirrors, scrapers, wire copy). This is the "
    "table that decides which source to drop when two overlap heavily. "
    "Pairs are tiny relative to the corpus, so the rollup is two "
    "broadcast-friendly id->source lookups plus a |sources|^2-bounded "
    "aggregate on top of the one LSH bucket shuffle.",
    oracle=_SYNDICATION_ORACLE,
    tags=("ext", "dedup", "lsh", "audit", "provenance"),
)
def x73_cross_source_syndication_matrix(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    pairs = X.lsh_candidate_pairs(docs)
    src = docs.select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    b = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            F.least("src_a", "src_b").alias("src_lo"),
            F.greatest("src_a", "src_b").alias("src_hi"),
        )
        .groupBy("src_lo", "src_hi")
        .agg(F.count("*").alias("n_pairs"))
    )


_DAU_ORACLE = """
    WITH days AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, user_id
        FROM events WHERE ts IS NOT NULL
    ),
    dau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS dau FROM days GROUP BY day
    ),
    first_day AS (
        SELECT user_id, min(day) AS day FROM days GROUP BY user_id
    ),
    newu AS (
        SELECT day, CAST(count(*) AS BIGINT) AS new_users
        FROM first_day GROUP BY day
    )
    SELECT d.day, d.dau,
           COALESCE(n.new_users, 0) AS new_users,
           CAST(sum(COALESCE(n.new_users, 0))
                    OVER (ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_users
    FROM dau d LEFT JOIN newu n USING (day)
"""


@register(
    "x74_daily_active_users",
    "Daily active users, new users, and the cumulative distinct-user "
    "curve — the growth dashboard over the events stream. Cumulative "
    "DISTINCT is the trap here: a naive running COUNT(DISTINCT) re-scans "
    "history per day; instead each user contributes once at their FIRST "
    "active day (groupBy(user) min — one shuffle of user ids), and the "
    "cumulative curve is a running sum over the tiny per-day histogram, "
    "never over events. The same first-touch trick powers x58's cohorts.",
    oracle=_DAU_ORACLE,
    tags=("ext", "events", "stats", "window"),
)
def x74_daily_active_users(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(F.col("ts").isNotNull())
    days = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    dau = days.groupBy("day").agg(F.count("*").alias("dau"))
    first_day = days.groupBy("user_id").agg(F.min("day").alias("day"))
    newu = first_day.groupBy("day").agg(F.count("*").alias("new_users"))
    joined = dau.join(newu, "day", "left").select(
        "day", "dau", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    cum = F.sum("new_users").over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select("day", "dau", "new_users", cum.alias("cum_users"))


_CALIBRATION_ORACLE = f"""
    WITH q AS ({_QUALITY_ORACLE}),
    base AS (
        SELECT d.doc_id, d.source,
               CAST(least(floor(q.quality_score * 10), 9) AS BIGINT)
                   AS quality_bin,
               {_SQL_FP} AS fingerprint,
               len({SQL_WORDS.format(t='d.text')}) AS n_tokens
        FROM documents d JOIN q USING (doc_id)
        WHERE d.text IS NOT NULL
    ),
    keepers AS (
        SELECT fingerprint, min(doc_id) AS keep_id
        FROM base GROUP BY fingerprint
    )
    SELECT b.quality_bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN b.doc_id <> k.keep_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dups,
           CAST(sum(CASE WHEN b.doc_id <> k.keep_id THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS dup_rate,
           CAST(sum(b.n_tokens) AS BIGINT) AS total_tokens
    FROM base b JOIN keepers k USING (fingerprint)
    GROUP BY b.quality_bin
"""


@register(
    "x75_quality_dup_calibration",
    "Cross-signal calibration: exact-duplicate rate per quality-score "
    "decile bin — the audit that tells you whether the quality filter and "
    "the dedup stage are redundant (low-quality bins dominated by dups) "
    "or complementary, before spending a 100 TB pass on both. Binning is "
    "a fixed-width projection (no global sort/ntile); the dup flag "
    "reuses the fingerprint keep-min shuffle; output is <=10 rows.",
    oracle=_CALIBRATION_ORACLE,
    tags=("ext", "quality", "dedup", "audit"),
)
def x75_quality_dup_calibration(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    d = TX.add_quality_signals(docs)
    base = d.select(
        "doc_id",
        F.least(F.floor(F.col("quality_score") * 10), F.lit(9))
        .cast("long")
        .alias("quality_bin"),
        F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))).alias(
            "fingerprint"
        ),
        F.size(TX.words("text")).alias("n_tokens"),
    )
    keepers = base.groupBy("fingerprint").agg(F.min("doc_id").alias("keep_id"))
    dup = F.when(F.col("doc_id") != F.col("keep_id"), 1).otherwise(0)
    return (
        base.join(keepers, "fingerprint")
        .groupBy("quality_bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(dup).cast("long").alias("n_dups"),
            (F.sum(dup).cast("double") / F.count("*")).alias("dup_rate"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


_TVD_ORACLE = f"""
    WITH tok AS (
        SELECT source, unnest({SQL_WORDS.format(t='text')}) AS token
        FROM documents WHERE text IS NOT NULL
    ),
    stc AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS n_st
        FROM tok GROUP BY source, token
    ),
    gtc AS (
        SELECT token, CAST(sum(n_st) AS BIGINT) AS n_gt FROM stc GROUP BY token
    ),
    stot AS (
        SELECT source, CAST(sum(n_st) AS BIGINT) AS n_s,
               CAST(count(*) AS BIGINT) AS n_distinct
        FROM stc GROUP BY source
    ),
    gtot AS (SELECT CAST(sum(n_st) AS BIGINT) AS n_g FROM stc),
    terms AS (
        SELECT s.source,
               abs(CAST(s.n_st AS DECIMAL(38,0)) * g2.n_g
                   - CAST(g.n_gt AS DECIMAL(38,0)) * st.n_s) AS term,
               g.n_gt
        FROM stc s
        JOIN gtc g USING (token)
        JOIN stot st USING (source)
        CROSS JOIN gtot g2
    ),
    agg AS (
        SELECT source,
               CAST(sum(term) AS DECIMAL(38,0)) AS sum_abs,
               CAST(sum(n_gt) AS BIGINT) AS sum_gpresent
        FROM terms GROUP BY source
    )
    SELECT st.source, st.n_s AS n_tokens, st.n_distinct AS n_distinct_tokens,
           ((CAST(a.sum_abs
                  + CAST(st.n_s AS DECIMAL(38,0)) * (g.n_g - a.sum_gpresent)
              AS DOUBLE) / st.n_s) / g.n_g) / 2 AS tvd_from_corpus
    FROM stot st
    JOIN agg a USING (source)
    CROSS JOIN gtot g
"""


@register(
    "x76_source_token_divergence",
    "Domain-shift audit: EXACT total-variation distance between each "
    "source's token distribution and the whole-corpus distribution — the "
    "statistic behind 'this source is an outlier, weight it separately' "
    "mixture decisions. TVD needs no logarithm (unlike KL), so it can be "
    "computed with zero libm drift: sum |n_st*N_g - n_gt*N_s| over a "
    "common denominator keeps every term an exact DECIMAL(38,0) integer "
    "(int64 would overflow at 100 TB token counts), absent tokens fold "
    "into one algebraic correction N_s*(N_g - sum_present) instead of a "
    "vocab-sized anti-join, and only the final fixed-order double "
    "division is inexact. Two token-key shuffles (per-source counts, "
    "global counts derived from them — the corpus is tokenized once).",
    oracle=_TVD_ORACLE,
    tags=("ext", "text", "stats", "audit", "mixture"),
)
def x76_source_token_divergence(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    tok = docs.select("source", F.explode(TX.words("text")).alias("token"))
    stc = tok.groupBy("source", "token").agg(F.count("*").alias("n_st"))
    gtc = stc.groupBy("token").agg(F.sum("n_st").alias("n_gt"))
    stot = stc.groupBy("source").agg(
        F.sum("n_st").alias("n_s"), F.count("*").alias("n_distinct")
    )
    gtot = stc.agg(F.sum("n_st").alias("n_g"))
    d38 = "decimal(38,0)"
    term = F.abs(
        F.col("n_st").cast(d38) * F.col("n_g")
        - F.col("n_gt").cast(d38) * F.col("n_s")
    )
    agg = (
        stc.join(gtc, "token")
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(gtot))
        .groupBy("source")
        .agg(
            F.sum(term).cast(d38).alias("sum_abs"),
            F.sum("n_gt").cast("long").alias("sum_gpresent"),
        )
    )
    tvd = (
        (
            (
                F.col("sum_abs")
                + F.col("n_s").cast(d38) * (F.col("n_g") - F.col("sum_gpresent"))
            ).cast("double")
            / F.col("n_s")
        )
        / F.col("n_g")
    ) / 2
    return (
        stot.join(agg, "source")
        .crossJoin(F.broadcast(gtot))
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            F.col("n_distinct").alias("n_distinct_tokens"),
            tvd.alias("tvd_from_corpus"),
        )
    )


_KEEP_BEST_ORACLE = f"""
    WITH RECURSIVE pairs AS ({_LSH_ORACLE}
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    walk(node, reach) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT w.node, e.dst
        FROM walk w JOIN edges e ON w.reach = e.src
    ),
    labels AS (
        SELECT node AS doc_id, LEAST(node, MIN(reach)) AS cluster_id
        FROM walk GROUP BY node
    ),
    q AS ({_QUALITY_ORACLE}),
    assigned AS (
        SELECT d.doc_id,
               COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
               q.quality_score
        FROM documents d
        LEFT JOIN labels l USING (doc_id)
        JOIN q USING (doc_id)
        WHERE d.text IS NOT NULL
    ),
    ranked AS (
        SELECT doc_id, cluster_id, quality_score,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY quality_score DESC, doc_id) AS rn,
               CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
                   AS n_members
        FROM assigned
    )
    SELECT cluster_id, doc_id AS rep_doc_id, quality_score AS rep_quality,
           n_members
    FROM ranked WHERE rn = 1
"""


@register(
    "x77_keep_best_dedup_policy",
    "Keep-BEST near-dup policy: one representative per x18 cluster chosen "
    "by highest quality score (doc-id tie-break) instead of min id — what "
    "curation actually ships, since near-dup clusters usually contain one "
    "clean original and N mangled scrapes. Singleton docs represent "
    "themselves via a left join + coalesce (no giant default cluster). "
    "The argmax is a row_number window over the cluster partition, "
    "sharing one exchange with the member count. Complements x53 "
    "(min-id + multiplicity weights) as the quality-aware variant.",
    oracle=_KEEP_BEST_ORACLE,
    tags=("ext", "dedup", "clustering", "quality", "policy"),
)
def x77_keep_best_dedup_policy(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    clusters = X.near_dup_clusters(docs).select("doc_id", "cluster_id")
    scored = TX.add_quality_signals(docs).select("doc_id", "quality_score")
    assigned = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
        .join(scored, "doc_id")
    )
    w = Window.partitionBy("cluster_id")
    ranked = assigned.select(
        "doc_id",
        "cluster_id",
        "quality_score",
        F.row_number()
        .over(w.orderBy(F.desc("quality_score"), "doc_id"))
        .alias("rn"),
        F.count("*").over(w).alias("n_members"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("rep_doc_id"),
        F.col("quality_score").alias("rep_quality"),
        "n_members",
    )


_DUP_SPAN_REMOVAL_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, {_SQL_WS} AS ws FROM documents WHERE text IS NOT NULL
    ),
    g0 AS (
        SELECT doc_id, ws,
               unnest(CASE WHEN len(ws) >= {_DUP_NGRAM_N} THEN
                   range(1, len(ws) - {_DUP_NGRAM_N - 2})
               ELSE CAST([] AS BIGINT[]) END) AS pos
        FROM w
    ),
    g AS (
        SELECT doc_id, pos,
               md5(array_to_string(ws[pos:pos+{_DUP_NGRAM_N - 1}], ' ')) AS gh
        FROM g0
    ),
    dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
    hits AS (SELECT doc_id, pos FROM g JOIN dup USING (gh)),
    cov0 AS (
        SELECT doc_id, unnest(range(pos, pos + {_DUP_NGRAM_N})) AS widx
        FROM hits
    ),
    cov AS (
        SELECT doc_id, list(DISTINCT widx) AS cws FROM cov0 GROUP BY doc_id
    ),
    kept AS (
        SELECT w.doc_id, w.ws,
               list_filter(range(1, len(w.ws) + 1),
                   i -> NOT list_contains(
                       COALESCE(cov.cws, CAST([] AS BIGINT[])), i)) AS ki
        FROM w LEFT JOIN cov USING (doc_id)
    )
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           CAST(len(ki) AS BIGINT) AS kept_words,
           COALESCE(array_to_string(list_transform(ki, i -> ws[i]), ' '),
                    '') AS text_dedup
    FROM kept
"""


@register(
    "x78_remove_dup_spans",
    "Corpus-duplicated-span REMOVAL (the transform half of x36's report; "
    "Lee et al. 2022 substring dedup): drop every word position covered "
    "by a word 5-gram occurring >= 2 times anywhere in the corpus and "
    "re-join the survivors in original order as text_dedup. "
    "Fully-boilerplate docs come out empty (downstream drops on "
    "kept_words = 0). The repeat decision shuffles md5(gram) keys only; "
    "reconstruction is a per-row array filter over the let-bound word "
    "array, never an n-fold explosion.",
    oracle=_DUP_SPAN_REMOVAL_ORACLE,
    tags=("ext", "dedup", "substring", "lee2022", "transform"),
)
def x78_remove_dup_spans(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return X.remove_dup_spans(docs, n=_DUP_NGRAM_N)


# fixed-point sqrt weight: floor(sqrt(cnt * 2^20)) — IEEE sqrt of an exact
# integer double is correctly rounded, so floor of it is deterministic and
# identical in both engines; the weights are then INTEGERS, so their sum is
# exact and order-free (a float sum of raw sqrt values is not: different
# aggregation orders drift in the last ulp). cnt * 2^20 stays under 2^52
# for per-source counts up to ~4e9 docs.
_SQL_SQRT_W = "CAST(floor(sqrt(CAST(cnt * 1048576 AS DOUBLE))) AS BIGINT)"

_TEMPERATURE_ORACLE = f"""
    WITH c AS (
        SELECT source, CAST(count(*) AS BIGINT) AS cnt
        FROM documents GROUP BY source
    ),
    w AS (SELECT source, cnt, {_SQL_SQRT_W} AS q FROM c),
    t AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS total,
               CAST(sum(q) AS BIGINT) AS sumq
        FROM w
    ),
    r AS (
        SELECT source, cnt, q,
               least(1.0,
                     ((CAST(total AS DOUBLE) / 2) * q / sumq) / cnt)
                   AS accept_rate
        FROM w, t
    )
    SELECT d.doc_id, d.source, r.accept_rate,
           {_SQL_UNIFORM} AS u_uniform
    FROM documents d JOIN r USING (source)
    WHERE {_SQL_UNIFORM} < r.accept_rate
"""


@register(
    "x79_temperature_mixture_sample",
    "Temperature-based mixture sampling (the alpha=0.5 exponent "
    "smoothing multilingual corpora train with): per-source keep "
    "probability proportional to sqrt(count) instead of count, filling a "
    "half-corpus budget — big sources shrink sub-linearly, small sources "
    "keep most of their docs, interpolating between x49's equal-share "
    "(alpha=0) and proportional (alpha=1) mixing. Weights are fixed-point "
    "floor(sqrt(cnt*2^20)) integers so their sum is exact and order-free "
    "(IEEE sqrt is correctly rounded -> deterministic in every engine); "
    "per-doc decisions reuse the x48 md5-uniform. The rate table "
    "broadcasts; the corpus filters in place with no shuffle.",
    oracle=_TEMPERATURE_ORACLE,
    tags=("ext", "sampling", "mixture", "temperature", "deterministic"),
)
def x79_temperature_mixture_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("cnt"))
    weighted = counts.select(
        "source",
        "cnt",
        F.floor(F.sqrt((F.col("cnt") * F.lit(1048576)).cast("double")))
        .cast("long")
        .alias("q"),
    )
    totals = weighted.agg(
        F.sum("cnt").alias("total"), F.sum("q").alias("sumq")
    )
    # explicit crossJoin: a condition-less join() is an implicit cartesian
    # product that fails when spark.sql.crossJoin.enabled is pinned off
    rates = weighted.crossJoin(F.broadcast(totals)).select(
        "source",
        F.least(
            F.lit(1.0),
            (
                (F.col("total").cast("double") / F.lit(2))
                * F.col("q")
                / F.col("sumq")
            )
            / F.col("cnt"),
        ).alias("accept_rate"),
    )
    u = _uniform_col()
    return (
        docs.join(F.broadcast(rates), "source")
        .withColumn("u_uniform", u)
        .filter(F.col("u_uniform") < F.col("accept_rate"))
        .select("doc_id", "source", "accept_rate", "u_uniform")
    )


# ---------------------------------------------------------------------------
# multimodal probe + training-shard layout (driver-verifiable evidence for
# the two tiers previously pinned only by unit tests)
# ---------------------------------------------------------------------------

from ..ext import multimodal as MM  # noqa: E402  (grouped with its tier)
from ..sinks import write_training_shards  # noqa: E402


def _be32(c: F.Column) -> F.Column:
    """8-hex-char big-endian encoding of an integer column."""
    return F.lpad(F.hex(c.cast("bigint")), 8, "0")


def _le32(c: F.Column) -> F.Column:
    h = _be32(c)
    return F.concat(
        F.substring(h, 7, 2), F.substring(h, 5, 2),
        F.substring(h, 3, 2), F.substring(h, 1, 2),
    )


def _le16(c: F.Column) -> F.Column:
    h = F.lpad(F.hex(c.cast("bigint")), 4, "0")
    return F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2))


def _be16(c: F.Column) -> F.Column:
    return F.lpad(F.hex(c.cast("bigint")), 4, "0")


_MEDIA_PROBE_ORACLE = """
    WITH d AS (
        SELECT doc_id, doc_id % 5 AS m, doc_id % 29 = 0 AS no_blob
        FROM documents
    )
    SELECT doc_id AS asset_id,
           CASE WHEN m IN (0, 1, 4) THEN 'image'
                WHEN m = 2 THEN 'audio' ELSE 'video' END AS media_type,
           CASE WHEN no_blob THEN NULL
                WHEN m = 0 THEN 'png' WHEN m = 1 THEN 'gif'
                WHEN m = 2 THEN 'wav' WHEN m = 3 THEN 'mp4'
                ELSE 'jpeg' END AS detected_format,
           CAST(CASE WHEN no_blob THEN NULL
                     WHEN m = 0 THEN 1 + doc_id % 2033
                     WHEN m = 1 THEN 1 + doc_id % 499
                     WHEN m = 4 THEN 1 + doc_id % 1999 END
                AS INTEGER) AS probe_width,
           CAST(CASE WHEN no_blob THEN NULL
                     WHEN m = 0 THEN 1 + (doc_id // 7) % 1021
                     WHEN m = 1 THEN 1 + (doc_id // 3) % 307
                     WHEN m = 4 THEN 1 + (doc_id // 11) % 1499 END
                AS INTEGER) AS probe_height,
           CAST(CASE WHEN NOT no_blob AND m = 2
                     THEN 1 + doc_id % 2 END AS INTEGER) AS channels,
           CAST(CASE WHEN NOT no_blob AND m = 2
                     THEN 8000 * (1 + doc_id % 4) END AS INTEGER)
               AS sample_rate,
           CAST(CASE WHEN NOT no_blob AND m = 2 THEN 16 END AS INTEGER)
               AS bits_per_sample,
           CAST(CASE WHEN no_blob THEN NULL
                     WHEN m = 2 THEN ((1000 + doc_id % 9000) * 1000)
                          // (8000 * (1 + doc_id % 4) * (1 + doc_id % 2) * 2)
                     WHEN m = 3 THEN ((1 + doc_id % 100000) * 1000) // 600
                END AS INTEGER) AS duration_ms,
           CASE WHEN NOT no_blob AND m = 3 THEN 'isom' END AS major_brand,
           CAST(CASE WHEN no_blob THEN NULL
                     WHEN m = 0 THEN 24 WHEN m = 1 THEN 10
                     WHEN m = 2 THEN 44 WHEN m = 3 THEN 52
                     ELSE 11 END AS INTEGER) AS n_bytes
    FROM d
"""


@register(
    "x81_media_header_probe",
    "End-to-end multimodal metadata probe: deterministic PNG / GIF / "
    "RIFF-WAVE / ISO-BMFF / JPEG (SOF0 marker walk) containers are "
    "CONSTRUCTED byte-for-byte in "
    "native SQL (hex assembly + unhex, widths/rates/durations derived "
    "from doc_id), then PARSED BACK by the real dependency-free header "
    "probes (ext/multimodal.py) in one Arrow mapInPandas pass. The "
    "oracle computes the closed-form expected metadata, so a bug in "
    "either the byte layout or the parser breaks the hash — a true "
    "round-trip verification of the media-ingest validation tier. "
    "doc_id % 29 rows carry NULL blobs to pin the null path. Scale "
    "posture: pure projection + pure map, zero shuffle; real blobs ride "
    "parquet binary columns the same way.",
    oracle=_MEDIA_PROBE_ORACLE,
    tags=("ext", "multimodal", "probe", "mapInPandas"),
)
def x81_media_header_probe(spark: SparkSession, sf: str) -> DataFrame:
    d = F.col("doc_id")
    m = d % 5
    png = F.concat(
        F.lit("89504E470D0A1A0A0000000D49484452"),
        _be32(F.lit(1) + d % 2033),
        _be32(F.lit(1) + F.floor(d / 7) % 1021),
    )
    gif = F.concat(
        F.lit("474946383961"),
        _le16(F.lit(1) + d % 499),
        _le16(F.lit(1) + F.floor(d / 3) % 307),
    )
    ch = F.lit(1) + d % 2
    rate = F.lit(8000) * (F.lit(1) + d % 4)
    byte_rate = rate * ch * 2
    data_size = F.lit(1000) + d % 9000
    wav = F.concat(
        F.lit("52494646"), _le32(F.lit(36) + data_size),
        F.lit("57415645"),                       # WAVE
        F.lit("666D7420"), F.lit("10000000"),    # 'fmt ' + size 16 LE
        F.lit("0100"),                           # PCM
        _le16(ch), _le32(rate), _le32(byte_rate),
        _le16(ch * 2), _le16(F.lit(16)),         # block align, bits
        F.lit("64617461"), _le32(data_size),     # 'data' + declared size
    )
    mp4 = F.concat(
        F.lit("0000001066747970"), F.lit("69736F6D"), F.lit("00000000"),
        F.lit("000000246D6F6F76"),               # moov, size 36
        F.lit("0000001C6D766864"), F.lit("00000000"),  # mvhd v0+flags
        F.lit("0000000000000000"),               # creation + modification
        _be32(F.lit(600)),                       # timescale
        _be32(F.lit(1) + d % 100000),            # duration units
    )
    jpeg = F.concat(
        F.lit("FFD8FFC0"),                       # SOI + SOF0 marker
        F.lit("000B"), F.lit("08"),              # segment length, precision
        _be16(F.lit(1) + F.floor(d / 11) % 1499),  # height
        _be16(F.lit(1) + d % 1999),              # width
    )
    hexstr = (
        F.when(m == 0, png)
        .when(m == 1, gif)
        .when(m == 2, wav)
        .when(m == 3, mp4)
        .otherwise(jpeg)
    )
    assets = load_table(spark, sf, "documents").select(
        d.alias("asset_id"),
        F.when(m.isin(0, 1, 4), "image")
        .when(m == 2, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.when(d % 29 == 0, F.lit(None).cast("binary"))
        .otherwise(F.unhex(hexstr))
        .alias("content"),
    )
    return MM.probe_media_metadata(assets)


_SHARD_MAX_ROWS = 40
_SHARD_BUDGET = 256

_SHARD_LAYOUT_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len({SQL_WORDS.format(t='text')}) AS INT) AS n_words
        FROM documents WHERE text IS NOT NULL
    ),
    b AS (
        SELECT source,
               CAST(floor(
                   (sum(n_words) OVER (PARTITION BY source ORDER BY doc_id)
                    - n_words) / {_SHARD_BUDGET}) AS BIGINT) AS bin_id
        FROM t
    )
    SELECT source,
           CAST(ceil(count(*) / {_SHARD_MAX_ROWS}.0) AS BIGINT) AS n_shards,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(bin_id) AS min_bin,
           max(bin_id) AS max_bin
    FROM b GROUP BY source
"""


@register(
    "x82_training_shard_layout",
    "Curation output edge, verified at the FILE level: documents are "
    "packed (contiguous bins), written as source-partitioned parquet "
    f"shards capped at {_SHARD_MAX_ROWS} rows (maxRecordsPerFile), read "
    "back, and summarized per source — shard count (via the _metadata "
    "hidden column's file paths), row count, bin range. The oracle "
    "derives the same layout arithmetically (ceil(rows/cap) shards, "
    "window-recomputed bin ids), so the writer's co-location contract "
    "(one source per task -> exact shard cuts) is what's being hashed. "
    "At 100 TB maxRecordsPerFile bounds shard size independently of "
    "source skew; the one repartition(source) is the only shuffle.",
    oracle=_SHARD_LAYOUT_ORACLE,
    tags=("ext", "packing", "sink", "layout"),
)
def x82_training_shard_layout(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    docs = load_table(spark, sf, "documents")
    path = write_training_shards(
        docs,
        tempfile.mkdtemp(prefix="shards_"),
        budget=_SHARD_BUDGET,
        shard_max_rows=_SHARD_MAX_ROWS,
    )
    # explicit schema (empty corpus writes no part files to infer from)
    back = spark.read.schema(
        "doc_id BIGINT, text STRING, lang STRING, n_chars BIGINT, "
        "bin_id BIGINT, source STRING"
    ).parquet(path)
    return (
        back.select(
            "source", F.col("_metadata.file_path").alias("f"), "bin_id"
        )
        .groupBy("source")
        .agg(
            F.countDistinct("f").alias("n_shards"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min("bin_id").alias("min_bin"),
            F.max("bin_id").alias("max_bin"),
        )
    )


_KMEANS_FIXED_ORACLE = f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
        WHERE (list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)), 'max') < 1e9)
    ),
    seeds AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
               v AS c
        FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)
    ),{_km_assign('a1', 'seeds')},{_km_update('a1', 's1', 'u1', 'seeds', 'c1')},{_km_assign('a2', 'c1')},{_km_update('a2', 's2', 'u2', 'c1', 'c2')},{_km_assign('a3', 'c2')}
    SELECT vec_id, cell FROM a3
"""


@register(
    "x83_kmeans_fixed_rounds",
    "Iterative ML, hash-verified end-to-end: TWO full Lloyd k-means "
    "rounds (k=4, lowest-id seeds) with the final assignment compared "
    "against an oracle that REPLAYS the whole iteration in SQL — "
    "assignment (expanded squared-L2, lower-cell tie-break), fixed-point "
    "floor(val*1e6) integer centroid sums, empty-cell carry-over, twice "
    "unrolled. Vectors are cast to double up front so both engines do "
    "identical IEEE arithmetic; the x35 production variant adds "
    "farthest-point seeding + data-dependent convergence on the same "
    "machinery (rows-only by nature). Scale posture: literal-centroid "
    "assignment projection + one partial-aggregated (cell, pos) shuffle "
    "per round; per-round collect is k x dim rows, never data-sized.",
    oracle=_KMEANS_FIXED_ORACLE,
    tags=("ext", "similarity", "kmeans", "iterative", "ml"),
)
def x83_kmeans_fixed_rounds(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").filter(finite_vec("embedding"))
    return S.kmeans_fixed_rounds(emb, k=4, rounds=2)


# ---------------------------------------------------------------------------
# prefix-filtered similarity join, fixed-rounds PageRank, SCD-2 merge
# ---------------------------------------------------------------------------

from ..dims import scd2_initial, scd2_merge  # noqa: E402
from ..ext import graph as G  # noqa: E402

# Prefix filtering is COMPLETE for the threshold (no qualifying pair can
# be pruned), so the oracle is simply "every pair with exact Jaccard >=
# t" — algorithm-independent, brute-forced over all shingle-sharing
# pairs. A hash match therefore proves both the pruning's completeness
# and the verification's exactness.
_PREFIX_JACCARD_ORACLE = f"""
    WITH docs AS (
        SELECT doc_id, {sql_shingles('text')} AS shs
        FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest(shs) AS s FROM docs
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT doc_a, doc_b,
               CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE)
               / (len(x.shs) + len(y.shs) - len(list_intersect(x.shs, y.shs)))
                   AS jaccard
        FROM cand
        JOIN docs x ON cand.doc_a = x.doc_id
        JOIN docs y ON cand.doc_b = y.doc_id
    )
    SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.5
"""


@register(
    "x85_prefix_filtered_jaccard",
    "Exact Jaccard >= 0.5 pairs via PREFIX FILTERING (AllPairs/SSJoin): "
    "shingles get a global rarest-first order and each doc indexes only "
    "its first m - ceil(t*m) + 1 shingles — pigeonhole-complete for the "
    "threshold, so hot boilerplate shingles sort to the suffix and never "
    "generate candidates (the skew that share-any blocking must cap "
    "away). Full arrays ship only to surviving candidates for exact "
    "verification. Same output contract as x6; the oracle brute-forces "
    "all qualifying pairs, so the hash proves pruning completeness.",
    oracle=_PREFIX_JACCARD_ORACLE,
    tags=("ext", "dedup", "join", "prefix-filter"),
)
def x85_prefix_filtered_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return X.prefix_filtered_jaccard_pairs(
        load_table(spark, sf, "documents"), threshold=0.5
    )


_PR_TELEPORT = "(1000000000000 * 15 // 100) // n_nodes"


def _pr_round(prev: str, s: str, cur: str) -> str:
    """One unrolled integer-PageRank round: contributions are
    rank // out_degree summed per destination, then damped 85//100 and
    re-based on the teleport share."""
    return f"""
    {s} AS (
        SELECT e.dst, sum(r.r // r.out_deg) AS s
        FROM e JOIN {prev} r ON e.src = r.node
        GROUP BY e.dst
    ),
    {cur} AS (
        SELECT d.src AS node, d.out_deg,
               {_PR_TELEPORT} + COALESCE(s.s, 0) * 85 // 100 AS r
        FROM deg d CROSS JOIN n LEFT JOIN {s} s ON d.src = s.dst
    )"""


_PAGERANK_ORACLE = f"""
    WITH e AS (
        SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
    ),
    deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
    n AS (SELECT count(*) AS n_nodes FROM deg),
    r0 AS (
        SELECT d.src AS node, d.out_deg,
               1000000000000 // n_nodes AS r
        FROM deg d CROSS JOIN n
    ),{_pr_round('r0', 's1', 'r1')},{_pr_round('r1', 's2', 'r2')}
    SELECT node AS supplier,
           CAST(r AS BIGINT) AS rank_scaled,
           r / 1000000000000.0 AS rank
    FROM r2
"""


@register(
    "x84_supplier_pagerank",
    "Fixed-rounds PageRank (d=0.85, 2 rounds) over the supplier "
    "co-supply graph (suppliers sharing an order, both directions — so "
    "no dangling nodes). The whole iteration is 64-bit INTEGER "
    "arithmetic (fixed-point 1e12 ranks, rank div out_degree "
    "contributions, sum*85 div 100 damping), so the result is "
    "bit-identical at any parallelism and the oracle REPLAYS both "
    "rounds in SQL — the rank-propagation analogue of x83's verified "
    "Lloyd iteration. Edge build is ONE fact exchange "
    "(groupBy-collect_set + bounded double-explode; the self-join "
    "alternative shuffles the fact twice — r4 A/B in BASELINE.md). Per "
    "round: one (src) equi-join of (node, long) rank pairs + one "
    "partial-aggregated (dst) shuffle — the textbook distributed "
    "PageRank shape; adjacency never ships.",
    oracle=_PAGERANK_ORACLE,
    tags=("ext", "graph", "pagerank", "iterative"),
)
def x84_supplier_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    # one-exchange edge build (r4 A/B vs the l_orderkey self-join,
    # recorded in BASELINE.md): groupBy + collect_set shuffles the fact
    # ONCE, then the bounded per-order supplier set (~7 lines/order)
    # double-explodes into ordered pairs map-side. The self-join form
    # shuffles the fact on both sides with no ReusedExchange (verified:
    # the aliased subtrees don't canonicalize equal), so this halves
    # the data-sized exchanges — a wash at bench scale, the difference
    # that matters at 100 TB. Edge sets proven identical (907,176 at
    # sf0.1) before switching.
    # co-supply edges are symmetric by construction (a<->b both emitted),
    # so the dangling-node precondition holds structurally — skip the
    # guard's extra anti-join count on this hot bench path
    return G.pagerank_fixed_rounds(
        _cosupply_edges(li), rounds=2, check_dangling=False
    ).select(F.col("node").alias("supplier"), "rank_scaled", "rank")


_SCD2_ORACLE = """
    WITH dim AS (
        SELECT c_custkey, c_mktsegment,
               '2024-01-01' AS valid_from,
               CAST(NULL AS VARCHAR) AS valid_to,
               TRUE AS is_current
        FROM customer
    ),
    upd AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 14 = 0 THEN c_mktsegment
                    ELSE 'UPDATED' END AS c_mktsegment
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey + 10000000, 'INSERTED'
        FROM customer WHERE c_custkey % 50 = 0
    ),
    changed AS (
        SELECT u.c_custkey, u.c_mktsegment
        FROM upd u JOIN dim d USING (c_custkey)
        WHERE u.c_mktsegment IS DISTINCT FROM d.c_mktsegment
    ),
    ins AS (
        SELECT u.c_custkey, u.c_mktsegment
        FROM upd u LEFT JOIN dim d USING (c_custkey)
        WHERE d.c_custkey IS NULL
    )
    SELECT d.c_custkey, d.c_mktsegment, d.valid_from,
           CASE WHEN c.c_custkey IS NULL THEN NULL
                ELSE '2024-07-01' END AS valid_to,
           c.c_custkey IS NULL AS is_current
    FROM dim d LEFT JOIN changed c USING (c_custkey)
    UNION ALL
    SELECT c_custkey, c_mktsegment, '2024-07-01', NULL, TRUE FROM changed
    UNION ALL
    SELECT c_custkey, c_mktsegment, '2024-07-01', NULL, TRUE FROM ins
"""


@register(
    "x86_scd2_dimension_merge",
    "Slowly-changing-dimension Type-2 merge (dims.scd2_merge): an "
    "update snapshot (every 7th customer, segment rewritten — except "
    "every 14th, a deliberate NO-OP update — plus every 50th shifted "
    "to a brand-new key, exercising WHEN NOT MATCHED) closes the "
    "current version of each genuinely-changed key (valid_to = "
    "effective date) and opens a new current version; unchanged keys "
    "and no-op updates pass through untouched; never-seen keys INSERT "
    "a first current version. Change detection is null-safe; dates "
    "ride as ISO strings for engine portability. One equi-join of the "
    "update batch vs the current slice (broadcast-sized in practice), "
    "four output branches reusing it — the canonical warehouse MERGE "
    "as pure DataFrame algebra.",
    oracle=_SCD2_ORACLE,
    tags=("ext", "warehouse", "scd2", "merge"),
)
def x86_scd2_dimension_merge(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    dim = scd2_initial(
        cust, "c_custkey", ("c_mktsegment",), "2024-01-01"
    )
    updates = (
        cust.filter(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 14 == 0, F.col("c_mktsegment"))
            .otherwise(F.lit("UPDATED"))
            .alias("c_mktsegment"),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 50 == 0).select(
                (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
                F.lit("INSERTED").alias("c_mktsegment"),
            )
        )
    )
    return scd2_merge(
        dim, updates, "c_custkey", ("c_mktsegment",), "2024-07-01"
    )


_GLOBAL_IDX_ORACLE = """
    SELECT doc_id, n_chars,
           row_number() OVER (ORDER BY n_chars, doc_id) AS global_idx
    FROM documents
"""


@register(
    "x87_global_row_number",
    "Contiguous global row numbering in a total order WITHOUT the "
    "single-partition window (row_number() OVER (ORDER BY ...) with no "
    "partition key funnels the whole dataset through ONE task — the "
    "classic zipWithIndex scale trap): range-repartition on the order "
    "key, number within partitions in parallel, add per-partition "
    "offsets from a driver-side prefix sum over n_partitions counts. "
    "The oracle is the naive total-order row_number, so the hash proves "
    "the two-phase distributed numbering equals the sequential "
    "semantics. Plan guard asserts no SinglePartition exchange.",
    oracle=_GLOBAL_IDX_ORACLE,
    tags=("ext", "index", "ordering", "scale-pattern"),
)
def x87_global_row_number(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "n_chars")
    return PK.global_row_number(docs, ("n_chars", "doc_id"))


_ROUNDTRIP_ORACLE = """
    SELECT doc_id, text, lang, source, n_chars FROM documents
"""

_DOCS_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


@register(
    "x88_json_source_roundtrip",
    "JSON-lines source connector, verified end-to-end: the documents "
    "table is written as newline-delimited JSON and read back with an "
    "explicit schema (a known table is never schema-inferred — "
    "inference costs an extra full scan AND types drift on empty/skewed "
    "partitions), then hash-compared against the original rows, proving "
    "the write-escape/read-parse round trip is lossless. At 100 TB the "
    "same reader streams splittable .json.gz/.zstd shards; JSON scans "
    "cannot prune columns or push filters like parquet, which is why "
    "the engine's canonical storage stays parquet (S1) and JSON is an "
    "ingest-edge format.",
    oracle=_ROUNDTRIP_ORACLE,
    tags=("source", "json", "roundtrip"),
)
def x88_json_source_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    path = tempfile.mkdtemp(prefix="json_src_") + "/documents"
    load_table(spark, sf, "documents").write.mode("overwrite").json(path)
    return spark.read.schema(_DOCS_SCHEMA).json(path).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


@register(
    "x89_csv_source_roundtrip",
    "CSV source connector (the reference's actual ingest format — its "
    "taxi trips arrive as CSV), verified end-to-end: documents written "
    "as quoted, headered CSV and read back with an explicit schema — "
    "quoting protects embedded commas/quotes, the explicit schema "
    "avoids the inference scan and its type drift. Same lossless-round-"
    "trip hash as x88. PRECONDITION: no embedded newlines in field "
    "values — the default line-splittable reader (multiLine=false) "
    "cuts records at raw newlines even inside quotes, which is exactly "
    "what makes CSV byte-range parallelizable; data with embedded "
    "newlines must either pre-escape them or pay the non-splittable "
    "multiLine=true reader (both paths pinned by "
    "tests/test_sources.py::test_csv_embedded_newline_paths). Scale "
    "note: uncompressed CSV is splittable so reads parallelize by "
    "128 MB ranges, but no pruning/pushdown exists — ingest converts "
    "to parquet in the first pass (S7) and everything downstream scans "
    "columnar.",
    oracle=_ROUNDTRIP_ORACLE,
    tags=("source", "csv", "roundtrip"),
)
def x89_csv_source_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    path = tempfile.mkdtemp(prefix="csv_src_") + "/documents"
    (
        load_table(spark, sf, "documents")
        .write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .csv(path)
    )
    return (
        spark.read.schema(_DOCS_SCHEMA)
        .option("header", True)
        .csv(path)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


_FLUENCY_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, {SQL_WORDS.format(t='text')} AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    pairs AS (
        SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        FROM w, unnest(range(1, len(ws))) AS t(i)
    ),
    big AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
    uni AS (SELECT w1, sum(c12) AS c1 FROM big GROUP BY 1),
    tab AS (
        SELECT w1, w2, (c12 * {TX.FLUENCY_SCALE}) // c1 AS q
        FROM big JOIN uni USING (w1)
    ),
    scored AS (
        SELECT doc_id, count(*) AS n_bigrams, sum(q) AS qsum
        FROM pairs JOIN tab USING (w1, w2)
        GROUP BY doc_id
    )
    SELECT w.doc_id,
           CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(s.qsum AS DOUBLE) / ({TX.FLUENCY_SCALE}.0 * s.n_bigrams)
               AS fluency
    FROM w LEFT JOIN scored s USING (doc_id)
"""


@register(
    "x90_bigram_lm_fluency",
    "Corpus-trained bigram LM fluency score (the CCNet/DCLM LM-quality-"
    "filter family, engine-portable): each doc scored by the mean "
    "P(w2|w1) of its word bigrams under the corpus's own counts. "
    "Probabilities become fixed-point integers floor(c12*1e6/c1) "
    "BEFORE the per-doc sum — exact in any partition order (true log-"
    "perplexity needs libm log, whose last ulp differs across engines; "
    "the mean-probability form keeps the ranking hash-verifiable). One "
    "bigram explode, one (w1,w2) count shuffle + w1 rollup, one count-"
    "table join, one per-doc aggregate; docs with <2 words score NULL.",
    oracle=_FLUENCY_ORACLE,
    tags=("ext", "text", "quality", "language-model"),
)
def x90_bigram_lm_fluency(spark: SparkSession, sf: str) -> DataFrame:
    return TX.bigram_fluency(load_table(spark, sf, "documents"))


# ---------------------------------------------------------------------------
# round-4 tier: community detection, PCA direction, simhash pairing,
# equi-depth histogram, inter-arrival profile, exact stratified holdout
# ---------------------------------------------------------------------------

from ..compat import oracle_money_sum as _omoney  # noqa: E402
from ..compat import money_sum as _money  # noqa: E402
from pyspark.sql.window import Window as _W  # noqa: E402

_COSUPPLY_EDGES_SQL = """
    e AS (
        SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
    )"""


def _cosupply_edges(li: DataFrame) -> DataFrame:
    """One-exchange co-supply edge build shared by x84/x91 (see the x84
    A/B in BASELINE.md): groupBy-collect_set + bounded double-explode,
    symmetric by construction."""
    grouped = li.groupBy("l_orderkey").agg(
        F.collect_set("l_suppkey").alias("ss")
    )
    return (
        grouped.select(F.explode("ss").alias("src"), "ss")
        .select("src", F.explode("ss").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def _lp_round(prev: str, cnt: str, cur: str) -> str:
    """One synchronous label-propagation round: most frequent neighbor
    label, ties to the smaller label."""
    return f"""
    {cnt} AS (
        SELECT e.src AS node, l.lab, count(*) AS c
        FROM e JOIN {prev} l ON l.node = e.dst
        GROUP BY 1, 2
    ),
    {cur} AS (
        SELECT node, lab FROM (
            SELECT node, lab,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY c DESC, lab) AS rn
            FROM {cnt}
        ) WHERE rn = 1
    )"""


_LABEL_PROP_ORACLE = f"""
    WITH {_COSUPPLY_EDGES_SQL},
    l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e),{_lp_round('l0', 'c1', 'l1')},{_lp_round('l1', 'c2', 'l2')}
    SELECT node AS supplier, lab AS label FROM l2
"""


@register(
    "x91_label_propagation_communities",
    "Fixed-round synchronous label propagation (Raghavan et al. 2007 "
    "community detection, determinized) over the supplier co-supply "
    "graph: every node starts as its own label; each of TWO rounds "
    "every node adopts the most frequent neighbor label (ties -> "
    "smaller label), and the oracle replays both rounds in SQL — the "
    "community-structure sibling of x84's verified PageRank and x18's "
    "connected components (which answers reachability, not density). "
    "Per round: one (dst) equi-join of scalar (node, label) pairs + "
    "one partial-aggregated (node, label) count shuffle + a "
    "partial-aggregated per-node argmax (max over (c, -label) "
    "structs — no window sort; r11 rework); adjacency never ships; "
    "edge build is the x84 one-exchange form.",
    oracle=_LABEL_PROP_ORACLE,
    tags=("ext", "graph", "community", "iterative"),
)
def x91_label_propagation_communities(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    return G.label_propagation_fixed_rounds(_cosupply_edges(li), rounds=2).select(
        F.col("node").alias("supplier"), "label"
    )


_PI_DOT_V0 = (
    "list_reduce(list_transform(list_zip(v, ["
    + ", ".join("CAST('0.125' AS DOUBLE)" for _ in range(64))
    + "]), z -> z[1]*z[2]), (acc, x) -> acc + x)"
)

_PI_V1_LIST = "(SELECT list(vc ORDER BY pos) FROM v1)"

_POWER_ITER_ORACLE = f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
        WHERE (list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)), 'max') < 1e9)
    ),
    q1 AS (
        SELECT t.pos,
               sum(CAST(floor(t.val * t.d * 1000000) AS BIGINT)) AS q
        FROM (
            SELECT unnest(v) AS val, unnest(range(0, len(v))) AS pos,
                   {_PI_DOT_V0} AS d
            FROM e
        ) t
        GROUP BY t.pos
    ),
    n1 AS (SELECT sum(CAST(q AS HUGEINT) * q) AS nsq FROM q1),
    v1 AS (
        SELECT pos,
               (CAST(q AS DOUBLE) / 1000000.0)
               / (sqrt(CAST(CAST(nsq AS VARCHAR) AS DOUBLE)) / 1000000.0)
                   AS vc
        FROM q1 CROSS JOIN n1
    ),
    q2 AS (
        SELECT t.pos,
               sum(CAST(floor(t.val * t.d * 1000000) AS BIGINT)) AS q
        FROM (
            SELECT unnest(v) AS val, unnest(range(0, len(v))) AS pos,
                   list_reduce(list_transform(list_zip(v, {_PI_V1_LIST}),
                       z -> z[1]*z[2]), (acc, x) -> acc + x) AS d
            FROM e
        ) t
        GROUP BY t.pos
    ),
    n2 AS (SELECT sum(CAST(q AS HUGEINT) * q) AS nsq FROM q2)
    SELECT CAST(pos AS INT) AS pos,
           (CAST(q AS DOUBLE) / 1000000.0)
           / (sqrt(CAST(CAST(nsq AS VARCHAR) AS DOUBLE)) / 1000000.0)
               AS loading,
           sqrt(CAST(CAST(nsq AS VARCHAR) AS DOUBLE)) / 1000000.0
               AS lambda_est
    FROM q2 CROSS JOIN n2
"""


@register(
    "x92_power_iteration_top_pc",
    "Fixed-rounds power iteration for the top principal direction of "
    "the uncentered Gram operator A = sum(x xT) over the embeddings — "
    "the PCA primitive without ever materializing the d x d matrix: "
    "each round evaluates Av = sum(x (x.v)) in ONE distributed pass "
    "(v rides as literals), with floor((val*dot)*1e6) fixed-point "
    "integer component sums (order-free at any parallelism), an exact "
    "decimal sum of squared qsums for the norm, and the pinned "
    "normalization (q/1e6)/(sqrt(double(nsq))/1e6). TWO rounds from "
    "the 1/sqrt(64) start vector, every step closed-form — the oracle "
    "replays the full iteration in SQL (the x83/x84 recipe applied to "
    "spectral methods). Per round: codegen'd projection + one "
    "partial-aggregated (pos) shuffle; collects are dim rows.",
    oracle=_POWER_ITER_ORACLE,
    tags=("ext", "embedding", "pca", "iterative", "ml"),
)
def x92_power_iteration_top_pc(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").filter(finite_vec("embedding"))
    return S.power_iteration_top_component(emb, rounds=2)


_SIMHASH_PAIRS_ORACLE = f"""
    WITH s AS (
        SELECT doc_id, CAST({_SIMHASH_BITS_SQL} AS BIGINT) AS sig
        FROM documents WHERE text IS NOT NULL
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""


@register(
    "x93_simhash_hamming_pairs",
    "SimHash near-dup PAIRING (completes the x9 signature entry into a "
    "join): pairs within Hamming distance <= 3 of the 16-bit signature, "
    "found by nibble-LSH blocking — 4 bands of 4 bits; by pigeonhole a "
    "pair with <= 3 differing bits shares at least one exact band, so "
    "the band-equality self-join is COMPLETE for the threshold and the "
    "oracle can be the algorithm-independent brute force over all "
    "id-ordered pairs. The scale shape is one shuffle on (band, value) "
    "keys with popcount verification only inside blocks — never "
    "all-pairs; the frequent-band skew bound is 2^4 bands x nibble "
    "collision rate, the same regime x8's MinHash bands occupy.",
    oracle=_SIMHASH_PAIRS_ORACLE,
    tags=("ext", "dedup", "simhash", "lsh"),
)
def x93_simhash_hamming_pairs(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    return X.simhash_near_dup_pairs(docs, max_hamming=3).select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    )


_EQUIDEPTH_ORACLE = f"""
    WITH r AS (
        SELECT l_extendedprice,
               row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
                                  l_linenumber) AS rn,
               count(*) OVER () AS n
        FROM lineitem
    )
    SELECT CAST((rn - 1) * 10 // n AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(l_extendedprice) AS lo,
           max(l_extendedprice) AS hi,
           {_omoney('l_extendedprice')} AS total
    FROM r GROUP BY 1
"""


@register(
    "x94_equidepth_histogram",
    "EQUI-DEPTH histogram (10 equal-count buckets of lineitem price) — "
    "the complement of x45's fixed-width bins, and the shape query "
    "optimizers and drift monitors actually want. Bucket = "
    "(global_rank-1)*10 div N, integer-exact in both engines. The rank "
    "comes from packing.global_row_number (range-repartition + "
    "in-partition numbering + driver prefix-sum over partition counts), "
    "NOT a partition-less row_number window, so no SinglePartition "
    "funnel exists at any scale; the oracle uses the naive total-order "
    "window, proving the distributed numbering equals sequential "
    "semantics (the x87 contract, now load-bearing inside an operator).",
    oracle=_EQUIDEPTH_ORACLE,
    tags=("ext", "histogram", "quantile", "scale-pattern"),
)
def x94_equidepth_histogram(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    numbered = PK.global_row_number(
        li, ("l_extendedprice", "l_orderkey", "l_linenumber")
    )
    n = numbered.agg(F.count(F.lit(1)).alias("n"))
    return (
        numbered.crossJoin(F.broadcast(n))
        .select(
            F.expr("CAST((global_idx - 1) * 10 div n AS INT)").alias(
                "bucket"
            ),
            "l_extendedprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
            _money("l_extendedprice").alias("total"),
        )
    )


_GAP_BUCKET_SQL = """
    CASE WHEN ts < prev_ts + INTERVAL 10 SECOND THEN 'lt_10s'
         WHEN ts < prev_ts + INTERVAL 1 MINUTE THEN '10s_1m'
         WHEN ts < prev_ts + INTERVAL 10 MINUTE THEN '1m_10m'
         WHEN ts < prev_ts + INTERVAL 1 HOUR THEN '10m_1h'
         ELSE 'ge_1h' END
"""

_INTERARRIVAL_ORACLE = f"""
    WITH g AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    )
    SELECT {_GAP_BUCKET_SQL} AS gap_bucket,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM g WHERE prev_ts IS NOT NULL
    GROUP BY 1
"""


@register(
    "x95_interarrival_profile",
    "Per-user inter-arrival-time profile: consecutive event gaps "
    "(lag over the user timeline) bucketed into banded ranges with "
    "gap counts and distinct affected users — the profile that sizes "
    "streaming watermarks (x69's lateness sibling for THROUGHPUT "
    "shape) and sessionization thresholds (w2's 30-min cut, made "
    "visible). Gap banding is INTERVAL comparisons on the raw "
    "timestamps — microsecond-exact in both engines, no epoch/double "
    "conversion anywhere. One shuffle on user_id (the window), then a "
    "5-group aggregate.",
    oracle=_INTERARRIVAL_ORACLE,
    tags=("ext", "events", "profile", "streaming-adjacent"),
)
def x95_interarrival_profile(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("user_id", "ts", "event_id")
    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.withColumn("prev_ts", F.lag("ts").over(w)).filter(
        F.col("prev_ts").isNotNull()
    )
    return g.select(F.expr(_GAP_BUCKET_SQL).alias("gap_bucket"), "user_id").groupBy(
        "gap_bucket"
    ).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.countDistinct("user_id").alias("n_users"),
    )


_HOLDOUT_ORACLE = """
    WITH r AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rn,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents
    )
    SELECT doc_id, source,
           CASE WHEN rn <= (n + 9) // 10 THEN 'test'
                WHEN rn <= 2 * ((n + 9) // 10) THEN 'val'
                ELSE 'train' END AS split
    FROM r
"""


@register(
    "x96_stratified_holdout_split",
    "Three-way train/val/test split with EXACT per-stratum counts "
    "(ceil(10%) test, next ceil(10%) val, rest train, per source): "
    "docs rank by md5(doc_id) within their stratum — deterministic, "
    "reshuffle-proof, and unlike x16/x48's independent-acceptance "
    "sampling the realized split sizes are exact integers, which is "
    "what evaluation-set contracts require. Complements x52, which "
    "assigns whole CLUSTERS to splits for leakage safety but only "
    "approximates proportions; this entry is the exact-proportion tool "
    "when leakage grouping is not needed. One shuffle on source (the "
    "ranking window); the md5 rank order is the x16 hash-sampling "
    "trick, so the two samplers compose without correlation.",
    oracle=_HOLDOUT_ORACLE,
    tags=("ext", "sampling", "split", "deterministic"),
)
def x96_stratified_holdout_split(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "source")
    w = _W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    r = docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(_W.partitionBy("source")).alias("n"),
    )
    return r.select(
        "doc_id",
        "source",
        F.expr(
            "CASE WHEN rn <= (n + 9) div 10 THEN 'test' "
            "WHEN rn <= 2 * ((n + 9) div 10) THEN 'val' "
            "ELSE 'train' END"
        ).alias("split"),
    )


_TOPIC_LEXICON: tuple[tuple[str, str], ...] = tuple(
    (topic, w)
    for topic, words in (
        ("storage", ("table", "row", "column", "scan", "part")),
        ("execution", ("hash", "merge", "sort", "join", "agg")),
        ("streaming", ("stream", "window", "batch", "order")),
    )
    for w in words
)

_TOPIC_TAG_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, unnest({SQL_WORDS.format(t='text')}) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    lex(topic, word) AS (
        VALUES {", ".join(f"('{t}', '{w}')" for t, w in _TOPIC_LEXICON)}
    ),
    c AS (
        SELECT doc_id, topic, count(*) AS n_hits
        FROM toks JOIN lex ON toks.w = lex.word
        GROUP BY 1, 2
    )
    SELECT doc_id, topic, CAST(n_hits AS BIGINT) AS n_hits,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY n_hits DESC, topic) = 1
               AS is_dominant
    FROM c
"""


@register(
    "x97_topic_lexicon_tagging",
    "Multi-lexicon topic tagging: per (doc, topic) hit counts against "
    "keyword lexicons plus a dominant-topic flag (count desc, topic "
    "asc ties) — the classifier-free corpus labeling step under "
    "domain-mixture decisions. The lexicon is a broadcast TABLE (not "
    "literal arrays), so the same plan serves thousand-topic "
    "taxonomies: one token explode, a broadcast equi-join, a "
    "partial-aggregated (doc, topic) count, and a per-doc top-1 "
    "window; docs with zero hits produce no rows (sparse long form, "
    "never a doc x topic grid).",
    oracle=_TOPIC_TAG_ORACLE,
    tags=("ext", "text", "tagging", "mixture"),
)
def x97_topic_lexicon_tagging(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    lex = docs.sparkSession.createDataFrame(
        list(_TOPIC_LEXICON), "topic string, word string"
    )
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), r"\s+")).alias("w"),
    )
    counts = (
        toks.join(F.broadcast(lex), toks["w"] == lex["word"])
        .groupBy("doc_id", "topic")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    w = _W.partitionBy("doc_id").orderBy(F.desc("n_hits"), F.asc("topic"))
    return counts.select(
        "doc_id",
        "topic",
        "n_hits",
        (F.row_number().over(w) == 1).alias("is_dominant"),
    )


_CONTAINMENT_ORACLE = f"""
    WITH docs AS (
        SELECT doc_id, {sql_shingles('text')} AS shs
        FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest(shs) AS s FROM docs
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_small, b.doc_id AS doc_big
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
    )
    SELECT doc_small, doc_big, containment
    FROM (
        SELECT doc_small, doc_big,
               CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE)
                   / len(x.shs) AS containment
        FROM cand
        JOIN docs x ON cand.doc_small = x.doc_id
        JOIN docs y ON cand.doc_big = y.doc_id
    )
    WHERE containment >= 0.8
"""


@register(
    "x98_containment_pairs",
    "ASYMMETRIC dedup: ordered pairs with containment |A∩B|/|A| >= 0.8 "
    "— the excerpt/quotation/derived-copy relation symmetric Jaccard "
    "underrates (a short excerpt of a long page has J ~ 0 but C = 1). "
    "Candidates via ONE-SIDED prefix filtering: only the contained "
    "side indexes its ~(1-t)m+1 rarest shingles (pigeonhole-complete "
    "for the containment bound), probed against the full shingle "
    "postings of the containing side; verification ships arrays only "
    "to survivors, so the oracle is the algorithm-independent brute "
    "force over shingle-sharing pairs. Epsilon-nudged ceil guards the "
    "IEEE t*m boundary (lengthening-only, the safe direction).",
    oracle=_CONTAINMENT_ORACLE,
    tags=("ext", "dedup", "containment", "prefix-filter"),
)
def x98_containment_pairs(spark: SparkSession, sf: str) -> DataFrame:
    return X.containment_pairs(
        load_table(spark, sf, "documents"), threshold=0.8
    )


_SPAN_LEXICON = ("table", "row", "column", "scan", "part")

_SPAN_MERGE_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, i - 1 AS pos, ws[i] AS w
        FROM (
            SELECT doc_id, {SQL_WORDS.format(t='text')} AS ws
            FROM documents WHERE text IS NOT NULL
        ), unnest(range(1, len(ws) + 1)) AS t(i)
    ),
    hits AS (
        SELECT doc_id,
               CAST(greatest(pos - 1, 0) AS BIGINT) AS s,
               CAST(pos + 1 AS BIGINT) AS e
        FROM toks
        WHERE w IN ({", ".join(f"'{w}'" for w in _SPAN_LEXICON)})
    ),
    flagged AS (
        SELECT doc_id, s, e,
               CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        >= s - 1
                    THEN 0 ELSE 1 END AS is_new
        FROM hits
    ),
    islands AS (
        SELECT doc_id, s, e,
               sum(is_new) OVER (PARTITION BY doc_id ORDER BY s, e
                   ROWS UNBOUNDED PRECEDING) AS island
        FROM flagged
    )
    SELECT doc_id, CAST(island AS BIGINT) AS span_id,
           min(s) AS span_start, max(e) AS span_end,
           CAST(count(*) AS BIGINT) AS n_hits
    FROM islands
    GROUP BY 1, 2
"""


@register(
    "x99_token_span_merge",
    "Interval-union span merging (gaps-and-islands over SPANS, not "
    "events — w2's pattern lifted to overlapping intervals): lexicon "
    "hits expand to +-1-word context windows, and overlapping or "
    "adjacent windows merge into maximal islands per doc — the span "
    "algebra under snippet extraction, redaction-region merging, and "
    "context-window construction. The island cut uses a running MAX of "
    "prior span ends (not lag: a long span can swallow several "
    "successors, where lag(e) would wrongly re-open), all integer "
    "word positions. One shuffle on doc_id; spans per doc are "
    "window-local.",
    oracle=_SPAN_MERGE_ORACLE,
    tags=("ext", "text", "spans", "islands"),
)
def x99_token_span_merge(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), r"\s+")).alias("pos", "w"),
    )
    hits = toks.filter(F.col("w").isin(*_SPAN_LEXICON)).select(
        "doc_id",
        F.greatest(F.col("pos") - 1, F.lit(0)).cast("long").alias("s"),
        (F.col("pos") + 1).cast("long").alias("e"),
    )
    w_order = _W.partitionBy("doc_id").orderBy("s", "e")
    prior_max_e = F.max("e").over(
        w_order.rowsBetween(_W.unboundedPreceding, -1)
    )
    flagged = hits.withColumn(
        "is_new",
        F.when(prior_max_e >= F.col("s") - 1, F.lit(0)).otherwise(F.lit(1)),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("is_new").over(w_order.rowsBetween(_W.unboundedPreceding, 0)),
    )
    return islands.groupBy("doc_id", F.col("island").alias("span_id")).agg(
        F.min("s").alias("span_start"),
        F.max("e").alias("span_end"),
        F.count(F.lit(1)).alias("n_hits"),
    )


@register(
    "x100_orc_source_roundtrip",
    "ORC source connector (the other in-core columnar format — the "
    "interop target when upstream systems are Hive/Trino-centric): "
    "documents written as ORC (zstd) and read back with an explicit "
    "schema, hash-compared against the original rows — same lossless "
    "round-trip contract as x88/x89. DuckDB cannot read ORC, so the "
    "oracle is the identity SELECT over the source table: the hash "
    "equality IS the round-trip proof. Scale: ORC stripes are "
    "splittable and carry min/max indexes like parquet; the engine's "
    "canonical storage stays parquet (S1) and ORC is an edge format.",
    oracle=_ROUNDTRIP_ORACLE,
    tags=("source", "orc", "roundtrip"),
)
def x100_orc_source_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    path = tempfile.mkdtemp(prefix="orc_src_") + "/documents"
    (
        load_table(spark, sf, "documents")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .orc(path)
    )
    return spark.read.schema(_DOCS_SCHEMA).orc(path).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


_QUARANTINE_ORACLE = """
    WITH raw AS (
        SELECT doc_id,
               CASE WHEN doc_id % 13 = 0 THEN 'not-a-number'
                    ELSE CAST(n_chars AS VARCHAR) END AS n_chars_raw
        FROM documents
    )
    SELECT
        CAST(count(*) FILTER (WHERE n_chars_raw ~ '^[0-9]+$') AS BIGINT)
            AS n_clean,
        CAST(count(*) FILTER (WHERE NOT n_chars_raw ~ '^[0-9]+$') AS BIGINT)
            AS n_quarantined,
        CAST(sum(CASE WHEN n_chars_raw ~ '^[0-9]+$'
                      THEN CAST(n_chars_raw AS BIGINT) END) AS BIGINT)
            AS clean_chars_total
    FROM raw
"""


@register(
    "x101_corrupt_record_quarantine",
    "Ingest-edge quarantine: a typed load where malformed values (a "
    "planted 'not-a-number' in every 13th row's numeric field) must "
    "NOT fail the job and must NOT silently vanish — try_cast splits "
    "the batch into clean rows (typed) and a counted quarantine "
    "(ANSI mode makes a bare CAST throw on the first bad record, "
    "try_cast is the per-row PERMISSIVE form; the reference's pandas "
    "to_numeric(errors='coerce') is the same contract, "
    "data_processing.py's type coercion). One aggregation pass; at "
    "100 TB the quarantined rows would additionally sink to a "
    "dead-letter table (S7 shape) for replay.",
    oracle=_QUARANTINE_ORACLE,
    tags=("ext", "ingest", "quarantine", "try-cast"),
)
def x101_corrupt_record_quarantine(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    raw = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 13 == 0, F.lit("not-a-number"))
        .otherwise(F.col("n_chars").cast("string"))
        .alias("n_chars_raw"),
    )
    typed = raw.select(F.expr("try_cast(n_chars_raw AS BIGINT)").alias("v"))
    return typed.agg(
        F.count(F.when(F.col("v").isNotNull(), 1)).alias("n_clean"),
        F.count(F.when(F.col("v").isNull(), 1)).alias("n_quarantined"),
        F.sum("v").alias("clean_chars_total"),
    )


_TOP_PATHS_ORACLE = """
    WITH flagged AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, event_id, ts, event_type,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    ),
    seqs AS (
        SELECT user_id, session_seq,
               string_agg(event_type, '>' ORDER BY ts, event_id)
                   AS event_seq
        FROM sessions
        GROUP BY 1, 2
    )
    SELECT event_seq,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(row_number() OVER (ORDER BY count(*) DESC, event_seq)
                AS INT) AS rank
    FROM seqs
    GROUP BY event_seq
    ORDER BY rank
    LIMIT 20
"""


@register(
    "x102_top_event_paths",
    "Top-20 most frequent session PATHS (the path-analysis rollup of "
    "x51's sequence construction): full ordered event-type sequences "
    "counted across all sessions, ranked with a deterministic "
    "(count desc, path asc) total order. Funnels (x57) check ONE "
    "hypothesized order; this surfaces what orders actually happen. "
    "Scale: sequences are bounded by session length (30-min gap cut), "
    "the path-count shuffle keys on the sequence string, and the "
    "top-20 cut is TakeOrdered — no global sort materializes.",
    oracle=_TOP_PATHS_ORACLE,
    tags=("ext", "events", "paths", "sequence"),
)
def x102_top_event_paths(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    sessions = ev.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ordered_types = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
        lambda s: s.event_type,
    )
    seqs = sessions.groupBy("user_id", "session_seq").agg(
        F.concat_ws(">", ordered_types).alias("event_seq")
    )
    counted = seqs.groupBy("event_seq").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
    )
    # TakeOrderedAndProject cut FIRST (orderBy+limit never materializes
    # a global sort), then the rank window runs over only the 20
    # surviving rows — a global row_number over the full path table
    # would funnel it through one partition
    top = counted.orderBy(F.desc("n_sessions"), F.asc("event_seq")).limit(20)
    wr = Window.orderBy(F.desc("n_sessions"), F.asc("event_seq"))
    return top.withColumn("rank", F.row_number().over(wr).cast("int"))


_DRIFT_ORACLE = """
    WITH halves AS (
        SELECT event_type, event_id, value,
               CASE WHEN day(ts) <= 15 THEN 'h1' ELSE 'h2' END AS half
        FROM events
    ),
    ranked AS (
        SELECT event_type, half, value,
               row_number() OVER (PARTITION BY event_type, half
                                  ORDER BY value, event_id) AS rk,
               count(*) OVER (PARTITION BY event_type, half) AS n
        FROM halves
    ),
    q AS (
        SELECT event_type, half,
               CAST(max(n) AS BIGINT) AS n,
               max(CASE WHEN rk = greatest(CAST(ceil(0.5 * n) AS BIGINT), 1)
                        THEN value END) AS p50,
               max(CASE WHEN rk = greatest(CAST(ceil(0.95 * n) AS BIGINT), 1)
                        THEN value END) AS p95
        FROM ranked
        GROUP BY 1, 2
    )
    SELECT a.event_type,
           a.n AS n_h1, b.n AS n_h2,
           a.p50 AS p50_h1, b.p50 AS p50_h2,
           a.p95 AS p95_h1, b.p95 AS p95_h2,
           b.p50 - a.p50 AS p50_shift,
           b.p95 - a.p95 AS p95_shift
    FROM q a JOIN q b
      ON a.event_type = b.event_type AND a.half = 'h1' AND b.half = 'h2'
"""


@register(
    "x103_quantile_drift_monitor",
    "Distribution-drift monitoring: exact rank-selected p50/p95 of "
    "event value per type, computed for two time slices (month halves) "
    "and joined into per-type shift columns — the data-quality gate a "
    "training pipeline runs before trusting a new ingest window "
    "(feature drift, upstream schema rot, unit changes). Quantiles are "
    "the x61 rank-selection form (actual data points, no "
    "interpolation/libm, hash-identical anywhere); shifts are single "
    "IEEE subtractions of those points. One sort shuffle on "
    "(type, slice); the final join is over |types| rows.",
    oracle=_DRIFT_ORACLE,
    tags=("ext", "monitoring", "quantile", "drift"),
)
def x103_quantile_drift_monitor(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").select(
        "event_type",
        "event_id",
        "value",
        F.when(F.dayofmonth("ts") <= 15, F.lit("h1"))
        .otherwise(F.lit("h2"))
        .alias("half"),
    )
    w = Window.partitionBy("event_type", "half").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type", "half")
    ranked = ev.select(
        "event_type",
        "half",
        "value",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wc).alias("n"),
    )

    def at(q: float):
        target = F.greatest(F.ceil(q * F.col("n")).cast("long"), F.lit(1))
        return F.max(F.when(F.col("rk") == target, F.col("value")))

    qf = ranked.groupBy("event_type", "half").agg(
        F.max("n").alias("n"),
        at(0.5).alias("p50"),
        at(0.95).alias("p95"),
    )

    # one conditional-aggregation pass folds the two slices side by
    # side — a filter-twice-and-join formulation would embed the ranked
    # subtree twice in the plan and rescan events if exchange reuse
    # doesn't canonicalize (the x84 ReusedExchange lesson)
    def side(col: str, half: str):
        return F.max(F.when(F.col("half") == half, F.col(col)))

    # a drift row needs BOTH slices (the oracle's h1 x h2 inner join):
    # a type seen in only one half-month has nothing to diff against,
    # so it drops instead of emitting a NULL-shift row (one-row-input
    # parity, round 10; vacuous on any corpus spanning both halves)
    return (
        qf.groupBy("event_type")
        .agg(
            side("n", "h1").alias("n_h1"),
            side("n", "h2").alias("n_h2"),
            side("p50", "h1").alias("p50_h1"),
            side("p50", "h2").alias("p50_h2"),
            side("p95", "h1").alias("p95_h1"),
            side("p95", "h2").alias("p95_h2"),
            (side("p50", "h2") - side("p50", "h1")).alias("p50_shift"),
            (side("p95", "h2") - side("p95", "h1")).alias("p95_shift"),
        )
        .filter(F.col("n_h1").isNotNull() & F.col("n_h2").isNotNull())
    )


from ..ext import stats as ST  # noqa: E402  (grouped with its tier)

_MANN_KENDALL_ORACLE = """
    WITH s AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS i
        FROM events WHERE value IS NOT NULL AND isfinite(value) AND abs(value) < 1e13
    ),
    pairs AS (
        SELECT a.event_type,
               count(*) FILTER (WHERE a.value < b.value) AS conc,
               count(*) FILTER (WHERE a.value > b.value) AS disc
        FROM s a JOIN s b
          ON a.event_type = b.event_type AND a.i < b.i
        GROUP BY 1
    ),
    n_rows AS (
        SELECT event_type, count(*) AS n FROM s GROUP BY 1
    )
    SELECT n_rows.event_type,
           CAST(n AS BIGINT) AS n,
           CAST(conc AS BIGINT) AS n_concordant,
           CAST(disc AS BIGINT) AS n_discordant,
           CAST(conc - disc AS BIGINT) AS s,
           CAST(conc - disc AS BIGINT)
               / CAST(n * (n - 1) // 2 AS DOUBLE) AS tau_a
    FROM n_rows JOIN pairs USING (event_type)
"""


@register(
    "x104_mann_kendall_trend",
    "Mann-Kendall trend statistic per event type (S = sum of "
    "sign(v_j - v_i) over time-ordered pairs, tau_a normalized) — the "
    "nonparametric is-this-metric-drifting test behind monitoring "
    "alerts, and THE showcase for the grouped-map Arrow path "
    "(applyInPandas): the efficient algorithm is merge-sort pair "
    "counting, O(n log n) and inherently sequential, while the "
    "relational formulation is an O(n^2) self-join — which is exactly "
    "what the oracle brute-forces, so the hash proves the imperative "
    "kernel against quadratic truth. All counts exact integers; tau_a "
    "one IEEE division. One group-key shuffle; group size is the "
    "documented worker-memory bound (per-entity series, not "
    "whole-corpus groups).",
    oracle=_MANN_KENDALL_ORACLE,
    tags=("ext", "stats", "trend", "applyInPandas"),
)
def x104_mann_kendall_trend(spark: SparkSession, sf: str) -> DataFrame:
    # the statistic is undefined below two points (no pairs): the
    # oracle's pair self-join drops such groups, so the verified entry
    # filters the library kernel's degenerate n=1 row to match
    # (one-row-input parity, round 10; vacuous at any real volume)
    # non-finite values carry no trend information and their pairwise
    # sign is engine-dependent (numpy NaN-sign vs SQL NaN-comparison
    # conventions) — excluded like NULLs (round-11 NaN convention)
    return ST.mann_kendall_trend(
        load_table(spark, sf, "events").filter(fin("value").isNotNull())
    ).filter(F.col("n") >= 2)


_BITMAP_ROLLUP_ORACLE = """
    SELECT event_type,
           CAST(count(DISTINCT strftime(ts, '%Y-%m-%d')) AS BIGINT)
               AS n_days,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1
"""


@register(
    "x105_bitmap_distinct_rollup",
    "EXACT mergeable distinct counts via bitmaps (a9's contract "
    "extended to the non-algebraic aggregate): per (type, day, "
    "id-bucket) user bitmaps (bitmap_construct_agg over "
    "bitmap_bit_position, bucketed by bitmap_bucket_number — one "
    "bitmap spans one fixed id range, which is what keeps each bitmap "
    "bounded), OR-merged up to per-type totals whose bitmap_count is "
    "EXACT — so daily bitmap partials give exact monthly distincts "
    "without rescanning raw events, where a naive daily "
    "COUNT(DISTINCT) is NOT re-aggregable at all and HLL merges are "
    "approximate (x106). The oracle is the direct COUNT(DISTINCT); "
    "hash equality proves merge exactness. Scale: shuffle keys are "
    "(type, day, bucket); bitmap payloads are range-bounded blobs.",
    oracle=_BITMAP_ROLLUP_ORACLE,
    tags=("ext", "sketch", "bitmap", "mergeable", "rollup"),
)
def x105_bitmap_distinct_rollup(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
            "bm"
        )
    )
    merged = daily.groupBy("event_type", "bucket").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm"),
        F.countDistinct("day").alias("n_days_b"),
    )
    return merged.groupBy("event_type").agg(
        F.max("n_days_b").alias("n_days"),
        F.sum(F.expr("bitmap_count(bm)")).alias("n_users"),
    )


_HLL_MERGE_ORACLE = """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS merged_within_5pct,
           TRUE AS direct_within_5pct
    FROM events
    GROUP BY 1
"""


@register(
    "x106_hll_sketch_merge",
    "Mergeable APPROXIMATE distinct rollup (the k2 verified-sketch "
    "contract applied to Datasketches HLL): per (type, day) "
    "hll_sketch_agg partials union up to per-type estimates — the "
    "constant-memory path when x105's exact bitmaps are too wide "
    "(unbounded id domains). Sketch registers are engine-specific, so "
    "the verified surface is the EXACT count plus booleans asserting "
    "both the merged-union estimate and a direct single-pass estimate "
    "land within 5% — the driver hash covers the accuracy contract of "
    "the MERGE path, which is the property incremental rollups rely "
    "on.",
    oracle=_HLL_MERGE_ORACLE,
    tags=("ext", "sketch", "hll", "mergeable", "rollup"),
)
def x106_hll_sketch_merge(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("merged_est")
    )
    direct = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias(
            "direct_est"
        ),
    )

    def within(est: str) -> Column:
        return (
            F.abs(F.col(est) - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        )

    return (
        direct.join(merged, "event_type")
        .select(
            "event_type",
            "exact_users",
            within("merged_est").alias("merged_within_5pct"),
            within("direct_est").alias("direct_within_5pct"),
        )
    )


_TIME_TO_CONVERT_ORACLE = """
    WITH v AS (
        SELECT user_id, min(ts) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS first_purchase
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= v.first_view
        GROUP BY 1
    ),
    d AS (
        SELECT p.user_id,
               CAST(floor(epoch(p.first_purchase - v.first_view))
                    AS BIGINT) AS secs
        FROM p JOIN v ON p.user_id = v.user_id
    ),
    ranked AS (
        SELECT secs,
               row_number() OVER (ORDER BY secs, user_id) AS rk,
               count(*) OVER () AS n
        FROM d
    )
    SELECT CAST(max(n) AS BIGINT) AS n_converters,
           max(CASE WHEN rk = greatest(CAST(ceil(0.5 * n) AS BIGINT), 1)
                    THEN secs END) AS median_secs,
           max(CASE WHEN rk = greatest(CAST(ceil(0.9 * n) AS BIGINT), 1)
                    THEN secs END) AS p90_secs
    FROM ranked
"""


@register(
    "x107_time_to_convert",
    "Funnel LATENCY (the time dimension x57's stage-order funnel "
    "drops): per user, whole seconds from first view to first "
    "subsequent purchase, reduced to exact rank-selected median and "
    "p90 — the conversion-latency numbers an attribution horizon "
    "(w11/streaming_attribution_join's 30-min choice) is tuned from. "
    "Latencies are integer floor-seconds via INTERVAL DIVISION — "
    "timezone-free on ntz timestamps where unix_timestamp would "
    "reinterpret them in the session zone, and verified equal to "
    "DuckDB's floor(epoch(interval)) — and the quantiles are actual "
    "data points (x61 rank selection) over the DISTRIBUTED global "
    "rank (x87 primitive: the converter table is user-cardinality, so "
    "no partition-less window). The >= first-view guard keeps "
    "purchase-before-any-view users out.",
    oracle=_TIME_TO_CONVERT_ORACLE,
    tags=("ext", "events", "funnel", "latency"),
)
def x107_time_to_convert(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("first_purchase"),
            F.min("first_view").alias("first_view"),
        )
    )
    # interval division is timezone-free on ntz timestamps (unlike
    # unix_timestamp, which reinterprets ntz in the session zone) and
    # floors the full microsecond difference in one step — semantics
    # verified equal to DuckDB's floor(epoch(interval))
    d = p.select(
        "user_id",
        F.expr(
            "(first_purchase - first_view) div INTERVAL 1 SECOND"
        ).alias("secs"),
    )
    # global quantiles WITHOUT a partition-less window: the converter
    # table is user-cardinality (billions at 100 TB), so the rank comes
    # from the distributed two-phase numbering (x87/x94 primitive)
    numbered = PK.global_row_number(d, ("secs", "user_id"), out_col="rk")
    nf = numbered.agg(F.count(F.lit(1)).alias("n"))
    ranked = numbered.crossJoin(F.broadcast(nf))

    def at(q: float):
        target = F.greatest(F.ceil(q * F.col("n")).cast("long"), F.lit(1))
        return F.max(F.when(F.col("rk") == target, F.col("secs")))

    return ranked.agg(
        F.max("n").alias("n_converters"),
        at(0.5).alias("median_secs"),
        at(0.9).alias("p90_secs"),
    )


_SNAPSHOT_DIFF_ORACLE = f"""
    WITH snap_a AS (
        SELECT doc_id, source, md5(text) AS fp FROM documents
        WHERE doc_id % 3 <> 0 AND text IS NOT NULL
    ),
    snap_b AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 5 = 0 THEN md5(text || ' v2')
                    ELSE md5(text) END AS fp
        FROM documents
        WHERE doc_id % 3 <> 1 AND text IS NOT NULL
    ),
    diff AS (
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
               COALESCE(a.source, b.source) AS source,
               CASE WHEN a.doc_id IS NULL THEN 'added'
                    WHEN b.doc_id IS NULL THEN 'removed'
                    WHEN a.fp = b.fp THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM snap_a a FULL OUTER JOIN snap_b b ON a.doc_id = b.doc_id
    )
    SELECT source, status, CAST(count(*) AS BIGINT) AS n_docs
    FROM diff GROUP BY 1, 2
"""


@register(
    "x108_corpus_snapshot_diff",
    "Dataset-version DIFF (the audit between two corpus snapshots "
    "before a training re-run): a FULL OUTER join on doc id classifies "
    "every document added / removed / changed / unchanged — change "
    "detection compares 16-byte content fingerprints, never text, so "
    "the shuffle ships (id, fp) pairs only. The fixture derives both "
    "snapshots from the documents table (disjoint %3 slices dropped "
    "from each side, every 5th doc rewritten), making added/removed/"
    "changed all non-empty. The rolled-up (source, status) counts are "
    "the refresh report a dataset card cites; the full outer join is "
    "the one shape the j-family's inner/semi/anti tiers don't cover.",
    oracle=_SNAPSHOT_DIFF_ORACLE,
    tags=("ext", "versioning", "diff", "full-outer"),
)
def x108_corpus_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(
        F.col("text").isNotNull()
    )
    snap_a = docs.filter(F.col("doc_id") % 3 != 0).select(
        "doc_id", "source", F.md5("text").alias("fp")
    )
    snap_b = docs.filter(F.col("doc_id") % 3 != 1).select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.md5(F.concat(F.col("text"), F.lit(" v2"))),
        )
        .otherwise(F.md5("text"))
        .alias("fp"),
    )
    a, b = snap_a.alias("a"), snap_b.alias("b")
    diff = a.join(b, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer").select(
        F.coalesce(F.col("a.source"), F.col("b.source")).alias("source"),
        F.when(F.col("a.doc_id").isNull(), F.lit("added"))
        .when(F.col("b.doc_id").isNull(), F.lit("removed"))
        .when(F.col("a.fp") == F.col("b.fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )
    return diff.groupBy("source", "status").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


_ANOMALY_ORACLE = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               count(*) AS n_hours,
               sum(n) AS s1,
               sum(n * n) AS s2
        FROM hourly GROUP BY 1
    )
    SELECT h.event_type, h.h AS hour_start, h.n AS n_events,
           CAST(s1 AS DOUBLE) / n_hours AS mean_n,
           (h.n - CAST(s1 AS DOUBLE) / n_hours)
           / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_hours)
                  / (n_hours - 1))
               AS z_score
    FROM hourly h JOIN stats s ON h.event_type = s.event_type
    WHERE abs((h.n - CAST(s1 AS DOUBLE) / n_hours)
          / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_hours)
                 / (n_hours - 1))) >= 2.0
"""


@register(
    "x109_hourly_anomaly_zscores",
    "Volume-anomaly detection: per event type, hours whose event count "
    "sits >= 2 sample standard deviations from that type's hourly mean "
    "— the alert rule behind ingest-volume monitoring. Moments are "
    "EXACT integer sums (counts and squared counts never touch "
    "doubles until the closing formula), so mean/std/z replay as "
    "identical IEEE expressions in both engines — the a8 "
    "one-pass-moments recipe applied to anomaly scoring. Two "
    "aggregations (hour roll-up, then per-type moments over the tiny "
    "hourly table) + a broadcast join back.",
    oracle=_ANOMALY_ORACLE,
    tags=("ext", "monitoring", "anomaly", "zscore"),
)
def x109_hourly_anomaly_zscores(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_hours")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n_hours")
    ) / (F.col("n_hours") - 1)
    z = (F.col("n_events") - mean) / F.sqrt(var)
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "hour_start",
            "n_events",
            mean.alias("mean_n"),
            z.alias("z_score"),
        )
        .filter(F.abs(F.col("z_score")) >= 2.0)
    )


_CONTINGENCY_ORACLE = """
    WITH cell AS (
        SELECT event_type, CAST(dayofweek(ts) + 1 AS INT) AS dow,
               CAST(count(*) AS BIGINT) AS observed
        FROM events GROUP BY 1, 2
    ),
    margins AS (
        SELECT c.event_type, c.dow, c.observed,
               sum(c.observed) OVER (PARTITION BY c.event_type) AS row_tot,
               sum(c.observed) OVER (PARTITION BY c.dow) AS col_tot,
               sum(c.observed) OVER () AS grand_tot
        FROM cell c
    )
    SELECT event_type, dow, observed,
           CAST(row_tot AS DOUBLE) * col_tot / grand_tot AS expected,
           (observed - CAST(row_tot AS DOUBLE) * col_tot / grand_tot)
           / sqrt(CAST(row_tot AS DOUBLE) * col_tot / grand_tot)
               AS pearson_residual
    FROM margins
"""


@register(
    "x110_contingency_residuals",
    "Association audit between two categoricals (event type x day of "
    "week): per-cell observed counts, expected counts under "
    "independence (row_total * col_total / grand_total), and Pearson "
    "residuals — the per-cell decomposition of the chi-square test "
    "(emitting cells, not the summed statistic, keeps every value a "
    "per-row IEEE expression over exact integers — a shuffle-order "
    "double sum of contributions would not hash). The margins come "
    "from windows over the ALREADY-AGGREGATED |types x 7| cell table, "
    "so the data-sized work is one count shuffle. Spark/DuckDB "
    "dayofweek conventions reconciled as in g8.",
    oracle=_CONTINGENCY_ORACLE,
    tags=("ext", "stats", "contingency", "chi-square"),
)
def x110_contingency_residuals(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    cell = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("observed"))
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("dow")
    wg = Window.partitionBy()
    m = cell.select(
        "event_type",
        "dow",
        "observed",
        F.sum("observed").over(wr).alias("row_tot"),
        F.sum("observed").over(wc).alias("col_tot"),
        F.sum("observed").over(wg).alias("grand_tot"),
    )
    expected = (
        F.col("row_tot").cast("double") * F.col("col_tot") / F.col("grand_tot")
    )
    return m.select(
        "event_type",
        "dow",
        "observed",
        expected.alias("expected"),
        ((F.col("observed") - expected) / F.sqrt(expected)).alias(
            "pearson_residual"
        ),
    )


# Poisson(1) inverse-CDF thresholds (shared literals — both engines
# compare the same decimal constants, no libm exp() at query time)
_POISSON1_CDF: tuple[str, ...] = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
    "0.9999897508033253",
)
_BOOT_B = 16


def _poisson_w_sql(u: str) -> str:
    # e0 suffix: force DuckDB to parse each threshold as a correctly-
    # rounded DOUBLE (bare literals parse as DECIMAL — the x162 trap);
    # the comparison then matches Spark's double < double exactly even
    # for a u landing inside the decimal-vs-double ULP window
    branches = " ".join(
        f"WHEN {u} < {c}e0 THEN {k}" for k, c in enumerate(_POISSON1_CDF)
    )
    return f"CASE {branches} ELSE {len(_POISSON1_CDF)} END"


def _boot_se_exprs(mcols: list[str]) -> tuple[str, str]:
    """(mean, se) SQL over the B replicate-mean columns as explicit
    left-associative chains — deterministic, engine-identical."""
    b = len(mcols)
    mbar = f"({' + '.join(mcols)}) / {b}.0"
    dev = " + ".join(f"({c} - mbar) * ({c} - mbar)" for c in mcols)
    return mbar, f"sqrt(({dev}) / {b - 1}.0)"


# the f-string above got unwieldy — build the oracle programmatically
def _build_boot_oracle() -> str:
    u = (
        "(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' "
        "|| CAST(b AS VARCHAR)), 1, 8) AS BIGINT)) / 4294967296.0"
    )
    w = _poisson_w_sql(f"({u})")
    mcols = [f"m{i}" for i in range(_BOOT_B)]
    msel = ", ".join(
        f"CAST(sum(CASE WHEN b = {i} THEN w * n_chars END) AS DOUBLE)"
        f" / sum(CASE WHEN b = {i} THEN w END) AS m{i}"
        for i in range(_BOOT_B)
    )
    mbar, se = _boot_se_exprs(mcols)
    return f"""
    WITH reps AS (
        SELECT d.doc_id, d.n_chars, t.b, {w} AS w
        FROM documents d, unnest(range(0, {_BOOT_B})) AS t(b)
        WHERE d.text IS NOT NULL
    ),
    means AS (
        SELECT count(DISTINCT doc_id) AS n_docs, {msel} FROM reps
    )
    SELECT n_docs, mbar AS boot_mean, {se} AS boot_se
    FROM (SELECT *, {mbar} AS mbar FROM means)
    """


_BOOT_ORACLE = _build_boot_oracle()


@register(
    "x111_bootstrap_se_deterministic",
    f"DETERMINISTIC bootstrap standard error of the mean document "
    f"length: {_BOOT_B} Poisson(1)-weighted replicates (the scalable "
    "Poisson bootstrap — per-row independent weights, no resampling "
    "shuffle) whose randomness is md5(doc_id:b) uniforms inverted "
    "through LITERAL Poisson CDF thresholds, so every engine draws "
    "identical weights and the whole procedure replays — the "
    "hash-sampling recipe (x16/x48) extended to resampling inference. "
    "Replicate means use exact integer weight*value sums; the "
    "across-replicate SE folds the B mean columns in one explicit "
    "left-associative chain (no shuffle-order double sums). One "
    "explode-by-B pass + one aggregation.",
    oracle=_BOOT_ORACLE,
    tags=("ext", "stats", "bootstrap", "deterministic"),
)
def x111_bootstrap_se_deterministic(spark: SparkSession, sf: str) -> DataFrame:
    docs = (
        load_table(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "n_chars")
    )
    reps = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    ).withColumn(
        "w",
        F.expr(
            _poisson_w_sql(
                "((CAST(conv(substr(md5(CAST(doc_id AS STRING) || ':' || "
                "CAST(b AS STRING)), 1, 8), 16, 10) AS BIGINT))"
                " / 4294967296.0)"
            )
        ),
    )
    aggs = [F.countDistinct("doc_id").alias("n_docs")]
    for i in range(_BOOT_B):
        aggs.append(
            (
                F.sum(
                    F.when(F.col("b") == i, F.col("w") * F.col("n_chars"))
                ).cast("double")
                / F.sum(F.when(F.col("b") == i, F.col("w")))
            ).alias(f"m{i}")
        )
    means = reps.agg(*aggs)
    mcols = [f"m{i}" for i in range(_BOOT_B)]
    mbar_sql, se_sql = _boot_se_exprs(mcols)
    return means.withColumn("mbar", F.expr(mbar_sql)).select(
        "n_docs",
        F.col("mbar").alias("boot_mean"),
        F.expr(se_sql).alias("boot_se"),
    )


@register(
    "x112_partition_pruned_read",
    "Hive-style partition PRUNING, written and read back: events land "
    "as parquet partitioned by event_type (partitionBy — the S7 sink "
    "shape), and the read filters to ONE partition value, so the scan "
    "lists a single directory instead of the table (PartitionFilters "
    "in the plan, asserted by tests/test_plans.py). The per-hour "
    "aggregate over the surviving partition hash-matches the oracle's "
    "filtered aggregation over the raw table, proving the "
    "write-partition/read-prune cycle is lossless — including the "
    "partition column's round trip through directory names (type "
    "widening/escaping is where naive layouts corrupt; the explicit "
    "read schema pins it).",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1
    """,
    tags=("source", "partitioning", "pruning", "sink"),
)
def x112_partition_pruned_read(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    path = tempfile.mkdtemp(prefix="part_ev_") + "/events"
    (
        load_table(spark, sf, "events")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(path)
    )
    back = spark.read.schema(
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
        "value DOUBLE, props STRING, event_type STRING"
    ).parquet(path)
    return (
        back.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_URL_PARSE_ORACLE = """
    SELECT doc_id,
           source || '.example.com' AS host,
           '/corpus/' || lang || '/' || CAST(doc_id AS VARCHAR) AS path,
           lang AS lang_param
    FROM documents
"""


@register(
    "x113_url_parsing",
    "URL decomposition with parse_url (HOST / PATH / QUERY param "
    "extraction — the provenance-normalization step under per-domain "
    "dedup, robots filtering, and source attribution): synthetic "
    "crawl-style URLs are constructed from the document columns, then "
    "parse_url takes them BACK apart, and the oracle derives the "
    "expected host/path/param directly from the raw columns — so the "
    "hash proves the parser inverts the construction exactly (query-"
    "string param extraction included). parse_url is a codegen'd "
    "projection; per-domain rollups downstream shuffle the parsed "
    "host, never the full URL.",
    oracle=_URL_PARSE_ORACLE,
    tags=("ext", "url", "parsing", "provenance"),
)
def x113_url_parsing(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/corpus/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=1"),
    )
    with_url = docs.select("doc_id", url.alias("url"))
    return with_url.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias(
            "lang_param"
        ),
    )


_BOILERPLATE_ORACLE = """
    WITH doc_lines AS (
        SELECT DISTINCT doc_id, source,
               trim(unnest(string_split(text, chr(10)))) AS line
        FROM documents WHERE text IS NOT NULL
    ),
    src_docs AS (
        SELECT source, count(DISTINCT doc_id) AS n_docs
        FROM documents WHERE text IS NOT NULL GROUP BY 1
    ),
    line_df AS (
        SELECT dl.source, md5(dl.line) AS lh,
               count(DISTINCT dl.doc_id) AS df
        FROM doc_lines dl
        WHERE dl.line <> ''
        GROUP BY 1, 2
    )
    SELECT l.source,
           CAST(count(*) AS BIGINT) AS n_boilerplate_lines,
           CAST(max(l.df) AS BIGINT) AS max_df,
           CAST(s.n_docs AS BIGINT) AS n_docs
    FROM line_df l JOIN src_docs s ON l.source = s.source
    WHERE 2 * l.df > s.n_docs
    GROUP BY l.source, s.n_docs
"""


@register(
    "x114_boilerplate_line_report",
    "Frequency-based BOILERPLATE detection (the C4/CCNet header-footer "
    "strip, as a report): per source, distinct lines whose document "
    "frequency exceeds half the source's docs — navigation chrome, "
    "legal footers, cookie banners — the lines a cleaning pass would "
    "strip by df-threshold rather than x26's global first-occurrence "
    "dedup (which keeps one copy; boilerplate wants zero). Lines "
    "reduce to (source, md5) keys before the df count — text never "
    "shuffles; per-doc DISTINCT first so a line repeated within one "
    "doc counts once toward df. Integer threshold compare (2*df > n), "
    "no ratios.",
    oracle=_BOILERPLATE_ORACLE,
    tags=("ext", "text", "boilerplate", "cleaning"),
)
def x114_boilerplate_line_report(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    doc_lines = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.split("text", "\n")).alias("raw_line"),
        )
        .select("doc_id", "source", F.trim("raw_line").alias("line"))
        .filter(F.col("line") != "")
        .select("doc_id", "source", F.md5("line").alias("lh"))
        .distinct()
    )
    src_docs = docs.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    line_df = doc_lines.groupBy("source", "lh").agg(
        F.countDistinct("doc_id").alias("df")
    )
    return (
        line_df.join(F.broadcast(src_docs), "source")
        .filter(2 * F.col("df") > F.col("n_docs"))
        .groupBy("source", "n_docs")
        .agg(
            F.count(F.lit(1)).alias("n_boilerplate_lines"),
            F.max("df").alias("max_df"),
        )
        .select("source", "n_boilerplate_lines", "max_df", "n_docs")
    )


_ROBUST_SCALE_ORACLE = """
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rk,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents
    ),
    q AS (
        SELECT source,
               max(CASE WHEN rk = greatest(CAST(ceil(0.25 * n) AS BIGINT), 1)
                        THEN n_chars END) AS q1,
               max(CASE WHEN rk = greatest(CAST(ceil(0.5 * n) AS BIGINT), 1)
                        THEN n_chars END) AS med,
               max(CASE WHEN rk = greatest(CAST(ceil(0.75 * n) AS BIGINT), 1)
                        THEN n_chars END) AS q3
        FROM ranked GROUP BY 1
    )
    SELECT r.doc_id, r.source, r.n_chars,
           q.med AS source_median,
           CAST(q.q3 - q.q1 AS BIGINT) AS iqr,
           CASE WHEN q.q3 > q.q1
                THEN CAST(r.n_chars - q.med AS DOUBLE) / (q.q3 - q.q1)
           END AS robust_z
    FROM ranked r JOIN q ON r.source = q.source
"""


@register(
    "x115_robust_scaling",
    "Outlier-resistant feature scaling: per-document robust z = "
    "(x - source_median) / source_IQR — the normalization x44's "
    "min-max cannot give when a source has length outliers (one 500k-"
    "char doc flattens min-max to ~0; median/IQR ignore it). Quartiles "
    "are exact rank-selected data points (x61 machinery, integer "
    "n_chars), the IQR an integer difference, and the z one IEEE "
    "division — hash-portable with zero interpolation. Degenerate "
    "constant-spread groups (IQR 0) yield NULL rather than a "
    "divide-by-zero. One sort shuffle on source + a broadcast "
    "quartile join back.",
    oracle=_ROBUST_SCALE_ORACLE,
    tags=("ext", "normalization", "robust", "quantile"),
)
def x115_robust_scaling(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("source")
    ranked = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wc).alias("n"),
    )

    def at(q: float):
        target = F.greatest(F.ceil(q * F.col("n")).cast("long"), F.lit(1))
        return F.max(F.when(F.col("rk") == target, F.col("n_chars")))

    quart = ranked.groupBy("source").agg(
        at(0.25).alias("q1"), at(0.5).alias("med"), at(0.75).alias("q3")
    )
    return (
        ranked.join(F.broadcast(quart), "source")
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("med").alias("source_median"),
            (F.col("q3") - F.col("q1")).alias("iqr"),
            F.when(
                F.col("q3") > F.col("q1"),
                (F.col("n_chars") - F.col("med")).cast("double")
                / (F.col("q3") - F.col("q1")),
            ).alias("robust_z"),
        )
    )


_DISTMATCH_ORACLE = f"""
    WITH b AS (
        SELECT doc_id, source,
               CAST(length(bin(greatest(n_chars, 1))) - 1 AS INT)
                   AS bucket
        FROM documents
    ),
    src AS (
        SELECT source, bucket, count(*) AS n_sb FROM b GROUP BY 1, 2
    ),
    src_tot AS (SELECT source, count(*) AS n_s FROM b GROUP BY 1),
    tgt AS (SELECT bucket, count(*) AS n_b FROM b GROUP BY 1),
    tot AS (SELECT count(*) AS n FROM b),
    rates AS (
        SELECT s.source, s.bucket,
               least(1.0,
                   (CAST(t.n_b AS DOUBLE) / tot.n)
                   / (CAST(s.n_sb AS DOUBLE) / st.n_s)) AS accept_rate
        FROM src s
        JOIN src_tot st ON s.source = st.source
        JOIN tgt t ON s.bucket = t.bucket
        CROSS JOIN tot
    )
    SELECT b.doc_id, b.source, b.bucket, r.accept_rate
    FROM b JOIN rates r ON b.source = r.source AND b.bucket = r.bucket
    WHERE ({SQL_H.format(s='CAST(b.doc_id AS VARCHAR)')}) / 4294967296.0
          < r.accept_rate
"""


@register(
    "x116_distribution_matched_sample",
    "IMPORTANCE RESAMPLING to a target length distribution (the "
    "DataComp/DoReMi-style distribution-matching step x49's equal-"
    "share rebalancer can't express): every source is downsampled so "
    "its log2-length histogram matches the CORPUS-WIDE histogram — "
    "accept_rate(source, bucket) = min(1, target_share / "
    "source_share), decided per doc by the same md5-uniform as "
    "x16/x48 (composable, reshuffle-proof). Buckets are exact binary-"
    "length integers (x45, no libm); the rate table is |sources x "
    "buckets| and broadcasts; the corpus filters in place with no "
    "data shuffle. Division order pinned (share ratios, not cross-"
    "multiplied) so doubles agree across engines.",
    oracle=_DISTMATCH_ORACLE,
    tags=("ext", "sampling", "distribution-matching", "deterministic"),
)
def x116_distribution_matched_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    b = docs.select(
        "doc_id",
        "source",
        (
            F.length(
                F.conv(F.greatest("n_chars", F.lit(1)).cast("string"), 10, 2)
            )
            - 1
        )
        .cast("int")
        .alias("bucket"),
    )
    src = b.groupBy("source", "bucket").agg(F.count("*").alias("n_sb"))
    src_tot = b.groupBy("source").agg(F.count("*").alias("n_s"))
    tgt = b.groupBy("bucket").agg(F.count("*").alias("n_b"))
    tot = b.agg(F.count("*").alias("n"))
    rates = (
        src.join(src_tot, "source")
        .join(tgt, "bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "bucket",
            F.least(
                F.lit(1.0),
                (F.col("n_b").cast("double") / F.col("n"))
                / (F.col("n_sb").cast("double") / F.col("n_s")),
            ).alias("accept_rate"),
        )
    )
    u = X.base_hash(F.col("doc_id").cast("string")) / F.lit(4294967296.0)
    return (
        b.join(F.broadcast(rates), ["source", "bucket"])
        .filter(u < F.col("accept_rate"))
        .select("doc_id", "source", "bucket", "accept_rate")
    )


_DECAY_SHIFT = 31

_DECAYED_ORACLE = f"""
    WITH base AS (
        SELECT user_id,
               CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 1000000) AS BIGINT) AS v_int,
               date_diff('day', CAST(ts AS DATE), DATE '2024-02-01')
                   AS age_days
        FROM events WHERE value IS NOT NULL AND value >= 0
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(CAST(sum(CAST(v_int AS HUGEINT)
                 * (CAST(1 AS HUGEINT) << ({_DECAY_SHIFT} - age_days)))
                 AS VARCHAR) AS DOUBLE)
           / (1000000.0 * {1 << _DECAY_SHIFT}) AS decayed_value
    FROM base
    GROUP BY 1
"""


@register(
    "x117_time_decayed_user_value",
    "EXACT exponential time decay (half-life 1 day, anchor 2024-02-01): "
    "per user, sum of value * 2^-age_days — the recency-weighted "
    "engagement score under feature stores and ranking signals — "
    "computed with ZERO floating-point accumulation: values quantize "
    "to integer micro-units, decay weights are integer POWERS OF TWO "
    "(weight = 1 << (31 - age), ages bounded by the data window), and "
    "the weighted sum accumulates as an exact decimal — order-free at "
    "any parallelism, where the naive double sum of pow(2,-age) terms "
    "is partition-order-dependent. One closing division renders the "
    "score. The a8/x83 fixed-point recipe applied to decay kernels.",
    oracle=_DECAYED_ORACLE,
    tags=("ext", "decay", "feature", "fixed-point"),
)
def x117_time_decayed_user_value(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(
        F.col("value").isNotNull() & (F.col("value") >= 0)
    )
    base = ev.select(
        "user_id",
        F.floor(fin("value") * 1_000_000).cast("long").alias("v_int"),
        F.datediff(F.lit("2024-02-01").cast("date"), F.col("ts").cast("date")).alias(
            "age_days"
        ),
    )
    term = F.col("v_int").cast("decimal(38,0)") * F.expr(
        f"CAST(shiftleft(CAST(1 AS BIGINT), {_DECAY_SHIFT} - age_days) AS DECIMAL(38,0))"
    )
    return base.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(term).cast("string").cast("double")
            / F.lit(1_000_000.0 * (1 << _DECAY_SHIFT))
        ).alias("decayed_value"),
    )


_MERGESCHEMA_ORACLE = """
    SELECT doc_id, source, n_chars,
           CAST(NULL AS VARCHAR) AS batch_tag
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, source, CAST(NULL AS BIGINT) AS n_chars,
           'b2' AS batch_tag
    FROM documents WHERE doc_id % 2 = 1
"""


@register(
    "x118_mergeschema_evolution_read",
    "FILE-level schema evolution (d2's union-drift semantics at the "
    "storage layer): two parquet batches land with different schemas — "
    "batch 1 carries n_chars, batch 2 drops it and adds batch_tag — "
    "and one mergeSchema read reconciles them, absent columns NULL per "
    "batch. The oracle is the explicit NULL-padded UNION ALL, so the "
    "hash proves footer-schema merging loses nothing and invents "
    "nothing. Scale note: mergeSchema reads every footer — fine per "
    "ingest batch, wrong as a steady-state table setting; promote the "
    "reconciled schema into the catalog (the explicit-schema reads "
    "everywhere else in this repo) once evolution settles.",
    oracle=_MERGESCHEMA_ORACLE,
    tags=("source", "schema-evolution", "mergeschema"),
)
def x118_mergeschema_evolution_read(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="evo_") + "/docs"
    (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", "source", "n_chars")
        .write.mode("overwrite")
        .parquet(path)
    )
    (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "source", F.lit("b2").alias("batch_tag"))
        .write.mode("append")
        .parquet(path)
    )
    return (
        spark.read.option("mergeSchema", True)
        .parquet(path)
        .select("doc_id", "source", "n_chars", "batch_tag")
    )


_REFRESH_ORACLE = f"""
    WITH snap_a AS (
        SELECT doc_id, md5(text) AS fp FROM documents
        WHERE doc_id % 3 <> 0 AND text IS NOT NULL
    ),
    snap_b AS (
        SELECT doc_id, text, source,
               CASE WHEN doc_id % 5 = 0 THEN md5(text || ' v2')
                    ELSE md5(text) END AS fp
        FROM documents
        WHERE doc_id % 3 <> 1 AND text IS NOT NULL
    ),
    fresh AS (
        SELECT b.doc_id, b.text, b.source, b.fp
        FROM snap_b b LEFT JOIN snap_a a ON b.doc_id = a.doc_id
        WHERE a.doc_id IS NULL OR a.fp <> b.fp
    ),
    gated AS (
        SELECT doc_id, source, fp FROM fresh
        WHERE {_SQL_QSCORE} >= 0.5
    ),
    deduped AS (
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY fp
                                      ORDER BY doc_id) AS rn
            FROM gated
        ) WHERE rn = 1
    ),
    split AS (
        SELECT doc_id, source,
               CASE WHEN rn <= (n + 9) // 10 THEN 'test'
                    WHEN rn <= 2 * ((n + 9) // 10) THEN 'val'
                    ELSE 'train' END AS split
        FROM (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                       AS rn,
                   count(*) OVER (PARTITION BY source) AS n
            FROM deduped
        )
    )
    SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs
    FROM split GROUP BY 1, 2
"""


@register(
    "x119_incremental_refresh_pipeline",
    "The round-4 CAPSTONE composition — an incremental corpus REFRESH "
    "as one declarative plan: snapshot diff keeps only added/changed "
    "docs (x108's fingerprint full-outer, as a left-join-or-changed "
    "filter), the quality gate drops low scorers (x48's composite "
    "score), exact dedup keeps the min-id representative per surviving "
    "fingerprint (x5), and the exact stratified holdout (x96) assigns "
    "train/val/test — so only NEW work flows through curation while "
    "split proportions stay exact, the x27 composed-pipeline pattern "
    "extended across the incremental tier. Catalyst fuses the gate "
    "into the diff's scan; shuffles: the diff join, the fp dedup, the "
    "per-source split window.",
    oracle=_REFRESH_ORACLE,
    tags=("ext", "pipeline", "incremental", "composed"),
)
def x119_incremental_refresh_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents").filter(
        F.col("text").isNotNull()
    )
    snap_a = docs.filter(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("a_id"), F.md5("text").alias("a_fp")
    )
    snap_b = docs.filter(F.col("doc_id") % 3 != 1).select(
        "doc_id",
        "text",
        "source",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.md5(F.concat(F.col("text"), F.lit(" v2"))),
        )
        .otherwise(F.md5("text"))
        .alias("fp"),
    )
    fresh = (
        snap_b.join(snap_a, snap_b["doc_id"] == snap_a["a_id"], "left")
        .filter(F.col("a_id").isNull() | (F.col("a_fp") != F.col("fp")))
        .select("doc_id", "text", "source", "fp")
    )
    gated = TX.add_quality_signals(fresh).filter(
        F.col("quality_score") >= 0.5
    )
    w_fp = Window.partitionBy("fp").orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(w_fp))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source")
    )
    w_split = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    split = deduped.select(
        "doc_id",
        "source",
        F.row_number().over(w_split).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    ).select(
        "source",
        F.expr(
            "CASE WHEN rn <= (n + 9) div 10 THEN 'test' "
            "WHEN rn <= 2 * ((n + 9) div 10) THEN 'val' "
            "ELSE 'train' END"
        ).alias("split"),
    )
    return split.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


_LIFT_ORACLE = """
    WITH flagged AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, event_type,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    ),
    st AS (
        SELECT DISTINCT user_id, session_seq, event_type FROM sess
    ),
    n_sessions AS (
        SELECT count(DISTINCT (user_id, session_seq)) AS ns FROM st
    ),
    singles AS (
        SELECT event_type, count(*) AS n1 FROM st GROUP BY 1
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_ab
        FROM st a JOIN st b
          ON a.user_id = b.user_id AND a.session_seq = b.session_seq
         AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           CAST(p.n_ab AS BIGINT) AS n_both,
           CAST(sa.n1 AS BIGINT) AS n_a,
           CAST(sb.n1 AS BIGINT) AS n_b,
           CAST(p.n_ab AS DOUBLE) * ns.ns / (CAST(sa.n1 AS DOUBLE) * sb.n1)
               AS lift
    FROM pairs p
    JOIN singles sa ON p.type_a = sa.event_type
    JOIN singles sb ON p.type_b = sb.event_type
    CROSS JOIN n_sessions ns
"""


@register(
    "x120_event_cooccurrence_lift",
    "Association mining over sessions: LIFT for every event-type pair "
    "— P(a,b) / (P(a)P(b)) computed as the exact integer ratio "
    "(n_ab * N) / (n_a * n_b), the log-free form of PMI (libm log "
    "isn't correctly-rounded-portable; the RATIO carries the same "
    "ordering information and hashes exactly). Sessions come from the "
    "w2 30-min cut; co-occurrence is session-distinct types "
    "self-joined on the session key — the join fans out by types-per-"
    "session (bounded by |event types|), never by events. The "
    "market-basket primitive under 'users who error also churn' "
    "analyses.",
    oracle=_LIFT_ORACLE,
    tags=("ext", "association", "lift", "sessions"),
)
def x120_event_cooccurrence_lift(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    st = (
        ev.withColumn(
            "session_seq",
            F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .select("user_id", "session_seq", "event_type")
        .distinct()
        .persist()
    )
    ns = st.select("user_id", "session_seq").distinct().count()
    singles = st.groupBy("event_type").agg(F.count("*").alias("n1"))
    a, b = st.alias("a"), st.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_seq") == F.col("b.session_seq"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n1").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n1").alias("n_b")
    )
    out = (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                F.col("n_both").cast("double")
                * F.lit(ns)
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).alias("lift"),
        )
    )
    out = out.localCheckpoint(eager=True)
    st.unpersist()
    return out


# ---------------------------------------------------------------------------
# Round-4 continuation: bucketed storage joins, CDC apply, graph triangles,
# seasonality profiling
# ---------------------------------------------------------------------------


@register(
    "x121_bucketed_colocated_join",
    "Bucketed-storage co-located join: orders and lineitem are written "
    "as bucketed tables (bucketBy(8, orderkey) + sortBy, the Spark "
    "analogue of Hive bucketing), and the fact-fact join then runs as "
    "a SortMergeJoin with ZERO join-side Exchanges — both scans "
    "already satisfy the join's hashpartitioning requirement from the "
    "storage layout, so the only shuffle left in the whole query is "
    "the final small groupBy (plan-guarded by tests/test_plans.py: "
    "exactly one Exchange, on o_orderpriority, vs three for the "
    "unbucketed form). The merge hint pins the SMJ at test scale "
    "where AQE would broadcast; at 100 TB neither side broadcasts and "
    "this IS the plan. This is the storage-level answer to the "
    "repeated-join workload: pay the bucketing shuffle once at write "
    "time, then every subsequent orderkey join on either table is "
    "shuffle-free.",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(l_quantity) AS BIGINT) AS total_qty,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
    """,
    tags=("storage", "bucketing", "join", "colocated"),
)
def x121_bucketed_colocated_join(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    base = tempfile.mkdtemp(prefix="bkt_")
    spark.sql("DROP TABLE IF EXISTS x121_bkt_orders")
    spark.sql("DROP TABLE IF EXISTS x121_bkt_lineitem")
    # project to the query's columns BEFORE the bucketing shuffle+write
    # (r11 optimization, guide §2.3/§6: shuffle and write fewer bytes —
    # the bucketed intermediates exist to serve THIS declared join, and
    # carrying lineitem's 14 unused columns through the write shuffle
    # tripled its bytes for nothing; the join/agg result is unchanged
    # and the one-Exchange plan guard still holds)
    (
        load_table(spark, sf, "orders")
        .select("o_orderkey", "o_orderpriority")
        .write.format("parquet")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", base + "/orders")
        .mode("overwrite")
        .saveAsTable("x121_bkt_orders")
    )
    (
        load_table(spark, sf, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.format("parquet")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", base + "/lineitem")
        .mode("overwrite")
        .saveAsTable("x121_bkt_lineitem")
    )
    ob = spark.table("x121_bkt_orders")
    lb = spark.table("x121_bkt_lineitem")
    return (
        ob.hint("merge")
        .join(lb, ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_quantity").cast("long").alias("total_qty"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


_CDC_ORACLE = """
    WITH log AS (
        SELECT user_id, event_id, value,
               CASE WHEN event_id % 10 = 0 THEN 'D'
                    WHEN event_id % 3 = 0 THEN 'I'
                    ELSE 'U' END AS op
        FROM events
    ), latest AS (
        SELECT user_id, event_id, value, op,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM log
    )
    SELECT user_id, event_id AS last_seq, op AS last_op,
           value AS current_value
    FROM latest WHERE rn = 1 AND op <> 'D'
"""


@register(
    "x122_cdc_apply_changes",
    "CDC apply-changes (the MERGE/upsert-with-deletes snapshot "
    "reconstruction): the events table is read as a change log — a "
    "deterministic op column tags every row I/U/D and event_id is the "
    "total-order sequence number — and the current snapshot is "
    "latest-wins per key with tombstoned keys REMOVED (a key whose "
    "newest change is a delete must vanish, not linger with stale "
    "values — the half that naive last() implementations get wrong). "
    "row_number over (key ORDER BY seq DESC) = 1, then filter the "
    "tombstones: one shuffle on the key, no join against the prior "
    "snapshot needed when the log is complete. At 100 TB the same "
    "plan applies per incremental batch against a bucketed snapshot "
    "(x121's layout) — shuffle only the delta, merge bucket-local. "
    "Complements x86's SCD2 (which keeps history; this keeps state).",
    oracle=_CDC_ORACLE,
    tags=("cdc", "merge", "upsert", "tombstone"),
)
def x122_cdc_apply_changes(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf, "events")
    log = ev.select(
        "user_id",
        "event_id",
        "value",
        F.when(F.col("event_id") % 10 == 0, F.lit("D"))
        .when(F.col("event_id") % 3 == 0, F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    latest = log.withColumn("rn", F.row_number().over(w))
    return latest.filter((F.col("rn") == 1) & (F.col("op") != "D")).select(
        "user_id",
        F.col("event_id").alias("last_seq"),
        F.col("op").alias("last_op"),
        F.col("value").alias("current_value"),
    )


_TRIANGLE_ORACLE = """
    WITH pairs AS (
        SELECT DISTINCT a.l_suppkey AS sa, b.l_suppkey AS sb
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_suppkey < b.l_suppkey
    ), tri AS (
        SELECT count(*) AS n_triangles
        FROM pairs e1
        JOIN pairs e2 ON e1.sb = e2.sa
        JOIN pairs e3 ON e3.sa = e1.sa AND e3.sb = e2.sb
    ), nodes AS (
        SELECT count(DISTINCT l_suppkey) AS n_nodes FROM lineitem
    ), edges AS (
        SELECT count(*) AS n_edges FROM pairs
    )
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_edges AS BIGINT) AS n_edges,
           CAST(n_triangles AS BIGINT) AS n_triangles
    FROM nodes, edges, tri
"""


@register(
    "x123_triangle_count",
    "Distributed triangle counting over the co-supply graph (suppliers "
    "that appear in the same order share an edge): triangles are "
    "closed wedges — canonical a<b edges joined edge(a,b)+edge(b,c) "
    "into wedges, then closed against edge(a,c), so each triangle "
    "a<b<c is found exactly once with equi-joins only (no cartesian, "
    "no per-node adjacency collection). The graph-health metric under "
    "clustering-coefficient / community-density monitoring, and the "
    "classic MapReduce graph benchmark. Edge derivation is the x84 "
    "shape: per-order fanout bounded by lines-per-order, so the edge "
    "build survives 100×; at 100 TB the wedge join would additionally "
    "orient edges low-degree→high-degree (halves the wedge count on "
    "skewed graphs) — same plan, one extra degree join. The edge set "
    "is localCheckpointed once and reused by all three self-joins.",
    oracle=_TRIANGLE_ORACLE,
    tags=("graph", "triangles", "self-join"),
)
def x123_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("sa"), F.col("b.l_suppkey").alias("sb")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.sb") == F.col("e2.sa"))
        .join(
            e3,
            (F.col("e3.sa") == F.col("e1.sa"))
            & (F.col("e3.sb") == F.col("e2.sb")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = li.agg(F.countDistinct("l_suppkey").alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return nodes.crossJoin(n_edges).crossJoin(tri)


_SEASONALITY_ORACLE = """
    WITH cells AS (
        SELECT CAST(isodow(ts) - 1 AS INT) AS dow,
               CAST(extract(hour FROM ts) AS INT) AS hour,
               count(*) AS n_events
        FROM events
        GROUP BY 1, 2
    ), total AS (SELECT sum(n_events) AS n_total FROM cells)
    SELECT dow, hour,
           CAST(n_events AS BIGINT) AS n_events,
           CAST((n_events * 168 * 1000000) // n_total AS BIGINT)
               AS ppm_of_uniform
    FROM cells, total
"""


@register(
    "x124_hour_of_week_seasonality",
    "Hour-of-week seasonality index: event volume per (weekday, hour) "
    "cell against the uniform expectation — the 168-cell traffic "
    "fingerprint under load forecasting, anomaly baselines (x109's "
    "z-scores assume this profile is known), and demand-curve "
    "scheduling. The index is reported as exact parts-per-million of "
    "uniform via integer arithmetic (n_cell * 168e6 DIV total) — the "
    "x120 log-free trick, so the hash is platform-exact with no "
    "float division. Weekday is ISO (0=Monday), pinned cross-dialect "
    "as Spark weekday() ≡ DuckDB isodow-1. One partial-aggregated "
    "shuffle to 168 cells, then a broadcast of the one-row total: "
    "scale-invariant output size.",
    oracle=_SEASONALITY_ORACLE,
    tags=("ext", "seasonality", "profile", "time"),
)
def x124_hour_of_week_seasonality(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    cells = ev.groupBy(
        F.weekday("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    total = cells.agg(F.sum("n_events").alias("n_total"))
    return cells.crossJoin(F.broadcast(total)).select(
        "dow",
        "hour",
        F.col("n_events").cast("long").alias("n_events"),
        F.expr("(n_events * 168 * 1000000) DIV n_total")
        .cast("long")
        .alias("ppm_of_uniform"),
    )


_CHI2_ORACLE = """
    WITH toks0 AS (
        SELECT source,
               unnest(string_split_regex(lower(text), '\\s+')) AS term
        FROM documents
    ), toks AS (
        SELECT source, term FROM toks0 WHERE term <> ''
    ), obs AS (
        SELECT source, term, count(*) AS n_st FROM toks GROUP BY 1, 2
    ), rows_ AS (
        SELECT source, sum(n_st) AS n_s FROM obs GROUP BY 1
    ), cols_ AS (
        SELECT term, sum(n_st) AS n_t FROM obs GROUP BY 1
    ), tot AS (SELECT sum(n_st) AS n FROM obs),
    scored AS (
        SELECT o.source, o.term,
               CAST(o.n_st AS BIGINT) AS n_st,
               (CAST(o.n_st * n.n - r.n_s * c.n_t AS DOUBLE)
                * CAST(o.n_st * n.n - r.n_s * c.n_t AS DOUBLE))
               / (CAST(r.n_s AS DOUBLE) * c.n_t) AS chi2_score
        FROM obs o
        JOIN rows_ r ON o.source = r.source
        JOIN cols_ c ON o.term = c.term
        CROSS JOIN tot n
        WHERE c.n_t >= 5
    )
    SELECT source, term, n_st, chi2_score
    FROM (SELECT *, row_number() OVER (PARTITION BY source
                                       ORDER BY chi2_score DESC, term)
                 AS rn
          FROM scored)
    WHERE rn <= 5
"""


@register(
    "x125_chi2_term_selection",
    "Per-class discriminative-term selection (the feature-selection "
    "step under quality/domain classifiers): for each source, the 5 "
    "terms whose token counts deviate most from source-independence, "
    "ranked by the chi-square cell numerator (obs*N - row*col)^2 / "
    "(row*col). The deviation is computed EXACTLY in int64 (token "
    "counts are small enough that obs*N fits with headroom), then "
    "squared and divided in two mirrored IEEE double ops — same "
    "operation sequence in both dialects, so the scores hash exactly "
    "(the x120/a12 discipline: floats only in a fixed-shape closing "
    "formula over exact integers, never in accumulation order). "
    "Rare terms (corpus count < 5) are excluded identically. Plan: "
    "tokenize-explode, three partial-aggregated shuffles (cell, row, "
    "column margins), margins broadcast back onto cells, window "
    "top-5 per source — no full-text shuffle anywhere.",
    oracle=_CHI2_ORACLE,
    tags=("ext", "text", "feature-selection", "chi2"),
)
def x125_chi2_term_selection(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    obs = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("n_st"))
    rows_ = obs.groupBy("source").agg(F.sum("n_st").alias("n_s"))
    cols_ = obs.groupBy("term").agg(F.sum("n_st").alias("n_t"))
    tot = obs.agg(F.sum("n_st").alias("n"))
    dev = F.col("n_st") * F.col("n") - F.col("n_s") * F.col("n_t")
    scored = (
        obs.join(F.broadcast(rows_), "source")
        .join(cols_, "term")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n_t") >= 5)
        .select(
            "source",
            "term",
            F.col("n_st").cast("long").alias("n_st"),
            (
                (dev.cast("double") * dev.cast("double"))
                / (F.col("n_s").cast("double") * F.col("n_t"))
            ).alias("chi2_score"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("chi2_score"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


_GINI_ORACLE = """
    WITH ranked AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS i,
               count(*) OVER (PARTITION BY source) AS n,
               sum(n_chars) OVER (PARTITION BY source) AS s
        FROM documents
    ), sums AS (
        SELECT source,
               max(n) AS n, max(s) AS s,
               sum(i * n_chars) AS weighted
        FROM ranked GROUP BY source
    )
    SELECT source,
           CAST(n AS BIGINT) AS n_docs,
           CAST(s AS BIGINT) AS total_chars,
           CAST(2 * weighted - (n + 1) * s AS BIGINT) AS gini_num,
           CAST(n * s AS BIGINT) AS gini_den
    FROM sums
"""


@register(
    "x126_length_gini_by_source",
    "Corpus concentration report: the exact Gini coefficient of "
    "document lengths per source, from the rank formulation "
    "G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over ascending "
    "ranks — the inequality metric that flags a source whose token "
    "mass is concentrated in a few giant documents (sharding hazard: "
    "x82's packer degrades when G -> 1) or suspiciously uniform "
    "(synthetic/boilerplate signal). Reported as the exact integer "
    "numerator/denominator pair — no division at all, so the hash is "
    "trivially exact and downstream consumers pick their precision. "
    "Ranks are per-source windows (partition-local, no global "
    "SinglePartition — the x87 lesson), ties broken by doc_id "
    "identically in both dialects.",
    oracle=_GINI_ORACLE,
    tags=("ext", "profile", "gini", "concentration"),
)
def x126_length_gini_by_source(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf, "documents").select(
        "source", "doc_id", "n_chars"
    )
    wr = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.withColumn("i", F.row_number().over(wr))
    sums = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
        F.sum(F.col("i") * F.col("n_chars")).alias("weighted"),
    )
    return sums.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.col("s").cast("long").alias("total_chars"),
        (F.lit(2) * F.col("weighted") - (F.col("n") + 1) * F.col("s"))
        .cast("long")
        .alias("gini_num"),
        (F.col("n") * F.col("s")).cast("long").alias("gini_den"),
    )


_BALANCE_ORACLE = """
    WITH RECURSIVE d AS (
        SELECT user_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS pos,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(floor(value) AS BIGINT)
                    ELSE -CAST(floor(value) AS BIGINT) END AS delta
        FROM events
        WHERE event_type IN ('purchase', 'error') AND value IS NOT NULL
          AND isfinite(value) AND abs(value) < 1e13
    ), n AS (
        SELECT user_id, max(pos) AS n_deltas FROM d GROUP BY user_id
    ), walk AS (
        SELECT user_id, 0 AS pos, CAST(0 AS BIGINT) AS b,
               CAST(0 AS BIGINT) AS h
        FROM n
        UNION ALL
        SELECT w.user_id, w.pos + 1,
               greatest(w.b + d.delta, CAST(0 AS BIGINT)),
               w.h + CASE WHEN w.b + d.delta < 0 THEN 1 ELSE 0 END
        FROM walk w
        JOIN d ON d.user_id = w.user_id AND d.pos = w.pos + 1
    )
    SELECT w.user_id,
           CAST(n.n_deltas AS BIGINT) AS n_deltas,
           w.b AS final_balance,
           w.h AS n_clamps
    FROM walk w JOIN n ON n.user_id = w.user_id AND w.pos = n.n_deltas
"""


@register(
    "x127_clamped_running_balance",
    "Floor-clamped running balance (inventory / credit-ledger "
    "semantics: balance_t = max(0, balance_{t-1} + delta_t)) — the "
    "textbook NON-linear recurrence that plain window cumsum cannot "
    "express (the clamp makes each step depend on the clamped "
    "previous state, not the raw prefix sum). Purchases credit "
    "floor(value), errors debit it, per user in (ts, event_id) order; "
    "output is the final balance plus how often the floor engaged. "
    "Implemented ENTIRELY JVM-side: sort_array(collect_list(struct)) "
    "per key, then a single F.aggregate fold with a struct "
    "accumulator — sequential state without leaving codegen'd "
    "expressions (no applyInPandas needed when the per-key series "
    "fits an array, the same bound the Arrow path has anyway; x104 "
    "stays the template for kernels too big for one expression). "
    "One shuffle on user_id; the oracle replays the fold as a "
    "recursive-CTE step walk — NOT list_reduce, whose struct-"
    "accumulator fold miscounts in DuckDB 1.0.0 (observed: clamp "
    "counts off by 1-2 with correct balances; the j16 recursion is "
    "the trustworthy replay). Exact int64 end to end.",
    oracle=_BALANCE_ORACLE,
    tags=("ext", "stateful-fold", "ledger", "hof"),
)
def x127_clamped_running_balance(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(
        F.col("event_type").isin("purchase", "error")
        & fin("value").isNotNull()
    )
    d = ev.select(
        "user_id",
        F.struct(
            "ts",
            "event_id",
            F.when(
                F.col("event_type") == "purchase",
                F.floor("value").cast("long"),
            )
            .otherwise(-F.floor("value").cast("long"))
            .alias("delta"),
        ).alias("step"),
    )
    agg = d.groupBy("user_id").agg(
        F.sort_array(F.collect_list("step")).alias("steps")
    )
    init = F.struct(
        F.lit(0).cast("long").alias("b"), F.lit(0).cast("long").alias("h")
    )
    folded = agg.select(
        "user_id",
        F.size("steps").cast("long").alias("n_deltas"),
        F.aggregate(
            "steps",
            init,
            lambda acc, x: F.struct(
                F.greatest(acc["b"] + x["delta"], F.lit(0).cast("long"))
                .alias("b"),
                (
                    acc["h"]
                    + F.when(acc["b"] + x["delta"] < 0, 1).otherwise(0)
                )
                .cast("long")
                .alias("h"),
            ),
        ).alias("st"),
    )
    return folded.select(
        "user_id",
        "n_deltas",
        F.col("st.b").alias("final_balance"),
        F.col("st.h").alias("n_clamps"),
    )


_ATTRIBUTION_ORACLE = """
    WITH tagged AS (
        SELECT user_id, ts, event_id, event_type, value,
               CASE WHEN event_type IN ('click', 'view') THEN ts END
                   AS mkt_ts,
               CASE WHEN event_type IN ('click', 'view') THEN event_type END
                   AS mkt_type
        FROM events WHERE event_type IN ('purchase', 'click', 'view')
    ), filled AS (
        SELECT user_id, ts, event_type, value,
               last_value(mkt_ts IGNORE NULLS) OVER w AS prior_mkt_ts,
               last_value(mkt_type IGNORE NULLS) OVER w AS prior_mkt_type
        FROM tagged
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), attributed AS (
        SELECT CASE WHEN prior_mkt_ts >= ts - INTERVAL 30 MINUTE
                    THEN prior_mkt_type ELSE 'direct' END AS channel,
               value
        FROM filled WHERE event_type = 'purchase'
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           {rev} AS attributed_revenue
    FROM attributed
    GROUP BY channel
"""


from ..compat import oracle_money_sum as _oracle_money_sum  # noqa: E402

_ATTRIBUTION_ORACLE_FULL = _ATTRIBUTION_ORACLE.format(
    rev=_oracle_money_sum("value")
)


@register(
    "x128_last_touch_attribution",
    "Last-touch revenue attribution: each purchase's value is credited "
    "to the user's most recent prior marketing touch (click or view) "
    "within a 30-minute window, else to 'direct' — the marketing-"
    "analytics allocation every growth dashboard starts from. Same "
    "union-sort as-of shape as j2/j20 (one scan tags all streams, one "
    "user_id shuffle, IGNORE-NULLS forward fill; ts and type fill "
    "from the same last non-null row so the pair is consistent), then "
    "a 3-row channel rollup with order-free decimal revenue sums "
    "(compat.money_sum). The staleness cap compares raw microsecond "
    "timestamps — no gap arithmetic, so no truncation reconciliation "
    "needed. Linear in rows; 'direct' fallback keeps the output "
    "total equal to total purchase revenue (conservation check "
    "downstream dashboards rely on).",
    oracle=_ATTRIBUTION_ORACLE_FULL,
    tags=("ext", "attribution", "asof", "revenue"),
)
def x128_last_touch_attribution(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..compat import money_sum

    ev = load_table(spark, sf, "events").filter(
        F.col("event_type").isin("purchase", "click", "view")
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(
            F.col("event_type").isin("click", "view"), F.col("ts")
        ).alias("mkt_ts"),
        F.when(
            F.col("event_type").isin("click", "view"), F.col("event_type")
        ).alias("mkt_type"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = tagged.withColumn(
        "prior_mkt_ts", F.last("mkt_ts", ignorenulls=True).over(w)
    ).withColumn("prior_mkt_type", F.last("mkt_type", ignorenulls=True).over(w))
    attributed = filled.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("prior_mkt_ts")
            >= F.col("ts") - F.expr("INTERVAL 30 MINUTES"),
            F.col("prior_mkt_type"),
        )
        .otherwise(F.lit("direct"))
        .alias("channel"),
        "value",
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        money_sum("value").alias("attributed_revenue"),
    )



_CLUSTER_FP_ORACLE = """
    WITH groups AS (
        SELECT md5(array_to_string(
                   (string_split_regex(lower(text), '\\s+'))[1:5], ' '))
                   AS block_hash,
               list(doc_id ORDER BY doc_id) AS members
        FROM documents
        GROUP BY 1
    )
    SELECT block_hash,
           CAST(len(members) AS BIGINT) AS n_members,
           md5(array_to_string(members, ',')) AS member_fp
    FROM groups WHERE len(members) >= 2
"""


@register(
    "x129_cluster_canonical_fingerprint",
    "Canonical cluster identity over prefix-blocking groups (the "
    "cheap dedup blocking key: docs sharing their first 5 normalized "
    "words — the corpus's near-dup families share openings, where "
    "exact content hashes group nothing): every block with >= 2 "
    "members gets a deterministic MEMBER fingerprint — md5 of the "
    "comma-joined ascending member ids — the stable cluster id "
    "provenance systems key on across corpus versions (block_hash "
    "identifies the blocking key; member_fp identifies the SET, so "
    "any membership change flips the fingerprint and x108's snapshot "
    "diff localizes it). The "
    "ordered concat is the portability trap here: Spark "
    "array_join(sort_array(collect_list)) ≡ DuckDB "
    "array_to_string(list(... ORDER BY)) only because the order is "
    "pinned on both sides — an unordered string_agg would be "
    "partition-order-dependent and could never hash. Shuffle key is "
    "the 16-byte block hash; member lists are group-local.",
    oracle=_CLUSTER_FP_ORACLE,
    tags=("ext", "dedup", "provenance", "fingerprint"),
)
def x129_cluster_canonical_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    groups = docs.groupBy(
        F.md5(
            F.array_join(
                F.slice(F.split(F.lower("text"), r"\s+"), 1, 5), " "
            )
        ).alias("block_hash")
    ).agg(F.sort_array(F.collect_list("doc_id")).alias("members"))
    return groups.filter(F.size("members") >= 2).select(
        "block_hash",
        F.size("members").cast("long").alias("n_members"),
        F.md5(F.array_join("members", ",")).alias("member_fp"),
    )


_NEG_SAMPLE_ORACLE = """
    WITH pos AS (
        SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), bounds AS (
        SELECT max(p_partkey) AS max_part FROM part
    ), cand AS (
        SELECT p.custkey, p.partkey AS pos_partkey, j.j,
               1 + CAST('0x' || substr(md5(
                       CAST(p.custkey AS VARCHAR) || ':' ||
                       CAST(p.partkey AS VARCHAR) || ':' ||
                       CAST(j.j AS VARCHAR)), 1, 8) AS BIGINT)
                   % b.max_part AS neg_partkey
        FROM pos p
        CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) j
        CROSS JOIN bounds b
    ), verified AS (
        SELECT c.custkey, c.pos_partkey, c.j, c.neg_partkey
        FROM cand c
        LEFT JOIN pos q ON q.custkey = c.custkey
                       AND q.partkey = c.neg_partkey
        WHERE q.custkey IS NULL
    )
    SELECT custkey, pos_partkey, j AS draw, neg_partkey
    FROM verified
"""


@register(
    "x130_negative_sampling",
    "Deterministic negative sampling for contrastive training pairs: "
    "every observed (customer, part) purchase is a positive; for each, "
    "3 candidate negatives are drawn by hashing (custkey:partkey:j) "
    "onto the part-key ring (md5-uniform — the x16 determinism "
    "recipe, so resamples are stable across runs and engines with no "
    "RNG), then candidates that collide with ANY true positive of "
    "that customer are discarded by an anti join — the verification "
    "step naive samplers skip, which silently trains on false "
    "negatives. Candidate generation is a projection (fanout 3); the "
    "verification is a shuffle on (custkey, partkey) against the "
    "positives — both linear. At 100 TB the positives side would "
    "pre-bucket on custkey (x121's layout) so the anti join is "
    "co-located; popular-item-aware (frequency-weighted) draws are "
    "the documented extension, swapping the uniform ring for x94's "
    "equi-depth bucket table.",
    oracle=_NEG_SAMPLE_ORACLE,
    tags=("ext", "training", "negative-sampling", "contrastive"),
)
def x130_negative_sampling(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    pos = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .distinct()
    )
    bounds = part.agg(F.max("p_partkey").alias("max_part"))
    draws = spark.range(1, 4).select(F.col("id").cast("int").alias("j"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("custkey").cast("string"),
                    F.col("partkey").cast("string"),
                    F.col("j").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    cand = (
        pos.crossJoin(F.broadcast(draws))
        .crossJoin(F.broadcast(bounds))
        .select(
            "custkey",
            F.col("partkey").alias("pos_partkey"),
            "j",
            (F.lit(1) + h % F.col("max_part")).alias("neg_partkey"),
        )
    )
    c, q = cand.alias("c"), pos.alias("q")
    verified = c.join(
        q,
        (F.col("c.custkey") == F.col("q.custkey"))
        & (F.col("c.neg_partkey") == F.col("q.partkey")),
        "left_anti",
    )
    return verified.select(
        "custkey", "pos_partkey", F.col("j").alias("draw"), "neg_partkey"
    )


_SIMPSON_ORACLE = """
    WITH cells AS (
        SELECT source, lang, count(*) AS n_sl
        FROM documents GROUP BY 1, 2
    ), per_source AS (
        SELECT source,
               sum(n_sl) AS n,
               sum(n_sl * (n_sl - 1)) AS same_pairs
        FROM cells GROUP BY source
    )
    SELECT source,
           CAST(n AS BIGINT) AS n_docs,
           CAST(same_pairs AS BIGINT) AS simpson_num,
           CAST(n * (n - 1) AS BIGINT) AS simpson_den
    FROM per_source
"""


@register(
    "x131_simpson_diversity",
    "Language-diversity monitoring without libm: per source, the "
    "Simpson index components — P(two random docs share a language) = "
    "sum n_i(n_i-1) / N(N-1) — reported as the exact integer "
    "numerator/denominator pair (1 - ratio is the diversity). Shannon "
    "entropy is the usual metric here but needs log(), which is not "
    "correctly-rounded-portable across libms (the x120 lesson); "
    "Simpson carries the same monitoring signal — collapse toward a "
    "single language drives the ratio to 1 — with pure integer "
    "arithmetic. Two partial-aggregated shuffles over a key space of "
    "|sources| x |langs|; output is |sources| rows regardless of "
    "corpus size.",
    oracle=_SIMPSON_ORACLE,
    tags=("ext", "diversity", "monitoring", "exact"),
)
def x131_simpson_diversity(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_sl")
    )
    per_source = cells.groupBy("source").agg(
        F.sum("n_sl").alias("n"),
        F.sum(F.col("n_sl") * (F.col("n_sl") - 1)).alias("same_pairs"),
    )
    return per_source.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.col("same_pairs").cast("long").alias("simpson_num"),
        (F.col("n") * (F.col("n") - 1)).cast("long").alias("simpson_den"),
    )


_QTRANSFORM_ORACLE = """
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS r,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents
    )
    SELECT doc_id, source,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(((r - 1) * 1000000) // (n - 1) AS BIGINT) AS quantile_ppm
    FROM ranked WHERE n > 1
"""


@register(
    "x132_quantile_transform",
    "Per-source quantile transform (rank normalization): each "
    "document's length maps to its exact within-source quantile — "
    "ppm of (rank-1)/(n-1) by integer division — making length "
    "comparable ACROSS sources whose raw distributions differ wildly "
    "(the preprocessing twin of x115's robust scaling: x115 centers "
    "by median/IQR and keeps shape, this destroys shape and keeps "
    "only order — the right choice when a downstream mixer consumes "
    "per-source percentile bands, e.g. 'drop the shortest 5% of "
    "every source'). Ties break by doc_id identically in both "
    "dialects, so the map is a deterministic bijection per source; "
    "single-doc sources are excluded ((n-1) = 0). One shuffle on "
    "source; window rank is partition-local.",
    oracle=_QTRANSFORM_ORACLE,
    tags=("ext", "scaling", "quantile", "normalization"),
)
def x132_quantile_transform(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("source")
    ranked = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.filter(F.col("n") > 1).select(
        "doc_id",
        "source",
        "n_chars",
        F.expr("((r - 1) * 1000000) DIV (n - 1)")
        .cast("long")
        .alias("quantile_ppm"),
    )


_INVERTED_INDEX_ORACLE = f"""
    WITH tf AS (
        SELECT token, doc_id, count(*) AS tf
        FROM (
            SELECT doc_id, unnest({SQL_WORDS.format(t='text')}) AS token
            FROM documents WHERE text IS NOT NULL
        ) WHERE length(token) > 0
        GROUP BY token, doc_id
    )
    SELECT token,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           md5(array_to_string(list_sort(list(doc_id)), ',')) AS postings_md5
    FROM tf GROUP BY token
"""


@register(
    "x133_inverted_index",
    "Search-index construction: the full inverted index over the corpus "
    "— per term, document frequency, total term frequency, and the "
    "posting list (ascending doc ids) fingerprinted as md5 so the "
    "whole index is hash-verifiable without shipping megabyte rows. "
    "Tokens reduce to per-(term, doc) tf FIRST (partial-aggregated, so "
    "the big shuffle carries one row per distinct term-doc pair, not "
    "one per occurrence), then one term-keyed agg builds the postings. "
    "Scale posture: stopword-grade terms own million-doc postings — "
    "the classic posting skew — so the 100 TB layout blocks each "
    "posting into fixed-size runs keyed by (term, block) exactly like "
    "x82's shard layout; the md5-of-ordered-ids surface here is x129's "
    "canonical-fingerprint trick applied to IR.",
    oracle=_INVERTED_INDEX_ORACLE,
    tags=("ext", "text", "index", "search"),
)
def x133_inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    toks = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.explode(TX.words("text")).alias("token"))
        .filter(F.length("token") > 0)
    )
    tf = toks.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
        F.md5(
            F.concat_ws(",", F.sort_array(F.collect_list("doc_id")))
        ).alias("postings_md5"),
    )


_VOCAB_GROWTH_ORACLE = f"""
    WITH first_seen AS (
        SELECT token, min(doc_id) AS first_doc
        FROM (
            SELECT doc_id, unnest({SQL_WORDS.format(t='text')}) AS token
            FROM documents WHERE text IS NOT NULL
        ) WHERE length(token) > 0
        GROUP BY token
    ), per_bucket AS (
        SELECT first_doc // 50 AS bucket, count(*) AS n_new
        FROM first_seen GROUP BY 1
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(n_new AS BIGINT) AS n_new_tokens,
           CAST(sum(n_new) OVER (ORDER BY bucket) AS BIGINT) AS cum_vocab
    FROM per_bucket
"""


@register(
    "x134_vocab_growth",
    "Heaps'-law vocabulary growth curve: scanning the corpus in doc-id "
    "order, how many NEVER-SEEN-BEFORE tokens each 50-document bucket "
    "contributes, plus the cumulative vocabulary size — the saturation "
    "curve that answers 'is more of this source still adding new "
    "language?' for crawl-budget decisions. Running count-distinct is "
    "inexpressible as a window, so it reformulates exactly: a token's "
    "first occurrence is min(doc_id) (one vocabulary-keyed agg over "
    "partial-aggregated per-doc distincts), bucketed by integer "
    "division, and the cumulative sum runs over ONLY |buckets| rows — "
    "the single-partition window touches ~N/50 pre-aggregated rows, "
    "never the corpus.",
    oracle=_VOCAB_GROWTH_ORACLE,
    tags=("ext", "text", "stats", "scaling-laws"),
)
def x134_vocab_growth(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf, "documents")
    toks = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.explode(TX.words("text")).alias("token"))
        .filter(F.length("token") > 0)
        .distinct()
    )
    first_seen = toks.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    per_bucket = (
        first_seen.select(F.expr("first_doc DIV 50").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return per_bucket.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n_new").cast("long").alias("n_new_tokens"),
        F.sum("n_new").over(w).cast("long").alias("cum_vocab"),
    )


_K_ANON_ORACLE = """
    SELECT event_type,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
           CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END / 50.0) AS BIGINT) AS value_band,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events,
           count(DISTINCT user_id) < 5 AS at_risk
    FROM events
    GROUP BY 1, 2, 3
"""


@register(
    "x135_k_anonymity_audit",
    "Privacy audit before releasing an analytics extract: treat "
    "(event_type, day, value band) as the quasi-identifier cell and "
    "flag every cell whose DISTINCT-user count is below k=5 — the "
    "k-anonymity criterion; a cell with few users re-identifies them "
    "by combination even with ids dropped. One grouped "
    "distinct-count over the quasi-identifier key (partial-aggregated "
    "per-user first by Spark's distinct rewrite); output is |cells| "
    "rows, bounded by types x days x bands regardless of event "
    "volume. Dates travel as ISO strings (the e17 lesson: DATE "
    "objects never repr-hash across engines); NULL values band to "
    "NULL and group together in both dialects.",
    oracle=_K_ANON_ORACLE,
    tags=("ext", "privacy", "audit", "k-anonymity"),
)
def x135_k_anonymity_audit(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    cells = ev.groupBy(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("event_date"),
        F.floor(fin("value") / 50.0).cast("long").alias("value_band"),
    ).agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return cells.select(
        "event_type",
        "event_date",
        "value_band",
        "n_users",
        "n_events",
        (F.col("n_users") < 5).alias("at_risk"),
    )


_SQ8_ORACLE = """
    WITH scaled AS (
        SELECT vec_id,
               list_max(list_transform(embedding,
                                       x -> abs(CAST(x AS DOUBLE)))) AS scale,
               embedding
        FROM embeddings
        WHERE (list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)), 'max') < 1e9)
    ), coded AS (
        SELECT vec_id, scale,
               list_transform(embedding,
                   x -> coalesce(CAST(floor(
                            (CAST(x AS DOUBLE) * 127.0) / nullif(scale, 0.0)
                            + 0.5) AS INT), 0)) AS codes,
               embedding
        FROM scaled
    )
    SELECT vec_id, scale,
           md5(array_to_string(codes, ',')) AS codes_md5,
           list_max(list_transform(list_zip(embedding, codes),
               z -> abs(CAST(z[1] AS DOUBLE)
                        - (CAST(z[2] AS DOUBLE) * scale) / 127.0)))
               AS max_abs_err
    FROM coded
"""


@register(
    "x136_int8_scalar_quantization",
    "Scalar (SQ8) embedding compression — the 4x-smaller vector store "
    "FAISS calls SQ8 and the standard complement of x38's product "
    "quantization (PQ shares codebooks across vectors; SQ8 keeps one "
    "max-abs scale PER vector and rounds each component to int8): "
    "code = floor(x*127/scale + 0.5), reported with the per-vector "
    "scale, an md5 over the code array, and the exact max "
    "reconstruction error (bounded by scale/254 up to float "
    "representation). Every arithmetic step is a fixed shape of IEEE "
    "ops on exactly-converted float32 inputs, so codes and errors are "
    "bit-identical across engines; zero vectors code to all-zeros via "
    "the nullif guard. Pure projection — no shuffle at any corpus "
    "size; the compressed store cuts ANN scan bandwidth 4x, which at "
    "100 TB of vectors is the difference between memory- and "
    "disk-resident search.",
    oracle=_SQ8_ORACLE,
    tags=("ext", "embedding", "quantization", "compression"),
)
def x136_int8_scalar_quantization(spark: SparkSession, sf: str) -> DataFrame:
    # NULL vectors carry nothing to encode — excluded from the code
    # store on both sides (engine-wide vector-NULL convention, round 11)
    emb = load_table(spark, sf, "embeddings").filter(finite_vec("embedding"))
    xd = lambda x: x.cast("double")  # noqa: E731
    scaled = emb.select(
        "vec_id",
        "embedding",
        F.array_max(
            F.transform("embedding", lambda x: F.abs(xd(x)))
        ).alias("scale"),
    )
    code = lambda x: F.coalesce(  # noqa: E731
        F.floor(
            (xd(x) * F.lit(127.0)) / F.nullif(F.col("scale"), F.lit(0.0))
            + F.lit(0.5)
        ).cast("int"),
        F.lit(0),
    )
    coded = scaled.select(
        "vec_id",
        "scale",
        "embedding",
        F.transform("embedding", code).alias("codes"),
    )
    return coded.select(
        "vec_id",
        "scale",
        F.md5(F.concat_ws(",", F.col("codes"))).alias("codes_md5"),
        F.array_max(
            F.zip_with(
                "embedding",
                "codes",
                lambda x, c: F.abs(xd(x) - (xd(c) * F.col("scale")) / F.lit(127.0)),
            )
        ).alias("max_abs_err"),
    )


# ---------------------------------------------------------------------------
# x137: count-min sketch — the mergeable heavy-hitter counter
# ---------------------------------------------------------------------------

CMS_WIDTH = 64
CMS_COEFFS = ((536870909, 7), (479001599, 13), (268435399, 29), (100000007, 71))

_CMS_CELLS_SQL = "\n        UNION ALL ".join(
    f"SELECT {j} AS r, ((h * {a} + {b}) % {X.MINHASH_PRIME}) % {CMS_WIDTH} "
    f"AS bkt, count(*) AS cell_cnt FROM tok GROUP BY 2"
    for j, (a, b) in enumerate(CMS_COEFFS)
)
_CMS_PROBES_SQL = "\n        UNION ALL ".join(
    f"SELECT word, exact_cnt, {j} AS r, "
    f"((({SQL_H.format(s='word')}) * {a} + {b}) % {X.MINHASH_PRIME}) "
    f"% {CMS_WIDTH} AS bkt FROM top"
    for j, (a, b) in enumerate(CMS_COEFFS)
)
_CMS_ORACLE = f"""
    WITH tok AS (
        SELECT word, {SQL_H.format(s='word')} AS h FROM (
            SELECT unnest({SQL_WORDS.format(t='text')}) AS word
            FROM documents
        ) WHERE word <> ''
    ), cells AS (
        {_CMS_CELLS_SQL}
    ), top AS (
        SELECT word, CAST(count(*) AS BIGINT) AS exact_cnt
        FROM tok GROUP BY 1
        ORDER BY exact_cnt DESC, word LIMIT 10
    ), probes AS (
        {_CMS_PROBES_SQL}
    )
    SELECT p.word AS term, p.exact_cnt,
           CAST(min(c.cell_cnt) AS BIGINT) AS cms_est,
           CAST(min(c.cell_cnt) - p.exact_cnt AS BIGINT) AS overcount
    FROM probes p JOIN cells c ON c.r = p.r AND c.bkt = p.bkt
    GROUP BY 1, 2
"""


@register(
    "x137_count_min_sketch",
    "Count-min sketch over the corpus token stream — the mergeable "
    "heavy-hitter counter that complements x105's exact bitmaps and "
    "x106's HLL (those answer distinct-count; CMS answers frequency) "
    "with d=4 hash rows x w=64 buckets. The sketch is pure additive "
    "state: every (row, bucket) cell is a SUM, so map-side combine "
    "collapses the token stream to d*w=256 cells per partition and "
    "merging shards/days is cell-wise addition — the property that "
    "lets one 256-cell table answer point frequency queries over any "
    "token volume at 100 TB. Surfaced as a self-test: the 10 exact "
    "top terms probed back through the sketch, reporting estimate and "
    "overcount (CMS never undercounts — min over rows of colliding "
    "sums). Hash rows share x7's (a*H+b) % p family with a < 2^30 so "
    "the int64 products cannot overflow in either engine; both "
    "dialects derive buckets from the identical md5 base hash, so "
    "every cell and estimate hash-matches exactly.",
    oracle=_CMS_ORACLE,
    tags=("ext", "sketch", "heavy-hitters", "mergeable"),
)
def x137_count_min_sketch(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    tok = (
        docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
    )

    def rows_for(h):
        return F.array(
            *[
                F.struct(
                    F.lit(j).cast("int").alias("r"),
                    (
                        ((h * F.lit(a) + F.lit(b)) % F.lit(X.MINHASH_PRIME))
                        % F.lit(CMS_WIDTH)
                    )
                    .cast("long")
                    .alias("bkt"),
                )
                for j, (a, b) in enumerate(CMS_COEFFS)
            ]
        )

    cells = (
        tok.select(F.explode(rows_for(X.base_hash(F.col("word")))).alias("rb"))
        .select(F.col("rb.r").alias("r"), F.col("rb.bkt").alias("bkt"))
        .groupBy("r", "bkt")
        .agg(F.count(F.lit(1)).cast("long").alias("cell_cnt"))
    )
    top = (
        tok.groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "word")
        .limit(10)
    )
    probes = top.select(
        "word",
        "exact_cnt",
        F.explode(rows_for(X.base_hash(F.col("word")))).alias("rb"),
    ).select("word", "exact_cnt", F.col("rb.r").alias("r"), F.col("rb.bkt").alias("bkt"))
    est = (
        probes.join(F.broadcast(cells), ["r", "bkt"])
        .groupBy("word", "exact_cnt")
        .agg(F.min("cell_cnt").alias("cms_est"))
    )
    return est.select(
        F.col("word").alias("term"),
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    )


_BFS_ORACLE = """
    WITH RECURSIVE walk(node, hop) AS (
        SELECT s_suppkey, 0
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        UNION
        SELECT e.dst, w.hop + 1
        FROM walk w
        JOIN (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
              FROM lineitem a
              JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                             AND a.l_suppkey <> b.l_suppkey) e
          ON e.src = w.node
        WHERE w.hop < 3
    )
    SELECT CAST(node AS BIGINT) AS s_suppkey, CAST(min(hop) AS INT) AS hops
    FROM walk GROUP BY 1
"""


@register(
    "x138_bfs_hops_fixed_rounds",
    "Fixed-round breadth-first search: shortest hop distance (<= 3) "
    "from the NATION_3 supplier seed set over the symmetric co-supply "
    "graph — the blast-radius / influence-propagation primitive that "
    "completes the graph tier (x84 ranks, x18/x91 cluster, x123 "
    "counts closure; this one measures DISTANCE). Each round is one "
    "equi-join of the current frontier against the edge list followed "
    "by a distinct — the Pregel superstep shape — with min(hop) over "
    "the unioned rounds collapsing revisits, so rounds never fan out "
    "beyond |V| rows regardless of path multiplicity. Edges are "
    "localCheckpointed once and reused by all three rounds (x123's "
    "lineage-truncation idiom); at 100 TB the frontier would also "
    "anti-join visited nodes before expanding — same plan, one extra "
    "join, noted not needed at verification scale. Fixed 3 rounds "
    "(no convergence check) keep the computation a deterministic "
    "closed form, replayed by the oracle as a depth-bounded recursive "
    "CTE with UNION dedup — the j16 recursion pattern.",
    oracle=_BFS_ORACLE,
    tags=("graph", "bfs", "iterative", "fixed-rounds"),
)
def x138_bfs_hops_fixed_rounds(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sup = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    seeds = (
        sup.join(
            F.broadcast(nat.filter(F.col("n_name") == "NATION_3")),
            sup.s_nationkey == F.col("n_nationkey"),
        )
        .select(F.col("s_suppkey").alias("node"))
        .distinct()
    )
    dist = seeds.withColumn("hop", F.lit(0).cast("int"))
    frontier = dist.select("node")
    for k in (1, 2, 3):
        # eager node-sized checkpoint (x84's pattern): hop k's frontier
        # is referenced both by hop k+1's expansion AND by the final
        # union, so an unchecked lineage re-runs every earlier hop's
        # join+distinct once per consumer
        frontier = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        dist = dist.unionByName(
            frontier.withColumn("hop", F.lit(k).cast("int"))
        )
    return dist.groupBy(F.col("node").alias("s_suppkey")).agg(
        F.min("hop").cast("int").alias("hops")
    )


_EWMA_ORACLE = """
    WITH RECURSIVE d AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY day) AS pos,
               x
        FROM (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END AS DECIMAL(28,6))) AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL AND isfinite(value) AND abs(value) < 1e13
            GROUP BY 1, 2
        )
    ), n AS (
        SELECT event_type, max(pos) AS n_days FROM d GROUP BY event_type
    ), walk AS (
        SELECT event_type, 0 AS pos, CAST(0 AS DOUBLE) AS cur,
               CAST(0 AS DOUBLE) AS peak
        FROM n
        UNION ALL
        SELECT w.event_type, w.pos + 1,
               CASE WHEN w.pos = 0 THEN d.x ELSE (w.cur + d.x) * 0.5 END,
               CASE WHEN w.pos = 0 THEN d.x
                    ELSE greatest(w.peak,
                                  CASE WHEN w.pos = 0 THEN d.x
                                       ELSE (w.cur + d.x) * 0.5 END) END
        FROM walk w
        JOIN d ON d.event_type = w.event_type AND d.pos = w.pos + 1
    )
    SELECT w.event_type,
           CAST(n.n_days AS BIGINT) AS n_days,
           w.cur AS final_ewma,
           w.peak AS peak_ewma
    FROM walk w JOIN n ON n.event_type = w.event_type AND w.pos = n.n_days
"""


@register(
    "w15_ewma_daily_value",
    "Exponentially-weighted moving average (alpha = 1/2) of the daily "
    "value total per event type — the standard smoothed-load monitor, "
    "and the second NON-linear recurrence in the catalog (x127's "
    "clamp was the first): ewma_t = (ewma_{t-1} + x_t)/2 depends on "
    "the accumulated state, which no window cumsum expresses. Same "
    "JVM-side shape as x127 — sort_array(collect_list(struct)) per "
    "event type, one F.aggregate fold with a (n, cur, peak) struct "
    "accumulator — one shuffle on the (tiny) group key; the per-key "
    "array is bounded by |days|, not |events|, because the daily "
    "pre-aggregation runs first (that pre-agg is what makes the fold "
    "safe at 100 TB: the fold only ever sees ~365 elements/year/key). "
    "Daily totals are exact decimal sums cast once to double, and "
    "alpha = 1/2 makes every fold step a dyadic-rational IEEE op — "
    "bit-identical across engines with zero rounding ambiguity. "
    "First day initializes the state (no zero-bias); peak tracks the "
    "running maximum of the smoothed series. Oracle replays the fold "
    "as the x127 recursive-CTE step walk.",
    oracle=_EWMA_ORACLE,
    tags=("window", "stateful-fold", "ewma", "hof"),
)
def w15_ewma_daily_value(spark: SparkSession, sf: str) -> DataFrame:
    from ..compat import exact_sum

    ev = load_table(spark, sf, "events").filter(fin("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(exact_sum("value").cast("double").alias("x"))
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("steps")
    )
    init = F.struct(
        F.lit(0).cast("int").alias("n"),
        F.lit(0.0).alias("cur"),
        F.lit(0.0).alias("peak"),
    )

    def step(acc, s):
        nxt = F.when(acc["n"] == 0, s["x"]).otherwise(
            (acc["cur"] + s["x"]) * F.lit(0.5)
        )
        return F.struct(
            (acc["n"] + 1).alias("n"),
            nxt.alias("cur"),
            F.when(acc["n"] == 0, s["x"])
            .otherwise(F.greatest(acc["peak"], nxt))
            .alias("peak"),
        )

    folded = series.select(
        "event_type",
        F.size("steps").cast("long").alias("n_days"),
        F.aggregate("steps", init, step).alias("st"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.col("st.cur").alias("final_ewma"),
        F.col("st.peak").alias("peak_ewma"),
    )


_FEATHASH_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, {SQL_H.format(s='word')} AS h FROM (
            SELECT doc_id, unnest({SQL_WORDS.format(t='text')}) AS word
            FROM documents
        ) WHERE word <> ''
    ), s AS (
        SELECT doc_id, h % 32 AS bkt,
               sum(CASE WHEN (h // 32) % 2 = 0 THEN 1 ELSE -1 END) AS v
        FROM tok GROUP BY 1, 2
    ), dense AS (
        SELECT d.doc_id, b.bkt, CAST(coalesce(s.v, 0) AS BIGINT) AS v
        FROM (SELECT doc_id FROM documents) d
        CROSS JOIN (SELECT unnest(range(0, 32)) AS bkt) b
        LEFT JOIN s ON s.doc_id = d.doc_id AND s.bkt = b.bkt
    )
    SELECT doc_id,
           md5(string_agg(v::VARCHAR, ',' ORDER BY bkt)) AS vec_md5,
           CAST(count(*) FILTER (WHERE v <> 0) AS INT) AS nnz,
           CAST(sum(abs(v)) AS BIGINT) AS l1_norm
    FROM dense GROUP BY 1
"""


@register(
    "x139_feature_hashing",
    "Hashing-trick featurization (Weinberger et al.): every token is "
    "routed to one of 32 buckets by its md5 base hash (h % 32) with a "
    "sign bit drawn from the next hash bit ((h >> 5) & 1), and the "
    "document's feature vector is the signed term-frequency sum per "
    "bucket — the fixed-width, vocabulary-free text vectorizer that "
    "needs NO dictionary build or broadcast, which is exactly why it "
    "scales to 100 TB corpora (x133's inverted index and x23's TF-IDF "
    "need global term state; this needs none). One shuffle on "
    "(doc_id, bucket) with map-side combine, then map_from_entries + "
    "a sequence transform densifies 32 cells per document JVM-side — "
    "no explode back. Signed hashing makes collisions cancel in "
    "expectation (the property that keeps hashed linear models "
    "unbiased). Output per document: md5 fingerprint of the dense "
    "vector, nnz, and L1 mass — all integers, hash-exact across "
    "engines.",
    oracle=_FEATHASH_ORACLE,
    tags=("ext", "features", "hashing-trick", "vectorizer"),
)
def x139_feature_hashing(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("word"),
        )
        .filter(F.col("word") != "")
        .select("doc_id", X.base_hash(F.col("word")).alias("h"))
    )
    s = tok.groupBy(
        "doc_id", (F.col("h") % 32).cast("int").alias("bkt")
    ).agg(
        F.sum(
            F.when(F.shiftright("h", 5) % 2 == 0, 1).otherwise(-1)
        )
        .cast("long")
        .alias("v")
    )
    m = s.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bkt", "v"))).alias("m")
    )
    dense = docs.select("doc_id").join(m, "doc_id", "left")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(31)),
        lambda b: F.coalesce(
            F.element_at("m", b.cast("int")), F.lit(0).cast("long")
        ),
    )
    out = dense.select("doc_id", vec.alias("vec"))
    return out.select(
        "doc_id",
        F.md5(F.concat_ws(",", F.col("vec"))).alias("vec_md5"),
        F.size(F.filter("vec", lambda x: x != 0)).cast("int").alias("nnz"),
        F.aggregate(
            "vec",
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.abs(x),
        ).alias("l1_norm"),
    )


_ROLL7_ORACLE = """
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), days AS (
        SELECT DISTINCT day FROM ud
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_active_7d
    FROM days d
    JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY 1
"""


@register(
    "w16_rolling_7d_distinct_users",
    "Rolling 7-day distinct active users per day — the trailing-window "
    "DISTINCT that no window frame can express (COUNT(DISTINCT) OVER "
    "RANGE is unsupported everywhere, and a sliding sum of daily "
    "distincts double-counts returners). Scalable formulation: dedup "
    "to (user, day) pairs first, then EXPLODE each pair into the <= 7 "
    "target days it contributes to (sequence(day, day+6)) and run one "
    "grouped distinct-count on the target day — shuffle volume is "
    "bounded by 7 x |user-days|, never by raw event volume, and the "
    "pattern generalizes to any window length W as a W-fold factor. "
    "Target days are restricted to days actually observed (broadcast "
    "semi-join) so trailing phantom days never appear. The oracle "
    "replays it as a day-range join over the same deduped pairs; "
    "dates travel as ISO strings (the e17 hashing lesson).",
    oracle=_ROLL7_ORACLE,
    tags=("window", "rolling-distinct", "dau"),
)
def w16_rolling_7d_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    days = ud.select("day").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("tday"),
    )
    observed = contrib.join(
        F.broadcast(days.withColumnRenamed("day", "tday")), "tday", "semi"
    )
    return observed.groupBy(
        F.date_format("tday", "yyyy-MM-dd").alias("day")
    ).agg(F.countDistinct("user_id").cast("long").alias("n_active_7d"))


# Benford expected first-digit frequencies, pre-baked to integer ppm so
# neither engine evaluates log10 at query time (libm results never
# hash-match; constants do). round(log10(1 + 1/d) * 1e6) for d = 1..9.
BENFORD_PPM = (
    301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757,
)

_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {ppm}" for d, ppm in enumerate(BENFORD_PPM, start=1)
)
_BENFORD_ORACLE = f"""
    WITH obs AS (
        SELECT CAST(substr(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR),
                           1, 1) AS INT) AS digit,
               count(*) AS n
        FROM events WHERE value >= 1 AND isfinite(value) AND abs(value) < 1e13
        GROUP BY 1
    ), tot AS (SELECT sum(n) AS n_total FROM obs)
    SELECT d.digit,
           CAST(coalesce(o.n, 0) AS BIGINT) AS n_values,
           CAST(coalesce(o.n, 0) * 1000000 // t.n_total AS BIGINT) AS obs_ppm,
           CAST(CASE d.digit {_BENFORD_CASE} END AS BIGINT) AS exp_ppm,
           CAST(abs(coalesce(o.n, 0) * 1000000 // t.n_total
                    - CASE d.digit {_BENFORD_CASE} END) AS BIGINT) AS dev_ppm
    FROM (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit) d
    LEFT JOIN obs o ON o.digit = d.digit
    CROSS JOIN tot t
"""


@register(
    "x140_benford_first_digit_audit",
    "Benford's-law fraud/synthetic-data audit: the first significant "
    "digit of every event value >= 1 against the log-law expectation "
    "P(d) = log10(1 + 1/d) — the screening test auditors and "
    "data-quality teams run because organically-generated magnitudes "
    "follow it and fabricated or unit-confused ones don't. Expected "
    "frequencies are PRE-BAKED integer ppm constants (computed once "
    "in Python, formatted into both dialects) so no engine touches "
    "libm log at query time — the x131 lesson applied; observed "
    "shares are exact integer ppm (n * 1e6 DIV total, the x124 "
    "trick). One grouped count over a projection, 9-row digit spine "
    "left-joined so absent digits report zero instead of vanishing; "
    "output volume is constant regardless of event count.",
    oracle=_BENFORD_ORACLE,
    tags=("ext", "audit", "benford", "data-quality"),
)
def x140_benford_first_digit_audit(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(
        (F.col("value") >= 1) & fin("value").isNotNull()
    )
    obs = ev.groupBy(
        F.substring(F.floor("value").cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    ).agg(F.count(F.lit(1)).alias("n"))
    spine = (
        load_table(spark, sf, "events")
        .sparkSession.range(1, 10)
        .select(F.col("id").cast("int").alias("digit"))
    )
    exp_col = F.lit(None).cast("long")
    for d, ppm in enumerate(BENFORD_PPM, start=1):
        exp_col = F.when(F.col("digit") == d, F.lit(ppm).cast("long")).otherwise(
            exp_col
        )
    tot = obs.agg(F.sum("n").alias("n_total"))
    joined = (
        spine.join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_values"),
            F.expr("coalesce(n, 0) * 1000000 DIV n_total")
            .cast("long")
            .alias("obs_ppm"),
            exp_col.alias("exp_ppm"),
        )
    )
    return joined.select(
        "digit",
        "n_values",
        "obs_ppm",
        "exp_ppm",
        F.abs(F.col("obs_ppm") - F.col("exp_ppm")).alias("dev_ppm"),
    )


_PARETO_ORACLE = """
    WITH rev AS (
        SELECT l_suppkey AS s,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(28,6))) * 1000000 AS BIGINT)
                   AS rev_micro
        FROM lineitem GROUP BY 1
    ), pts AS (
        SELECT s.s_suppkey,
               CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
               r.rev_micro
        FROM supplier s JOIN rev r ON r.s = s.s_suppkey
    )
    SELECT p.s_suppkey, p.bal_cents, p.rev_micro
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.rev_micro >= p.rev_micro AND q.bal_cents >= p.bal_cents
          AND (q.rev_micro > p.rev_micro OR q.bal_cents > p.bal_cents)
    )
"""


def _frontier(df: DataFrame, *part_cols: str) -> DataFrame:
    """2D skyline sweep (maximize both axes) via two window frames:
    a point is dominated iff a strictly-higher-revenue point has >= its
    balance, or a same-revenue point has strictly higher balance."""
    from pyspark.sql import Window

    w_higher = (
        Window.partitionBy(*part_cols)
        .orderBy("rev_micro")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    w_same = Window.partitionBy(*part_cols, "rev_micro")
    return (
        df.withColumn("m_hi", F.max("bal_cents").over(w_higher))
        .withColumn("m_eq", F.max("bal_cents").over(w_same))
        .filter(
            (F.col("m_hi").isNull() | (F.col("m_hi") < F.col("bal_cents")))
            & (F.col("bal_cents") == F.col("m_eq"))
        )
        .drop("m_hi", "m_eq")
    )


@register(
    "j22_pareto_frontier",
    "Pareto frontier (2D skyline) over suppliers maximizing both "
    "account balance and lifetime shipped revenue — the multi-"
    "criteria shortlist query (no supplier on the frontier is beaten "
    "on BOTH axes). Distributed via the classic two-stage skyline: "
    "stage 1 computes a LOCAL frontier inside each of 8 salt "
    "partitions (valid because the frontier of a union is contained "
    "in the union of per-partition frontiers), stage 2 runs the same "
    "sweep globally over only the pruned survivors — so the single-"
    "ordering window that a naive skyline would run over ALL rows "
    "(an Exchange SinglePartition on the full table) only ever sees "
    "the tiny candidate set; at 100 TB stage 1 eliminates ~everything "
    "map-side. The sweep itself is two window frames, not a self-"
    "join: strictly-higher-revenue max balance (range frame offset 1 "
    "on exact integer micro-revenue) and same-revenue max balance, "
    "with tie semantics matching textbook dominance (equal points "
    "both survive). Money is exact: decimal-summed revenue in integer "
    "micro-units, balances in half-up cents — the range frame's "
    "strict +1 offset is only sound on integers, which is why the "
    "conversion happens first. Oracle is the NOT EXISTS dominance "
    "definition, so the window formulation is verified against the "
    "semantic spec, not a re-derivation.",
    oracle=_PARETO_ORACLE,
    tags=("join", "skyline", "pareto", "window"),
)
def j22_pareto_frontier(spark: SparkSession, sf: str) -> DataFrame:
    from ..compat import exact_sum

    li = load_table(spark, sf, "lineitem")
    rev = li.groupBy(F.col("l_suppkey").alias("s")).agg(
        (
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            * 1000000
        )
        .cast("long")
        .alias("rev_micro")
    )
    sup = load_table(spark, sf, "supplier")
    pts = sup.join(rev, sup.s_suppkey == rev.s).select(
        "s_suppkey",
        F.floor(F.col("s_acctbal") * 100 + 0.5).cast("long").alias("bal_cents"),
        "rev_micro",
    )
    local = _frontier(
        pts.withColumn("salt", F.pmod("s_suppkey", F.lit(8))), "salt"
    ).drop("salt")
    return _frontier(local)


# Bloom filter: m = 1024 bit positions, k = 3 hash rows drawn from the
# same (a*H + b) % p family as the CMS (first three coefficient pairs).
BLOOM_BITS = 1024
_BLOOM_MEMBER_FP = (
    "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
)
_BLOOM_POS_SQL = ", ".join(
    f"(({SQL_H.format(s='fp')} * {a} + {b}) % {X.MINHASH_PRIME}) "
    f"% {BLOOM_BITS}"
    for a, b in CMS_COEFFS[:3]
)
_BLOOM_ORACLE = f"""
    WITH fps AS (
        SELECT doc_id, source, {_BLOOM_MEMBER_FP} AS fp FROM documents
    ), members AS (
        SELECT DISTINCT fp FROM fps
        WHERE CAST(substr(source, 4) AS INT) < 10
    ), bits AS (
        SELECT DISTINCT unnest([{_BLOOM_POS_SQL}]) AS pos FROM members
    ), probes AS (
        SELECT doc_id, fp, list_distinct([{_BLOOM_POS_SQL}]) AS pos
        FROM fps WHERE CAST(substr(source, 4) AS INT) >= 10
    ), hits AS (
        SELECT p.doc_id,
               len(p.pos) = (SELECT count(*) FROM bits b
                             WHERE list_contains(p.pos, b.pos)) AS bloom_hit,
               EXISTS (SELECT 1 FROM members m WHERE m.fp = p.fp)
                   AS exact_dup
        FROM probes p
    )
    SELECT doc_id, bloom_hit, exact_dup,
           bloom_hit AND NOT exact_dup AS false_positive
    FROM hits
"""


@register(
    "x141_bloom_filter_membership",
    "Bloom-filter membership pruning — THE structure that makes "
    "100 TB anti-joins cheap: fingerprints of the canonical corpus "
    "(sources src0-src9) are hashed into a 1024-bit filter (k = 3 "
    "positions per key, same overflow-safe (a*H+b) % p family as the "
    "CMS), and every incoming document (src10-src19) is probed "
    "against it — a miss is a GUARANTEED non-member (skip the "
    "expensive exact check entirely), a hit is a candidate to "
    "verify. The filter is pure OR-able state (distinct positions), "
    "so shards union cell-wise and the whole filter broadcasts in "
    "128 bytes where the member-key set would not. Output per probe: "
    "bloom_hit, the ground-truth exact_dup, and false_positive — "
    "measuring the FP rate the m/n/k choice implies (~13% here by "
    "(1-e^(-kn/m))^k) while proving zero false NEGATIVES "
    "(bloom_hit is true for every exact_dup row, the property the "
    "structure guarantees). Probe-side positions are de-duplicated "
    "per key so self-colliding hashes cannot miscount.",
    oracle=_BLOOM_ORACLE,
    tags=("ext", "bloom", "membership", "join-pruning"),
)
def x141_bloom_filter_membership(spark: SparkSession, sf: str) -> DataFrame:
    docs = TX.add_fingerprint(load_table(spark, sf, "documents")).select(
        "doc_id",
        F.substring("source", 4, 10).cast("int").alias("src_n"),
        F.col("fingerprint").alias("fp"),
    )

    def positions(fp_col):
        return F.array_distinct(
            F.array(
                *[
                    (
                        (X.base_hash(fp_col) * F.lit(a) + F.lit(b))
                        % F.lit(X.MINHASH_PRIME)
                    )
                    % F.lit(BLOOM_BITS)
                    for a, b in CMS_COEFFS[:3]
                ]
            )
        )

    members = docs.filter(F.col("src_n") < 10).select("fp").distinct()
    bits = (
        members.select(F.explode(positions(F.col("fp"))).alias("pos"))
        .distinct()
        .withColumn("is_set", F.lit(1))
    )
    probes = docs.filter(F.col("src_n") >= 10).select(
        "doc_id", "fp", F.explode(positions(F.col("fp"))).alias("pos"),
        F.size(positions(F.col("fp"))).alias("n_pos"),
    )
    matched = (
        probes.join(F.broadcast(bits), "pos", "left")
        .groupBy("doc_id", "fp", "n_pos")
        .agg(F.sum(F.coalesce("is_set", F.lit(0))).alias("n_hit"))
    )
    flagged = matched.join(
        F.broadcast(members.withColumn("exact", F.lit(True))), "fp", "left"
    ).select(
        "doc_id",
        (F.col("n_hit") == F.col("n_pos")).alias("bloom_hit"),
        F.coalesce("exact", F.lit(False)).alias("exact_dup"),
    )
    return flagged.select(
        "doc_id",
        "bloom_hit",
        "exact_dup",
        (F.col("bloom_hit") & ~F.col("exact_dup")).alias("false_positive"),
    )


_RRF_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ), p AS (
        SELECT vec_id AS probe_id, v AS pv FROM c WHERE vec_id < 8
    ), sem AS (
        SELECT probe_id, vec_id AS doc_id,
               row_number() OVER (
                   PARTITION BY probe_id
                   ORDER BY {sql_cosine('pv', 'v')} DESC, vec_id
               ) AS rnk
        FROM p JOIN c ON c.vec_id <> p.probe_id
    ), semk AS (
        SELECT probe_id, doc_id, rnk FROM sem WHERE rnk <= 20
    ), dsh AS (
        SELECT doc_id, {sql_shingles('text')} AS sh FROM documents
    ), psh AS (
        SELECT doc_id AS probe_id, sh AS ps FROM dsh WHERE doc_id < 8
    ), ov AS (
        SELECT p.probe_id, d.doc_id,
               len(list_intersect(p.ps, d.sh)) AS inter,
               len(p.ps) AS na, len(d.sh) AS nb
        FROM psh p JOIN dsh d ON d.doc_id <> p.probe_id
    ), lex AS (
        SELECT probe_id, doc_id,
               row_number() OVER (
                   PARTITION BY probe_id
                   ORDER BY inter * 1000000 // (na + nb - inter) DESC, doc_id
               ) AS rnk
        FROM ov WHERE inter > 0
    ), lexk AS (
        SELECT probe_id, doc_id, rnk FROM lex WHERE rnk <= 20
    ), fused AS (
        SELECT probe_id, doc_id,
               sum(1000000000 // (60 + rnk)) AS rrf,
               count(*) AS n_systems
        FROM (SELECT * FROM semk UNION ALL SELECT * FROM lexk)
        GROUP BY 1, 2
    )
    SELECT CAST(probe_id AS BIGINT) AS probe_id,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(rrf AS BIGINT) AS rrf_score,
           CAST(n_systems AS INT) AS n_systems
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY probe_id ORDER BY rrf DESC, doc_id
        ) AS r
        FROM fused
    ) WHERE r <= 5
"""


@register(
    "x142_reciprocal_rank_fusion",
    "Hybrid retrieval via reciprocal-rank fusion (the RAG-era "
    "standard): for each of 8 query documents, a SEMANTIC ranking "
    "(exact cosine over the aligned embedding, the x10 fold) and a "
    "LEXICAL ranking (3-shingle Jaccard through an inverted-index "
    "equi-join — probe shingles explode and hash-join corpus "
    "postings, never an all-pairs text comparison) each contribute "
    "their top-20, fused by RRF score = sum over systems of "
    "1e9 DIV (60 + rank) — the rank-only formula that needs NO score "
    "normalization across incommensurable systems, computed in exact "
    "integers so fusion is hash-verifiable. Top-5 fused results per "
    "query, with n_systems exposing whether a hit was semantic-only, "
    "lexical-only, or corroborated by both. Probe side broadcasts in "
    "both arms; at 100 TB the semantic arm swaps brute-force for the "
    "x11/x14 candidate generators and the fusion stage is unchanged — "
    "RRF only consumes (query, doc, rank) triples. Ranks tie-break on "
    "doc id everywhere, and the lexical sort key is integer ppm, so "
    "both engines order identically.",
    oracle=_RRF_ORACLE,
    tags=("ext", "retrieval", "rrf", "hybrid-search"),
)
def x142_reciprocal_rank_fusion(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    # NULL vectors are excluded (engine-wide vector-NULL convention,
    # round 11) — the oracle carries the explicit IS NOT NULL twin
    emb = load_table(spark, sf, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    corpus = emb.select(
        "vec_id", "embedding", S.norm(F.col("embedding")).alias("cn")
    )
    probes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pv"),
        S.norm(F.col("embedding")).alias("pn"),
    )
    cos = (
        F.broadcast(probes)
        .join(corpus, F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("doc_id"),
            # per-row norms hoisted above the pair join (r11, same
            # bit-identical rework as similarity.brute_force_topk)
            (
                S.dot(F.col("pv"), F.col("embedding"))
                / (F.col("pn") * F.col("cn"))
            ).alias("c"),
        )
    )
    w_sem = Window.partitionBy("probe_id").orderBy(F.desc("c"), "doc_id")
    semk = (
        cos.withColumn("rnk", F.row_number().over(w_sem))
        .filter(F.col("rnk") <= 20)
        .select("probe_id", "doc_id", "rnk")
    )

    docs = load_table(spark, sf, "documents")
    dsh = docs.select("doc_id", X.word_shingles(F.col("text")).alias("sh"))
    pex = (
        dsh.filter(F.col("doc_id") < 8)
        .select(
            F.col("doc_id").alias("probe_id"),
            F.size("sh").alias("na"),
            F.explode("sh").alias("g"),
        )
    )
    dex = dsh.select(
        "doc_id", F.size("sh").alias("nb"), F.explode("sh").alias("g")
    )
    ov = (
        F.broadcast(pex)
        .join(dex, "g")
        .filter(F.col("doc_id") != F.col("probe_id"))
        .groupBy("probe_id", "doc_id", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    w_lex = Window.partitionBy("probe_id").orderBy(
        F.desc(F.expr("inter * 1000000 DIV (na + nb - inter)")), "doc_id"
    )
    lexk = (
        ov.filter(F.col("inter") > 0)
        .withColumn("rnk", F.row_number().over(w_lex))
        .filter(F.col("rnk") <= 20)
        .select("probe_id", "doc_id", "rnk")
    )

    fused = (
        semk.unionByName(lexk)
        .groupBy("probe_id", "doc_id")
        .agg(
            F.sum(F.expr("1000000000 DIV (60 + rnk)")).alias("rrf"),
            F.count(F.lit(1)).cast("int").alias("n_systems"),
        )
    )
    w_top = Window.partitionBy("probe_id").orderBy(F.desc("rrf"), "doc_id")
    return (
        fused.withColumn("r", F.row_number().over(w_top))
        .filter(F.col("r") <= 5)
        .select(
            "probe_id",
            "doc_id",
            F.col("rrf").cast("long").alias("rrf_score"),
            "n_systems",
        )
    )


_DRAWDOWN_ORACLE = """
    WITH RECURSIVE d AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY day) AS pos,
               x
        FROM (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END AS DECIMAL(28,6))) AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL AND isfinite(value) AND abs(value) < 1e13
            GROUP BY 1, 2
        )
    ), n AS (
        SELECT event_type, max(pos) AS n_days FROM d GROUP BY event_type
    ), walk AS (
        SELECT event_type, 0 AS pos, CAST(0 AS DOUBLE) AS peak,
               CAST(0 AS DOUBLE) AS mdd
        FROM n
        UNION ALL
        SELECT w.event_type, w.pos + 1,
               CASE WHEN w.pos = 0 THEN d.x
                    ELSE greatest(w.peak, d.x) END,
               CASE WHEN w.pos = 0 THEN CAST(0 AS DOUBLE)
                    ELSE greatest(w.mdd, greatest(w.peak, d.x) - d.x) END
        FROM walk w
        JOIN d ON d.event_type = w.event_type AND d.pos = w.pos + 1
    )
    SELECT w.event_type,
           CAST(n.n_days AS BIGINT) AS n_days,
           w.peak AS peak_value,
           w.mdd AS max_drawdown
    FROM walk w JOIN n ON n.event_type = w.event_type AND w.pos = n.n_days
"""


@register(
    "w17_max_drawdown",
    "Maximum drawdown of the daily value series per event type — the "
    "largest peak-to-current drop, the canonical risk / degradation "
    "statistic for any monitored series (revenue, traffic, model "
    "quality). A path-dependent double recurrence (running peak feeds "
    "the running worst-drop), so like x127/w15 it is a stateful fold, "
    "NOT a window: cummax gives the peak but the drawdown maximum "
    "needs the joint walk. Same scale posture as w15 — exact-decimal "
    "daily pre-aggregation first, so the per-key fold array is "
    "bounded by |days| and the shuffle by |type x days|; greatest/"
    "subtract over identical doubles is bit-exact across engines. "
    "First day initializes peak = x, drawdown = 0; oracle replays the "
    "fold as the recursive-CTE step walk.",
    oracle=_DRAWDOWN_ORACLE,
    tags=("window", "stateful-fold", "drawdown", "risk"),
)
def w17_max_drawdown(spark: SparkSession, sf: str) -> DataFrame:
    from ..compat import exact_sum

    ev = load_table(spark, sf, "events").filter(fin("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(exact_sum("value").cast("double").alias("x"))
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("steps")
    )
    init = F.struct(
        F.lit(0).cast("int").alias("n"),
        F.lit(0.0).alias("peak"),
        F.lit(0.0).alias("mdd"),
    )

    def step(acc, s):
        peak = F.when(acc["n"] == 0, s["x"]).otherwise(
            F.greatest(acc["peak"], s["x"])
        )
        return F.struct(
            (acc["n"] + 1).alias("n"),
            peak.alias("peak"),
            F.when(acc["n"] == 0, F.lit(0.0))
            .otherwise(F.greatest(acc["mdd"], peak - s["x"]))
            .alias("mdd"),
        )

    folded = series.select(
        "event_type",
        F.size("steps").cast("long").alias("n_days"),
        F.aggregate("steps", init, step).alias("st"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.col("st.peak").alias("peak_value"),
        F.col("st.mdd").alias("max_drawdown"),
    )


_COORD_SAMPLE_ORACLE = f"""
    WITH so AS (
        SELECT * FROM orders
        WHERE {SQL_H.format(s='CAST(o_orderkey AS VARCHAR)')} % 100 < 20
    ), sl AS (
        SELECT * FROM lineitem
        WHERE {SQL_H.format(s='CAST(l_orderkey AS VARCHAR)')} % 100 < 20
    )
    SELECT so.o_orderpriority,
           CAST(count(DISTINCT so.o_orderkey) AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(sl.l_extendedprice * (1 - sl.l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM so JOIN sl ON sl.l_orderkey = so.o_orderkey
    GROUP BY 1
"""


@register(
    "x143_coordinated_key_sample",
    "Coordinated (join-consistent) sampling — the trick that makes "
    "sampled analytics on a 100 TB star schema honest: BOTH tables "
    "keep a key iff md5(key) % 100 < 20, so each side is sampled "
    "INDEPENDENTLY with a pure in-place filter (no shuffle, no "
    "coordination traffic, no sampled-key exchange), yet the join of "
    "the samples equals the sample of the join — every surviving "
    "order keeps ALL its lines, so per-key aggregates (line counts, "
    "revenue) are exact for sampled keys rather than doubly-thinned "
    "the way independent Bernoulli row sampling would make them "
    "(P(both sides) = p² with broken per-key completeness). Same "
    "md5-acceptance determinism as x16, applied as a cross-table "
    "protocol; the demonstration query reports per-priority order/"
    "line/revenue rollups over the coordinated 20% sample with exact "
    "decimal money. The join-completeness property is additionally "
    "pinned by a behavior test comparing sample-then-join against "
    "join-then-sample.",
    oracle=_COORD_SAMPLE_ORACLE,
    tags=("ext", "sampling", "coordinated", "join"),
)
def x143_coordinated_key_sample(spark: SparkSession, sf: str) -> DataFrame:
    from ..compat import exact_sum

    def keep(col):
        return X.base_hash(col.cast("string")) % 100 < 20

    so = load_table(spark, sf, "orders").filter(keep(F.col("o_orderkey")))
    sl = load_table(spark, sf, "lineitem").filter(keep(F.col("l_orderkey")))
    return (
        so.join(sl, sl.l_orderkey == so.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
    )


_ALLOC_ORACLE = """
    WITH li AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem
    ), tot AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents
        FROM orders
    ), j AS (
        SELECT li.l_orderkey, li.l_linenumber, li.qty, t.total_cents,
               sum(li.qty) OVER (PARTITION BY li.l_orderkey) AS sum_qty
        FROM li JOIN tot t ON t.o_orderkey = li.l_orderkey
    ), base AS (
        SELECT *, (total_cents * qty) // sum_qty AS base_cents,
               (total_cents * qty) % sum_qty AS frac
        FROM j
    ), res AS (
        SELECT *,
               total_cents - sum(base_cents)
                   OVER (PARTITION BY l_orderkey) AS n_extra,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY frac DESC, l_linenumber) AS rk
        FROM base
    )
    SELECT l_orderkey,
           CAST(l_linenumber AS INT) AS l_linenumber,
           CAST(base_cents + CASE WHEN rk <= n_extra THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_cents
    FROM res
"""


@register(
    "x144_largest_remainder_allocation",
    "Exact cent allocation by the largest-remainder (Hamilton) method: "
    "each order's total (in half-up cents) is prorated across its "
    "lines proportional to quantity, floor shares first, then the "
    "leftover cents go one each to the lines with the largest "
    "fractional remainders (tie-break on line number) — so every "
    "order's allocations sum EXACTLY to its total, the invariant "
    "naive round(share) proration violates on almost every order "
    "(off-by-a-cent rows are the classic reconciliation bug). All "
    "arithmetic is int64 — products bounded at total_cents * qty "
    "~ 2.5e9 — and the remainder ranking is a per-order window, so "
    "the whole operator is one join plus order-partitioned windows: "
    "shuffle on the order key only, no global ordering anywhere. A "
    "behavior test pins the per-order conservation invariant "
    "directly.",
    oracle=_ALLOC_ORACLE,
    tags=("ext", "allocation", "money-exact", "window"),
)
def x144_largest_remainder_allocation(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    tot = load_table(spark, sf, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("long")
        .alias("total_cents"),
    )
    j = li.join(tot, li.l_orderkey == tot.o_orderkey).withColumn(
        "sum_qty", F.sum("qty").over(Window.partitionBy("l_orderkey"))
    )
    base = j.withColumn(
        "base_cents", F.expr("(total_cents * qty) DIV sum_qty")
    ).withColumn("frac", F.expr("(total_cents * qty) % sum_qty"))
    res = base.withColumn(
        "n_extra",
        F.col("total_cents")
        - F.sum("base_cents").over(Window.partitionBy("l_orderkey")),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("l_orderkey").orderBy(
                F.desc("frac"), "l_linenumber"
            )
        ),
    )
    return res.select(
        "l_orderkey",
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        (
            F.col("base_cents")
            + F.when(F.col("rk") <= F.col("n_extra"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc_cents"),
    )


_CHECKSUM_ORACLE = f"""
    WITH rows_ AS (
        SELECT l_orderkey // 1000 AS bucket,
               {SQL_H.format(
                   s="concat_ws('|', l_orderkey, l_linenumber, "
                     "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT), "
                     "CAST(l_quantity AS BIGINT), l_returnflag, "
                     "l_linestatus, strftime(CAST(l_shipdate AS DATE), "
                     "'%Y-%m-%d'))"
               )} AS digest
        FROM lineitem
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(digest) AS BIGINT) AS checksum
    FROM rows_ GROUP BY 1
"""


@register(
    "x145_range_bucketed_table_checksum",
    "Anti-entropy table checksum: every lineitem row is canonicalized "
    "to a stable text form (keys and ints verbatim, money in half-up "
    "cents, dates as ISO strings — never raw double repr, which no "
    "two engines print alike), digested with the md5 base hash, and "
    "SUMMED per 1000-order key-range bucket — an order-insensitive, "
    "partition-parallel fingerprint. Two replicas (or a source and a "
    "migrated copy) compare |buckets| tiny rows instead of 100 TB of "
    "data, and a mismatch pinpoints the divergent key range for "
    "targeted re-sync — the Merkle-tree leaf level of Dynamo/"
    "Cassandra anti-entropy, expressed as one scan + one grouped sum "
    "with map-side combine. Commutative addition makes the checksum "
    "independent of row order and partitioning; int64 cannot overflow "
    "below ~4e9 rows per bucket (digests are < 2^32).",
    oracle=_CHECKSUM_ORACLE,
    tags=("ext", "checksum", "anti-entropy", "audit"),
)
def x145_range_bucketed_table_checksum(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    canon = F.concat_ws(
        "|",
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"),
        F.col("l_quantity").cast("long"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.date_format("l_shipdate", "yyyy-MM-dd"),
    )
    return (
        li.select(
            F.expr("l_orderkey DIV 1000").alias("bucket"),
            X.base_hash(canon).alias("digest"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("digest").cast("long").alias("checksum"),
        )
    )


_ROLLCORR_ORACLE = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS epoch_day,
               CAST(count(*) FILTER (WHERE event_type = 'purchase')
                    AS BIGINT) AS p,
               CAST(count(*) FILTER (WHERE event_type = 'error')
                    AS BIGINT) AS e
        FROM events GROUP BY 1, 2
    ), mo AS (
        SELECT day,
               count(*) OVER w AS n,
               sum(p) OVER w AS sp, sum(e) OVER w AS se,
               sum(p * p) OVER w AS spp, sum(e * e) OVER w AS see,
               sum(p * e) OVER w AS spe
        FROM daily
        WINDOW w AS (ORDER BY epoch_day
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(n AS BIGINT) AS n_days,
           CASE WHEN sqrt(CAST(n * spp - sp * sp AS DOUBLE))
                     * sqrt(CAST(n * see - se * se AS DOUBLE)) = 0
                THEN NULL
                ELSE CAST(n * spe - sp * se AS DOUBLE)
                     / (sqrt(CAST(n * spp - sp * sp AS DOUBLE))
                        * sqrt(CAST(n * see - se * se AS DOUBLE)))
           END AS rolling_corr
    FROM mo
"""


@register(
    "w18_rolling_correlation",
    "Trailing 7-day Pearson correlation between the daily purchase and "
    "error counts — the co-movement monitor ('do failures rise with "
    "load?') that plain rolling averages can't answer. The rolling "
    "moments (n, Σp, Σe, Σp², Σe², Σpe) accumulate as exact int64 "
    "range-frame sums over the integer epoch-day key (RANGE 6 "
    "PRECEDING handles calendar gaps correctly where ROWS would not), "
    "and the correlation closes in one fixed shape of IEEE ops on "
    "those exact integers — bit-identical across engines, the same "
    "exact-moments discipline as a8/a14. Zero-variance windows return "
    "NULL via an explicit guard rather than engine-specific inf "
    "semantics. One shuffle to the |days| pre-aggregate, windows over "
    "|days| rows; event volume only touches the first grouped count.",
    oracle=_ROLLCORR_ORACLE,
    tags=("window", "rolling-correlation", "range-frame"),
)
def w18_rolling_correlation(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("p"),
        F.count(F.when(F.col("event_type") == "error", 1))
        .cast("long")
        .alias("e"),
    ).withColumn("epoch_day", F.datediff("day", F.lit("1970-01-01")))
    w = Window.orderBy("epoch_day").rangeBetween(-6, 0)
    mo = daily.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("p").over(w).alias("sp"),
        F.sum("e").over(w).alias("se"),
        F.sum(F.col("p") * F.col("p")).over(w).alias("spp"),
        F.sum(F.col("e") * F.col("e")).over(w).alias("see"),
        F.sum(F.col("p") * F.col("e")).over(w).alias("spe"),
    )
    den = F.sqrt((F.col("n") * F.col("spp") - F.col("sp") * F.col("sp")).cast("double")) * F.sqrt(
        (F.col("n") * F.col("see") - F.col("se") * F.col("se")).cast("double")
    )
    return mo.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n_days"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(
            (F.col("n") * F.col("spe") - F.col("sp") * F.col("se")).cast(
                "double"
            )
            / den
        )
        .alias("rolling_corr"),
    )


_GENERALIZE_WIDTHS = (50, 100, 200)

_GENERALIZE_CELLS_SQL = "\n        UNION ALL ".join(
    f"SELECT event_type, CAST(ts AS DATE) AS day, {w} AS width, "
    f"CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END / {w}.0) AS BIGINT) AS band, user_id FROM events"
    for w in _GENERALIZE_WIDTHS
)
_GENERALIZE_ORACLE = f"""
    WITH bands AS (
        {_GENERALIZE_CELLS_SQL}
    ), cells AS (
        SELECT event_type, day, width, band,
               count(DISTINCT user_id) AS n_users
        FROM bands GROUP BY 1, 2, 3, 4
    ), floors AS (
        SELECT event_type, day, width, min(n_users) AS min_users
        FROM cells GROUP BY 1, 2, 3
    ), chosen AS (
        SELECT event_type, day,
               min(width) FILTER (WHERE min_users >= 5) AS chosen_width
        FROM floors GROUP BY 1, 2
    )
    SELECT c.event_type,
           strftime(c.day, '%Y-%m-%d') AS day,
           CAST(c.chosen_width AS INT) AS chosen_width,
           CAST(f.min_users AS BIGINT) AS min_users_at_chosen
    FROM chosen c
    LEFT JOIN floors f ON f.event_type = c.event_type AND f.day = c.day
                      AND f.width = c.chosen_width
"""


@register(
    "x146_k_anonymity_generalization",
    "The REPAIR to x135's k-anonymity audit: for every (event_type, "
    "day) release group, pick the narrowest value-band width from the "
    "generalization ladder (50, 100, 200) whose every quasi-identifier "
    "cell reaches k = 5 distinct users — textbook generalization-"
    "lattice anonymization restricted to one attribute's ladder; "
    "groups no width can fix come back with NULL (suppress the "
    "release, the only safe fallback). One union-of-ladder pass: the "
    "banding is a projection per rung, the distinct-count shuffles "
    "(type, day, width, band, user) keys — 3x the x135 audit cost, "
    "still bounded by cells x users, never event volume. NULL values "
    "band to NULL and participate as their own cell in both dialects. "
    "Dates travel as ISO strings.",
    oracle=_GENERALIZE_ORACLE,
    tags=("ext", "privacy", "k-anonymity", "generalization"),
)
def x146_k_anonymity_generalization(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    bands = None
    for w in _GENERALIZE_WIDTHS:
        part = ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.lit(w).cast("int").alias("width"),
            F.floor(fin("value") / float(w)).cast("long").alias("band"),
            "user_id",
        )
        bands = part if bands is None else bands.unionByName(part)
    cells = bands.groupBy("event_type", "day", "width", "band").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    floors = cells.groupBy("event_type", "day", "width").agg(
        F.min("n_users").alias("min_users")
    )
    chosen = floors.groupBy("event_type", "day").agg(
        F.min(F.when(F.col("min_users") >= 5, F.col("width"))).alias(
            "chosen_width"
        )
    )
    return (
        chosen.join(
            floors.withColumnRenamed("width", "chosen_width"),
            ["event_type", "day", "chosen_width"],
            "left",
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("chosen_width").cast("int").alias("chosen_width"),
            F.col("min_users").cast("long").alias("min_users_at_chosen"),
        )
    )


_VOCAB_ENCODE_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, pos, word FROM (
            SELECT doc_id, generate_subscripts(ws, 1) AS pos,
                   unnest(ws) AS word
            FROM (SELECT doc_id, {SQL_WORDS.format(t='text')} AS ws
                  FROM documents)
        ) WHERE word <> ''
    ), counts AS (
        SELECT word, count(*) AS cnt FROM tok GROUP BY 1
    ), vocab AS (
        SELECT word, row_number() OVER (ORDER BY cnt DESC, word) AS id
        FROM counts ORDER BY cnt DESC, word LIMIT 1000
    ), enc AS (
        SELECT t.doc_id, t.pos, coalesce(v.id, 0) AS tid
        FROM tok t LEFT JOIN vocab v ON v.word = t.word
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS oov_ppm,
           md5(string_agg(tid::VARCHAR, ',' ORDER BY pos)) AS ids_md5
    FROM enc GROUP BY 1
"""


@register(
    "x147_vocab_encode",
    "Vocabulary encoding — the doc -> token-id step between x43's "
    "coverage check and x40/x41's chunk-and-pack: the corpus's top "
    "1000 words by frequency (deterministic count-desc/word-asc "
    "ranking) become ids 1..1000, every token maps through a "
    "BROADCAST vocab join (OOV -> 0, the reserved unk id), and each "
    "document reassembles its id sequence in token order JVM-side "
    "(sort_array over (pos, id) structs — one shuffle on doc_id, the "
    "x127 array-bound caveat applies per document, not per corpus). "
    "Reported as the md5 of the ordered id sequence plus the exact "
    "integer-ppm OOV rate — the metric that decides whether the vocab "
    "is big enough before a 100 TB encode run. No driver collect "
    "anywhere: the vocab stays a dataframe and broadcasts; at real "
    "scale the same plan serves a 100k-entry vocab unchanged.",
    oracle=_VOCAB_ENCODE_ORACLE,
    tags=("ext", "tokenizer", "vocab", "encoding"),
)
def x147_vocab_encode(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), r"\s+")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    counts = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        counts.orderBy(F.desc("cnt"), "word")
        .limit(1000)
        .withColumn(
            "id",
            F.row_number().over(Window.orderBy(F.desc("cnt"), "word")),
        )
        .select("word", "id")
    )
    enc = toks.join(F.broadcast(vocab), "word", "left").select(
        "doc_id", "pos", F.coalesce("id", F.lit(0)).alias("tid")
    )
    seq = enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("tid") == 0, 1).otherwise(0)).alias("n_oov"),
        F.sort_array(F.collect_list(F.struct("pos", "tid"))).alias("s"),
    )
    return seq.select(
        "doc_id",
        "n_tokens",
        F.expr("n_oov * 1000000 DIV n_tokens").cast("long").alias("oov_ppm"),
        F.md5(
            F.concat_ws(",", F.transform("s", lambda x: x["tid"]))
        ).alias("ids_md5"),
    )


_ENCODING_ADVISOR_ORACLE = """
    WITH melt AS (
        SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS day,
               'l_returnflag' AS col_name, l_returnflag AS val
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE),
               'l_linestatus', l_linestatus FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE),
               'l_quantity', CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE),
               'l_shipdate', strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
        FROM lineitem
    ), runs AS (
        SELECT col_name,
               sum(CASE WHEN prev IS NULL OR prev <> val
                        THEN 1 ELSE 0 END) AS n_runs
        FROM (
            SELECT col_name, val,
                   lag(val) OVER (PARTITION BY col_name, day
                                  ORDER BY l_orderkey, l_linenumber, val)
                       AS prev
            FROM melt
        ) GROUP BY 1
    ), freq AS (
        SELECT col_name, val, count(*) AS cnt FROM melt GROUP BY 1, 2
    ), stats AS (
        SELECT col_name,
               CAST(sum(cnt) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_distinct
        FROM freq GROUP BY 1
    ), top AS (
        SELECT col_name, val AS top_value, CAST(cnt AS BIGINT) AS top_freq
        FROM (
            SELECT *, row_number() OVER (PARTITION BY col_name
                                         ORDER BY cnt DESC, val) AS rk
            FROM freq
        ) WHERE rk = 1
    )
    SELECT s.col_name, s.n_rows, s.n_distinct, t.top_value, t.top_freq,
           CAST(r.n_runs AS BIGINT) AS n_runs_date_sorted
    FROM stats s
    JOIN top t ON t.col_name = s.col_name
    JOIN runs r ON r.col_name = s.col_name
"""


@register(
    "z2_encoding_advisor",
    "Storage-encoding advisor (z1's layout sibling): for four "
    "candidate lineitem columns, one pass reports the inputs every "
    "columnar writer's encoding choice needs — cardinality "
    "(dictionary feasibility), top-value frequency (RLE on the mode), "
    "and run count under the table's natural shipdate-major sort "
    "(low runs/row -> run-length encoding wins; ~one run per row -> "
    "don't bother). Columns melt into (col, value) rows via an "
    "EXPLODE projection so the table is scanned ONCE for all columns; "
    "run detection windows are partitioned by (column, ship-day), "
    "never a global ordering, so the pass parallelizes at any scale "
    "(cross-day boundary runs are counted as new runs — a <= |days| "
    "overcount, documented, irrelevant to the encoding decision). At "
    "100 TB this is how you pick z1's z-order candidates and the "
    "parquet dictionary/RLE knobs from data rather than folklore; "
    "values canonicalize to stable text (ints, ISO dates) in both "
    "dialects.",
    oracle=_ENCODING_ADVISOR_ORACLE,
    tags=("storage", "encoding", "advisor", "profiling"),
)
def z2_encoding_advisor(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf, "lineitem")
    melt = li.select(
        "l_orderkey",
        "l_linenumber",
        F.to_date("l_shipdate").alias("day"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("l_returnflag").alias("col_name"),
                    F.col("l_returnflag").alias("val"),
                ),
                F.struct(
                    F.lit("l_linestatus").alias("col_name"),
                    F.col("l_linestatus").alias("val"),
                ),
                F.struct(
                    F.lit("l_quantity").alias("col_name"),
                    F.col("l_quantity").cast("long").cast("string").alias("val"),
                ),
                F.struct(
                    F.lit("l_shipdate").alias("col_name"),
                    F.date_format("l_shipdate", "yyyy-MM-dd").alias("val"),
                ),
            )
        ).alias("kv"),
    ).select(
        "l_orderkey",
        "l_linenumber",
        "day",
        F.col("kv.col_name").alias("col_name"),
        F.col("kv.val").alias("val"),
    )
    # (l_orderkey, l_linenumber) is NOT unique in the fixture; appending
    # val totalizes the order up to equal values, and equal values are
    # run-count-invariant under permutation — so the lag is deterministic
    w = Window.partitionBy("col_name", "day").orderBy(
        "l_orderkey", "l_linenumber", "val"
    )
    runs = (
        melt.withColumn("prev", F.lag("val").over(w))
        .groupBy("col_name")
        .agg(
            F.sum(
                F.when(
                    F.col("prev").isNull() | (F.col("prev") != F.col("val")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_runs_date_sorted")
        )
    )
    freq = melt.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = freq.groupBy("col_name").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    top = (
        freq.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("col_name").orderBy(F.desc("cnt"), "val")
            ),
        )
        .filter(F.col("rk") == 1)
        .select(
            "col_name",
            F.col("val").alias("top_value"),
            F.col("cnt").cast("long").alias("top_freq"),
        )
    )
    return stats.join(top, "col_name").join(runs, "col_name")


_APPROX_CERT_ORACLE = """
    WITH ranked AS (
        SELECT l_returnflag, l_extendedprice,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           l_extendedprice AS exact_p99_by_rank,
           TRUE AS approx_within_bound
    FROM ranked
    WHERE rn = CAST(ceil(0.99 * n) AS BIGINT)
"""


@register(
    "k6_approx_percentile_certification",
    "Accuracy certification for the exact<->approx percentile switch "
    "the cleaning suite's C4/C5 caps rely on (SURVEY quality design): "
    "per return flag, Spark's approx_percentile(price, 0.99, 10000) "
    "is measured against its OWN contract — the Greenwald-Khanna "
    "rank-error bound says the returned value's empirical rank must "
    "sit within n/accuracy of the 0.99n target — and the entry emits "
    "approx_within_bound, which the DuckDB oracle pins as literal "
    "TRUE: if a Spark upgrade ever loosens the sketch, the hash "
    "mismatches and the driver flags it. The exact p99 is the rank-"
    "selected order statistic (ceil(0.99n), tie-permutation-invariant "
    "— never interpolated, engines disagree on interpolation op "
    "order), reported alongside so the certificate also shows WHAT "
    "the approximation is near. The rank of the approx value is one "
    "count-below aggregate, not a sort.",
    oracle=_APPROX_CERT_ORACLE,
    tags=("scale", "approx", "percentile", "certification"),
)
def k6_approx_percentile_certification(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    wsz = Window.partitionBy("l_returnflag")
    ranked = li.withColumn(
        "rn",
        F.row_number().over(wsz.orderBy("l_extendedprice")),
    ).withColumn("n", F.count(F.lit(1)).over(wsz))
    exact = ranked.filter(
        F.col("rn") == F.ceil(0.99 * F.col("n")).cast("long")
    ).select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        F.col("l_extendedprice").alias("exact_p99_by_rank"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.99, 10000)").alias("ap")
    )
    rank_of = (
        li.join(F.broadcast(approx), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("ap"), 1).otherwise(0)
            ).alias("rank_ap")
        )
    )
    return (
        exact.join(F.broadcast(rank_of), "l_returnflag")
        .select(
            "l_returnflag",
            "n_rows",
            "exact_p99_by_rank",
            (
                F.abs(
                    F.col("rank_ap")
                    - F.ceil(0.99 * F.col("n_rows")).cast("long")
                )
                <= F.col("n_rows") / 10000 + 1
            ).alias("approx_within_bound"),
        )
    )


_WILSON_ORACLE = """
    WITH per_user AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(*) FILTER (WHERE event_type = 'purchase')
                    AS BIGINT) AS n_purchases
        FROM events GROUP BY 1
    ), scored AS (
        SELECT user_id, n_events, n_purchases,
               (CAST(n_purchases AS DOUBLE) / CAST(n_events AS DOUBLE)
                + 3.8416 / (2.0 * CAST(n_events AS DOUBLE))
                - 1.96 * sqrt(
                    (CAST(n_purchases AS DOUBLE) / CAST(n_events AS DOUBLE)
                     * (1.0 - CAST(n_purchases AS DOUBLE)
                              / CAST(n_events AS DOUBLE))
                     + 3.8416 / (4.0 * CAST(n_events AS DOUBLE)))
                    / CAST(n_events AS DOUBLE)))
               / (1.0 + 3.8416 / CAST(n_events AS DOUBLE)) AS wilson_lb
        FROM per_user
    )
    SELECT user_id, n_events, n_purchases, wilson_lb
    FROM (
        SELECT *, row_number() OVER (ORDER BY wilson_lb DESC, user_id) AS rk
        FROM scored
    ) WHERE rk <= 20
"""


@register(
    "x148_wilson_lower_bound_ranking",
    "Top-20 users by purchase propensity ranked by the WILSON score "
    "lower bound (z = 1.96) rather than the raw rate — the standard "
    "small-sample correction (the 'sort by rating' answer): a 1/1 "
    "user must NOT outrank a 45/50 user, which naive s/n ranking "
    "does. Inputs are exact integer (successes, trials) per user; the "
    "bound itself is one fixed expression shape over those exact "
    "integers with decimal literals (z^2 = 3.8416 parses to the same "
    "double everywhere), written CHARACTER-IDENTICAL in both dialects "
    "so every IEEE intermediate matches and the ranking hash-"
    "verifies. One grouped count then top-20 via orderBy+limit "
    "(TakeOrderedAndProject per-partition heaps — no global sort, no "
    "rank window over |users|); the certainty-vs-volume tradeoff is "
    "pinned by a planted behavior test.",
    oracle=_WILSON_ORACLE,
    tags=("ext", "ranking", "wilson", "small-sample"),
)
def x148_wilson_lower_bound_ranking(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("n_purchases"),
    )
    nd = F.col("n_events").cast("double")
    phat = F.col("n_purchases").cast("double") / nd
    wilson = (
        phat
        + F.lit(3.8416) / (F.lit(2.0) * nd)
        - F.lit(1.96)
        * F.sqrt(
            (phat * (F.lit(1.0) - phat) + F.lit(3.8416) / (F.lit(4.0) * nd))
            / nd
        )
    ) / (F.lit(1.0) + F.lit(3.8416) / nd)
    scored = per_user.withColumn("wilson_lb", wilson)
    # top-20 via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps, never a global sort or an unpartitioned rank window over
    # |users| rows — the x203 top-k shape)
    return scored.orderBy(F.desc("wilson_lb"), "user_id").limit(20).select(
        "user_id", "n_events", "n_purchases", "wilson_lb"
    )


_DPP_ORACLE = """
    WITH dim AS (
        SELECT DISTINCT strftime(CAST(o_orderdate AS DATE), '%Y-%m')
                   AS ship_month
        FROM orders
        WHERE o_orderpriority = '1-URGENT'
          AND extract(year FROM o_orderdate) = 1995
    )
    SELECT f.ship_month,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM (SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS ship_month,
                 l_quantity
          FROM lineitem) f
    JOIN dim ON dim.ship_month = f.ship_month
    GROUP BY 1
"""


@register(
    "z3_dynamic_partition_pruning",
    "Dynamic partition pruning demonstrated end-to-end (z1 z-order and "
    "x112 static pruning's runtime sibling): the fact table is "
    "written partitioned by ship month, and the join against a "
    "FILTER-derived month dimension plans a SubqueryAdaptiveBroadcast "
    "dynamicpruning subquery on the fact scan — the dim filter's "
    "surviving months are computed at runtime and only those "
    "partitions are read, which at 100 TB is the difference between "
    "scanning a month and scanning a decade (static pruning can't do "
    "it: the month list isn't known until the dim filter runs). The "
    "plan shape is asserted by a guard (dynamicpruning present on the "
    "partitioned scan), the RESULT is engine-independent and "
    "hash-verified against the plain filtered-join oracle. Partition "
    "layout is written per run to a temp table (the x121 honest-cost "
    "pattern).",
    oracle=_DPP_ORACLE,
    tags=("storage", "dpp", "partition-pruning", "join"),
)
def z3_dynamic_partition_pruning(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    base = tempfile.mkdtemp(prefix="dpp_")
    spark.sql("DROP TABLE IF EXISTS z3_fact_lineitem")
    (
        load_table(spark, sf, "lineitem")
        .withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
        .write.format("parquet")
        .partitionBy("ship_month")
        .option("path", base + "/fact")
        .mode("overwrite")
        .saveAsTable("z3_fact_lineitem")
    )
    fact = spark.table("z3_fact_lineitem")
    dim = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .filter(F.year("o_orderdate") == 1995)
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("ship_month"))
        .distinct()
    )
    return (
        fact.join(dim, "ship_month")
        .groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("long"))
            .cast("long")
            .alias("total_qty"),
        )
    )


_KS_ORACLE = """
    WITH s AS (
        SELECT n_chars, source FROM documents WHERE source IN ('src0', 'src1')
    ), n AS (
        SELECT count(*) FILTER (WHERE source = 'src0') AS n1,
               count(*) FILTER (WHERE source = 'src1') AS n2
        FROM s
    ), pervals AS (
        SELECT n_chars AS v,
               count(*) FILTER (WHERE source = 'src0') AS c1,
               count(*) FILTER (WHERE source = 'src1') AS c2
        FROM s GROUP BY 1
    ), cum AS (
        SELECT v,
               sum(c1) OVER (ORDER BY v) AS f1,
               sum(c2) OVER (ORDER BY v) AS f2
        FROM pervals
    ), d AS (
        SELECT v, abs(f1 * (SELECT n2 FROM n) - f2 * (SELECT n1 FROM n))
                   AS diff
        FROM cum
    )
    SELECT CAST((SELECT n1 FROM n) AS BIGINT) AS n1,
           CAST((SELECT n2 FROM n) AS BIGINT) AS n2,
           CAST(max(diff) AS BIGINT) AS d_num,
           CAST((SELECT n1 FROM n) * (SELECT n2 FROM n) AS BIGINT) AS d_den,
           CAST(min(v) FILTER (WHERE diff = (SELECT max(diff) FROM d))
                AS BIGINT) AS d_at_value
    FROM d
"""


@register(
    "a15_ks_two_sample",
    "Two-sample Kolmogorov-Smirnov statistic between the src0 and "
    "src1 document-length distributions, in EXACT RATIONAL arithmetic "
    "— D = max|F1 - F2| is emitted as the integer pair (d_num, d_den "
    "= n1*n2) plus the location where the maximum is first attained, "
    "so the distribution-shift test joins the exact-stats family "
    "(a8 Pearson, a14 Spearman, x104 Mann-Kendall, x125 chi-square) "
    "with zero floating point anywhere. ECDFs never materialize per "
    "row: values pre-aggregate to (value, count-per-sample) cells, "
    "cumulative sums run over the |distinct values| rows, and the max "
    "closes in one aggregate — event volume touches only the first "
    "grouped count, so the test costs the same at any corpus size "
    "with a bounded value domain. The step-function convention "
    "(compare AT observed values, right-continuous ECDF) is the "
    "standard one and identical in both dialects by construction.",
    oracle=_KS_ORACLE,
    tags=("analytics", "ks-test", "exact-stats", "drift"),
)
def a15_ks_two_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    n = docs.agg(
        F.count(F.when(F.col("source") == "src0", 1)).alias("n1"),
        F.count(F.when(F.col("source") == "src1", 1)).alias("n2"),
    )
    pervals = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.when(F.col("source") == "src0", 1)).alias("c1"),
        F.count(F.when(F.col("source") == "src1", 1)).alias("c2"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = pervals.select(
        "v",
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
    )
    d = cum.crossJoin(F.broadcast(n)).select(
        "v",
        "n1",
        "n2",
        F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")).alias(
            "diff"
        ),
    )
    d2 = d.withColumn("dmax", F.max("diff").over(Window.partitionBy()))
    # n1/n2/d_den come from the always-one-row global count frame, not
    # first() over the per-value frame: on an EMPTY corpus the oracle's
    # scalar subqueries still read n1 = n2 = 0 while first() over zero
    # rows is NULL (empty-input parity, round 10)
    ks = d2.agg(
        F.max("diff").cast("long").alias("d_num"),
        F.min(F.when(F.col("diff") == F.col("dmax"), F.col("v")))
        .cast("long")
        .alias("d_at_value"),
    )
    return ks.crossJoin(F.broadcast(n)).select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        "d_num",
        (F.col("n1") * F.col("n2")).cast("long").alias("d_den"),
        "d_at_value",
    )


_QMAP_ORACLE = """
    WITH ref AS (
        SELECT n_chars AS v,
               row_number() OVER (ORDER BY n_chars, doc_id) AS rn
        FROM documents WHERE source = 'src0'
    ), n0 AS (SELECT count(*) AS n0 FROM ref),
    tgt AS (
        SELECT doc_id, n_chars AS v,
               row_number() OVER (ORDER BY n_chars, doc_id) AS r,
               count(*) OVER () AS n1
        FROM documents WHERE source = 'src1'
    )
    SELECT t.doc_id,
           CAST(t.v AS BIGINT) AS n_chars,
           CAST((t.r * (SELECT n0 FROM n0) + t.n1 - 1) // t.n1
                AS BIGINT) AS ref_rank,
           CAST(ref.v AS BIGINT) AS mapped_n_chars
    FROM tgt t
    JOIN ref ON ref.rn = (t.r * (SELECT n0 FROM n0) + t.n1 - 1) // t.n1
"""


@register(
    "x149_quantile_mapping",
    "Quantile mapping (CDF matching): every src1 document's length is "
    "remapped to the src0 length at the SAME empirical quantile — the "
    "distribution-matching transform (histogram matching / bias "
    "correction) that makes cross-source features comparable by "
    "reshaping one distribution onto a reference, where x132's "
    "quantile transform only flattens to uniform. All rank "
    "arithmetic is integer (target rank = ceil(r * n0 / n1) via the "
    "DIV identity), ranks totalize on (value, doc_id), and the mapped "
    "value joins by exact rank equality — zero floats, hash-exact. "
    "Both per-source rankings RUN on x87's two-phase distributed "
    "numbering (ext/packing.py:global_row_number) and the "
    "rank-equality join is a plain shuffle join (the ref side is "
    "source-sized, never broadcast) — no single-task sort at any "
    "scale.",
    oracle=_QMAP_ORACLE,
    tags=("ext", "quantile-mapping", "distribution", "normalization"),
)
def x149_quantile_mapping(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    # both per-source rankings use x87's two-phase numbering (range
    # repartition + partition offsets) — no unpartitioned row_number
    # funnelling a whole source through one task
    ref = PK.global_row_number(
        docs.filter(F.col("source") == "src0").select(
            "doc_id", F.col("n_chars").alias("v")
        ),
        ("v", "doc_id"),
        out_col="rn",
    )
    counts = docs.groupBy().agg(
        F.count(F.when(F.col("source") == "src0", 1)).alias("n0"),
        F.count(F.when(F.col("source") == "src1", 1)).alias("n1"),
    )
    tgt = (
        PK.global_row_number(
            docs.filter(F.col("source") == "src1").select(
                "doc_id", F.col("n_chars").alias("v")
            ),
            ("v", "doc_id"),
            out_col="r",
        )
        .crossJoin(F.broadcast(counts))
        .withColumn("ref_rank", F.expr("(r * n0 + n1 - 1) DIV n1"))
    )
    # rank-equality shuffle join — the ref side is source-sized, so it
    # is NOT broadcast; both sides hash-partition on ref_rank
    return tgt.join(
        ref.select(F.col("rn").alias("ref_rank"), F.col("v").alias("mv")),
        "ref_rank",
    ).select(
        "doc_id",
        F.col("v").cast("long").alias("n_chars"),
        F.col("ref_rank").cast("long").alias("ref_rank"),
        F.col("mv").cast("long").alias("mapped_n_chars"),
    )


_SURVIVOR_ORACLE = """
    WITH fp AS (
        SELECT doc_id, lang, n_chars,
               md5(array_to_string(
                   (string_split_regex(lower(text), '\\s+'))[1:5], ' '))
                   AS block_hash
        FROM documents
    ), lang_votes AS (
        SELECT block_hash, lang, count(*) AS c FROM fp GROUP BY 1, 2
    ), lang_mode AS (
        SELECT block_hash, lang AS lang_survivor FROM (
            SELECT *, row_number() OVER (PARTITION BY block_hash
                                         ORDER BY c DESC, lang) AS rk
            FROM lang_votes
        ) WHERE rk = 1
    )
    SELECT f.block_hash,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(f.doc_id) AS BIGINT) AS canonical_doc_id,
           CAST(max(f.n_chars) AS BIGINT) AS n_chars_survivor,
           min(l.lang_survivor) AS lang_survivor
    FROM fp f JOIN lang_mode l ON l.block_hash = f.block_hash
    GROUP BY 1
    HAVING count(*) > 1
"""


@register(
    "x150_survivorship_merge",
    "Field-level survivorship (the MDM golden-record merge): duplicate "
    "families (x129's 5-word-prefix blocking groups — the fixture has "
    "near-dups, not byte dups, so blocking is the honest grouping) "
    "are merged into ONE record with per-field survivorship rules — "
    "canonical id = min doc_id (stability), length = max (most "
    "complete), language = group MODE with deterministic tie-break "
    "(consensus) — which is a different operator from x77's "
    "keep-best-ROW policy: survivorship composes the best FIELDS "
    "across members, so the golden record may match no single source "
    "row. Only multi-member families (n > 1) emit. Two shuffles on "
    "the 16-byte block hash (member rollup + mode vote), both "
    "partial-aggregated; no text ever shuffles except inside the md5. "
    "The standard entity-resolution follow-on: cluster first (x18/"
    "x129), survive fields second.",
    oracle=_SURVIVOR_ORACLE,
    tags=("ext", "survivorship", "mdm", "dedup"),
)
def x150_survivorship_merge(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    fp = load_table(spark, sf, "documents").withColumn(
        "block_hash",
        F.md5(
            F.array_join(F.slice(F.split(F.lower("text"), r"\s+"), 1, 5), " ")
        ),
    )
    votes = fp.groupBy("block_hash", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    mode = (
        votes.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("block_hash").orderBy(
                    F.desc("c"), "lang"
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("block_hash", F.col("lang").alias("lang_survivor"))
    )
    merged = fp.groupBy("block_hash").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min("doc_id").cast("long").alias("canonical_doc_id"),
        F.max("n_chars").cast("long").alias("n_chars_survivor"),
    )
    return (
        merged.filter(F.col("n_members") > 1)
        .join(mode, "block_hash")
        .select(
            "block_hash",
            "n_members",
            "canonical_doc_id",
            "n_chars_survivor",
            "lang_survivor",
        )
    )


_SQL_IFACE_ORACLE = """
    WITH rev AS (
        SELECT o.o_orderpriority, o.o_custkey,
               count(DISTINCT o.o_orderkey) AS n_orders,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    )
    SELECT o_orderpriority, o_custkey,
           CAST(n_orders AS BIGINT) AS n_orders, revenue,
           CAST(rk AS INT) AS rk
    FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                     ORDER BY revenue DESC, o_custkey) AS rk
        FROM rev
    ) WHERE rk <= 3
"""


@register(
    "x151_sql_interface_roundtrip",
    "The pure-SQL front door: the engine's tables register as temp "
    "views and a single spark.sql() statement — CTE, join, exact-"
    "decimal money, window top-k — produces the top-3 customers by "
    "revenue per order priority, proving a user of the reference who "
    "writes SQL (not DataFrames) can drive this engine verbatim; "
    "every other catalog entry exercises the DataFrame API, this one "
    "pins that the Catalyst SQL surface plans the same shapes (the "
    "star join broadcasts, the window partitions — same physical "
    "plans the DataFrame twin gets, because both compile to the same "
    "logical plan). Revenue stays bit-exact via the decimal-sum-"
    "then-double idiom inside the SQL text itself.",
    oracle=_SQL_IFACE_ORACLE,
    tags=("api", "sql", "interface", "window"),
)
def x151_sql_interface_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    load_table(spark, sf, "orders").createOrReplaceTempView("x151_orders")
    load_table(spark, sf, "lineitem").createOrReplaceTempView("x151_lineitem")
    return spark.sql(
        """
        WITH rev AS (
            SELECT o.o_orderpriority, o.o_custkey,
                   count(DISTINCT o.o_orderkey) AS n_orders,
                   CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(28,6))) AS DOUBLE) AS revenue
            FROM x151_orders o
            JOIN x151_lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2
        )
        SELECT o_orderpriority, o_custkey,
               CAST(n_orders AS BIGINT) AS n_orders, revenue,
               CAST(rk AS INT) AS rk
        FROM (
            SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                         ORDER BY revenue DESC, o_custkey)
                          AS rk
            FROM rev
        ) WHERE rk <= 3
        """
    )


_THEIL_SEN_ORACLE = """
    WITH daily AS (
        SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ), pairs AS (
        SELECT CAST(b.c - a.c AS DOUBLE) / CAST(b.d - a.d AS DOUBLE)
                   AS slope
        FROM daily a JOIN daily b ON b.d > a.d
    ), ranked AS (
        SELECT slope,
               row_number() OVER (ORDER BY slope) AS rn,
               count(*) OVER () AS n
        FROM pairs
    )
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST(max(n) AS BIGINT) AS n_pairs,
           max(CASE WHEN rn = (n + 1) // 2 THEN slope END)
               AS theil_sen_slope
    FROM ranked
"""


@register(
    "a16_theil_sen_slope",
    "Theil-Sen robust trend slope of the daily purchase-count series — "
    "the median of all pairwise slopes, the estimator that shrugs off "
    "~29% outlier contamination where a12's OLS line chases every "
    "spike (and the magnitude companion to x104's direction-only "
    "Mann-Kendall: same pairs, median slope instead of sign votes). "
    "Each pairwise slope is ONE IEEE division of exact integers "
    "(count delta over day delta) — identical doubles, identically "
    "ordered, in both engines — and the median is the LOWER-median "
    "order statistic (rank (n+1) DIV 2), never interpolated, so the "
    "result is a value the data actually produced and the hash is "
    "exact. The pair join is quadratic in |days|, not |events| "
    "(435 pairs for a month, ~66k for a year): the daily pre-"
    "aggregation is what makes the robust estimator affordable at "
    "any event volume.",
    oracle=_THEIL_SEN_ORACLE,
    tags=("analytics", "theil-sen", "robust", "trend"),
)
def a16_theil_sen_slope(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("b.d") > F.col("a.d")).select(
        (
            (F.col("b.c") - F.col("a.c")).cast("double")
            / (F.col("b.d") - F.col("a.d")).cast("double")
        ).alias("slope")
    )
    ranked = pairs.select(
        "slope",
        F.row_number().over(Window.orderBy("slope")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    med = ranked.agg(
        F.max("n").cast("long").alias("n_pairs"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("slope"))
        ).alias("theil_sen_slope"),
    )
    return n_days.crossJoin(F.broadcast(med))


_ARGMAX_ORACLE = """
    WITH per_user AS (
        SELECT event_type, user_id,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ), best AS (
        SELECT event_type,
               max(struct_pack(t := n_events, u := user_id)) AS b
        FROM per_user GROUP BY 1
    )
    SELECT event_type,
           CAST(b.u AS BIGINT) AS top_user_id,
           CAST(b.t AS BIGINT) AS top_user_events
    FROM best
"""


@register(
    "g9_argmax_aggregate",
    "Aggregate-side argmax (struct-max idiom): the most active user "
    "per event type via max(struct(count, user_id)) — ONE aggregate "
    "with lexicographic struct comparison, deterministic ties by "
    "construction (equal counts resolve to the larger user id in both "
    "engines) — instead of the w3 window-top-1 shape. The difference "
    "matters at 100 TB: the struct max PARTIAL-AGGREGATES (each map "
    "task emits one candidate per group before any shuffle, and "
    "merging is associative), where row_number()-filter must shuffle "
    "and sort every row of every group first; top-1-per-group is the "
    "single most common window query that should not be a window. A "
    "plan guard pins the no-Window claim.",
    oracle=_ARGMAX_ORACLE,
    tags=("groupby", "argmax", "struct-max", "partial-agg"),
)
def g9_argmax_aggregate(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    best = per_user.groupBy("event_type").agg(
        F.max(F.struct(F.col("n_events").alias("t"),
                       F.col("user_id").alias("u"))).alias("b")
    )
    return best.select(
        "event_type",
        F.col("b.u").cast("long").alias("top_user_id"),
        F.col("b.t").cast("long").alias("top_user_events"),
    )


_TWO_PROP_ORACLE = f"""
    WITH arms AS (
        SELECT {SQL_H.format(s='CAST(user_id AS VARCHAR)')} % 2 AS arm,
               count(*) AS n,
               count(*) FILTER (WHERE event_type = 'purchase') AS s
        FROM events GROUP BY 1
    ), w AS (
        SELECT max(CASE WHEN arm = 0 THEN n END) AS n1,
               max(CASE WHEN arm = 0 THEN s END) AS s1,
               max(CASE WHEN arm = 1 THEN n END) AS n2,
               max(CASE WHEN arm = 1 THEN s END) AS s2
        FROM arms
    )
    SELECT CAST(n1 AS BIGINT) AS n_a, CAST(s1 AS BIGINT) AS s_a,
           CAST(n2 AS BIGINT) AS n_b, CAST(s2 AS BIGINT) AS s_b,
           (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
           / sqrt(CAST(s1 + s2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
                  * (1.0 - CAST(s1 + s2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                  * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
               AS z_score
    FROM w
"""


@register(
    "x152_two_proportion_ztest",
    "The A/B-test readout: users deterministically split into two "
    "arms by the md5 assignment hash (the x16 acceptance idiom — the "
    "split itself is reproducible, no RNG), purchase rates compared "
    "with the pooled two-proportion z statistic. Counts are exact "
    "int64; the z closes in one fixed expression shape over those "
    "integers, written character-identical in both dialects, so even "
    "the test statistic hash-verifies (the x148 Wilson discipline). "
    "Complements x110's full-table chi-square residuals with the "
    "focused two-arm readout every experimentation platform ships. "
    "One grouped count over a projection; output is one row at any "
    "event volume.",
    oracle=_TWO_PROP_ORACLE,
    tags=("ext", "ab-test", "z-test", "experimentation"),
)
def x152_two_proportion_ztest(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    arms = ev.groupBy(
        (X.base_hash(F.col("user_id").cast("string")) % 2).alias("arm")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("s"),
    )
    w = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 0, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("arm") == 1, F.col("s"))).alias("s2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    pp = (d("s1") + d("s2")) / (d("n1") + d("n2"))
    z = (d("s1") / d("n1") - d("s2") / d("n2")) / F.sqrt(
        pp * (F.lit(1.0) - pp) * (F.lit(1.0) / d("n1") + F.lit(1.0) / d("n2"))
    )
    return w.select(
        F.col("n1").cast("long").alias("n_a"),
        F.col("s1").cast("long").alias("s_a"),
        F.col("n2").cast("long").alias("n_b"),
        F.col("s2").cast("long").alias("s_b"),
        z.alias("z_score"),
    )


_RFM_ORACLE = """
    WITH per_cust AS (
        SELECT o_custkey,
               max(CAST(o_orderdate AS DATE)) AS last_order,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders GROUP BY 1
    ), anchored AS (
        SELECT *, datediff('day', last_order,
                           (SELECT max(CAST(o_orderdate AS DATE))
                            FROM orders)) AS recency_days,
               count(*) OVER () AS n
        FROM per_cust
    ), scored AS (
        SELECT o_custkey, recency_days, freq, monetary_cents,
               6 - ((row_number() OVER (ORDER BY recency_days, o_custkey)
                     - 1) * 5 // n + 1) AS r_score,
               (row_number() OVER (ORDER BY freq, o_custkey) - 1) * 5 // n
                   + 1 AS f_score,
               (row_number() OVER (ORDER BY monetary_cents, o_custkey) - 1)
                   * 5 // n + 1 AS m_score
        FROM anchored
    )
    SELECT o_custkey,
           CAST(recency_days AS BIGINT) AS recency_days,
           freq, monetary_cents,
           CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm_segment
    FROM scored
"""


@register(
    "a17_rfm_segmentation",
    "RFM customer segmentation — the classic warehouse marketing "
    "rollup: per customer, Recency (days since last order, anchored "
    "to the corpus max date so the result is data-determined, not "
    "wall-clock), Frequency (order count), Monetary (half-up-cent "
    "lifetime total), each scored into quintiles and composed into "
    "the 3-digit RFM segment code (555 = best). Quintiles use the "
    "exact integer rank formula ((r-1)*5 DIV n + 1) over a totalized "
    "(metric, custkey) order — x132's trick — rather than ntile, so "
    "boundary assignment is identical in both engines by arithmetic, "
    "not by shared convention. The three rankings run as ONE x87 "
    "two-phase numbering pass (range-repartition + per-partition "
    "offsets, ext/packing.py:global_row_number) over the metrics "
    "stacked to (metric_id, value, custkey) rows of the |custkey| "
    "pre-aggregate — metric blocks are contiguous in the total order, "
    "so each within-metric rank is global_index - (metric_id-1)*n by "
    "arithmetic; no unpartitioned row_number window, no single-task "
    "sort, and one barrier set instead of three (r10 rework). Recency "
    "scores INVERT (most recent = 5) — the direction mistake every "
    "first RFM implementation makes, pinned here by the oracle.",
    oracle=_RFM_ORACLE,
    tags=("analytics", "rfm", "segmentation", "quantiles"),
)
def a17_rfm_segmentation(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("monetary_cents"),
    )
    # one broadcast scalar frame: the recency anchor (max over per-cust
    # maxes == corpus max order date) and n for the quintile divisor —
    # no data-sized count() OVER () window
    scalars = per_cust.agg(
        F.max("last_order").alias("anchor"),
        F.count(F.lit(1)).alias("n"),
    )
    anchored = per_cust.crossJoin(F.broadcast(scalars)).withColumn(
        "recency_days", F.datediff("anchor", "last_order")
    )
    # the three global rankings run as ONE x87 two-phase numbering pass
    # (range-repartition + per-partition offsets — never an
    # unpartitioned row_number window funneling every customer through
    # ONE task) over the metrics STACKED to (metric_id, value, custkey)
    # rows: metric_id leads the total order, so each metric's block is
    # contiguous and holds exactly n rows, making the within-metric
    # rank = global_index - (metric_id - 1) * n by arithmetic. One
    # range sampling + one count collect + one checkpoint instead of
    # three of each (VERDICT r9 item 6): a17 was the suite's most
    # barrier-heavy query — ~10 sequential driver barriers whose fixed
    # per-job latency dominated wall time (24.5 s min-rep on a degraded
    # 20-core box vs the 2.8 s record) — and the stack trims it to ~4
    # jobs while shuffling the same 3n rows of (long, long, long):
    # 3.2 s min-rep / 4.5 s median standalone after, same box state,
    # value-exact vs the DuckDB oracle at sf0.01 AND sf0.1.
    stacked = anchored.select(
        "o_custkey",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(mid).alias("m"),
                        F.col(c).cast("long").alias("val"),
                    )
                    for mid, c in (
                        (1, "recency_days"),
                        (2, "freq"),
                        (3, "monetary_cents"),
                    )
                ]
            )
        ).alias("s"),
    ).select("o_custkey", "n", F.col("s.m").alias("m"), F.col("s.val").alias("val"))
    numbered = PK.global_row_number(
        stacked, ("m", "val", "o_custkey"), out_col="_gidx"
    )
    rank_in_block = F.col("_gidx") - (F.col("m") - 1) * F.col("n")
    ranks = numbered.groupBy("o_custkey").agg(
        *[
            F.max(F.when(F.col("m") == mid, rank_in_block)).alias(out)
            for mid, out in ((1, "_rn_r"), (2, "_rn_f"), (3, "_rn_m"))
        ]
    )
    ranked = anchored.join(ranks, "o_custkey")

    def quintile(rn_col):
        return (F.col(rn_col) - 1) * 5 / F.col("n")

    scored = (
        ranked.withColumn(
            "r_score",
            6 - (F.floor(quintile("_rn_r")).cast("int") + 1),
        )
        .withColumn(
            "f_score", F.floor(quintile("_rn_f")).cast("int") + 1
        )
        .withColumn(
            "m_score",
            F.floor(quintile("_rn_m")).cast("int") + 1,
        )
    )
    return scored.select(
        "o_custkey",
        F.col("recency_days").cast("long").alias("recency_days"),
        "freq",
        "monetary_cents",
        "r_score",
        "f_score",
        "m_score",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        )
        .cast("int")
        .alias("rfm_segment"),
    )


_SARGABLE_ORACLE = """
    SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS ship_month,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1996-01-01'
    GROUP BY 1
"""


@register(
    "z4_sargable_predicate_rewrite",
    "Sargable predicate discipline: 'lines shipped in 1995' written as "
    "the half-open range l_shipdate >= '1995-01-01' AND < '1996-01-01' "
    "— which reaches the parquet scan as PushedFilters and prunes row "
    "groups by min/max stats — instead of the semantically identical "
    "year(l_shipdate) = 1995, which wraps the column in a function and "
    "pushes NOTHING (the scan reads every row group and filters "
    "after). The plan guard asserts BOTH facts: this entry's scan "
    "carries the pushed range, and the year() formulation's "
    "PushedFilters is empty — proving the trap, not just avoiding it. "
    "At 100 TB with date-sorted or date-partitioned layout this "
    "rewrite is the difference between reading one year and reading "
    "everything. The aggregate itself is the routine month rollup.",
    oracle=_SARGABLE_ORACLE,
    tags=("storage", "sargable", "pushdown", "scan"),
)
def z4_sargable_predicate_rewrite(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1995-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1996-01-01"))
        )
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("long"))
            .cast("long")
            .alias("total_qty"),
        )
    )


_VARINT_ORACLE = """
    WITH d AS (
        SELECT l_orderkey // 1000 AS bucket,
               l_orderkey - lag(l_orderkey) OVER (
                   PARTITION BY l_orderkey // 1000
                   ORDER BY l_orderkey, l_linenumber, l_partkey) AS delta
        FROM lineitem
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) * 8 AS BIGINT) AS raw_bytes,
           CAST(sum(CASE WHEN delta IS NULL THEN 8
                         ELSE (length(bin(delta)) + 6) // 7 END)
                AS BIGINT) AS delta_varint_bytes,
           CAST((count(*) * 8
                 - sum(CASE WHEN delta IS NULL THEN 8
                            ELSE (length(bin(delta)) + 6) // 7 END))
                * 1000000 // (count(*) * 8) AS BIGINT) AS savings_ppm
    FROM d GROUP BY 1
"""


@register(
    "z5_delta_varint_estimate",
    "Delta+varint size estimate for the sorted key column (z2's "
    "companion: z2 advises dictionary/RLE for low-cardinality "
    "columns, this one prices the standard encoding for sorted "
    "monotone ids): within each 1000-order key-range bucket, "
    "consecutive l_orderkey deltas cost ceil(bitlen/7) varint bytes "
    "(bitlen via length(bin(d)) — exact in both engines, and d = 0 "
    "ties cost the 1-byte minimum through the same formula), the "
    "bucket-leading row pays the full 8 bytes; reported against raw "
    "8-byte storage as exact integer savings ppm. Deltas are "
    "computed per bucket so the lag windows parallelize at any "
    "scale (bucket-boundary deltas are charged as full values — a "
    "<= |buckets| overcount, conservative by construction). Repeated "
    "keys tie-break on (linenumber, partkey) but yield delta 0 under "
    "any tie order, so the estimate is deterministic. This is the "
    "arithmetic parquet's DELTA_BINARY_PACKED decision rests on, "
    "made queryable.",
    oracle=_VARINT_ORACLE,
    tags=("storage", "encoding", "varint", "advisor"),
)
def z5_delta_varint_estimate(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf, "lineitem")
    w = Window.partitionBy(F.expr("l_orderkey DIV 1000")).orderBy(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    d = li.select(
        F.expr("l_orderkey DIV 1000").alias("bucket"),
        (F.col("l_orderkey") - F.lag("l_orderkey").over(w)).alias("delta"),
    )
    return d.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) * 8).cast("long").alias("raw_bytes"),
        F.sum(
            F.when(F.col("delta").isNull(), F.lit(8)).otherwise(
                F.expr("(length(bin(delta)) + 6) DIV 7")
            )
        )
        .cast("long")
        .alias("delta_varint_bytes"),
    ).select(
        "bucket",
        "n_rows",
        "raw_bytes",
        "delta_varint_bytes",
        F.expr(
            "(raw_bytes - delta_varint_bytes) * 1000000 DIV raw_bytes"
        )
        .cast("long")
        .alias("savings_ppm"),
    )


_WRITE_AUDIT_ORACLE = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_source,
           CAST(count(*) AS BIGINT) AS n_written,
           TRUE AS counts_match
    FROM events GROUP BY 1
"""


@register(
    "s8_write_readback_audit",
    "Write-path integrity made driver-verifiable (the sink ops S7-S9 "
    "are otherwise pinned only by pytest goldens): events are written "
    "to a partitioned parquet sink (partitionBy event_type — the "
    "fact-sink layout), read BACK through a fresh scan, and the "
    "per-partition readback counts are compared against the source "
    "aggregation inside the query itself; counts_match is pinned "
    "literal TRUE by the oracle, so a silent write-path drop — the "
    "failure mode partitioned writers actually have (task retries "
    "double-writing without committed-file protocol, partition-column "
    "null routing) — hash-mismatches in the driver rather than "
    "passing silently. The readback is a real files-on-disk scan, not "
    "a cached frame (localCheckpoint/cache would verify nothing); "
    "writes go to a per-run temp dir, the x121 honest-cost pattern.",
    oracle=_WRITE_AUDIT_ORACLE,
    tags=("sink", "write-audit", "integrity", "partitioned"),
)
def s8_write_readback_audit(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    base = tempfile.mkdtemp(prefix="wra_")
    ev = load_table(spark, sf, "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(
        base + "/events_sink"
    )
    # explicit schema: a zero-row source writes no files, and a bare
    # readback would fail schema inference instead of returning empty
    back = spark.read.schema(ev.schema).parquet(base + "/events_sink")
    n_src = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_source")
    )
    n_back = back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_written")
    )
    return n_src.join(n_back, "event_type", "full_outer").select(
        "event_type",
        "n_source",
        "n_written",
        (
            F.col("n_source").isNotNull()
            & F.col("n_written").isNotNull()
            & (F.col("n_source") == F.col("n_written"))
        ).alias("counts_match"),
    )


_STRIDE_W = 32
_STRIDE_S = 24

_STRIDE_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, {SQL_WORDS.format(t='text')} AS ws
        FROM documents WHERE text IS NOT NULL
    ), c AS (
        SELECT doc_id, ws,
               CASE WHEN len(ws) <= {_STRIDE_W} THEN 1
                    ELSE CAST(ceil((len(ws) - {_STRIDE_W})
                              / {_STRIDE_S}.0) AS INT) + 1 END AS nc
        FROM w
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_id,
           CAST(i * {_STRIDE_S} + 1 AS INT) AS start_word,
           CAST(len(ws[i * {_STRIDE_S} + 1
                       : i * {_STRIDE_S} + {_STRIDE_W}]) AS INT) AS n_words,
           md5(array_to_string(
               ws[i * {_STRIDE_S} + 1 : i * {_STRIDE_S} + {_STRIDE_W}],
               ' ')) AS chunk_md5
    FROM c, unnest(range(0, nc)) AS t(i)
"""


@register(
    "x154_stride_overlap_chunking",
    f"Sliding-window chunking with overlap (window {_STRIDE_W} words, "
    f"stride {_STRIDE_S}, so consecutive chunks share "
    f"{_STRIDE_W - _STRIDE_S} words) — the chunking RAG/embedding "
    "pipelines actually use, where x40's disjoint windows lose "
    "cross-boundary context: a sentence straddling a cut exists "
    "intact in the overlapped neighbor. Chunk count is "
    "1 + ceil((len - W)/S) (every word covered, the tail chunk short "
    "but never empty, and a doc shorter than one window yields "
    "exactly one chunk — the three boundary cases the closed form "
    "must get right, pinned by the oracle on every document). Same "
    "scale shape as x40: pure projection + explode of per-doc chunk "
    "indices, zero shuffle at any corpus size; the ~W/S duplication "
    "factor is the documented storage price of overlap. Chunks are "
    "reported as (start, length, md5) so the surface hash-verifies "
    "without shipping the overlapped text twice.",
    oracle=_STRIDE_ORACLE,
    tags=("ext", "text", "chunking", "overlap"),
)
def x154_stride_overlap_chunking(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(
        F.col("text").isNotNull()
    )
    W, S = _STRIDE_W, _STRIDE_S
    ws = F.split(F.lower("text"), r"\s+")
    c = docs.select("doc_id", ws.alias("ws")).withColumn(
        "nc",
        F.when(F.size("ws") <= W, F.lit(1)).otherwise(
            F.ceil((F.size("ws") - W) / float(S)).cast("int") + 1
        ),
    )
    exploded = c.select(
        "doc_id",
        "ws",
        F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("i"),
    )
    chunk = F.slice(F.col("ws"), F.col("i") * S + 1, W)
    return exploded.select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_id"),
        (F.col("i") * S + 1).cast("int").alias("start_word"),
        F.size(chunk).cast("int").alias("n_words"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


_ACF_ORACLE = """
    WITH daily AS (
        SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ), lags AS (
        SELECT unnest(range(1, 8)) AS lag
    ), pairs AS (
        SELECT l.lag, a.c AS x, b.c AS y
        FROM lags l
        JOIN daily a ON TRUE
        JOIN daily b ON b.d = a.d + l.lag
    ), mo AS (
        SELECT lag, count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        FROM pairs GROUP BY 1
    )
    SELECT CAST(lag AS INT) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE)) = 0
                THEN NULL
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS acf
    FROM mo
"""


@register(
    "a18_autocorrelation_lags",
    "Autocorrelation of the daily purchase-count series at lags 1-7 — "
    "the seasonality detector (a weekly cycle surfaces as an acf peak "
    "at lag 7) and the periodicity complement of x124's hour-of-week "
    "fingerprint and w18's cross-series correlation. For each lag the "
    "lagged pairs come from an equi-join on the exact epoch-day "
    "offset (calendar gaps pair nothing, rather than silently "
    "sliding), the six moments accumulate as exact int64, and the "
    "Pearson close is the one fixed IEEE shape with the explicit "
    "zero-variance NULL guard (the w18 discipline). All seven lags "
    "compute in ONE pass: the lag spine cross-joins the tiny |days| "
    "pre-aggregate, so event volume touches only the first grouped "
    "count and the output is exactly 7 rows at any scale.",
    oracle=_ACF_ORACLE,
    tags=("analytics", "acf", "seasonality", "exact-stats"),
)
def a18_autocorrelation_lags(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    lags = ev.sparkSession.range(1, 8).select(F.col("id").alias("lag"))
    a = daily.select(F.col("d").alias("da"), F.col("c").alias("x"))
    b = daily.select(F.col("d").alias("db"), F.col("c").alias("y"))
    pairs = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
    )
    mo = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return mo.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / den
        )
        .alias("acf"),
    )


_HOLT_ORACLE = """
    WITH RECURSIVE d AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY day) AS pos,
               x
        FROM (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END AS DECIMAL(28,6))) AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL AND isfinite(value) AND abs(value) < 1e13
            GROUP BY 1, 2
        )
    ), n AS (
        SELECT event_type, max(pos) AS n_days FROM d GROUP BY event_type
    ), walk AS (
        SELECT event_type, 0 AS pos, CAST(0 AS DOUBLE) AS lvl,
               CAST(0 AS DOUBLE) AS trd
        FROM n
        UNION ALL
        SELECT w.event_type, w.pos + 1,
               CASE WHEN w.pos = 0 THEN d.x
                    ELSE (d.x + w.lvl + w.trd) * 0.5 END,
               CASE WHEN w.pos = 0 THEN CAST(0 AS DOUBLE)
                    ELSE ((CASE WHEN w.pos = 0 THEN d.x
                                ELSE (d.x + w.lvl + w.trd) * 0.5 END
                           - w.lvl) + w.trd) * 0.5 END
        FROM walk w
        JOIN d ON d.event_type = w.event_type AND d.pos = w.pos + 1
    )
    SELECT w.event_type,
           CAST(n.n_days AS BIGINT) AS n_days,
           w.lvl AS level,
           w.trd AS trend,
           w.lvl + w.trd AS forecast_next
    FROM walk w JOIN n ON n.event_type = w.event_type AND w.pos = n.n_days
"""


@register(
    "w19_holt_double_exponential",
    "Holt's double-exponential smoothing (alpha = beta = 1/2) of the "
    "daily value series per event type — the TREND-aware smoother "
    "that w15's plain EWMA is not: level' = (x + level + trend)/2 "
    "chases the series while trend' = ((level' - level) + trend)/2 "
    "tracks its slope, and level + trend is the one-step-ahead "
    "forecast every capacity planner actually wants. Third member of "
    "the stateful-fold family (x127 clamp, w15/w17): same "
    "sort_array + F.aggregate shape with a (n, level, trend) struct "
    "accumulator, the daily decimal pre-aggregation bounding the "
    "per-key array at |days|; dyadic coefficients keep every step an "
    "exact IEEE halving. First day initializes level = x, trend = 0; "
    "oracle replays the joint recurrence as the recursive-CTE walk "
    "(the trend update references the NEW level — the subtlety the "
    "replay must repeat, not simplify).",
    oracle=_HOLT_ORACLE,
    tags=("window", "stateful-fold", "holt", "forecast"),
)
def w19_holt_double_exponential(spark: SparkSession, sf: str) -> DataFrame:
    from ..compat import exact_sum

    ev = load_table(spark, sf, "events").filter(fin("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(exact_sum("value").cast("double").alias("x"))
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("steps")
    )
    init = F.struct(
        F.lit(0).cast("int").alias("n"),
        F.lit(0.0).alias("lvl"),
        F.lit(0.0).alias("trd"),
    )

    def step(acc, s):
        lvl = F.when(acc["n"] == 0, s["x"]).otherwise(
            (s["x"] + acc["lvl"] + acc["trd"]) * F.lit(0.5)
        )
        return F.struct(
            (acc["n"] + 1).alias("n"),
            lvl.alias("lvl"),
            F.when(acc["n"] == 0, F.lit(0.0))
            .otherwise(((lvl - acc["lvl"]) + acc["trd"]) * F.lit(0.5))
            .alias("trd"),
        )

    folded = series.select(
        "event_type",
        F.size("steps").cast("long").alias("n_days"),
        F.aggregate("steps", init, step).alias("st"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.col("st.lvl").alias("level"),
        F.col("st.trd").alias("trend"),
        (F.col("st.lvl") + F.col("st.trd")).alias("forecast_next"),
    )


_LORENZ_ORACLE = """
    WITH ranked AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rn,
               count(*) OVER (PARTITION BY source) AS n,
               sum(n_chars) OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS cum_chars,
               sum(n_chars) OVER (PARTITION BY source) AS total_chars
        FROM documents
    )
    SELECT source, CAST(d AS INT) AS decile,
           CAST(max(CASE WHEN rn = (d * n) // 10 THEN
                         cum_chars * 1000000 // total_chars END)
                AS BIGINT) AS cum_share_ppm
    FROM ranked, unnest(range(1, 11)) AS t(d)
    WHERE (d * n) // 10 >= 1
    GROUP BY 1, 2
"""


@register(
    "x155_lorenz_curve_deciles",
    "Lorenz curve of length concentration per source — the curve "
    "UNDER x126's Gini scalar: at each decile, the exact-ppm share of "
    "total characters held by the shortest d*10% of documents "
    "(bottom-decile share near zero + top decile near 100% = a few "
    "giants dominate the source; the shape tells a curator WHERE the "
    "inequality lives, which the scalar cannot). Rank and cumulative "
    "sums run per source over a totalized (length, doc_id) order; the "
    "decile probe selects the cum-sum at exact integer rank "
    "(d*n) DIV 10, so every point is integer arithmetic on exact "
    "int64 sums — tie-permutation-invariant and hash-exact. One "
    "shuffle on source; 10 rows per source at any corpus size.",
    oracle=_LORENZ_ORACLE,
    tags=("ext", "lorenz", "concentration", "exact-stats"),
)
def x155_lorenz_curve_deciles(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents")
    wp = Window.partitionBy("source")
    wo = wp.orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "source",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("n_chars")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_chars"),
        F.sum("n_chars").over(wp).alias("total_chars"),
    )
    deciles = docs.sparkSession.range(1, 11).select(
        F.col("id").cast("int").alias("decile")
    )
    probed = ranked.crossJoin(F.broadcast(deciles)).filter(
        F.expr("(decile * n) DIV 10 >= 1")
    )
    return probed.groupBy("source", "decile").agg(
        F.max(
            F.when(
                F.col("rn") == F.expr("(decile * n) DIV 10"),
                F.expr("cum_chars * 1000000 DIV total_chars"),
            )
        )
        .cast("long")
        .alias("cum_share_ppm")
    )


_SPAN_ALIGN_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, i - 1 AS pos, ws[i] AS w, len(ws) AS n_words
        FROM (
            SELECT doc_id, {SQL_WORDS.format(t='text')} AS ws
            FROM documents WHERE text IS NOT NULL
        ), unnest(range(1, len(ws) + 1)) AS t(i)
    ), hits AS (
        SELECT doc_id, n_words,
               CAST(greatest(pos - 1, 0) AS BIGINT) AS s,
               CAST(least(pos + 1, n_words - 1) AS BIGINT) AS e
        FROM toks
        WHERE w IN ({", ".join(f"'{w}'" for w in _SPAN_LEXICON)})
    ), flagged AS (
        SELECT doc_id, n_words, s, e,
               CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        >= s - 1
                    THEN 0 ELSE 1 END AS is_new
        FROM hits
    ), islands AS (
        SELECT doc_id, n_words, s, e,
               sum(is_new) OVER (PARTITION BY doc_id ORDER BY s, e
                   ROWS UNBOUNDED PRECEDING) AS island
        FROM flagged
    ), spans AS (
        SELECT doc_id, CAST(island AS BIGINT) AS span_id,
               min(s) AS ss, max(e) AS se, max(n_words) AS n_words
        FROM islands GROUP BY 1, 2
    ), grid AS (
        SELECT *,
               CASE WHEN n_words <= {_STRIDE_W} THEN 1
                    ELSE CAST(ceil((n_words - {_STRIDE_W})
                              / {_STRIDE_S}.0) AS BIGINT) + 1 END AS nc,
               (greatest(se - {_STRIDE_W} + 1, 0) + {_STRIDE_S} - 1)
                   // {_STRIDE_S} AS i_min,
               ss // {_STRIDE_S} AS i_max_raw
        FROM spans
    )
    SELECT doc_id, span_id,
           CAST(ss AS BIGINT) AS span_start,
           CAST(se AS BIGINT) AS span_end,
           CASE WHEN i_min <= least(i_max_raw, nc - 1)
                THEN CAST(i_min AS INT) END AS chunk_id,
           i_min <= least(i_max_raw, nc - 1) AS contained
    FROM grid
"""


@register(
    "x156_span_to_chunk_alignment",
    "Label-to-chunk alignment — the step that decides whether a "
    "training annotation SURVIVES chunking: every merged lexicon span "
    "(x99's islands, end-clamped to the document) is assigned to the "
    "x154 stride grid (W = 32, S = 24) by CLOSED-FORM arithmetic — "
    "the earliest chunk fully containing it is i_min = "
    "ceil((end - W + 1)/S) when that does not exceed both start DIV S "
    "and the chunk count — so alignment costs a projection, not an "
    "interval join (the grid is arithmetic, not data; compare j12, "
    "where both sides are data and bucketing IS the join). Spans "
    "longer than the W - S overlap can straddle every cut: those "
    "emit contained = false with a NULL chunk — the rows a training "
    "pipeline must route to a re-chunk or drop path, not silently "
    "keep. The ceil is written (x + S - 1) DIV S on a "
    "greatest(..., 0)-guarded numerator because Spark DIV truncates "
    "toward zero while DuckDB // floors — identical only on "
    "non-negative operands (the cross-dialect trap the guard "
    "removes).",
    oracle=_SPAN_ALIGN_ORACLE,
    tags=("ext", "spans", "chunking", "alignment"),
)
def x156_span_to_chunk_alignment(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as _Wd

    W, S = _STRIDE_W, _STRIDE_S
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.lower("text"), r"\s+")).alias("n_words"),
        F.posexplode(F.split(F.lower("text"), r"\s+")).alias("pos", "w"),
    )
    hits = toks.filter(F.col("w").isin(*_SPAN_LEXICON)).select(
        "doc_id",
        "n_words",
        F.greatest(F.col("pos") - 1, F.lit(0)).cast("long").alias("s"),
        F.least(F.col("pos") + 1, F.col("n_words") - 1)
        .cast("long")
        .alias("e"),
    )
    w_order = _Wd.partitionBy("doc_id").orderBy("s", "e")
    prior_max_e = F.max("e").over(
        w_order.rowsBetween(_Wd.unboundedPreceding, -1)
    )
    flagged = hits.withColumn(
        "is_new",
        F.when(prior_max_e >= F.col("s") - 1, F.lit(0)).otherwise(F.lit(1)),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("is_new").over(w_order.rowsBetween(_Wd.unboundedPreceding, 0)),
    )
    spans = islands.groupBy("doc_id", F.col("island").alias("span_id")).agg(
        F.min("s").alias("ss"),
        F.max("e").alias("se"),
        F.max("n_words").alias("n_words"),
    )
    grid = (
        spans.withColumn(
            "nc",
            F.when(F.col("n_words") <= W, F.lit(1).cast("long")).otherwise(
                F.ceil((F.col("n_words") - W) / float(S)).cast("long") + 1
            ),
        )
        .withColumn(
            "i_min",
            F.expr(f"(greatest(se - {W} + 1, 0) + {S} - 1) DIV {S}"),
        )
        .withColumn("i_max", F.least(F.expr(f"ss DIV {S}"), F.col("nc") - 1))
    )
    contained = F.col("i_min") <= F.col("i_max")
    return grid.select(
        "doc_id",
        F.col("span_id").cast("long").alias("span_id"),
        F.col("ss").cast("long").alias("span_start"),
        F.col("se").cast("long").alias("span_end"),
        F.when(contained, F.col("i_min").cast("int")).alias("chunk_id"),
        contained.alias("contained"),
    )


_LPT_ORACLE = """
    WITH RECURSIVE d AS (
        SELECT source, doc_id, CAST(n_chars AS BIGINT) AS w,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS pos
        FROM documents
    ), n AS (
        SELECT source, max(pos) AS np FROM d GROUP BY source
    ), walk AS (
        SELECT source, 0 AS pos,
               CAST(0 AS BIGINT) AS l0, CAST(0 AS BIGINT) AS l1,
               CAST(0 AS BIGINT) AS l2, CAST(0 AS BIGINT) AS l3,
               CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS INT) AS bin
        FROM n
        UNION ALL
        SELECT w.source, w.pos + 1,
               w.l0 + CASE WHEN least(w.l0, w.l1, w.l2, w.l3) = w.l0
                           THEN d.w ELSE 0 END,
               w.l1 + CASE WHEN least(w.l0, w.l1, w.l2, w.l3) <> w.l0
                            AND least(w.l0, w.l1, w.l2, w.l3) = w.l1
                           THEN d.w ELSE 0 END,
               w.l2 + CASE WHEN least(w.l0, w.l1, w.l2, w.l3) NOT IN (w.l0, w.l1)
                            AND least(w.l0, w.l1, w.l2, w.l3) = w.l2
                           THEN d.w ELSE 0 END,
               w.l3 + CASE WHEN least(w.l0, w.l1, w.l2, w.l3) NOT IN (w.l0, w.l1, w.l2)
                           THEN d.w ELSE 0 END,
               d.doc_id,
               CASE WHEN least(w.l0, w.l1, w.l2, w.l3) = w.l0 THEN 0
                    WHEN least(w.l0, w.l1, w.l2, w.l3) = w.l1 THEN 1
                    WHEN least(w.l0, w.l1, w.l2, w.l3) = w.l2 THEN 2
                    ELSE 3 END
        FROM walk w
        JOIN d ON d.source = w.source AND d.pos = w.pos + 1
    )
    SELECT source, doc_id, CAST(bin AS INT) AS assigned_bin
    FROM walk WHERE pos >= 1
"""


@register(
    "x157_lpt_shard_balancing",
    "LPT (longest-processing-time-first) shard balancing: per source, "
    "documents sorted by descending size are greedily assigned to the "
    "least-loaded of 4 bins (ties to the lowest bin id) — the "
    "classic 4/3-approximation for makespan that turns heterogeneous "
    "document sizes into near-equal training shards, where x82's "
    "layout packs by order and x41 by capacity (neither BALANCES "
    "loads). Greedy least-loaded is inherently sequential state — "
    "every assignment depends on all prior loads — so it joins the "
    "fold family: per-source sort_array + one F.aggregate with a "
    "(4 loads, assignments) struct accumulator, fold arrays bounded "
    "by docs-per-source and sources folding in parallel (the honest "
    "scale frame: balancing is per-shard-group, never a global "
    "sequential pass). The oracle replays the walk as a recursive "
    "CTE emitting each step's assignment — the argmin CASE evaluated "
    "on the PREVIOUS loads, exactly as the fold does.",
    oracle=_LPT_ORACLE,
    tags=("ext", "sharding", "lpt", "stateful-fold"),
)
def x157_lpt_shard_balancing(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    steps = docs.groupBy("source").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("n_chars")).cast("long").alias("negw"),
                    F.col("doc_id").cast("long").alias("doc_id"),
                    F.col("n_chars").cast("long").alias("w"),
                )
            )
        ).alias("steps")
    )
    init = F.expr(
        "named_struct("
        "'l0', CAST(0 AS BIGINT), 'l1', CAST(0 AS BIGINT), "
        "'l2', CAST(0 AS BIGINT), 'l3', CAST(0 AS BIGINT), "
        "'assigns', CAST(array() AS ARRAY<STRUCT<doc_id: BIGINT, bin: INT>>))"
    )

    def step(acc, s):
        m = F.least(acc["l0"], acc["l1"], acc["l2"], acc["l3"])
        b = (
            F.when(acc["l0"] == m, 0)
            .when(acc["l1"] == m, 1)
            .when(acc["l2"] == m, 2)
            .otherwise(3)
        )
        add = lambda i, l: (  # noqa: E731
            l + F.when(b == i, s["w"]).otherwise(F.lit(0).cast("long"))
        ).alias(f"l{i}")
        return F.struct(
            add(0, acc["l0"]),
            add(1, acc["l1"]),
            add(2, acc["l2"]),
            add(3, acc["l3"]),
            F.concat(
                acc["assigns"],
                F.array(
                    F.struct(
                        s["doc_id"].alias("doc_id"),
                        b.cast("int").alias("bin"),
                    )
                ),
            ).alias("assigns"),
        )

    folded = steps.select(
        "source", F.aggregate("steps", init, step).alias("st")
    )
    return folded.select(
        "source", F.explode("st.assigns").alias("a")
    ).select(
        "source",
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.bin").alias("assigned_bin"),
    )


_RUNS_TEST_ORACLE = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS c
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ), diffs AS (
        SELECT day, c - lag(c) OVER (ORDER BY day) AS d
        FROM daily
    ), signs AS (
        SELECT day, CASE WHEN d > 0 THEN 1 ELSE -1 END AS sg
        FROM diffs WHERE d IS NOT NULL AND d <> 0
    ), flips AS (
        SELECT sg, CASE WHEN lag(sg) OVER (ORDER BY day) IS NULL
                         OR lag(sg) OVER (ORDER BY day) <> sg
                        THEN 1 ELSE 0 END AS new_run
        FROM signs
    ), agg AS (
        SELECT count(*) FILTER (WHERE sg = 1) AS np,
               count(*) FILTER (WHERE sg = -1) AS nm,
               sum(new_run) AS n_runs
        FROM flips
    )
    SELECT CAST(np AS BIGINT) AS n_plus,
           CAST(nm AS BIGINT) AS n_minus,
           CAST(n_runs AS BIGINT) AS n_runs,
           CAST(2 * np * nm + (np + nm) AS BIGINT) AS e_runs_num,
           CAST(np + nm AS BIGINT) AS e_runs_den,
           CAST(2 * np * nm * (2 * np * nm - (np + nm)) AS BIGINT)
               AS var_runs_num,
           CAST((np + nm) * (np + nm) * (np + nm - 1) AS BIGINT)
               AS var_runs_den
    FROM agg
"""


@register(
    "a19_runs_test",
    "Wald-Wolfowitz runs test on the day-over-day direction of the "
    "purchase series — the randomness check that catches what neither "
    "a16's slope nor a18's acf states directly: too FEW runs means "
    "trending/sticky days, too MANY means oscillation. Tie days drop "
    "(the standard up-down convention), the run count is a lag-based "
    "flip count over the tie-filtered sign sequence, and the null-"
    "hypothesis moments are emitted as EXACT RATIONALS — "
    "E[R] = (2 n+ n- + n)/n and Var[R] = 2 n+ n-(2 n+ n- - n) / "
    "(n^2 (n-1)) as integer num/den pairs — so the entire test "
    "surface is integers (the a15 KS discipline: no libm, no "
    "floats). Windows run over the |days| pre-aggregate only.",
    oracle=_RUNS_TEST_ORACLE,
    tags=("analytics", "runs-test", "randomness", "exact-stats"),
)
def a19_runs_test(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    wd = Window.orderBy("day")
    diffs = daily.withColumn("d", F.col("c") - F.lag("c").over(wd))
    signs = diffs.filter(
        F.col("d").isNotNull() & (F.col("d") != 0)
    ).select("day", F.when(F.col("d") > 0, 1).otherwise(-1).alias("sg"))
    flips = signs.withColumn(
        "new_run",
        F.when(
            F.lag("sg").over(wd).isNull()
            | (F.lag("sg").over(wd) != F.col("sg")),
            1,
        ).otherwise(0),
    )
    # count(when), not sum(when/otherwise 0): on an EMPTY series the
    # oracle's count(*) FILTER reads 0 while sum over zero rows is NULL
    # (empty-input parity, round 10); identical on any non-empty input
    agg = flips.agg(
        F.count(F.when(F.col("sg") == 1, 1)).alias("np"),
        F.count(F.when(F.col("sg") == -1, 1)).alias("nm"),
        F.sum("new_run").alias("n_runs"),
    )
    n = F.col("np") + F.col("nm")
    tp = 2 * F.col("np") * F.col("nm")
    return agg.select(
        F.col("np").cast("long").alias("n_plus"),
        F.col("nm").cast("long").alias("n_minus"),
        F.col("n_runs").cast("long").alias("n_runs"),
        (tp + n).cast("long").alias("e_runs_num"),
        n.cast("long").alias("e_runs_den"),
        (tp * (tp - n)).cast("long").alias("var_runs_num"),
        (n * n * (n - 1)).cast("long").alias("var_runs_den"),
    )


_HH_DISCOVERY_ORACLE = f"""
    WITH tok AS (
        SELECT word, {SQL_H.format(s='word')} AS h FROM (
            SELECT unnest({SQL_WORDS.format(t='text')}) AS word
            FROM documents
        ) WHERE word <> ''
    ), total AS (SELECT count(*) AS n_tok FROM tok),
    cells AS (
        {_CMS_CELLS_SQL}
    ), vocab AS (
        SELECT DISTINCT word, h FROM tok
    ), est AS (
        SELECT v.word, min(c.cell_cnt) AS cms_est
        FROM (
            {" UNION ALL ".join(
                f"SELECT word, {j} AS r, ((h * {a} + {b}) % {X.MINHASH_PRIME})"
                f" % {CMS_WIDTH} AS bkt FROM vocab"
                for j, (a, b) in enumerate(CMS_COEFFS)
            )}
        ) v
        JOIN cells c ON c.r = v.r AND c.bkt = v.bkt
        GROUP BY 1
    ), cand AS (
        SELECT word, cms_est FROM est, total
        WHERE cms_est >= n_tok // 100
    ), verified AS (
        SELECT c.word, c.cms_est, count(*) AS exact_cnt
        FROM cand c JOIN tok t ON t.word = c.word
        GROUP BY 1, 2
    )
    SELECT v.word AS term,
           CAST(v.cms_est AS BIGINT) AS cms_est,
           CAST(v.exact_cnt AS BIGINT) AS exact_cnt,
           v.exact_cnt >= t.n_tok // 100 AS is_heavy,
           v.exact_cnt < t.n_tok // 100 AS false_positive
    FROM verified v, total t
"""


@register(
    "x158_heavy_hitter_discovery",
    "Sketch-then-verify heavy-hitter DISCOVERY — the production "
    "direction of x137 (which certified exact -> sketch; this goes "
    "sketch -> exact): every distinct term is priced through the "
    "256-cell count-min sketch, only terms whose ESTIMATE clears the "
    "1%-of-stream threshold (scale-free, integer DIV) graduate to "
    "exact verification, and the exact pass counts ONLY those "
    "candidates through a semi-joined recount. Because CMS never "
    "undercounts, no true heavy hitter can be screened out — the "
    "candidate set is a guaranteed superset, and the output's "
    "false_positive column is exactly the sketch collisions the "
    "verify pass exists to remove. At 100 TB the economics are the "
    "point: the sketch pass is mergeable map-side state, the probe "
    "runs per DISTINCT term (vocab-sized, not stream-sized), and the "
    "expensive exact aggregation touches only the handful of "
    "candidates instead of every term.",
    oracle=_HH_DISCOVERY_ORACLE,
    tags=("ext", "sketch", "heavy-hitters", "verify"),
)
def x158_heavy_hitter_discovery(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    tok = (
        docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
    )
    total = tok.agg(F.count(F.lit(1)).alias("n_tok"))

    def rows_for(h):
        return F.array(
            *[
                F.struct(
                    F.lit(j).cast("int").alias("r"),
                    (
                        ((h * F.lit(a) + F.lit(b)) % F.lit(X.MINHASH_PRIME))
                        % F.lit(CMS_WIDTH)
                    )
                    .cast("long")
                    .alias("bkt"),
                )
                for j, (a, b) in enumerate(CMS_COEFFS)
            ]
        )

    cells = (
        tok.select(F.explode(rows_for(X.base_hash(F.col("word")))).alias("rb"))
        .select(F.col("rb.r").alias("r"), F.col("rb.bkt").alias("bkt"))
        .groupBy("r", "bkt")
        .agg(F.count(F.lit(1)).cast("long").alias("cell_cnt"))
    )
    vocab = tok.distinct()
    est = (
        vocab.select(
            "word", F.explode(rows_for(X.base_hash(F.col("word")))).alias("rb")
        )
        .select("word", F.col("rb.r").alias("r"), F.col("rb.bkt").alias("bkt"))
        .join(F.broadcast(cells), ["r", "bkt"])
        .groupBy("word")
        .agg(F.min("cell_cnt").alias("cms_est"))
    )
    cand = est.crossJoin(F.broadcast(total)).filter(
        F.expr("cms_est >= n_tok DIV 100")
    )
    verified = (
        tok.join(F.broadcast(cand.select("word")), "word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    )
    return (
        cand.join(verified, "word")
        .select(
            F.col("word").alias("term"),
            F.col("cms_est").cast("long").alias("cms_est"),
            "exact_cnt",
            F.expr("exact_cnt >= n_tok DIV 100").alias("is_heavy"),
            F.expr("exact_cnt < n_tok DIV 100").alias("false_positive"),
        )
    )


_CUPED_ORACLE = f"""
    WITH anchor AS (
        SELECT min(CAST(ts AS DATE)) AS d0 FROM events
    ), per_user AS (
        SELECT user_id,
               {SQL_H.format(s='CAST(user_id AS VARCHAR)')} % 2 AS arm,
               sum(CASE WHEN CAST(ts AS DATE) < d0 + 15
                        THEN CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS pre_cents,
               sum(CASE WHEN CAST(ts AS DATE) >= d0 + 15
                        THEN CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS post_cents
        FROM events, anchor
        WHERE value IS NOT NULL
        GROUP BY 1, 2
    ), mo AS (
        SELECT count(*) AS n,
               sum(pre_cents) AS sx, sum(post_cents) AS sy,
               sum(pre_cents * pre_cents) AS sxx,
               sum(pre_cents * post_cents) AS sxy,
               sum(post_cents * post_cents) AS syy,
               sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
               sum(CASE WHEN arm = 0 THEN pre_cents ELSE 0 END) AS sx0,
               sum(CASE WHEN arm = 0 THEN post_cents ELSE 0 END) AS sy0,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN arm = 1 THEN pre_cents ELSE 0 END) AS sx1,
               sum(CASE WHEN arm = 1 THEN post_cents ELSE 0 END) AS sy1
        FROM per_user
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
           CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS mean_a_raw,
           CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_b_raw,
           CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)
           - (CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE))
             * (CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
               AS mean_a_cuped,
           CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
           - (CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE))
             * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
               AS mean_b_cuped,
           (CAST(n * sxy - sx * sy AS DOUBLE)
            * CAST(n * sxy - sx * sy AS DOUBLE))
           / (CAST(n * sxx - sx * sx AS DOUBLE)
              * CAST(n * syy - sy * sy AS DOUBLE)) AS var_reduction
    FROM mo
"""


@register(
    "x159_cuped_adjustment",
    "CUPED variance reduction for the A/B readout (the Deng et al. "
    "technique every experimentation platform ships): each user's "
    "post-period spend is adjusted by theta * (pre-period spend - "
    "grand pre-mean), where theta = cov(pre, post)/var(pre), shrinking "
    "arm-mean variance by exactly the pre/post correlation-squared "
    "(reported as var_reduction = rho^2) without biasing the "
    "treatment contrast — the pre-period covariate is assignment-"
    "independent by construction (md5 arms, the x152 split). Spend "
    "lives in half-up integer CENTS so every moment (Sx, Sy, Sxx, "
    "Sxy, Syy, per-arm slices) accumulates as exact order-free int64 "
    "— the trick that makes a covariance-based estimator hash-"
    "verifiable where double sums never replay — and theta plus the "
    "adjusted means close in fixed character-identical IEEE shapes. "
    "One grouped pass over events, one 12-moment aggregate; output "
    "is one row at any volume.",
    oracle=_CUPED_ORACLE,
    tags=("ext", "ab-test", "cuped", "variance-reduction"),
)
def x159_cuped_adjustment(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    anchor = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    cents = F.floor(fin("value") * 100 + 0.5).cast("long")
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy(
            "user_id",
            (X.base_hash(F.col("user_id").cast("string")) % 2).alias("arm"),
        )
        .agg(
            F.sum(
                F.when(
                    F.to_date("ts") < F.date_add(F.col("d0"), 15), cents
                ).otherwise(F.lit(0).cast("long"))
            ).alias("pre_cents"),
            F.sum(
                F.when(
                    F.to_date("ts") >= F.date_add(F.col("d0"), 15), cents
                ).otherwise(F.lit(0).cast("long"))
            ).alias("post_cents"),
        )
    )
    arm0 = F.when(F.col("arm") == 0, 1).otherwise(0)
    arm1 = F.when(F.col("arm") == 1, 1).otherwise(0)
    mo = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre_cents").alias("sx"),
        F.sum("post_cents").alias("sy"),
        F.sum(F.col("pre_cents") * F.col("pre_cents")).alias("sxx"),
        F.sum(F.col("pre_cents") * F.col("post_cents")).alias("sxy"),
        F.sum(F.col("post_cents") * F.col("post_cents")).alias("syy"),
        F.sum(arm0).alias("n0"),
        F.sum(arm0 * F.col("pre_cents")).alias("sx0"),
        F.sum(arm0 * F.col("post_cents")).alias("sy0"),
        F.sum(arm1).alias("n1"),
        F.sum(arm1 * F.col("pre_cents")).alias("sx1"),
        F.sum(arm1 * F.col("post_cents")).alias("sy1"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cov_n = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    varx_n = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vary_n = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    theta = cov_n / varx_n
    gx = d("sx") / d("n")

    def cuped(sy_a, n_a, sx_a):
        return d(sy_a) / d(n_a) - theta * (d(sx_a) / d(n_a) - gx)

    return mo.select(
        F.col("n").cast("long").alias("n_users"),
        theta.alias("theta"),
        (d("sy0") / d("n0")).alias("mean_a_raw"),
        (d("sy1") / d("n1")).alias("mean_b_raw"),
        cuped("sy0", "n0", "sx0").alias("mean_a_cuped"),
        cuped("sy1", "n1", "sx1").alias("mean_b_cuped"),
        ((cov_n * cov_n) / (varx_n * vary_n)).alias("var_reduction"),
    )


_BACKTEST_ORACLE = """
    WITH RECURSIVE d AS (
        SELECT event_type, day,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY day) AS pos,
               x
        FROM (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END AS DECIMAL(28,6))) AS DOUBLE) AS x
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        )
    ), n AS (
        SELECT event_type, max(pos) AS n_days FROM d GROUP BY event_type
    ), walk AS (
        SELECT event_type, 0 AS pos, CAST(NULL AS DATE) AS day,
               CAST(0 AS DOUBLE) AS lvl, CAST(0 AS DOUBLE) AS trd,
               CAST(NULL AS DOUBLE) AS actual,
               CAST(NULL AS DOUBLE) AS forecast
        FROM n
        UNION ALL
        SELECT w.event_type, w.pos + 1, d.day,
               CASE WHEN w.pos = 0 THEN d.x
                    ELSE (d.x + w.lvl + w.trd) * 0.5 END,
               CASE WHEN w.pos = 0 THEN CAST(0 AS DOUBLE)
                    ELSE ((CASE WHEN w.pos = 0 THEN d.x
                                ELSE (d.x + w.lvl + w.trd) * 0.5 END
                           - w.lvl) + w.trd) * 0.5 END,
               d.x,
               CASE WHEN w.pos = 0 THEN CAST(NULL AS DOUBLE)
                    ELSE w.lvl + w.trd END
        FROM walk w
        JOIN d ON d.event_type = w.event_type AND d.pos = w.pos + 1
    )
    SELECT event_type,
           strftime(day, '%Y-%m-%d') AS day,
           actual, forecast,
           abs(actual - forecast) AS abs_err
    FROM walk WHERE pos >= 2
"""


@register(
    "w20_forecast_backtest",
    "Rolling-origin backtest of the w19 Holt forecaster — the "
    "evaluation HALF of forecasting that the smoother alone omits: "
    "for every day from the second onward, the one-step-ahead "
    "prediction (level + trend of the state BEFORE that day's "
    "observation arrives — strict temporal hygiene, no peeking) is "
    "compared to the actual daily total, emitting the per-day error "
    "series a capacity planner inspects before trusting the model. "
    "Same fold machinery as w19 with the accumulator additionally "
    "carrying the emitted (day, actual, forecast) rows — per-key "
    "bounded by |days|, folds parallel across event types — and the "
    "oracle's recursive walk computes each forecast from the "
    "PREVIOUS state exactly as the fold does. Dyadic coefficients "
    "keep every emitted double bit-identical.",
    oracle=_BACKTEST_ORACLE,
    tags=("window", "stateful-fold", "backtest", "forecast"),
)
def w20_forecast_backtest(spark: SparkSession, sf: str) -> DataFrame:
    from ..compat import exact_sum

    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(exact_sum("value").cast("double").alias("x"))
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("steps")
    )
    init = F.expr(
        "named_struct("
        "'n', CAST(0 AS INT), 'lvl', CAST(0 AS DOUBLE), "
        "'trd', CAST(0 AS DOUBLE), "
        "'rows', CAST(array() AS "
        "ARRAY<STRUCT<day: DATE, actual: DOUBLE, forecast: DOUBLE>>))"
    )

    def step(acc, s):
        fc = acc["lvl"] + acc["trd"]
        lvl = F.when(acc["n"] == 0, s["x"]).otherwise(
            (s["x"] + acc["lvl"] + acc["trd"]) * F.lit(0.5)
        )
        emitted = F.when(
            acc["n"] >= 1,
            F.concat(
                acc["rows"],
                F.array(
                    F.struct(
                        s["day"].alias("day"),
                        s["x"].alias("actual"),
                        fc.alias("forecast"),
                    )
                ),
            ),
        ).otherwise(acc["rows"])
        return F.struct(
            (acc["n"] + 1).alias("n"),
            lvl.alias("lvl"),
            F.when(acc["n"] == 0, F.lit(0.0))
            .otherwise(((lvl - acc["lvl"]) + acc["trd"]) * F.lit(0.5))
            .alias("trd"),
            emitted.alias("rows"),
        )

    folded = series.select(
        "event_type", F.aggregate("steps", init, step).alias("st")
    )
    return folded.select(
        "event_type", F.explode("st.rows").alias("r")
    ).select(
        "event_type",
        F.date_format("r.day", "yyyy-MM-dd").alias("day"),
        F.col("r.actual").alias("actual"),
        F.col("r.forecast").alias("forecast"),
        F.abs(F.col("r.actual") - F.col("r.forecast")).alias("abs_err"),
    )


_RECALL_THRESHOLDS_PPM = (300000, 400000, 500000, 600000, 700000, 800000)

_RECALL_CURVE_ORACLE = f"""
    WITH docs AS (
        SELECT doc_id, {sql_shingles('text')} AS shs
        FROM documents
    ), sh AS (
        SELECT doc_id, unnest(shs) AS s FROM docs
    ), rare AS (
        SELECT s FROM sh GROUP BY s HAVING count(*) <= {X.MAX_SHINGLE_DF}
    ), cand0 AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        WHERE a.s IN (SELECT s FROM rare)
    ), scored AS (
        SELECT doc_a, doc_b,
               CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE)
               / (len(x.shs) + len(y.shs) - len(list_intersect(x.shs, y.shs)))
                   AS jaccard
        FROM cand0
        JOIN docs x ON cand0.doc_a = x.doc_id
        JOIN docs y ON cand0.doc_b = y.doc_id
    ), exact AS (
        SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.3
    ), lsh AS (
        SELECT doc_a, doc_b, 1 AS is_cand FROM ({_LSH_ORACLE})
    ), flagged AS (
        SELECT e.jaccard, coalesce(l.is_cand, 0) AS is_cand
        FROM exact e LEFT JOIN lsh l USING (doc_a, doc_b)
    )
    SELECT CAST(t AS BIGINT) AS threshold_ppm,
           CAST(count(*) FILTER (WHERE jaccard * 1000000 >= t)
                AS BIGINT) AS n_true_pairs,
           CAST(count(*) FILTER (WHERE jaccard * 1000000 >= t
                                   AND is_cand = 1)
                AS BIGINT) AS n_recalled,
           CAST(CASE WHEN count(*) FILTER (WHERE jaccard * 1000000 >= t) > 0
                     THEN count(*) FILTER (WHERE jaccard * 1000000 >= t
                                             AND is_cand = 1) * 1000000
                          // count(*) FILTER (WHERE jaccard * 1000000 >= t)
                END AS BIGINT) AS recall_ppm
    FROM flagged,
         (SELECT unnest([{", ".join(str(t) for t in _RECALL_THRESHOLDS_PPM)}])
             AS t)
    GROUP BY 1
"""


@register(
    "x160_lsh_recall_curve",
    "LSH recall CURVE — x65's single 0.5-threshold recall extended "
    "across the 0.3-0.8 similarity range in one pass: exact blocked "
    "Jaccard pairs down to 0.3 are flagged against the fixed LSH "
    "candidate set, a 6-point threshold spine explodes over the "
    "flagged pairs, and each point reports true pairs, recalled "
    "pairs, and exact-ppm recall — the S-curve every b x r banding "
    "choice implies, measured rather than assumed, which is how the "
    "banding parameters get TUNED before a 100 TB dedup run (recall "
    "rises with threshold; the curve shows where it crosses the "
    "acceptable floor). Thresholds compare as jaccard * 1e6 >= "
    "integer ppm so no float literal parsing is ever trusted; the "
    "pair table is computed ONCE and the spine fan-out is 6x a "
    "pair-count-sized frame, not a re-scoring.",
    oracle=_RECALL_CURVE_ORACLE,
    tags=("ext", "dedup", "lsh", "evaluation", "tuning"),
)
def x160_lsh_recall_curve(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    exact = X.jaccard_near_dup_pairs(docs, threshold=0.3).select(
        "doc_a", "doc_b", "jaccard"
    )
    cand = X.lsh_candidate_pairs(docs).select(
        "doc_a", "doc_b", F.lit(1).alias("is_cand")
    )
    flagged = exact.join(cand, ["doc_a", "doc_b"], "left").select(
        "jaccard", F.coalesce("is_cand", F.lit(0)).alias("is_cand")
    )
    spine = docs.sparkSession.createDataFrame(
        [(t,) for t in _RECALL_THRESHOLDS_PPM], "t long"
    )
    # conditional aggregation (not filter-then-group) so a threshold
    # with ZERO qualifying pairs still emits its zero row — the oracle's
    # FILTER-clause counts behave the same way
    hit = F.col("jaccard") * 1000000 >= F.col("t")
    fanned = flagged.crossJoin(F.broadcast(spine))
    return fanned.groupBy(F.col("t").alias("threshold_ppm")).agg(
        F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_true_pairs"),
        F.sum(F.when(hit, F.col("is_cand")).otherwise(0))
        .cast("long")
        .alias("n_recalled"),
        F.expr(
            "CAST(CASE WHEN sum(CASE WHEN jaccard * 1000000 >= t "
            "THEN 1 ELSE 0 END) > 0 THEN "
            "sum(CASE WHEN jaccard * 1000000 >= t THEN is_cand ELSE 0 END) "
            "* 1000000 DIV sum(CASE WHEN jaccard * 1000000 >= t "
            "THEN 1 ELSE 0 END) END AS BIGINT)"
        ).alias("recall_ppm"),
    )


_DID_ORACLE = f"""
    WITH anchor AS (
        SELECT min(CAST(ts AS DATE)) AS d0 FROM events
    ), per_user AS (
        SELECT user_id,
               {SQL_H.format(s='CAST(user_id AS VARCHAR)')} % 2 AS arm,
               sum(CASE WHEN CAST(ts AS DATE) < d0 + 15
                        THEN CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS pre_cents,
               sum(CASE WHEN CAST(ts AS DATE) >= d0 + 15
                        THEN CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS post_cents
        FROM events, anchor
        WHERE value IS NOT NULL
        GROUP BY 1, 2
    ), mo AS (
        SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
               sum(CASE WHEN arm = 0 THEN pre_cents ELSE 0 END) AS pre0,
               sum(CASE WHEN arm = 0 THEN post_cents ELSE 0 END) AS post0,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN arm = 1 THEN pre_cents ELSE 0 END) AS pre1,
               sum(CASE WHEN arm = 1 THEN post_cents ELSE 0 END) AS post1
        FROM per_user
    )
    SELECT CAST(n0 AS BIGINT) AS n_a, CAST(n1 AS BIGINT) AS n_b,
           CAST(pre0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS mean_a_pre,
           CAST(post0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS mean_a_post,
           CAST(pre1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_b_pre,
           CAST(post1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_b_post,
           (CAST(post1 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(pre1 AS DOUBLE) / CAST(n1 AS DOUBLE))
           - (CAST(post0 AS DOUBLE) / CAST(n0 AS DOUBLE)
              - CAST(pre0 AS DOUBLE) / CAST(n0 AS DOUBLE)) AS did_estimate
    FROM mo
"""


@register(
    "x161_difference_in_differences",
    "Difference-in-differences — the quasi-experimental estimator for "
    "when randomization can't be trusted (rollouts, geo launches): "
    "the treatment effect is arm B's pre-to-post change MINUS arm "
    "A's, so any shared time shock (seasonality, a site-wide "
    "incident) cancels instead of biasing the contrast — the "
    "parallel-trends complement to x152's randomized z-test and "
    "x159's CUPED (x159 reduces variance under randomization; DiD "
    "removes common-trend BIAS without it). Same exact-cents "
    "discipline: six per-arm/per-period int64 moments from one "
    "grouped pass, four means and the DiD close in fixed character-"
    "identical IEEE shapes; one output row at any event volume.",
    oracle=_DID_ORACLE,
    tags=("ext", "ab-test", "did", "causal"),
)
def x161_difference_in_differences(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    anchor = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    cents = F.floor(fin("value") * 100 + 0.5).cast("long")
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy(
            "user_id",
            (X.base_hash(F.col("user_id").cast("string")) % 2).alias("arm"),
        )
        .agg(
            F.sum(
                F.when(
                    F.to_date("ts") < F.date_add(F.col("d0"), 15), cents
                ).otherwise(F.lit(0).cast("long"))
            ).alias("pre_cents"),
            F.sum(
                F.when(
                    F.to_date("ts") >= F.date_add(F.col("d0"), 15), cents
                ).otherwise(F.lit(0).cast("long"))
            ).alias("post_cents"),
        )
    )
    a0 = F.when(F.col("arm") == 0, 1).otherwise(0)
    a1 = F.when(F.col("arm") == 1, 1).otherwise(0)
    mo = per_user.agg(
        F.sum(a0).alias("n0"),
        F.sum(a0 * F.col("pre_cents")).alias("pre0"),
        F.sum(a0 * F.col("post_cents")).alias("post0"),
        F.sum(a1).alias("n1"),
        F.sum(a1 * F.col("pre_cents")).alias("pre1"),
        F.sum(a1 * F.col("post_cents")).alias("post1"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return mo.select(
        F.col("n0").cast("long").alias("n_a"),
        F.col("n1").cast("long").alias("n_b"),
        (d("pre0") / d("n0")).alias("mean_a_pre"),
        (d("post0") / d("n0")).alias("mean_a_post"),
        (d("pre1") / d("n1")).alias("mean_b_pre"),
        (d("post1") / d("n1")).alias("mean_b_post"),
        (
            (d("post1") / d("n1") - d("pre1") / d("n1"))
            - (d("post0") / d("n0") - d("pre0") / d("n0"))
        ).alias("did_estimate"),
    )


# NDCG position discounts 1/log2(i+1), i = 1..10, pre-baked as double
# literals (the Benford/x140 pattern: no libm at query time — both
# engines parse the same decimal literal to the same double).
NDCG_DISCOUNTS = (
    "1.0", "0.6309297535714575", "0.5", "0.43067655807339306",
    "0.38685280723454163", "0.3562071871080222", "0.3333333333333333",
    "0.31546487678572877", "0.3010299956639812", "0.2890648263178879",
)

# the e0 suffix forces DuckDB to PARSE each literal as DOUBLE
# (correctly rounded): a bare decimal literal parses as DECIMAL and
# converts via int128 / 10^scale, which is NOT correctly rounded —
# measured one ULP off Spark's strtod on these very constants, even
# under an explicit CAST(... AS DOUBLE)
_NDCG_DISC_SQL = "[" + ", ".join(f"{d}e0" for d in NDCG_DISCOUNTS) + "]"
_NDCG_PAD_SQL = "[" + ", ".join(["CAST(0 AS DOUBLE)"] * 10) + "]"


def _sql_dcg(glist: str) -> str:
    padded = f"(({glist}) || {_NDCG_PAD_SQL})[1:10]"
    return (
        f"list_reduce(list_transform(list_zip({padded}, {_NDCG_DISC_SQL}), "
        f"z -> z[1] * z[2]), (a, x) -> a + x)"
    )


_NDCG_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ), p AS (
        SELECT vec_id AS probe_id, v AS pv FROM c WHERE vec_id < 8
    ), semk AS (
        SELECT probe_id, doc_id, rnk FROM (
            SELECT probe_id, vec_id AS doc_id,
                   row_number() OVER (
                       PARTITION BY probe_id
                       ORDER BY {sql_cosine('pv', 'v')} DESC, vec_id
                   ) AS rnk
            FROM p JOIN c ON c.vec_id <> p.probe_id
        ) WHERE rnk <= 10
    ), dsh AS (
        SELECT doc_id, {sql_shingles('text')} AS sh FROM documents
    ), psh AS (
        SELECT doc_id AS probe_id, sh AS ps FROM dsh WHERE doc_id < 8
    ), gains AS (
        SELECT p.probe_id, d.doc_id,
               len(list_intersect(p.ps, d.sh)) * 1000000
               // (len(p.ps) + len(d.sh) - len(list_intersect(p.ps, d.sh)))
                   AS gain_ppm
        FROM psh p JOIN dsh d ON d.doc_id <> p.probe_id
            AND len(list_intersect(p.ps, d.sh)) > 0
    ), sys_lists AS (
        SELECT s.probe_id,
               list(CAST(coalesce(g.gain_ppm, 0) AS DOUBLE)
                    ORDER BY s.rnk) AS gl
        FROM semk s
        LEFT JOIN gains g ON g.probe_id = s.probe_id
                         AND g.doc_id = s.doc_id
        GROUP BY 1
    ), ideal_lists AS (
        SELECT probe_id,
               list(CAST(gain_ppm AS DOUBLE)
                    ORDER BY gain_ppm DESC, doc_id) FILTER (WHERE rk <= 10)
                   AS gl
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY probe_id
                       ORDER BY gain_ppm DESC, doc_id) AS rk
            FROM gains
        )
        GROUP BY 1
    )
    SELECT s.probe_id,
           {_sql_dcg('s.gl')} AS dcg,
           {_sql_dcg('i.gl')} AS idcg,
           CASE WHEN {_sql_dcg('i.gl')} > 0
                THEN {_sql_dcg('s.gl')} / {_sql_dcg('i.gl')} END AS ndcg
    FROM sys_lists s JOIN ideal_lists i ON i.probe_id = s.probe_id
"""


@register(
    "x162_ndcg_eval",
    "NDCG@10 ranking evaluation — the retrieval-quality closer for "
    "the similarity tier: the SEMANTIC arm's cosine top-10 per probe "
    "is scored against lexical-overlap ground truth (exact integer "
    "ppm Jaccard gains over docs sharing >=1 shingle — the inverted-"
    "index candidate set, on both sides), discounted by the pre-baked 1/log2(i+1) "
    "position constants (the x140 no-libm pattern), and normalized "
    "by the ideal ordering's DCG — measuring how well embedding "
    "search recovers lexically-relevant documents, the cross-modal "
    "agreement x142 fuses and x160 curves. Both DCGs are SEQUENTIAL "
    "zip-folds over position-ordered gain lists (the proven SQL_DOT "
    "machinery) because a grouped SUM of doubles is order-"
    "nondeterministic — the one wrong way to compute DCG that still "
    "looks right; short ideal lists pad with zero gains before the "
    "fold so both engines fold exactly 10 terms. Probe side "
    "broadcasts in both arms; gains come from the inverted-index "
    "join, never all-pairs text.",
    oracle=_NDCG_ORACLE,
    tags=("ext", "ndcg", "ranking-eval", "retrieval"),
)
def x162_ndcg_eval(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    # NULL vectors are excluded (engine-wide vector-NULL convention,
    # round 11) — the oracle carries the explicit IS NOT NULL twin
    emb = load_table(spark, sf, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    corpus = emb.select(
        "vec_id", "embedding", S.norm(F.col("embedding")).alias("cn")
    )
    probes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pv"),
        S.norm(F.col("embedding")).alias("pn"),
    )
    cos = (
        F.broadcast(probes)
        .join(corpus, F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("doc_id"),
            # per-row norms hoisted above the pair join (r11, same
            # bit-identical rework as similarity.brute_force_topk)
            (
                S.dot(F.col("pv"), F.col("embedding"))
                / (F.col("pn") * F.col("cn"))
            ).alias("c"),
        )
    )
    w_sem = Window.partitionBy("probe_id").orderBy(F.desc("c"), "doc_id")
    semk = (
        cos.withColumn("rnk", F.row_number().over(w_sem))
        .filter(F.col("rnk") <= 10)
        .select("probe_id", "doc_id", "rnk")
    )

    docs = load_table(spark, sf, "documents")
    dsh = docs.select("doc_id", X.word_shingles(F.col("text")).alias("sh"))
    pex = dsh.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("probe_id"),
        F.size("sh").alias("na"),
        F.explode("sh").alias("g"),
    )
    dex = dsh.select(
        "doc_id", F.size("sh").alias("nb"), F.explode("sh").alias("g")
    )
    gains = (
        F.broadcast(pex)
        .join(dex, "g")
        .filter(F.col("doc_id") != F.col("probe_id"))
        .groupBy("probe_id", "doc_id", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
        .select(
            "probe_id",
            "doc_id",
            F.expr("inter * 1000000 DIV (na + nb - inter)").alias("gain_ppm"),
        )
    )

    disc = F.array(*[F.lit(float(d)) for d in NDCG_DISCOUNTS])
    pad = F.array(*[F.lit(0.0)] * 10)

    def dcg(gl):
        padded = F.slice(F.concat(gl, pad), 1, 10)
        return F.aggregate(
            F.zip_with(padded, disc, lambda g, d: g * d),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    sys_lists = (
        semk.join(gains, ["probe_id", "doc_id"], "left")
        .select(
            "probe_id",
            "rnk",
            F.coalesce("gain_ppm", F.lit(0)).cast("double").alias("gv"),
        )
        .groupBy("probe_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rnk", "gv"))),
                lambda s: s["gv"],
            ).alias("gl")
        )
    )
    w_ideal = Window.partitionBy("probe_id").orderBy(
        F.desc("gain_ppm"), "doc_id"
    )
    ideal_lists = (
        gains.withColumn("rk", F.row_number().over(w_ideal))
        .filter(F.col("rk") <= 10)
        .select(
            "probe_id", "rk", F.col("gain_ppm").cast("double").alias("gv")
        )
        .groupBy("probe_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rk", "gv"))),
                lambda s: s["gv"],
            ).alias("gl")
        )
    )
    joined = sys_lists.join(
        ideal_lists.withColumnRenamed("gl", "il"), "probe_id"
    )
    dcg_c, idcg_c = dcg(F.col("gl")), dcg(F.col("il"))
    return joined.select(
        "probe_id",
        dcg_c.alias("dcg"),
        idcg_c.alias("idcg"),
        F.when(idcg_c > 0, dcg_c / idcg_c).alias("ndcg"),
    )


_MRR_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ), p AS (
        SELECT vec_id AS probe_id, v AS pv FROM c WHERE vec_id < 8
    ), semk AS (
        SELECT probe_id, doc_id, rnk FROM (
            SELECT probe_id, vec_id AS doc_id,
                   row_number() OVER (
                       PARTITION BY probe_id
                       ORDER BY {sql_cosine('pv', 'v')} DESC, vec_id
                   ) AS rnk
            FROM p JOIN c ON c.vec_id <> p.probe_id
        ) WHERE rnk <= 10
    ), dsh AS (
        SELECT doc_id, {sql_shingles('text')} AS sh FROM documents
    ), psh AS (
        SELECT doc_id AS probe_id, sh AS ps FROM dsh WHERE doc_id < 8
    ), rel AS (
        SELECT probe_id, doc_id FROM (
            SELECT p.probe_id, d.doc_id,
                   row_number() OVER (
                       PARTITION BY p.probe_id
                       ORDER BY len(list_intersect(p.ps, d.sh)) * 1000000
                           // (len(p.ps) + len(d.sh)
                               - len(list_intersect(p.ps, d.sh))) DESC,
                           d.doc_id
                   ) AS lrk
            FROM psh p JOIN dsh d ON d.doc_id <> p.probe_id
                AND len(list_intersect(p.ps, d.sh)) > 0
        ) WHERE lrk <= 5
    ), hits AS (
        SELECT s.probe_id, s.rnk,
               CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
        FROM semk s
        LEFT JOIN rel r ON r.probe_id = s.probe_id AND r.doc_id = s.doc_id
    )
    SELECT probe_id,
           CAST(min(CASE WHEN is_rel = 1 THEN rnk END) AS BIGINT)
               AS first_rel_rank,
           CAST(coalesce(1000000 // min(CASE WHEN is_rel = 1 THEN rnk END),
                         0) AS BIGINT) AS rr_ppm,
           CAST(sum(CASE WHEN is_rel = 1 AND rnk <= 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS rel_at_1,
           CAST(sum(CASE WHEN is_rel = 1 AND rnk <= 5 THEN 1 ELSE 0 END)
                AS BIGINT) AS rel_at_5,
           CAST(sum(is_rel) AS BIGINT) AS rel_at_10
    FROM hits GROUP BY 1
"""


@register(
    "x163_mrr_recall_at_k",
    "MRR and recall@k — the INTEGER-surface retrieval metrics beside "
    "x162's NDCG: the lexical top-5 per probe is the relevant set "
    "(rank-based among docs sharing >=1 shingle — the inverted-index "
    "candidate set — tie-broken, no score threshold to tune), and the semantic "
    "top-10 is scored by the rank of its first relevant hit "
    "(reciprocal rank as exact ppm = 1e6 DIV rank — no float "
    "division), plus relevant-hit counts at cutoffs 1, 5, 10. Every "
    "output cell is an integer, making this the preferred regression "
    "gate for retrieval changes (NDCG moves by ULPs; these move by "
    "whole hits). A probe whose semantic list contains NO lexical "
    "neighbor reports NULL first rank and rr_ppm 0 — the disagreement "
    "signal x142's fusion exists to fix. Same broadcast-probe / "
    "inverted-index shapes as the rest of the tier.",
    oracle=_MRR_ORACLE,
    tags=("ext", "mrr", "recall-at-k", "ranking-eval"),
)
def x163_mrr_recall_at_k(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    # NULL vectors are excluded (engine-wide vector-NULL convention,
    # round 11) — the oracle carries the explicit IS NOT NULL twin
    emb = load_table(spark, sf, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    corpus = emb.select(
        "vec_id", "embedding", S.norm(F.col("embedding")).alias("cn")
    )
    probes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pv"),
        S.norm(F.col("embedding")).alias("pn"),
    )
    cos = (
        F.broadcast(probes)
        .join(corpus, F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("doc_id"),
            # per-row norms hoisted above the pair join (r11, same
            # bit-identical rework as similarity.brute_force_topk)
            (
                S.dot(F.col("pv"), F.col("embedding"))
                / (F.col("pn") * F.col("cn"))
            ).alias("c"),
        )
    )
    w_sem = Window.partitionBy("probe_id").orderBy(F.desc("c"), "doc_id")
    semk = (
        cos.withColumn("rnk", F.row_number().over(w_sem))
        .filter(F.col("rnk") <= 10)
        .select("probe_id", "doc_id", "rnk")
    )

    docs = load_table(spark, sf, "documents")
    dsh = docs.select("doc_id", X.word_shingles(F.col("text")).alias("sh"))
    pex = dsh.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("probe_id"),
        F.size("sh").alias("na"),
        F.explode("sh").alias("g"),
    )
    dex = dsh.select(
        "doc_id", F.size("sh").alias("nb"), F.explode("sh").alias("g")
    )
    gains = (
        F.broadcast(pex)
        .join(dex, "g")
        .filter(F.col("doc_id") != F.col("probe_id"))
        .groupBy("probe_id", "doc_id", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
        .select(
            "probe_id",
            "doc_id",
            F.expr("inter * 1000000 DIV (na + nb - inter)").alias("gain_ppm"),
        )
    )
    w_lex = Window.partitionBy("probe_id").orderBy(
        F.desc("gain_ppm"), "doc_id"
    )
    rel = (
        gains.withColumn("lrk", F.row_number().over(w_lex))
        .filter(F.col("lrk") <= 5)
        .select("probe_id", "doc_id", F.lit(1).alias("is_rel"))
    )
    hits = semk.join(rel, ["probe_id", "doc_id"], "left").select(
        "probe_id", "rnk", F.coalesce("is_rel", F.lit(0)).alias("is_rel")
    )
    first = F.min(F.when(F.col("is_rel") == 1, F.col("rnk")))
    return hits.groupBy("probe_id").agg(
        first.cast("long").alias("first_rel_rank"),
        F.coalesce(
            F.expr(
                "1000000 DIV min(CASE WHEN is_rel = 1 THEN rnk END)"
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("rr_ppm"),
        F.sum(F.when((F.col("is_rel") == 1) & (F.col("rnk") <= 1), 1).otherwise(0))
        .cast("long")
        .alias("rel_at_1"),
        F.sum(F.when((F.col("is_rel") == 1) & (F.col("rnk") <= 5), 1).otherwise(0))
        .cast("long")
        .alias("rel_at_5"),
        F.sum("is_rel").cast("long").alias("rel_at_10"),
    )


_ROLLMED_ORACLE = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS epoch_day,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ), rolled AS (
        SELECT day,
               list_sort(list(cents) OVER (
                   ORDER BY epoch_day
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
        FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(len(win) AS BIGINT) AS n_days,
           CAST(win[(len(win) + 1) // 2] AS BIGINT) AS rolling_median_cents
    FROM rolled
"""


@register(
    "w21_rolling_median",
    "Trailing 7-day MEDIAN of the daily value total — the robust "
    "smoother that w5's moving average is not (one outlier day drags "
    "a mean for a week; the median shrugs), and a window statistic "
    "no built-in frame aggregate computes: the frame's values are "
    "COLLECTED per day (bounded at 7 elements by the frame itself — "
    "the only safe collect-in-window shape), sorted, and the "
    "lower-median element selected by integer rank. Daily totals are "
    "exact half-up cents, so selection is tie-permutation-invariant "
    "integer comparison — no interpolation, no floats. The range "
    "frame on the epoch-day key handles calendar gaps (w18's "
    "discipline); windows run over the |days| pre-aggregate, never "
    "raw events.",
    oracle=_ROLLMED_ORACLE,
    tags=("window", "rolling-median", "robust", "range-frame"),
)
def w21_rolling_median(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("cents")
    ).withColumn("epoch_day", F.datediff("day", F.lit("1970-01-01")))
    w = Window.orderBy("epoch_day").rangeBetween(-6, 0)
    rolled = daily.select(
        "day", F.sort_array(F.collect_list("cents").over(w)).alias("win")
    )
    return rolled.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.size("win").cast("long").alias("n_days"),
        F.element_at(
            "win", F.expr("(size(win) + 1) DIV 2").cast("int")
        )
        .cast("long")
        .alias("rolling_median_cents"),
    )


_MAP_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ), p AS (
        SELECT vec_id AS probe_id, v AS pv FROM c WHERE vec_id < 8
    ), semk AS (
        SELECT probe_id, doc_id, rnk FROM (
            SELECT probe_id, vec_id AS doc_id,
                   row_number() OVER (
                       PARTITION BY probe_id
                       ORDER BY {sql_cosine('pv', 'v')} DESC, vec_id
                   ) AS rnk
            FROM p JOIN c ON c.vec_id <> p.probe_id
        ) WHERE rnk <= 10
    ), dsh AS (
        SELECT doc_id, {sql_shingles('text')} AS sh FROM documents
    ), psh AS (
        SELECT doc_id AS probe_id, sh AS ps FROM dsh WHERE doc_id < 8
    ), rel AS (
        SELECT probe_id, doc_id FROM (
            SELECT p.probe_id, d.doc_id,
                   row_number() OVER (
                       PARTITION BY p.probe_id
                       ORDER BY len(list_intersect(p.ps, d.sh)) * 1000000
                           // (len(p.ps) + len(d.sh)
                               - len(list_intersect(p.ps, d.sh))) DESC,
                           d.doc_id
                   ) AS lrk
            FROM psh p JOIN dsh d ON d.doc_id <> p.probe_id
                AND len(list_intersect(p.ps, d.sh)) > 0
        ) WHERE lrk <= 5
    ), hits AS (
        SELECT s.probe_id, s.rnk,
               CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
        FROM semk s
        LEFT JOIN rel r ON r.probe_id = s.probe_id AND r.doc_id = s.doc_id
    ), cum AS (
        SELECT probe_id, rnk, is_rel,
               sum(is_rel) OVER (PARTITION BY probe_id ORDER BY rnk)
                   AS hits_so_far
        FROM hits
    )
    SELECT probe_id,
           CAST(5 AS BIGINT) AS n_rel,
           CAST(sum(CASE WHEN is_rel = 1
                         THEN hits_so_far * 1000000 // rnk
                         ELSE 0 END) // 5 AS BIGINT) AS ap_ppm
    FROM cum GROUP BY 1
"""


@register(
    "x164_map_at_10",
    "Average precision @10 per probe — the third leg of the ranking-"
    "eval family (x162 NDCG weights positions, x163 MRR takes the "
    "first hit; AP integrates precision at EVERY relevant hit, the "
    "metric most sensitive to burying a relevant doc mid-list). Same "
    "rank-based relevant set (lexical top-5 among docs sharing >=1 "
    "shingle) and semantic top-10; "
    "precision-at-hit terms are the TRUNCATING integer form "
    "(hits_so_far * 1e6 DIV rank, summed then DIV n_rel) — documented "
    "as the exact-integer variant of AP, monotone-equivalent to the "
    "float definition at these list sizes and hash-exact by "
    "construction. The running hit count is one cumulative window "
    "over 10-row-per-probe frames; all the heavy machinery (cosine "
    "broadcast, inverted-index gains) is shared shape with x162/x163.",
    oracle=_MAP_ORACLE,
    tags=("ext", "map", "average-precision", "ranking-eval"),
)
def x164_map_at_10(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    # NULL vectors are excluded (engine-wide vector-NULL convention,
    # round 11) — the oracle carries the explicit IS NOT NULL twin
    emb = load_table(spark, sf, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    corpus = emb.select(
        "vec_id", "embedding", S.norm(F.col("embedding")).alias("cn")
    )
    probes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pv"),
        S.norm(F.col("embedding")).alias("pn"),
    )
    cos = (
        F.broadcast(probes)
        .join(corpus, F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("doc_id"),
            # per-row norms hoisted above the pair join (r11, same
            # bit-identical rework as similarity.brute_force_topk)
            (
                S.dot(F.col("pv"), F.col("embedding"))
                / (F.col("pn") * F.col("cn"))
            ).alias("c"),
        )
    )
    w_sem = Window.partitionBy("probe_id").orderBy(F.desc("c"), "doc_id")
    semk = (
        cos.withColumn("rnk", F.row_number().over(w_sem))
        .filter(F.col("rnk") <= 10)
        .select("probe_id", "doc_id", "rnk")
    )
    docs = load_table(spark, sf, "documents")
    dsh = docs.select("doc_id", X.word_shingles(F.col("text")).alias("sh"))
    pex = dsh.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("probe_id"),
        F.size("sh").alias("na"),
        F.explode("sh").alias("g"),
    )
    dex = dsh.select(
        "doc_id", F.size("sh").alias("nb"), F.explode("sh").alias("g")
    )
    gains = (
        F.broadcast(pex)
        .join(dex, "g")
        .filter(F.col("doc_id") != F.col("probe_id"))
        .groupBy("probe_id", "doc_id", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
        .select(
            "probe_id",
            "doc_id",
            F.expr("inter * 1000000 DIV (na + nb - inter)").alias("gain_ppm"),
        )
    )
    w_lex = Window.partitionBy("probe_id").orderBy(
        F.desc("gain_ppm"), "doc_id"
    )
    rel = (
        gains.withColumn("lrk", F.row_number().over(w_lex))
        .filter(F.col("lrk") <= 5)
        .select("probe_id", "doc_id", F.lit(1).alias("is_rel"))
    )
    hits = semk.join(rel, ["probe_id", "doc_id"], "left").select(
        "probe_id", "rnk", F.coalesce("is_rel", F.lit(0)).alias("is_rel")
    )
    w_cum = Window.partitionBy("probe_id").orderBy("rnk")
    cum = hits.withColumn("hits_so_far", F.sum("is_rel").over(w_cum))
    return cum.groupBy("probe_id").agg(
        F.lit(5).cast("long").alias("n_rel"),
        F.expr(
            "CAST(sum(CASE WHEN is_rel = 1 "
            "THEN hits_so_far * 1000000 DIV rnk ELSE 0 END) DIV 5 AS BIGINT)"
        ).alias("ap_ppm"),
    )


_COHENS_D_ORACLE = f"""
    WITH per_user AS (
        SELECT user_id,
               {SQL_H.format(s='CAST(user_id AS VARCHAR)')} % 2 AS arm,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ), mo AS (
        SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS s1,
               sum(CASE WHEN arm = 0 THEN cents * cents ELSE 0 END) AS q1,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n2,
               sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS s2,
               sum(CASE WHEN arm = 1 THEN cents * cents ELSE 0 END) AS q2
        FROM per_user
    )
    SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
           CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
           - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_diff_cents,
           (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
            - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
           / sqrt(((CAST(q1 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                      / CAST(n1 AS DOUBLE))
                   + (CAST(q2 AS DOUBLE)
                      - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                        / CAST(n2 AS DOUBLE)))
                  / CAST(n1 + n2 - 2 AS DOUBLE)) AS cohens_d
    FROM mo
"""


@register(
    "a20_cohens_d_effect_size",
    "Cohen's d standardized effect size between the two md5-assigned "
    "arms' per-user spend — the practical-significance companion the "
    "z-test (x152) lacks: a tiny p with d near zero is noise a large "
    "sample amplified, and reporting both is the discipline "
    "experimentation reviews demand. Pooled SD comes from the exact "
    "int64 sum/sum-of-squares moments (cents keep them order-free), "
    "closed in one character-identical IEEE shape per dialect — the "
    "x148/x152 pattern — so even a ratio of floats hash-verifies. "
    "One grouped pass, six moments, one output row at any volume.",
    oracle=_COHENS_D_ORACLE,
    tags=("ext", "ab-test", "effect-size", "exact-stats"),
)
def a20_cohens_d_effect_size(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    per_user = ev.groupBy(
        "user_id",
        (X.base_hash(F.col("user_id").cast("string")) % 2).alias("arm"),
    ).agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    a0 = F.when(F.col("arm") == 0, 1).otherwise(0)
    a1 = F.when(F.col("arm") == 1, 1).otherwise(0)
    mo = per_user.agg(
        F.sum(a0).alias("n1"),
        F.sum(a0 * F.col("cents")).alias("s1"),
        F.sum(a0 * F.col("cents") * F.col("cents")).alias("q1"),
        F.sum(a1).alias("n2"),
        F.sum(a1 * F.col("cents")).alias("s2"),
        F.sum(a1 * F.col("cents") * F.col("cents")).alias("q2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    diff = d("s2") / d("n2") - d("s1") / d("n1")
    pooled = F.sqrt(
        (
            (d("q1") - d("s1") * d("s1") / d("n1"))
            + (d("q2") - d("s2") * d("s2") / d("n2"))
        )
        / (F.col("n1") + F.col("n2") - 2).cast("double")
    )
    return mo.select(
        F.col("n1").cast("long").alias("n_a"),
        F.col("n2").cast("long").alias("n_b"),
        diff.alias("mean_diff_cents"),
        (diff / pooled).alias("cohens_d"),
    )


# ---------------------------------------------------------------------------
# round-4 continuation tier: nonparametric tests, change detection,
# link prediction, zone-map skipping
# ---------------------------------------------------------------------------

_MANN_WHITNEY_ORACLE = f"""
    WITH per_user AS (
        SELECT user_id,
               {SQL_H.format(s='CAST(user_id AS VARCHAR)')} % 2 AS arm,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
        HAVING sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value
                   END * 100 + 0.5) AS BIGINT)) IS NOT NULL
    ), vals AS (
        SELECT cents, count(*) AS n_eq,
               sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a_eq
        FROM per_user GROUP BY cents
    ), ranked AS (
        SELECT cents, n_eq, n_a_eq,
               COALESCE(sum(n_eq) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cnt_less
        FROM vals
    ), mo AS (
        SELECT sum(n_a_eq) AS n_a,
               sum(n_eq - n_a_eq) AS n_b,
               sum(n_eq) AS nn,
               sum(n_a_eq * (2 * cnt_less + n_eq + 1)) AS r_a_x2,
               sum(n_eq * n_eq * n_eq - n_eq) AS tt
        FROM ranked
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(r_a_x2 AS BIGINT) AS r_a_x2,
           CAST(r_a_x2 - n_a * (n_a + 1) AS BIGINT) AS u_a_x2,
           (CAST(r_a_x2 - n_a * (n_a + 1) AS DOUBLE) / 2e0
            - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2e0)
           / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 1.2e1
                  * ((CAST(nn AS DOUBLE) + 1e0)
                     - CAST(tt AS DOUBLE)
                       / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1e0))))
               AS z_stat
    FROM mo
"""


@register(
    "a21_mann_whitney_u",
    "Mann-Whitney U rank-sum test between the two md5-assigned arms' "
    "per-user spend — the nonparametric companion to x152's z-test and "
    "a20's Cohen's d: heavy-tailed revenue distributions violate the "
    "normality the t/z family leans on, and the rank statistic is the "
    "standard robust fallback. Tie-averaged ranks are kept EXACT by "
    "doubling (2*avgrank = 2*cnt_less + n_eq + 1, an integer), and the "
    "rank sums are computed from the DISTINCT-VALUE aggregate (one "
    "groupBy on cents, then a cumulative window over distinct spend "
    "levels) — the window runs over value cardinality, not user "
    "cardinality, so the single-partition final stage is bounded by "
    "distinct cents, the same posture as x61/x94. The tie-corrected "
    "normal-approximation z closes in one character-identical IEEE "
    "shape per dialect (the a20/x148 pattern). No reference analogue "
    "(reference has no hypothesis testing); Spark-native extension tier.",
    oracle=_MANN_WHITNEY_ORACLE,
    tags=("ext", "ab-test", "nonparametric", "exact-stats"),
)
def a21_mann_whitney_u(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    per_user = ev.groupBy(
        "user_id",
        (X.base_hash(F.col("user_id").cast("string")) % 2).alias("arm"),
    ).agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    # a user with NO finite observations has no spend statistic: the
    # NULL-cents group would otherwise need a cross-engine NULL rank
    # position (Spark NULLS FIRST vs DuckDB NULLS LAST) — drop it
    per_user = per_user.filter(F.col("cents").isNotNull())
    vals = per_user.groupBy("cents").agg(
        F.count(F.lit(1)).alias("n_eq"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a_eq"),
    )
    w = (
        Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = vals.withColumn(
        "cnt_less", F.coalesce(F.sum("n_eq").over(w), F.lit(0))
    )
    mo = ranked.agg(
        F.sum("n_a_eq").alias("n_a"),
        F.sum(F.col("n_eq") - F.col("n_a_eq")).alias("n_b"),
        F.sum("n_eq").alias("nn"),
        F.sum(
            F.col("n_a_eq") * (2 * F.col("cnt_less") + F.col("n_eq") + 1)
        ).alias("r_a_x2"),
        F.sum(
            F.col("n_eq") * F.col("n_eq") * F.col("n_eq") - F.col("n_eq")
        ).alias("tt"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    u_a_x2 = F.col("r_a_x2") - F.col("n_a") * (F.col("n_a") + 1)
    z = (u_a_x2.cast("double") / 2.0 - d("n_a") * d("n_b") / 2.0) / F.sqrt(
        d("n_a")
        * d("n_b")
        / 12.0
        * ((d("nn") + 1.0) - d("tt") / (d("nn") * (d("nn") - 1.0)))
    )
    return mo.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("r_a_x2").cast("long").alias("r_a_x2"),
        u_a_x2.cast("long").alias("u_a_x2"),
        z.alias("z_stat"),
    )


_CUSUM_ORACLE = """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ), tot AS (
        SELECT event_type, count(*) AS n_days, sum(cents) AS total
        FROM daily GROUP BY 1
    ), walk AS (
        SELECT d.event_type, d.d, t.n_days, t.total,
               sum(d.cents) OVER (PARTITION BY d.event_type ORDER BY d.d)
                   AS prefix,
               row_number() OVER (PARTITION BY d.event_type ORDER BY d.d)
                   AS i
        FROM daily d JOIN tot t USING (event_type)
    ), scored AS (
        SELECT event_type, d, n_days, total,
               prefix * n_days - i * total AS cusum_scaled,
               row_number() OVER (PARTITION BY event_type
                   ORDER BY abs(prefix * n_days - i * total) DESC, d) AS rn
        FROM walk
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           CAST(total AS BIGINT) AS total_cents,
           d AS peak_day,
           CAST(cusum_scaled AS BIGINT) AS peak_cusum_scaled
    FROM scored WHERE rn = 1
"""


@register(
    "x165_cusum_changepoint",
    "CUSUM change-point localization over each event type's daily spend "
    "walk: the day where the cumulative deviation from the type's mean "
    "peaks in magnitude is the classic single-change-point estimate "
    "(Page's statistic with the drift term folded into the mean). The "
    "mean division is eliminated by scaling — cusum_i = prefix_i*N - "
    "i*total is N*(prefix_i - i*mean) in pure int64, so the walk, the "
    "peak, and the argmax day are all hash-exact. One daily groupBy, "
    "one per-type prefix window, one per-type argmax window — every "
    "stage partitions by event_type, nothing global; the monitoring "
    "companion to x109's z-scores (which flag pointwise anomalies; "
    "CUSUM finds the sustained level shift they miss).",
    oracle=_CUSUM_ORACLE,
    tags=("ext", "changepoint", "monitoring", "exact-stats"),
)
def x165_cusum_changepoint(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("cents").alias("total")
    )
    w_walk = Window.partitionBy("event_type").orderBy("d")
    walk = daily.join(tot, "event_type").select(
        "event_type",
        "d",
        "n_days",
        "total",
        F.sum("cents").over(w_walk).alias("prefix"),
        F.row_number().over(w_walk).alias("i"),
    )
    cus = F.col("prefix") * F.col("n_days") - F.col("i") * F.col("total")
    w_peak = Window.partitionBy("event_type").orderBy(
        F.abs(cus).desc(), "d"
    )
    return (
        walk.withColumn("cusum_scaled", cus)
        .withColumn("rn", F.row_number().over(w_peak))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.col("total").cast("long").alias("total_cents"),
            F.col("d").alias("peak_day"),
            F.col("cusum_scaled").cast("long").alias("peak_cusum_scaled"),
        )
    )


_LINK_PRED_ORACLE = """
    WITH e AS (
        SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM (SELECT * FROM lineitem WHERE l_quantity >= 45e0) a
        JOIN (SELECT * FROM lineitem WHERE l_quantity >= 45e0) b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
    ),
    deg AS (SELECT src, count(*) AS degree FROM e GROUP BY src),
    cand AS (
        SELECT x.src AS a, y.src AS b, count(*) AS common
        FROM e x JOIN e y ON x.dst = y.dst AND x.src < y.src
        GROUP BY 1, 2
    ), open_wedges AS (
        SELECT c.a, c.b, c.common, da.degree AS deg_a, db.degree AS deg_b
        FROM cand c
        JOIN deg da ON da.src = c.a
        JOIN deg db ON db.src = c.b
        LEFT JOIN e ON e.src = c.a AND e.dst = c.b
        WHERE e.src IS NULL
    )
    SELECT a, b, CAST(common AS BIGINT) AS common,
           CAST(deg_a AS BIGINT) AS deg_a, CAST(deg_b AS BIGINT) AS deg_b,
           CAST(common * 1000000 // (deg_a + deg_b - common) AS BIGINT)
               AS nbr_jaccard_ppm
    FROM open_wedges
    ORDER BY common DESC, nbr_jaccard_ppm DESC, a, b
    LIMIT 20
"""


@register(
    "x166_common_neighbor_link_prediction",
    "Link prediction on the co-supply graph: the 20 supplier pairs that "
    "are NOT directly connected but share the most co-supply neighbors, "
    "scored by common-neighbor count with neighborhood-Jaccard (ppm, "
    "integer DIV) as the degree-normalized tiebreak — the classic "
    "common-neighbors / Jaccard predictors from the link-prediction "
    "literature, deliberately log-free (Adamic-Adar's 1/ln(deg) terms "
    "are not cross-engine hash-stable; see the module-head ln() note). "
    "Shares x84/x91's one-exchange bounded edge build; the wedge join "
    "keys on the shared neighbor, so its fanout is sum(deg^2) — bounded "
    "here by the ~7-lines-per-order co-supply cap, and the documented "
    "100 TB mitigation is the standard top-degree-node cap (drop hub "
    "nodes above a degree threshold before the wedge join, as in "
    "x123's triangle counting). Direct edges are removed with a "
    "left-anti join against the edge set, not a NOT IN scan. The edge "
    "set is built from the high-quantity (>= 45) co-supply subgraph — "
    "the full graph is near-complete at small SF, leaving no open "
    "wedges to predict; the cut also pushes down to the parquet scan.",
    oracle=_LINK_PRED_ORACLE,
    tags=("ext", "graph", "link-prediction"),
)
def x166_common_neighbor_link_prediction(spark: SparkSession, sf: str) -> DataFrame:
    li = (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_quantity") >= 45.0)
        .select("l_orderkey", "l_suppkey")
    )
    # materialize the co-supply edge build ONCE (r12 plan audit: the
    # un-checkpointed plan embedded the collect_set+explode build FOUR
    # times — both wedge sides, the anti-join side, and the degree
    # count — with NO ReusedExchange; 10 parquet scans for one edge
    # set). Same x180 pattern incl. the pre-checkpoint inline guard
    # (lineage truncation blinds the parity sweep's plan check).
    # A/B min-of-5: 1.90 -> 1.59 s, identical rows; persist() measured
    # SLOWER (2.60 s — cache-write overhead on the wide edge set).
    pre = _cosupply_edges(li)
    if os.environ.get("SPARK_GRAFT_PLAN_GUARD") == "1":
        from tests.plan_invariants import check_plan_invariants

        check_plan_invariants(
            "x166_common_neighbor_link_prediction (pre-checkpoint edges)",
            pre._jdf.queryExecution().executedPlan().toString(),
        )
    e = pre.localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    x = e.select(F.col("src").alias("a"), F.col("dst").alias("n"))
    y = e.select(F.col("src").alias("b"), F.col("dst").alias("n"))
    cand = (
        x.join(y, "n")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    open_wedges = cand.join(
        e.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    scored = (
        open_wedges.join(
            deg.select(F.col("src").alias("a"), F.col("degree").alias("deg_a")),
            "a",
        )
        .join(
            deg.select(F.col("src").alias("b"), F.col("degree").alias("deg_b")),
            "b",
        )
        .select(
            "a",
            "b",
            F.col("common").cast("long").alias("common"),
            F.col("deg_a").cast("long").alias("deg_a"),
            F.col("deg_b").cast("long").alias("deg_b"),
            F.expr(
                "CAST(common * 1000000 DIV (deg_a + deg_b - common) AS BIGINT)"
            ).alias("nbr_jaccard_ppm"),
        )
    )
    return scored.orderBy(
        F.desc("common"), F.desc("nbr_jaccard_ppm"), "a", "b"
    ).limit(20)


_ZONE_MAP_ORACLE = """
    WITH zones AS (
        SELECT date_trunc('month', l_shipdate) AS ship_month,
               count(*) AS n_rows,
               min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price
        FROM lineitem GROUP BY 1
    )
    SELECT ship_month, CAST(n_rows AS BIGINT) AS n_rows,
           min_qty, max_qty, min_price, max_price,
           CASE WHEN max_qty < 45e0 THEN 1 ELSE 0 END AS skip_qty_ge_45,
           CASE WHEN min_price > 9e4 OR max_price < 1e3
                THEN 1 ELSE 0 END AS skip_price_1k_90k
    FROM zones
"""


@register(
    "z6_zone_map_skipping_report",
    "Zone-map (min/max statistics) report per ship-month partition of "
    "the fact, with the skipping DECISION for two representative "
    "predicates materialized as flags: a partition whose max quantity "
    "is below the `l_quantity >= 45` cut, or whose price range misses "
    "[1e3, 9e4] entirely, is provably irrelevant and a scan can skip "
    "it without reading a row. This is exactly the reasoning parquet "
    "row-group stats + partition pruning perform physically (z3 proves "
    "the pruning happens; this entry materializes WHICH partitions and "
    "WHY as relational output — the advisor view a table-layout tuner "
    "reads). One groupBy over the partition key; min/max are "
    "partial-aggregating and shuffle one row per month regardless of "
    "fact size.",
    oracle=_ZONE_MAP_ORACLE,
    tags=("ext", "zone-map", "data-skipping", "layout"),
)
def z6_zone_map_skipping_report(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    zones = li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("ship_month")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    return zones.select(
        "ship_month",
        "n_rows",
        "min_qty",
        "max_qty",
        "min_price",
        "max_price",
        F.when(F.col("max_qty") < 45.0, 1).otherwise(0).alias("skip_qty_ge_45"),
        F.when(
            (F.col("min_price") > 9e4) | (F.col("max_price") < 1e3), 1
        )
        .otherwise(0)
        .alias("skip_price_1k_90k"),
    )


_L_DIVERSITY_ORACLE = """
    WITH cells AS (
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
               CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END / 5e1) AS BIGINT) AS value_band,
               count(DISTINCT event_type) AS n_sensitive,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events
        GROUP BY 1, 2
    )
    SELECT event_date, value_band,
           CAST(n_sensitive AS BIGINT) AS n_sensitive,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_events AS BIGINT) AS n_events,
           n_sensitive < 3 AS low_diversity
    FROM cells
"""


@register(
    "x167_l_diversity_audit",
    "l-diversity audit — the companion privacy criterion k-anonymity "
    "(x135) misses: a cell can hold MANY users yet still leak if they "
    "all share one sensitive value (homogeneity attack), so each "
    "(day, value-band) quasi-identifier cell must also contain >= l "
    "distinct sensitive values (here event_type, l=3). One grouped "
    "multi-distinct aggregate (Spark expands the two DISTINCTs via "
    "its expand-rewrite, still partial-aggregated map-side); output "
    "bounded by days x bands regardless of event volume. Dates travel "
    "as ISO strings (the e17/x135 lesson).",
    oracle=_L_DIVERSITY_ORACLE,
    tags=("ext", "privacy", "audit", "l-diversity"),
)
def x167_l_diversity_audit(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    cells = ev.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("event_date"),
        F.floor(fin("value") / 50.0).cast("long").alias("value_band"),
    ).agg(
        F.countDistinct("event_type").cast("long").alias("n_sensitive"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return cells.select(
        "event_date",
        "value_band",
        "n_sensitive",
        "n_users",
        "n_events",
        (F.col("n_sensitive") < 3).alias("low_diversity"),
    )


_MAD_ORACLE = """
    WITH obs AS (
        SELECT event_type,
               2 * CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT) AS x2
        FROM events WHERE value IS NOT NULL
    ), med AS (
        SELECT event_type,
               CAST(quantile_cont(x2, 0.5e0) AS BIGINT) AS med2
        FROM obs GROUP BY 1
    ), dev AS (
        SELECT o.event_type, o.x2, m.med2, abs(o.x2 - m.med2) AS dev2
        FROM obs o JOIN med m USING (event_type)
    ), mad AS (
        SELECT event_type,
               CAST(2 * quantile_cont(dev2, 0.5e0) AS BIGINT) AS mad4
        FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(d.med2) AS BIGINT) AS med2,
           CAST(max(a.mad4) AS BIGINT) AS mad4,
           CAST(sum(CASE WHEN d.dev2 * 20000 > 44478 * a.mad4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad a USING (event_type)
    GROUP BY 1
"""


@register(
    "x168_mad_outlier_flags",
    "Robust outlier detection via median absolute deviation: flag "
    "events whose |x - median| exceeds 3 * 1.4826 * MAD per event "
    "type — the estimator that survives exactly the heavy tails that "
    "inflate the classical z-score's own sigma (x109's known blind "
    "spot: an outlier masks itself by widening the sigma it is judged "
    "against). Everything is INTEGER: values as doubled cents keep "
    "the even-count median interpolation exact (a multiple of 0.5 "
    "doubled is an integer), the MAD is quadrupled likewise, and the "
    "3-sigma-equivalent cut is the cross-multiplied dev2*20000 > "
    "44478*mad4 — no float division anywhere, so the whole surface "
    "hash-verifies. Two exact grouped percentiles (the a1 "
    "ObjectHashAggregate posture; approx_percentile is the documented "
    "100 TB switch, the same C4/C5 dial) and one re-join against the "
    "bounded per-type medians, broadcast at any realistic type "
    "cardinality.",
    oracle=_MAD_ORACLE,
    tags=("ext", "robust-stats", "outliers", "exact-stats"),
)
def x168_mad_outlier_flags(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    obs = ev.select(
        "event_type",
        (2 * F.floor(fin("value") * 100 + 0.5).cast("long")).alias("x2"),
    )
    med = obs.groupBy("event_type").agg(
        F.expr("CAST(percentile(x2, 0.5) AS BIGINT)").alias("med2")
    )
    dev = obs.join(F.broadcast(med), "event_type").select(
        "event_type", "med2", F.abs(F.col("x2") - F.col("med2")).alias("dev2")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("CAST(2 * percentile(dev2, 0.5) AS BIGINT)").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("med2").cast("long").alias("med2"),
            F.max("mad4").cast("long").alias("mad4"),
            F.sum(
                F.when(
                    F.col("dev2") * 20000 > 44478 * F.col("mad4"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


_SAX_ORACLE = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ), sym AS (
        SELECT event_type, d,
               ntile(4) OVER (PARTITION BY event_type
                              ORDER BY cents, d) AS tile
        FROM daily
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           string_agg(substr('abcd', tile, 1), '' ORDER BY d) AS sax_word
    FROM sym GROUP BY 1
"""


@register(
    "x169_sax_rank_symbolization",
    "SAX-style symbolization of each event type's daily-spend series: "
    "every day is mapped to one of 4 symbols by its QUARTILE within "
    "the type (ntile over the per-type ordering, ties broken by day "
    "for a total order both dialects agree on), and the symbols "
    "concatenate in day order into the type's motif word — the "
    "discretization that makes time-series motif/anomaly mining a "
    "plain string problem (grep for 'dddd' = a sustained top-quartile "
    "run). Rank-based breakpoints replace the classical z-normalized "
    "Gaussian breakpoints deliberately: ranks need no mean/sigma "
    "floats, so the word is hash-exact. Per-type windows only "
    "(bounded by days-per-type); the order-aware concat is "
    "array_sort over (day, symbol) structs — collect_list order is "
    "NOT deterministic under retries, the w14 lesson.",
    oracle=_SAX_ORACLE,
    tags=("ext", "time-series", "sax", "symbolization"),
)
def x169_sax_rank_symbolization(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("cents", "d")
    sym = daily.withColumn("tile", F.ntile(4).over(w)).withColumn(
        "sym", F.substring(F.lit("abcd"), F.col("tile"), 1)
    )
    return sym.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "sym"))),
                lambda s: s.sym,
            ),
            "",
        ).alias("sax_word"),
    )


_WELCH_ORACLE = f"""
    WITH per_user AS (
        SELECT user_id,
               {SQL_H.format(s='CAST(user_id AS VARCHAR)')} % 2 AS arm,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ), mo AS (
        SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS s1,
               sum(CASE WHEN arm = 0 THEN cents * cents ELSE 0 END) AS q1,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n2,
               sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS s2,
               sum(CASE WHEN arm = 1 THEN cents * cents ELSE 0 END) AS q2
        FROM per_user
    ), v AS (
        SELECT n1, n2, s1, s2,
               (CAST(q1 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                  / CAST(n1 AS DOUBLE))
               / CAST(n1 - 1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS vn1,
               (CAST(q2 AS DOUBLE)
                - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                  / CAST(n2 AS DOUBLE))
               / CAST(n2 - 1 AS DOUBLE) / CAST(n2 AS DOUBLE) AS vn2
        FROM mo
    )
    SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
           CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
           - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_diff_cents,
           (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
            - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
           / sqrt(vn1 + vn2) AS t_stat,
           (vn1 + vn2) * (vn1 + vn2)
           / (vn1 * vn1 / CAST(n1 - 1 AS DOUBLE)
              + vn2 * vn2 / CAST(n2 - 1 AS DOUBLE)) AS welch_df
    FROM v
"""


@register(
    "a22_welch_t_test",
    "Welch's unequal-variance t between the two md5-assigned arms' "
    "per-user spend, with the Welch-Satterthwaite degrees of freedom — "
    "the test the pooled z (x152) silently gets wrong when a treatment "
    "changes the VARIANCE as well as the mean (common for revenue "
    "metrics: a feature that converts whales shifts the tail, not the "
    "median). Same exact int64 moment machinery as a20/x152 (cents "
    "keep sums order-free); per-arm variance-over-n terms close in one "
    "character-identical IEEE shape per dialect, and both t and df are "
    "pure +-*/sqrt compositions of those two terms, so the whole "
    "surface hash-verifies. One grouped pass, six moments, one row.",
    oracle=_WELCH_ORACLE,
    tags=("ext", "ab-test", "welch", "exact-stats"),
)
def a22_welch_t_test(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    per_user = ev.groupBy(
        "user_id",
        (X.base_hash(F.col("user_id").cast("string")) % 2).alias("arm"),
    ).agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    a0 = F.when(F.col("arm") == 0, 1).otherwise(0)
    a1 = F.when(F.col("arm") == 1, 1).otherwise(0)
    mo = per_user.agg(
        F.sum(a0).alias("n1"),
        F.sum(a0 * F.col("cents")).alias("s1"),
        F.sum(a0 * F.col("cents") * F.col("cents")).alias("q1"),
        F.sum(a1).alias("n2"),
        F.sum(a1 * F.col("cents")).alias("s2"),
        F.sum(a1 * F.col("cents") * F.col("cents")).alias("q2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    vn1 = (
        (d("q1") - d("s1") * d("s1") / d("n1"))
        / (F.col("n1") - 1).cast("double")
        / d("n1")
    )
    vn2 = (
        (d("q2") - d("s2") * d("s2") / d("n2"))
        / (F.col("n2") - 1).cast("double")
        / d("n2")
    )
    v = mo.select(
        "n1", "n2", "s1", "s2", vn1.alias("vn1"), vn2.alias("vn2")
    )
    diff = F.col("s2").cast("double") / F.col("n2").cast("double") - F.col(
        "s1"
    ).cast("double") / F.col("n1").cast("double")
    return v.select(
        F.col("n1").cast("long").alias("n_a"),
        F.col("n2").cast("long").alias("n_b"),
        diff.alias("mean_diff_cents"),
        (diff / F.sqrt(F.col("vn1") + F.col("vn2"))).alias("t_stat"),
        (
            (F.col("vn1") + F.col("vn2")) * (F.col("vn1") + F.col("vn2"))
            / (
                F.col("vn1") * F.col("vn1")
                / (F.col("n1") - 1).cast("double")
                + F.col("vn2") * F.col("vn2")
                / (F.col("n2") - 1).cast("double")
            )
        ).alias("welch_df"),
    )


_ROLLING_BAND_ORACLE = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ), rolled AS (
        SELECT event_type, d, cents,
               sum(cents) OVER w AS sum7,
               sum(cents * cents) OVER w AS sumsq7,
               count(*) OVER w AS n7
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
           CAST(cents AS BIGINT) AS cents,
           CAST(sum7 AS BIGINT) AS sum7,
           CASE WHEN (7 * cents - sum7) * (7 * cents - sum7)
                     > 4 * (7 * sumsq7 - sum7 * sum7)
                THEN CASE WHEN 7 * cents > sum7 THEN 1 ELSE -1 END
                ELSE 0 END AS band_breach
    FROM rolled WHERE n7 = 7
"""


@register(
    "w22_rolling_band_outliers",
    "Bollinger-style rolling-band breach detection on each event "
    "type's daily spend: a day breaches when it sits more than 2 "
    "rolling standard deviations from its own trailing-7-day mean — "
    "the volatility-adaptive alarm that a fixed threshold or a "
    "global z (x109) cannot give, because quiet types get tight "
    "bands and noisy types wide ones automatically. The 2-sigma test "
    "is the cross-multiplied INTEGER inequality (7x - sum7)^2 > "
    "4*(7*sumsq7 - sum7^2) — mean and sigma are never materialized "
    "as floats, so breach flags and their signs are hash-exact "
    "(int64 headroom verified: per-day cents through sf0.1 keep the "
    "squared terms under 2^60). One daily groupBy, one per-type "
    "trailing ROWS frame carrying (sum, sumsq, count) — the "
    "mergeable-moments idiom of w15/w18; partial windows are "
    "excluded by the count, not by fragile date arithmetic.",
    oracle=_ROLLING_BAND_ORACLE,
    tags=("ext", "rolling-window", "outliers", "exact-stats"),
)
def w22_rolling_band_outliers(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    rolled = daily.select(
        "event_type",
        "d",
        "cents",
        F.sum("cents").over(w).alias("sum7"),
        F.sum(F.col("cents") * F.col("cents")).over(w).alias("sumsq7"),
        F.count(F.lit(1)).over(w).alias("n7"),
    )
    dev = 7 * F.col("cents") - F.col("sum7")
    breach = F.when(
        dev * dev > 4 * (7 * F.col("sumsq7") - F.col("sum7") * F.col("sum7")),
        F.when(dev > 0, 1).otherwise(-1),
    ).otherwise(0)
    return rolled.filter(F.col("n7") == 7).select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("cents").cast("long").alias("cents"),
        F.col("sum7").cast("long").alias("sum7"),
        breach.alias("band_breach"),
    )


_ASPECT_LADDER = (
    # idx, bucket, bw, bh, wgt(=144/bh), tw, th
    (1, "1:1", 1, 1, 144, 512, 512),
    (2, "4:3", 4, 3, 48, 592, 444),
    (3, "3:4", 3, 4, 36, 444, 592),
    (4, "16:9", 16, 9, 9, 608, 342),
    (5, "9:16", 9, 16, 16, 342, 608),
)

_ASPECT_LADDER_SQL = ", ".join(
    f"({i}, '{b}', {bw}, {bh}, {wgt}, {tw}, {th})"
    for i, b, bw, bh, wgt, tw, th in _ASPECT_LADDER
)

_RESIZE_PLAN_ORACLE = f"""
    WITH img AS (
        SELECT doc_id AS asset_id,
               CASE WHEN doc_id % 5 = 0 THEN 'png'
                    WHEN doc_id % 5 = 1 THEN 'gif' ELSE 'jpeg' END AS format,
               CASE WHEN doc_id % 5 = 0 THEN 1 + doc_id % 2033
                    WHEN doc_id % 5 = 1 THEN 1 + doc_id % 499
                    ELSE 1 + doc_id % 1999 END AS w,
               CASE WHEN doc_id % 5 = 0 THEN 1 + (doc_id // 7) % 1021
                    WHEN doc_id % 5 = 1 THEN 1 + (doc_id // 3) % 307
                    ELSE 1 + (doc_id // 11) % 1499 END AS h
        FROM documents
        WHERE doc_id % 5 IN (0, 1, 4) AND doc_id % 29 <> 0
    ), pick AS (
        SELECT i.*, l.*,
               row_number() OVER (PARTITION BY i.asset_id ORDER BY
                   abs(i.w * l.bh - i.h * l.bw) * l.wgt, l.idx) AS rn
        FROM img i CROSS JOIN (VALUES {_ASPECT_LADDER_SQL})
             AS l(idx, bucket, bw, bh, wgt, tw, th)
    )
    SELECT asset_id, format,
           CAST(w AS BIGINT) AS probe_width,
           CAST(h AS BIGINT) AS probe_height,
           bucket,
           CAST(tw AS BIGINT) AS target_w, CAST(th AS BIGINT) AS target_h,
           CAST(CASE WHEN tw * h >= th * w
                     THEN tw ELSE (w * th + h - 1) // h END AS BIGINT)
               AS resized_w,
           CAST(CASE WHEN tw * h >= th * w
                     THEN (h * tw + w - 1) // w ELSE th END AS BIGINT)
               AS resized_h,
           CAST(CASE WHEN tw * h >= th * w
                     THEN 0 ELSE ((w * th + h - 1) // h - tw) // 2
                END AS BIGINT) AS crop_x,
           CAST(CASE WHEN tw * h >= th * w
                     THEN ((h * tw + w - 1) // w - th) // 2 ELSE 0
                END AS BIGINT) AS crop_y
    FROM pick WHERE rn = 1
"""


@register(
    "x170_aspect_bucket_resize_plan",
    "Aspect-ratio bucketing + resize/center-crop geometry for a vision "
    "training pipeline: every probed image is assigned the closest of "
    "5 canonical aspect buckets (1:1, 4:3, 3:4, 16:9, 9:16 — the "
    "bucketed-batching trick that lets a trainer batch same-shape "
    "tensors without destructive square cropping), then the EXACT "
    "cover-scale + center-crop geometry for its bucket's target box "
    "is computed relationally. Bucket choice is an integer argmin — "
    "|w*bh - h*bw| weighted by 144/bh puts all 5 ratio distances on "
    "one common denominator, no float ratios — and the geometry is "
    "ceil-division arithmetic, so the whole plan hash-verifies. The "
    "dims come from the REAL byte-level header parsers over the "
    "x81-style SQL-constructed PNG/GIF/JPEG containers (one Arrow "
    "mapInPandas pass), so this is the actual decode-free front half "
    "of a resize job: at scale the plan rows ship to the pixel "
    "workers and every shuffle-free stage stays a projection; the "
    "5-row ladder is a broadcast cross join, the per-asset argmin a "
    "5-row window.",
    oracle=_RESIZE_PLAN_ORACLE,
    tags=("ext", "multimodal", "resize", "aspect-bucket", "mapInPandas"),
)
def x170_aspect_bucket_resize_plan(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    d = F.col("doc_id")
    m = d % 5
    png = F.concat(
        F.lit("89504E470D0A1A0A0000000D49484452"),
        _be32(F.lit(1) + d % 2033),
        _be32(F.lit(1) + F.floor(d / 7) % 1021),
    )
    gif = F.concat(
        F.lit("474946383961"),
        _le16(F.lit(1) + d % 499),
        _le16(F.lit(1) + F.floor(d / 3) % 307),
    )
    jpeg = F.concat(
        F.lit("FFD8FFC0"),
        F.lit("000B"),
        F.lit("08"),
        _be16(F.lit(1) + F.floor(d / 11) % 1499),
        _be16(F.lit(1) + d % 1999),
    )
    assets = (
        load_table(spark, sf, "documents")
        .filter(m.isin(0, 1, 4) & (d % 29 != 0))
        .select(
            d.alias("asset_id"),
            F.unhex(F.when(m == 0, png).when(m == 1, gif).otherwise(jpeg))
            .alias("content"),
        )
    )
    img = MM.probe_image_dimensions(assets).select(
        "asset_id",
        "format",
        F.col("probe_width").cast("long").alias("w"),
        F.col("probe_height").cast("long").alias("h"),
    )
    ladder = spark.createDataFrame(
        list(_ASPECT_LADDER),
        "idx INT, bucket STRING, bw INT, bh INT, wgt INT, tw INT, th INT",
    )
    pick = img.crossJoin(F.broadcast(ladder))
    w_min = Window.partitionBy("asset_id").orderBy(
        F.abs(F.col("w") * F.col("bh") - F.col("h") * F.col("bw"))
        * F.col("wgt"),
        "idx",
    )
    chosen = pick.withColumn("rn", F.row_number().over(w_min)).filter(
        F.col("rn") == 1
    )
    wide = F.col("tw") * F.col("h") >= F.col("th") * F.col("w")
    rh_when_wide = F.expr("(h * tw + w - 1) DIV w")
    rw_when_tall = F.expr("(w * th + h - 1) DIV h")
    return chosen.select(
        "asset_id",
        "format",
        F.col("w").alias("probe_width"),
        F.col("h").alias("probe_height"),
        "bucket",
        F.col("tw").cast("long").alias("target_w"),
        F.col("th").cast("long").alias("target_h"),
        F.when(wide, F.col("tw").cast("long"))
        .otherwise(rw_when_tall)
        .cast("long")
        .alias("resized_w"),
        F.when(wide, rh_when_wide)
        .otherwise(F.col("th").cast("long"))
        .cast("long")
        .alias("resized_h"),
        F.when(wide, F.lit(0).cast("long"))
        .otherwise(F.expr("((w * th + h - 1) DIV h - tw) DIV 2"))
        .cast("long")
        .alias("crop_x"),
        F.when(wide, F.expr("((h * tw + w - 1) DIV w - th) DIV 2"))
        .otherwise(F.lit(0).cast("long"))
        .cast("long")
        .alias("crop_y"),
    )


_FRAME_PLAN_ORACLE = """
    WITH vid AS (
        SELECT doc_id AS asset_id,
               ((1 + doc_id % 100000) * 1000) // 600 AS dur_ms,
               CAST(160 * (1 + doc_id % 8) AS BIGINT) AS width,
               CAST(120 * (1 + doc_id % 6) AS BIGINT) AS height
        FROM documents
        WHERE doc_id % 5 = 3 AND doc_id % 29 <> 0
    )
    SELECT asset_id,
           CAST(unnest(range(0, greatest(dur_ms - 1, 0) + 1, 1000))
                AS BIGINT) AS frame_ts_ms,
           width, height
    FROM vid
"""


@register(
    "x171_video_frame_sample_plan",
    "Video frame-sampling fan-out: probe each ISO-BMFF container's "
    "duration from raw bytes (real mvhd timescale/duration parse via "
    "one Arrow mapInPandas pass — x81's video probe), then explode a "
    "1-per-second frame-timestamp plan per asset with its declared "
    "raster dims riding along — the exact shape a 100 TB video corpus "
    "fans out to frame granularity WITHOUT touching pixel data: the "
    "plan rows (asset, ts, dims) ship to decode workers, and the "
    "sequence+explode stays a zero-shuffle projection whose output "
    "scales with total video seconds, not blob bytes. Duration's "
    "closed form ((1 + id % 1e5) * 1000 DIV 600) replays the mvhd "
    "units-to-ms conversion in SQL, so the byte layout, the parser, "
    "AND the sampling arithmetic all sit under the hash.",
    oracle=_FRAME_PLAN_ORACLE,
    tags=("ext", "multimodal", "video", "frame-sample", "mapInPandas"),
)
def x171_video_frame_sample_plan(spark: SparkSession, sf: str) -> DataFrame:
    d = F.col("doc_id")
    mp4 = F.concat(
        F.lit("0000001066747970"), F.lit("69736F6D"), F.lit("00000000"),
        F.lit("000000246D6F6F76"),
        F.lit("0000001C6D766864"), F.lit("00000000"),
        F.lit("0000000000000000"),
        _be32(F.lit(600)),
        _be32(F.lit(1) + d % 100000),
    )
    assets = (
        load_table(spark, sf, "documents")
        .filter((d % 5 == 3) & (d % 29 != 0))
        .select(
            d.alias("asset_id"),
            F.unhex(mp4).alias("content"),
            (160 * (F.lit(1) + d % 8)).cast("long").alias("width"),
            (120 * (F.lit(1) + d % 6)).cast("long").alias("height"),
        )
    )
    probed = MM.probe_video_metadata(
        assets.select("asset_id", "content")
    ).select("asset_id", F.col("probe_duration_ms").alias("duration_ms"))
    vid = assets.select("asset_id", "width", "height").join(
        probed, "asset_id"
    ).withColumn("media_type", F.lit("video"))
    return MM.frame_sample_plan(vid, every_ms=1000).select(
        "asset_id",
        F.col("frame_ts_ms").cast("long").alias("frame_ts_ms"),
        "width",
        "height",
    )


_KENDALL_RANKINGS_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ), p AS (
        SELECT vec_id AS probe_id, v AS pv FROM c WHERE vec_id < 8
    ), semk AS (
        SELECT probe_id, doc_id, rnk FROM (
            SELECT probe_id, vec_id AS doc_id,
                   row_number() OVER (
                       PARTITION BY probe_id
                       ORDER BY {sql_cosine('pv', 'v')} DESC, vec_id
                   ) AS rnk
            FROM p JOIN c ON c.vec_id <> p.probe_id
        ) WHERE rnk <= 10
    ), dsh AS (
        SELECT doc_id, {sql_shingles('text')} AS sh FROM documents
    ), psh AS (
        SELECT doc_id AS probe_id, sh AS ps FROM dsh WHERE doc_id < 8
    ), lexk AS (
        SELECT probe_id, doc_id, lrk FROM (
            SELECT p.probe_id, d.doc_id,
                   row_number() OVER (
                       PARTITION BY p.probe_id
                       ORDER BY len(list_intersect(p.ps, d.sh)) * 1000000
                           // (len(p.ps) + len(d.sh)
                               - len(list_intersect(p.ps, d.sh))) DESC,
                           d.doc_id
                   ) AS lrk
            FROM psh p JOIN dsh d ON d.doc_id <> p.probe_id
                AND len(list_intersect(p.ps, d.sh)) > 0
        ) WHERE lrk <= 10
    ), common AS (
        SELECT s.probe_id, s.doc_id, s.rnk AS srk, l.lrk
        FROM semk s JOIN lexk l
          ON l.probe_id = s.probe_id AND l.doc_id = s.doc_id
    ), pairs AS (
        SELECT a.probe_id,
               CASE WHEN (a.lrk - b.lrk) * (a.srk - b.srk) > 0
                    THEN 1 ELSE 0 END AS conc
        FROM common a JOIN common b
          ON a.probe_id = b.probe_id AND a.doc_id < b.doc_id
    )
    SELECT s.probe_id,
           CAST(COALESCE(ca.n_common, 0) AS BIGINT) AS n_common,
           CAST(COALESCE(pa.concordant, 0) AS BIGINT) AS concordant,
           CAST(COALESCE(pa.discordant, 0) AS BIGINT) AS discordant,
           CAST(CASE WHEN COALESCE(ca.n_common, 0) >= 2
                THEN (COALESCE(pa.concordant, 0)
                      - COALESCE(pa.discordant, 0)) * 1000000
                     // (COALESCE(pa.concordant, 0)
                         + COALESCE(pa.discordant, 0))
                END AS BIGINT) AS tau_ppm
    FROM (SELECT vec_id AS probe_id FROM embeddings
          WHERE vec_id < 8 AND embedding IS NOT NULL) s
    LEFT JOIN (
        SELECT probe_id, count(*) AS n_common FROM common GROUP BY 1
    ) ca ON ca.probe_id = s.probe_id
    LEFT JOIN (
        SELECT probe_id, sum(conc) AS concordant,
               sum(1 - conc) AS discordant
        FROM pairs GROUP BY 1
    ) pa ON pa.probe_id = s.probe_id
"""


@register(
    "x172_kendall_tau_rankings",
    "Kendall-tau agreement between the lexical (shingle-Jaccard) and "
    "semantic (cosine) top-10 rankings per probe — the "
    "retrieval-systems diagnostic that x162/x163/x164 don't answer: "
    "those score ONE ranking against a relevant set; tau asks whether "
    "the two rankers ORDER the shared candidates the same way, which "
    "is what decides if hybrid fusion (x142's RRF) can add anything "
    "(tau near 1 = redundant rankers, fusion is wasted; tau near 0 = "
    "complementary evidence). Pure integer: concordant/discordant "
    "pair counts over the <=10-item intersection (<=45 pairs/probe, "
    "a bounded self-join keyed on probe), tau in ppm by integer DIV. "
    "Shares the x162-family broadcast cosine + shingle machinery.",
    oracle=_KENDALL_RANKINGS_ORACLE,
    tags=("ext", "ranking-eval", "kendall-tau", "exact-stats"),
)
def x172_kendall_tau_rankings(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    # NULL vectors are excluded (engine-wide vector-NULL convention,
    # round 11) — the oracle carries the explicit IS NOT NULL twin
    emb = load_table(spark, sf, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    corpus = emb.select(
        "vec_id", "embedding", S.norm(F.col("embedding")).alias("cn")
    )
    probes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pv"),
        S.norm(F.col("embedding")).alias("pn"),
    )
    cos = (
        F.broadcast(probes)
        .join(corpus, F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("doc_id"),
            # per-row norms hoisted above the pair join (r11, same
            # bit-identical rework as similarity.brute_force_topk)
            (
                S.dot(F.col("pv"), F.col("embedding"))
                / (F.col("pn") * F.col("cn"))
            ).alias("c"),
        )
    )
    w_sem = Window.partitionBy("probe_id").orderBy(F.desc("c"), "doc_id")
    semk = (
        cos.withColumn("srk", F.row_number().over(w_sem))
        .filter(F.col("srk") <= 10)
        .select("probe_id", "doc_id", "srk")
    )
    docs = load_table(spark, sf, "documents")
    dsh = docs.select("doc_id", X.word_shingles(F.col("text")).alias("sh"))
    pex = dsh.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("probe_id"),
        F.size("sh").alias("na"),
        F.explode("sh").alias("g"),
    )
    dex = dsh.select(
        "doc_id", F.size("sh").alias("nb"), F.explode("sh").alias("g")
    )
    gains = (
        F.broadcast(pex)
        .join(dex, "g")
        .filter(F.col("doc_id") != F.col("probe_id"))
        .groupBy("probe_id", "doc_id", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
        .select(
            "probe_id",
            "doc_id",
            F.expr("inter * 1000000 DIV (na + nb - inter)").alias("gain_ppm"),
        )
    )
    w_lex = Window.partitionBy("probe_id").orderBy(
        F.desc("gain_ppm"), "doc_id"
    )
    lexk = (
        gains.withColumn("lrk", F.row_number().over(w_lex))
        .filter(F.col("lrk") <= 10)
        .select("probe_id", "doc_id", "lrk")
    )
    common = semk.join(lexk, ["probe_id", "doc_id"])
    a = common.select(
        "probe_id",
        F.col("doc_id").alias("doc_a"),
        F.col("srk").alias("srk_a"),
        F.col("lrk").alias("lrk_a"),
    )
    b = common.select(
        "probe_id",
        F.col("doc_id").alias("doc_b"),
        F.col("srk").alias("srk_b"),
        F.col("lrk").alias("lrk_b"),
    )
    pairs = (
        a.join(b, "probe_id")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "probe_id",
            F.when(
                (F.col("lrk_a") - F.col("lrk_b"))
                * (F.col("srk_a") - F.col("srk_b"))
                > 0,
                1,
            )
            .otherwise(0)
            .alias("conc"),
        )
    )
    per_pairs = pairs.groupBy("probe_id").agg(
        F.sum("conc").alias("concordant"),
        F.sum(1 - F.col("conc")).alias("discordant"),
    )
    per_common = common.groupBy("probe_id").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    spine = probes.select("probe_id")
    joined = (
        spine.join(per_common, "probe_id", "left")
        .join(per_pairs, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.coalesce("concordant", F.lit(0))
            .cast("long")
            .alias("concordant"),
            F.coalesce("discordant", F.lit(0))
            .cast("long")
            .alias("discordant"),
        )
    )
    return joined.withColumn(
        "tau_ppm",
        F.when(
            F.col("n_common") >= 2,
            F.expr(
                "(concordant - discordant) * 1000000 "
                "DIV (concordant + discordant)"
            ),
        ).cast("long"),
    )


_JOIN_ORDER_ORACLE = """
    WITH st AS (
        SELECT (SELECT count(*) FROM orders) AS n_o,
               (SELECT count(DISTINCT o_custkey) FROM orders) AS d_oc,
               (SELECT count(*) FROM customer) AS n_c,
               (SELECT count(DISTINCT c_custkey) FROM customer) AS d_cc,
               (SELECT count(DISTINCT c_nationkey) FROM customer) AS d_cn,
               (SELECT count(*) FROM nation) AS n_n,
               (SELECT count(DISTINCT n_nationkey) FROM nation) AS d_nn
    ), plans AS (
        SELECT 'customer_orders_then_nation' AS plan,
               n_o * n_c // greatest(d_oc, d_cc) AS e1,
               (n_o * n_c // greatest(d_oc, d_cc)) * n_n
                   // greatest(d_cn, d_nn) AS e2
        FROM st
        UNION ALL
        SELECT 'customer_nation_then_orders',
               n_c * n_n // greatest(d_cn, d_nn),
               (n_c * n_n // greatest(d_cn, d_nn)) * n_o
                   // greatest(d_oc, d_cc)
        FROM st
        UNION ALL
        SELECT 'orders_cross_nation_then_customer',
               n_o * n_n,
               (n_o * n_n) * n_c
                   // (greatest(d_oc, d_cc) * greatest(d_cn, d_nn))
        FROM st
    )
    SELECT plan,
           CAST(e1 AS BIGINT) AS est_intermediate,
           CAST(e2 AS BIGINT) AS est_final,
           CAST(e1 + e2 AS BIGINT) AS cost,
           CAST(row_number() OVER (ORDER BY e1 + e2, plan) AS BIGINT)
               AS cost_rank
    FROM plans
"""


@register(
    "z7_join_order_cost_rank",
    "System-R-style join-order cost advisor computed FROM live table "
    "statistics: cardinalities and join-key NDVs feed the classical "
    "|R||S|/max(ndv_R, ndv_S) estimator, three candidate orders for "
    "the customer-orders-nation star (the two linear orders plus the "
    "cartesian-first straw man) are costed as the sum of estimated "
    "intermediates, and ranked. This materializes the reasoning "
    "Catalyst's CBO performs internally as an auditable relational "
    "surface — the k5 cardinality estimate generalized from one join "
    "to plan comparison, and the documentation for WHY the engine's "
    "own chosen order (j1's star join) is the cheap one. All integer "
    "(counts, exact NDVs, integer DIV); the stats pass is three "
    "single-row aggregates over pruned single-column scans, then "
    "3-row arithmetic — nothing scales with data beyond the stats "
    "scan itself, exactly like a real optimizer's stats collection.",
    oracle=_JOIN_ORDER_ORACLE,
    tags=("ext", "optimizer", "cost-model", "advisor"),
)
def z7_join_order_cost_rank(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf, "orders").agg(
        F.count(F.lit(1)).alias("n_o"),
        F.countDistinct("o_custkey").alias("d_oc"),
    )
    c = load_table(spark, sf, "customer").agg(
        F.count(F.lit(1)).alias("n_c"),
        F.countDistinct("c_custkey").alias("d_cc"),
        F.countDistinct("c_nationkey").alias("d_cn"),
    )
    n = load_table(spark, sf, "nation").agg(
        F.count(F.lit(1)).alias("n_n"),
        F.countDistinct("n_nationkey").alias("d_nn"),
    )
    st = o.crossJoin(c).crossJoin(n)
    plans = st.selectExpr(
        """
        stack(3,
            'customer_orders_then_nation',
            n_o * n_c DIV greatest(d_oc, d_cc),
            (n_o * n_c DIV greatest(d_oc, d_cc)) * n_n
                DIV greatest(d_cn, d_nn),
            'customer_nation_then_orders',
            n_c * n_n DIV greatest(d_cn, d_nn),
            (n_c * n_n DIV greatest(d_cn, d_nn)) * n_o
                DIV greatest(d_oc, d_cc),
            'orders_cross_nation_then_customer',
            n_o * n_n,
            (n_o * n_n) * n_c
                DIV (greatest(d_oc, d_cc) * greatest(d_cn, d_nn))
        ) AS (plan, e1, e2)
        """
    )
    return plans.select(
        "plan",
        F.col("e1").cast("long").alias("est_intermediate"),
        F.col("e2").cast("long").alias("est_final"),
        (F.col("e1") + F.col("e2")).cast("long").alias("cost"),
        F.row_number()
        .over(Window.orderBy(F.col("e1") + F.col("e2"), "plan"))
        .cast("long")
        .alias("cost_rank"),
    )


_CURRICULUM_ORACLE = """
    WITH src AS (
        SELECT source, row_number() OVER (ORDER BY source) - 1 AS src_idx,
               count(*) OVER () AS n_sources
        FROM (SELECT DISTINCT source FROM documents)
    ), ranked AS (
        SELECT d.doc_id, d.source,
               row_number() OVER (PARTITION BY d.source
                                  ORDER BY d.n_chars DESC, d.doc_id)
                   AS src_rank
        FROM documents d
    )
    SELECT r.doc_id, r.source,
           CAST(r.src_rank AS BIGINT) AS src_rank,
           CAST((r.src_rank - 1) * s.n_sources + s.src_idx AS BIGINT)
               AS interleave_pos
    FROM ranked r JOIN src s USING (source)
"""


@register(
    "x173_curriculum_interleave",
    "Deterministic curriculum interleave: rank documents within each "
    "source by a difficulty/quality proxy (n_chars desc), then place "
    "them on a GLOBAL round-robin order via the closed form "
    "(src_rank-1)*n_sources + src_idx — every source's best document "
    "first, round by round, the source-balanced ordering curriculum "
    "training and mixture preview both want. The closed form is the "
    "scale point: a naive global row_number over the interleave sort "
    "key is an Exchange SinglePartition (the x87 lesson); this "
    "computes the position ARITHMETICALLY from the per-source rank "
    "and a broadcast source index, so the plan is per-source windows "
    "+ a tiny dim join, fully parallel. Positions are gap-tolerant "
    "by design (a source that exhausts leaves its slots empty — "
    "order is preserved, density is not claimed); consumers sort by "
    "interleave_pos, they don't index by it.",
    oracle=_CURRICULUM_ORACLE,
    tags=("ext", "curriculum", "interleave", "training-data"),
)
def x173_curriculum_interleave(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents")
    src = (
        docs.select("source")
        .distinct()
        .withColumn(
            "src_idx",
            F.row_number().over(Window.orderBy("source")) - 1,
        )
        .withColumn("n_sources", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    ranked = docs.withColumn(
        "src_rank",
        F.row_number().over(
            Window.partitionBy("source").orderBy(
                F.desc("n_chars"), "doc_id"
            )
        ),
    )
    return ranked.join(F.broadcast(src), "source").select(
        "doc_id",
        "source",
        F.col("src_rank").cast("long").alias("src_rank"),
        (
            (F.col("src_rank") - 1) * F.col("n_sources") + F.col("src_idx")
        )
        .cast("long")
        .alias("interleave_pos"),
    )


_TEMPORAL_SPLIT_ORACLE = """
    WITH tagged AS (
        SELECT user_id, event_id, value,
               CASE WHEN ts < TIMESTAMP '2024-01-20' THEN 'train'
                    WHEN ts < TIMESTAMP '2024-01-26' THEN 'val'
                    ELSE 'test' END AS split
        FROM events
    ), stats AS (
        SELECT split,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               sum(CAST(floor(COALESCE(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END, 0) * 100 + 0.5) AS BIGINT))
                   AS total_cents
        FROM tagged GROUP BY 1
    ), overlap AS (
        SELECT split,
               count(DISTINCT CASE WHEN seen_in_train THEN user_id END)
                   AS n_users_seen_in_train
        FROM (
            SELECT t.split, t.user_id,
                   t.user_id IN (SELECT DISTINCT user_id FROM tagged
                                 WHERE split = 'train') AS seen_in_train
            FROM tagged t
        ) GROUP BY 1
    )
    SELECT s.split,
           CAST(s.n_events AS BIGINT) AS n_events,
           CAST(s.n_users AS BIGINT) AS n_users,
           CAST(s.total_cents AS BIGINT) AS total_cents,
           CAST(o.n_users_seen_in_train AS BIGINT) AS n_users_seen_in_train
    FROM stats s JOIN overlap o USING (split)
"""


@register(
    "x174_temporal_split_audit",
    "Time-based train/val/test split with the leakage audit a "
    "forecasting or recommendation pipeline needs BEFORE training: "
    "events partition by fixed time boundaries (the only split that "
    "respects causality — x52's group-hash split prevents entity "
    "leakage but still lets the model peek at the future), and the "
    "audit reports, per split, how many of its users also appear in "
    "train — the overlap that decides whether eval measures "
    "generalization to returning users or to cold-start users. "
    "One tag projection (pushdown-friendly timestamp range "
    "predicates), one grouped multi-aggregate, and one broadcast "
    "semi-join of the bounded distinct-user set for the overlap "
    "flag; output is 3 rows at any event volume.",
    oracle=_TEMPORAL_SPLIT_ORACLE,
    tags=("ext", "split", "leakage-audit", "training-data"),
)
def x174_temporal_split_audit(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    tagged = ev.select(
        "user_id",
        "event_id",
        "value",
        F.when(F.col("ts") < F.lit("2024-01-20").cast("timestamp"), "train")
        .when(F.col("ts") < F.lit("2024-01-26").cast("timestamp"), "val")
        .otherwise("test")
        .alias("split"),
    )
    train_users = (
        tagged.filter(F.col("split") == "train").select("user_id").distinct()
    )
    # the distinct-train-user set is USER-sized — plain shuffle left
    # join on user_id, no broadcast hint (AQE broadcasts if small)
    flagged = tagged.join(
        train_users.withColumn("seen_in_train", F.lit(1)),
        "user_id",
        "left",
    )
    return flagged.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(
            F.floor(F.coalesce(fin("value"), F.lit(0.0)) * 100 + 0.5).cast(
                "long"
            )
        )
        .cast("long")
        .alias("total_cents"),
        F.countDistinct(
            F.when(F.col("seen_in_train") == 1, F.col("user_id"))
        )
        .cast("long")
        .alias("n_users_seen_in_train"),
    )


_TWAP_ORACLE = """
    WITH obs AS (
        SELECT user_id, event_id, epoch_us(ts) AS t_us,
               CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ), paired AS (
        SELECT user_id, cents, t_us,
               lead(cents) OVER w AS next_cents,
               lead(t_us) OVER w AS next_t
        FROM obs
        WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
    )
    SELECT user_id,
           CAST(count(*) + 1 AS BIGINT) AS n_samples,
           CAST(max(next_t) - min(t_us) AS BIGINT) AS span_us,
           CAST(sum((cents + next_cents) * (next_t - t_us)) AS BIGINT)
               AS twap_num_x2,
           CAST(sum((cents + next_cents) * (next_t - t_us)) AS DOUBLE)
           / (2e0 * CAST(max(next_t) - min(t_us) AS DOUBLE)) AS twap_cents
    FROM paired WHERE next_t IS NOT NULL
    GROUP BY 1
"""


@register(
    "w23_time_weighted_average",
    "Time-weighted average (trapezoidal TWAP) of each user's value "
    "series: irregular samples mean a plain mean over-weights bursty "
    "periods; the trapezoid integral sum((v_i + v_{i+1}) * dt) / "
    "(2 * span) weights each level by how LONG it held — the standard "
    "estimator for balances, prices, and gauge metrics sampled on "
    "activity. Exact machinery: timestamps as integer epoch "
    "microseconds (unix_micros ≡ DuckDB epoch_us, verified "
    "value-for-value on the nanos-normalized read edge), values as "
    "cents, so the doubled numerator and the span are int64 and only "
    "the final ratio is a (single-shape, hash-stable) float. One "
    "per-user lead window, one grouped sum — shuffles once on "
    "user_id; int64 headroom holds through sf0.1's worst "
    "cents x month-of-microseconds pair (~5e17 < 2^63).",
    oracle=_TWAP_ORACLE,
    tags=("ext", "time-series", "twap", "exact-stats"),
)
def w23_time_weighted_average(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    obs = ev.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        F.floor(fin("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    paired = obs.select(
        "user_id",
        "cents",
        "t_us",
        F.lead("cents").over(w).alias("next_cents"),
        F.lead("t_us").over(w).alias("next_t"),
    ).filter(F.col("next_t").isNotNull())
    num = F.sum(
        (F.col("cents") + F.col("next_cents"))
        * (F.col("next_t") - F.col("t_us"))
    )
    span = F.max("next_t") - F.min("t_us")
    return paired.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).cast("long").alias("n_samples"),
        span.cast("long").alias("span_us"),
        num.cast("long").alias("twap_num_x2"),
        (num.cast("double") / (F.lit(2.0) * span.cast("double"))).alias(
            "twap_cents"
        ),
    )


_RENDEZVOUS_ORACLE = f"""
    WITH workers8 AS (
        SELECT 'w' || CAST(i AS VARCHAR) AS worker FROM range(8) t(i)
    ), a8 AS (
        SELECT doc_id, worker FROM (
            SELECT d.doc_id, w.worker,
                   row_number() OVER (PARTITION BY d.doc_id ORDER BY
                       {SQL_H.format(s="CAST(d.doc_id AS VARCHAR) || '|' || w.worker")}
                       DESC, w.worker) AS rn
            FROM documents d CROSS JOIN workers8 w
        ) WHERE rn = 1
    ), a7 AS (
        SELECT doc_id, worker FROM (
            SELECT d.doc_id, w.worker,
                   row_number() OVER (PARTITION BY d.doc_id ORDER BY
                       {SQL_H.format(s="CAST(d.doc_id AS VARCHAR) || '|' || w.worker")}
                       DESC, w.worker) AS rn
            FROM documents d CROSS JOIN workers8 w
            WHERE w.worker <> 'w7'
        ) WHERE rn = 1
    )
    SELECT a7.worker,
           CAST(COALESCE(c8.n, 0) AS BIGINT) AS n_docs_8w,
           CAST(count(*) AS BIGINT) AS n_docs_7w,
           CAST(sum(CASE WHEN a8.worker = 'w7' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_inherited
    FROM a7 JOIN a8 USING (doc_id)
    LEFT JOIN (SELECT worker, count(*) AS n FROM a8 GROUP BY 1) c8
      ON c8.worker = a7.worker
    GROUP BY 1, c8.n
"""


@register(
    "x175_rendezvous_sharding",
    "Rendezvous (highest-random-weight) sharding with the "
    "minimal-movement property made VISIBLE: every document scores "
    "each worker by md5(doc|worker) and lands on its argmax; when "
    "worker w7 is decommissioned, ONLY the documents it owned move "
    "(each to its second-best worker) — the report shows per "
    "surviving worker its 8-worker count, its 7-worker count, and "
    "n_inherited, which by construction equals exactly the "
    "difference (a structural invariant the hash check pins; "
    "mod-N hashing would reshuffle ~7/8 of all docs instead). This "
    "is the assignment layer for stateful shard maps — embedding "
    "index shards, media cache nodes — where movement is the cost "
    "that matters. Scale shape: worker list is a broadcast cross "
    "join (8 rows), argmax an 8-row per-doc window; both "
    "assignments are one pass each over the corpus, no shuffle "
    "beyond the final bounded per-worker rollup.",
    oracle=_RENDEZVOUS_ORACLE,
    tags=("ext", "sharding", "rendezvous", "consistent-hashing"),
)
def x175_rendezvous_sharding(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents").select("doc_id")
    workers = spark.range(8).select(
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("worker")
    )

    def assign(wdf: DataFrame) -> DataFrame:
        scored = docs.crossJoin(F.broadcast(wdf)).withColumn(
            "score",
            X.base_hash(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("|"),
                    F.col("worker"),
                )
            ),
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.desc("score"), "worker"
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", "worker")
        )

    a8 = assign(workers)
    a7 = assign(workers.filter(F.col("worker") != "w7"))
    c8 = a8.groupBy("worker").agg(F.count(F.lit(1)).alias("n8"))
    joined = a7.join(
        a8.select("doc_id", F.col("worker").alias("worker8")), "doc_id"
    )
    return (
        joined.groupBy("worker")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_7w"),
            F.sum(F.when(F.col("worker8") == "w7", 1).otherwise(0))
            .cast("long")
            .alias("n_inherited"),
        )
        .join(F.broadcast(c8), "worker", "left")
        .select(
            "worker",
            F.coalesce("n8", F.lit(0)).cast("long").alias("n_docs_8w"),
            "n_docs_7w",
            "n_inherited",
        )
    )


_BINARYFILE_FIXTURE_CACHE: dict[str, str] = {}


def _binaryfile_fixture_dir(spark: SparkSession, sf: str) -> str:
    """Write x176's deterministic image-container files ONCE per
    (sf, process) and return the cached directory.

    Fixture generation (bounded driver-side file writes) is setup, not
    operator cost, so it lives outside the query path (VERDICT r4 item
    3): repeat invocations — bench reps included — measure only the
    ``binaryFile`` scan + Arrow header probe. The only driver-side read
    here is a ONE-ROW min/max/count aggregate, asserted dense so the
    locally generated id range provably equals the table's doc_ids —
    no data-scaled ``.collect()`` anywhere in the path (enforced by
    tests/test_audit.py::test_no_data_scaled_collect_in_catalog).
    """
    import os
    import struct
    import tempfile
    from pathlib import Path

    key = os.path.abspath(sf)
    cached = _BINARYFILE_FIXTURE_CACHE.get(key)
    if cached is not None and os.path.isdir(cached):
        return cached
    lo, hi, n = (
        load_table(spark, sf, "documents")
        .agg(
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    # doc_id must be a dense range so the locally generated ids provably
    # equal the table's (empty table → empty fixture dir; binaryFile on
    # an empty dir yields an empty frame under its fixed schema).
    assert n == 0 or hi - lo + 1 == n, f"doc_id not dense: {(lo, hi, n)}"
    root = Path(tempfile.mkdtemp(prefix="binsrc_"))
    for i in range(lo, hi + 1) if n else ():
        m = i % 5
        if m not in (0, 1, 4) or i % 29 == 0:
            continue
        if m == 0:
            w, h = 1 + i % 2033, 1 + (i // 7) % 1021
            blob = (
                bytes.fromhex("89504E470D0A1A0A0000000D49484452")
                + struct.pack(">II", w, h)
            )
            name = f"{i}.png"
        elif m == 1:
            w, h = 1 + i % 499, 1 + (i // 3) % 307
            blob = bytes.fromhex("474946383961") + struct.pack("<HH", w, h)
            name = f"{i}.gif"
        else:
            w, h = 1 + i % 1999, 1 + (i // 11) % 1499
            blob = bytes.fromhex("FFD8FFC0000B08") + struct.pack(">HH", h, w)
            name = f"{i}.jpg"
        (root / name).write_bytes(blob)
    _BINARYFILE_FIXTURE_CACHE[key] = str(root)
    return str(root)


_BINARYFILE_ORACLE = """
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 5 = 0 THEN 'png'
                WHEN doc_id % 5 = 1 THEN 'gif' ELSE 'jpeg' END AS format,
           CAST(CASE WHEN doc_id % 5 = 0 THEN 1 + doc_id % 2033
                     WHEN doc_id % 5 = 1 THEN 1 + doc_id % 499
                     ELSE 1 + doc_id % 1999 END AS BIGINT) AS probe_width,
           CAST(CASE WHEN doc_id % 5 = 0 THEN 1 + (doc_id // 7) % 1021
                     WHEN doc_id % 5 = 1 THEN 1 + (doc_id // 3) % 307
                     ELSE 1 + (doc_id // 11) % 1499 END AS BIGINT)
               AS probe_height,
           CAST(CASE WHEN doc_id % 5 = 0 THEN 24
                     WHEN doc_id % 5 = 1 THEN 10
                     ELSE 11 END AS BIGINT) AS n_bytes
    FROM documents
    WHERE doc_id % 5 IN (0, 1, 4) AND doc_id % 29 <> 0
"""


@register(
    "x176_binaryfile_source_probe",
    "Spark's `binaryFile` source driven end-to-end — the ingest path "
    "a real multimodal corpus arrives on (a directory/bucket of blob "
    "files, not a parquet binary column): deterministic PNG/GIF/JPEG "
    "containers (x81's byte layouts) are written as individual "
    "<asset_id>.<ext> files, read back through "
    "spark.read.format('binaryFile') — which yields (path, "
    "modificationTime, length, content) with distributed file "
    "splitting — then asset ids are recovered from the path by "
    "regexp and dimensions by the real byte-level header parsers "
    "(one Arrow mapInPandas). The oracle's closed forms check id "
    "recovery, every parsed dimension, AND the source-reported "
    "`length` against the expected container size, so path "
    "handling, listing metadata, and parsing are all under the "
    "hash. Fixture files are written ONCE per (sf, process) by a "
    "cached setup step outside the query path (bounded bytes, the "
    "same posture as x88/x89's temp-dir roundtrips), so repeat "
    "invocations measure only the binaryFile scan + probe; at "
    "scale the identical plan reads an object-store prefix.",
    oracle=_BINARYFILE_ORACLE,
    tags=("ext", "multimodal", "source", "binaryFile", "mapInPandas"),
)
def x176_binaryfile_source_probe(spark: SparkSession, sf: str) -> DataFrame:
    files = spark.read.format("binaryFile").load(
        _binaryfile_fixture_dir(spark, sf)
    )
    assets = files.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.\w+$", 1)
        .cast("long")
        .alias("asset_id"),
        F.col("length").alias("n_bytes"),
        "content",
    )
    probed = MM.probe_image_dimensions(
        assets.select("asset_id", "content")
    )
    return probed.join(
        assets.select("asset_id", "n_bytes"), "asset_id"
    ).select(
        "asset_id",
        "format",
        F.col("probe_width").cast("long").alias("probe_width"),
        F.col("probe_height").cast("long").alias("probe_height"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
    )


_SRM_ORACLE = f"""
    WITH per_user AS (
        SELECT user_id,
               {SQL_H.format(s='CAST(user_id AS VARCHAR)')} % 2 AS arm,
               count(*) AS n_events,
               sum(CAST(floor(COALESCE(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END, 0) * 100 + 0.5) AS BIGINT))
                   AS cents
        FROM events GROUP BY 1, 2
    ), mo AS (
        SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b,
               sum(CASE WHEN arm = 0 THEN n_events ELSE 0 END) AS ev_a,
               sum(CASE WHEN arm = 1 THEN n_events ELSE 0 END) AS ev_b,
               sum(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS cents_a,
               sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS cents_b
        FROM per_user
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(ev_a AS BIGINT) AS ev_a, CAST(ev_b AS BIGINT) AS ev_b,
           CAST(cents_a AS BIGINT) AS cents_a,
           CAST(cents_b AS BIGINT) AS cents_b,
           CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
           / CAST(n_a + n_b AS DOUBLE) AS srm_chi2,
           CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
           / CAST(n_a + n_b AS DOUBLE) > 3.841459e0 AS srm_flag
    FROM mo
"""


@register(
    "a23_experiment_health_report",
    "Experiment health gate run BEFORE any effect readout (a20/a21/"
    "a22/x152 all assume it passed): per-arm unit counts, event "
    "counts, and spend totals, plus the sample-ratio-mismatch "
    "chi-square against the designed 50/50 split — the single "
    "highest-yield validity check in experimentation practice, since "
    "a biased assignment hash or a crash path that drops one arm's "
    "telemetry invalidates every downstream p-value. For two cells "
    "the chi-square closes to (n_a-n_b)^2/(n_a+n_b) — integer "
    "numerator and denominator, one float division, one literal "
    "threshold compare (3.841459 = chi2_0.95,df=1), all "
    "hash-stable. One grouped pass over users, one row out.",
    oracle=_SRM_ORACLE,
    tags=("ext", "ab-test", "srm", "health-check"),
)
def a23_experiment_health_report(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    per_user = ev.groupBy(
        "user_id",
        (X.base_hash(F.col("user_id").cast("string")) % 2).alias("arm"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.floor(F.coalesce(fin("value"), F.lit(0.0)) * 100 + 0.5).cast(
                "long"
            )
        ).alias("cents"),
    )
    a0 = F.when(F.col("arm") == 0, 1).otherwise(0)
    a1 = F.when(F.col("arm") == 1, 1).otherwise(0)
    mo = per_user.agg(
        F.sum(a0).alias("n_a"),
        F.sum(a1).alias("n_b"),
        F.sum(a0 * F.col("n_events")).alias("ev_a"),
        F.sum(a1 * F.col("n_events")).alias("ev_b"),
        F.sum(a0 * F.col("cents")).alias("cents_a"),
        F.sum(a1 * F.col("cents")).alias("cents_b"),
    )
    chi2 = (
        ((F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b")))
        .cast("double")
        / (F.col("n_a") + F.col("n_b")).cast("double")
    )
    return mo.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("ev_a").cast("long").alias("ev_a"),
        F.col("ev_b").cast("long").alias("ev_b"),
        F.col("cents_a").cast("long").alias("cents_a"),
        F.col("cents_b").cast("long").alias("cents_b"),
        chi2.alias("srm_chi2"),
        (chi2 > 3.841459).alias("srm_flag"),
    )


_DIVERSIFIED_TOPK_ORACLE = """
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS src_rk
        FROM documents
    ), capped AS (
        SELECT * FROM ranked WHERE src_rk <= 2
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(src_rk AS BIGINT) AS src_rk,
           CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
                AS BIGINT) AS global_rk
    FROM capped
    ORDER BY global_rk LIMIT 20
"""


@register(
    "x177_diversified_topk",
    "Diversified global top-k: the 20 highest-scoring documents "
    "subject to AT MOST 2 per source — the result-diversification "
    "constraint search and retrieval overlays on any ranking so one "
    "prolific source cannot monopolize the page (w3's top-k-per-"
    "group guarantees every group appears; this is the dual — a "
    "global list with per-group caps). Two stages, both scale-"
    "correct: the per-source cap is a partitioned window (parallel "
    "by source), and the global top-20 over the capped survivors is "
    "orderBy+limit, which Spark executes as TakeOrderedAndProject — "
    "per-partition heaps then a 20-row driver merge, never a full "
    "global sort. The final global_rk over 20 rows is a trivial "
    "window; ordering is total (score desc, doc_id) in both "
    "dialects.",
    oracle=_DIVERSIFIED_TOPK_ORACLE,
    tags=("ext", "topk", "diversification", "ranking"),
)
def x177_diversified_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents")
    ranked = docs.withColumn(
        "src_rk",
        F.row_number().over(
            Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
        ),
    ).filter(F.col("src_rk") <= 2)
    top = ranked.orderBy(F.desc("n_chars"), "doc_id").limit(20)
    return top.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("src_rk").cast("long").alias("src_rk"),
        F.row_number()
        .over(Window.orderBy(F.desc("n_chars"), "doc_id"))
        .cast("long")
        .alias("global_rk"),
    )


_VARIANT_ORACLE = """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_band,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE props IS NOT NULL
    GROUP BY 1
"""


@register(
    "e18_variant_json_shred",
    "Semi-structured shredding through Spark 4's VARIANT type: "
    "parse_json lifts the props payload into the binary variant "
    "encoding once, variant_get extracts the typed field with a "
    "JSONPath, and the extracted integer feeds a plain banded "
    "rollup — the modern replacement for e15's schema-declared "
    "from_json when the payload schema is open (variant defers "
    "typing to extraction, so new keys don't invalidate the reader). "
    "Catalyst pushes the single-field extraction into the scan "
    "projection; the rollup is one grouped aggregate with bounded "
    "output. Oracle shreds the same path via DuckDB's native JSON "
    "extraction — two independent JSON engines agreeing on the "
    "typed value under the hash.",
    oracle=_VARIANT_ORACLE,
    tags=("ext", "variant", "json", "semi-structured"),
)
def e18_variant_json_shred(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("props").isNotNull())
    return (
        ev.select(
            F.expr(
                "variant_get(parse_json(props), '$.k', 'bigint') DIV 10"
            ).alias("k_band"),
            "user_id",
        )
        .groupBy("k_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


def _kcore_round(prev: str, deg: str, keep: str, cur: str, k: int) -> str:
    return f"""
    {deg} AS (SELECT src, count(*) AS d FROM {prev} GROUP BY 1),
    {keep} AS (SELECT src FROM {deg} WHERE d >= {k}),
    {cur} AS (
        SELECT e.src, e.dst FROM {prev} e
        JOIN {keep} ka ON ka.src = e.src
        JOIN {keep} kb ON kb.src = e.dst
    )"""


_KCORE_ORACLE = f"""
    WITH e0 AS (
        SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM (SELECT * FROM lineitem WHERE l_quantity >= 45e0) a
        JOIN (SELECT * FROM lineitem WHERE l_quantity >= 45e0) b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
    ),{_kcore_round('e0', 'd1', 'k1', 'e1', 22)},
    {_kcore_round('e1', 'd2', 'k2', 'e2', 22)},
    {_kcore_round('e2', 'd3', 'k3', 'e3', 22)}
    SELECT src AS node, CAST(count(*) AS BIGINT) AS core_degree
    FROM e3 GROUP BY 1
"""


@register(
    "x178_kcore_peeling",
    "k-core decomposition by fixed-rounds peeling (k=22, 3 synchronous "
    "rounds) on the high-quantity co-supply graph: repeatedly delete "
    "every node whose current degree falls below k — what survives is "
    "the densely-interconnected core, the standard prefilter for "
    "community mining and fraud-ring detection (degree alone is "
    "gameable; core membership requires your NEIGHBORS to be "
    "well-connected too). Each round is one grouped degree count + "
    "two semi-joins restricting the edge list — the same bounded "
    "join-per-round shape as x84/x91/x138, with the round count a "
    "documented cap (production peels to fixpoint with the x18 "
    "convergence-check pattern; 3 rounds is exact on this graph and "
    "keeps the oracle a finite CTE unroll). Symmetric edges mean "
    "src-side degrees ARE node degrees; no dangling handling needed.",
    oracle=_KCORE_ORACLE,
    tags=("ext", "graph", "k-core", "fixed-rounds"),
)
def x178_kcore_peeling(spark: SparkSession, sf: str) -> DataFrame:
    li = (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_quantity") >= 45.0)
        .select("l_orderkey", "l_suppkey")
    )
    # r12 rework (guide §2.4): each round's per-node degree is an
    # unordered WINDOW count over the current edge set — symmetric
    # edges make the dst-side window the dst node's true degree — and
    # the round keeps an edge iff both endpoint degrees clear k. This
    # deletes the whole keep/semi-join machinery: the old shape needed
    # an eager node-set checkpoint per round (keep fed TWO semi-joins,
    # so unchecked lineage re-embedded the round's edge subtree twice)
    # plus a per-round edge checkpoint — 16 jobs/invocation. The window
    # form's lineage is LINEAR (each round is two windows + a filter
    # over the previous round), so the whole 3-round peel plus the
    # closing agg is ONE lazy plan with zero intermediate actions
    # (~5 jobs). Window order (dst, then src) leaves each round
    # src-partitioned, so round N+1's dst window pays the only
    # exchange and the closing src groupBy reuses the last window's
    # partitioning. A/B min-of-5 1.41 -> 1.32 s, identical cores;
    # symmetry is invariant under the peel (the filter is symmetric in
    # the endpoints), so in-degree == out-degree holds every round.
    # The r8 edge checkpoint is gone WITH its reason: it existed to
    # stop the keep actions replaying the co-supply self-join, and
    # there are no keep actions left — the single consumer reads the
    # edge build once inside the one job.
    e = _cosupply_edges(li)
    wd = _W.partitionBy("dst")
    ws = _W.partitionBy("src")
    for _ in range(3):
        e = (
            e.withColumn("dd", F.count(F.lit(1)).over(wd))
            .withColumn("ds", F.count(F.lit(1)).over(ws))
            .filter((F.col("ds") >= 22) & (F.col("dd") >= 22))
            .select("src", "dst")
        )
    return e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("core_degree")
    )


_COVERAGE_PICKS_ORACLE = f"""
    WITH dw AS (
        SELECT DISTINCT doc_id, unnest({sql_shingles('text')}) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    g1 AS (SELECT doc_id, count(*) AS gain FROM dw GROUP BY 1),
    p1 AS (SELECT doc_id, gain FROM g1 ORDER BY gain DESC, doc_id LIMIT 1),
    c1 AS (SELECT DISTINCT w FROM dw JOIN p1 USING (doc_id)),
    g2 AS (
        SELECT d.doc_id, count(*) AS gain
        FROM dw d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM p1)
          AND d.w NOT IN (SELECT w FROM c1)
        GROUP BY 1
    ),
    p2 AS (SELECT doc_id, gain FROM g2 ORDER BY gain DESC, doc_id LIMIT 1),
    c2 AS (SELECT w FROM c1 UNION
           SELECT DISTINCT w FROM dw JOIN p2 USING (doc_id)),
    g3 AS (
        SELECT d.doc_id, count(*) AS gain
        FROM dw d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM p1
                               UNION SELECT doc_id FROM p2)
          AND d.w NOT IN (SELECT w FROM c2)
        GROUP BY 1
    ),
    p3 AS (SELECT doc_id, gain FROM g3 ORDER BY gain DESC, doc_id LIMIT 1)
    SELECT 1 AS pick_no, doc_id, CAST(gain AS BIGINT) AS new_words FROM p1
    UNION ALL
    SELECT 2, doc_id, CAST(gain AS BIGINT) FROM p2
    UNION ALL
    SELECT 3, doc_id, CAST(gain AS BIGINT) FROM p3
"""


@register(
    "x179_greedy_coverage_picks",
    "Greedy maximum-coverage selection, 3 unrolled rounds: pick the "
    "document adding the most NOT-yet-covered vocabulary each round — "
    "the classic (1-1/e)-approximate submodular-coverage greedy that "
    "budgeted annotation, eval-set construction, and seed-corpus "
    "selection all reduce to (naive top-k-by-richness picks 3 "
    "near-duplicates of the same rich doc; marginal-gain greedy is "
    "what forces diversity). Every round is one anti-join against "
    "the covered-word set + one grouped count + a 1-row "
    "TakeOrdered argmax — no collect, the pick flows back as a "
    "1-row eagerly-checkpointed broadcast (x84's localCheckpoint "
    "pattern, so later rounds never re-execute earlier rounds' "
    "aggregations); rounds-as-a-cap is the x84/x178 pattern "
    "(production uses distributed lazy-greedy with the same "
    "per-round shape). Oracle unrolls the identical greedy in CTEs, "
    "so tie-breaks (gain desc, doc_id) and the whole marginal-gain "
    "cascade are under the hash.",
    oracle=_COVERAGE_PICKS_ORACLE,
    tags=("ext", "coverage", "submodular", "data-selection"),
)
def x179_greedy_coverage_picks(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(
        F.col("text").isNotNull()
    )
    # the shingle frame feeds every round (gain count, coverage update,
    # anti-joins) — persist it once, the x8 keyed-frame posture
    dw = docs.select(
        "doc_id", F.explode(X.word_shingles(F.col("text"))).alias("w")
    ).distinct().persist()

    # r12 (guide §5, bounded driver data): each round's pick is ONE
    # row — the argmax collect()s to driver literals instead of living
    # on as an eagerly-checkpointed 1-row frame re-attached via
    # broadcast joins. Lineage stays shallow because the next round's
    # plan references only dw + literal predicates, so the per-round
    # checkpoint, its job, and both broadcast builds disappear: 17
    # jobs/invocation -> ~8 (the rounds themselves stay sequential —
    # greedy marginal gain is inherently so). Identical picks (A/B
    # min-of-7 3.28 -> 3.19 s; the residual cost is the three gain
    # aggregations, which ARE the algorithm).
    picked_ids: list = []
    rows: list = []
    remaining = dw
    for round_no in (1, 2, 3):
        gains = remaining.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("gain")
        )
        top = gains.orderBy(F.desc("gain"), "doc_id").limit(1).collect()
        if not top:
            break  # empty corpus: no pick exists this round or later
        rows.append((round_no, top[0]["doc_id"], top[0]["gain"]))
        picked_ids.append(top[0]["doc_id"])
        covered = (
            dw.filter(F.col("doc_id").isin(picked_ids))
            .select("w")
            .distinct()
        )
        remaining = dw.filter(~F.col("doc_id").isin(picked_ids)).join(
            covered, "w", "left_anti"
        )
    # dw's cache is intentionally left live: Spark's CacheManager
    # dedupes identical canonicalized plans, so repeated invocations
    # REUSE this cache rather than stack copies (A/B'd in r7: an
    # explicit unpersist here costs ~1 s/invocation in steady state)
    if rows:
        return spark.createDataFrame(
            rows, "pick_no INT, doc_id BIGINT, new_words BIGINT"
        )
    return dw.select(
        F.lit(1).alias("pick_no"),
        "doc_id",
        F.lit(0).cast("long").alias("new_words"),
    ).limit(0)


_MODULARITY_ORACLE = f"""
    WITH {_COSUPPLY_EDGES_SQL},
    l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e),{_lp_round('l0', 'mc1', 'ml1')},{_lp_round('ml1', 'mc2', 'ml2')},
    lab_e AS (
        SELECT la.lab AS lab_src, lb.lab AS lab_dst
        FROM e
        JOIN ml2 la ON la.node = e.src
        JOIN ml2 lb ON lb.node = e.dst
    ),
    m2 AS (SELECT count(*) AS two_m FROM e),
    comm AS (
        SELECT ls.lab,
               COALESCE(i.in_x2, 0) AS in_x2,
               ls.tot
        FROM (
            SELECT lab_src AS lab, count(*) AS tot
            FROM lab_e GROUP BY 1
        ) ls
        LEFT JOIN (
            SELECT lab_src AS lab, count(*) AS in_x2
            FROM lab_e WHERE lab_src = lab_dst GROUP BY 1
        ) i USING (lab)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_communities,
           CAST(max(two_m) AS BIGINT) AS two_m,
           CAST(sum(two_m * in_x2 - tot * tot) AS BIGINT)
               AS modularity_scaled,
           CAST(sum(two_m * in_x2 - tot * tot) AS DOUBLE)
           / (CAST(max(two_m) AS DOUBLE) * CAST(max(two_m) AS DOUBLE))
               AS modularity
    FROM comm CROSS JOIN m2
"""


@register(
    "x180_modularity_score",
    "Newman modularity of the x91 label-propagation communities — the "
    "quality number that turns 'we ran community detection' into an "
    "evaluated result (Q near 0 = the partition is no better than the "
    "degree-preserving random graph; production uses exactly this to "
    "decide whether to keep or re-run a clustering). On the symmetric "
    "directed edge list, Q = sum_c(in_c/2m - (tot_c/2m)^2) clears its "
    "denominators to the INTEGER form sum_c(2m*in_c - tot_c^2) with "
    "2m = |directed edges|, in_c = within-community directed edges, "
    "tot_c = community degree sum — one float division at the very "
    "end. Pipeline: the same two LP rounds as x91 (shared unrolled "
    "oracle CTEs — the two entries cannot drift), one edge-to-label "
    "join against the BROADCAST node-label map (supplier-dimension "
    "sized — the edge list never shuffles for labels), then ONE "
    "community aggregation: the whole score is linear in per-community "
    "(tot, in) — 2m = sum(tot) and scaled = 2m*sum(in) - sum(tot^2) — "
    "so no separate edge count and no scalar cross join (r7 rework: "
    "4.7 -> 3.3 s isolated / 1.9 s in-suite — the remainder is the "
    "x91-shared LP phase).",
    oracle=_MODULARITY_ORACLE,
    tags=("ext", "graph", "modularity", "community-eval"),
)
def x180_modularity_score(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    # localCheckpoint: materialized once for the eager LP phase AND the
    # lazy rollup below, with lineage truncated so the rollup plan stays
    # shallow; the ContextCleaner reclaims it when the plan is released.
    # Lineage truncation blinds the parity sweep's plan guard to
    # everything upstream (ADVICE r7), so the PRE-checkpoint edge plan
    # is checked here inline before the checkpoint job runs.
    pre = _cosupply_edges(li)
    # The inline guard is CI-only and gated on an explicit env flag set
    # by tests/conftest.py (ADVICE r8): a bare try-import of `tests`
    # from library code would execute whatever unrelated package happens
    # to own that name in a deployed environment (or silently disable
    # the guard via the ImportError catch).
    if os.environ.get("SPARK_GRAFT_PLAN_GUARD") == "1":
        from tests.plan_invariants import check_plan_invariants

        check_plan_invariants(
            "x180_modularity_score (pre-checkpoint edges)",
            pre._jdf.queryExecution().executedPlan().toString(),
        )
    e = pre.localCheckpoint(eager=True)
    labels = G.label_propagation_fixed_rounds(e, rounds=2).select(
        "node", F.col("label").alias("lab")
    )
    # every node holds exactly one label, so the label joins are
    # row-preserving: |lab_e| = |e| = 2m — no separate edge count needed
    lab_e = (
        e.join(
            F.broadcast(
                labels.select(
                    F.col("node").alias("src"), F.col("lab").alias("lab_src")
                )
            ),
            "src",
        )
        .join(
            F.broadcast(
                labels.select(
                    F.col("node").alias("dst"), F.col("lab").alias("lab_dst")
                )
            ),
            "dst",
        )
        .select("lab_src", "lab_dst")
    )
    comm = lab_e.groupBy(F.col("lab_src").alias("lab")).agg(
        F.count(F.lit(1)).alias("tot"),
        F.sum(
            F.when(F.col("lab_src") == F.col("lab_dst"), 1).otherwise(0)
        ).alias("in_x2"),
    )
    # Q's cleared-denominator form is LINEAR in the per-community rows:
    # scaled = sum_c(2m*in_c - tot_c^2) = (sum tot)*(sum in) - sum(tot^2)
    agg = comm.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.sum("tot").cast("long").alias("two_m"),
        F.sum("in_x2").cast("long").alias("s_in"),
        F.sum(F.col("tot") * F.col("tot")).cast("long").alias("s_tot2"),
    )
    scaled = F.col("two_m") * F.col("s_in") - F.col("s_tot2")
    return agg.select(
        "n_communities",
        "two_m",
        scaled.cast("long").alias("modularity_scaled"),
        (
            scaled.cast("double")
            / (F.col("two_m").cast("double") * F.col("two_m").cast("double"))
        ).alias("modularity"),
    )


_WEIGHTED_JACCARD_ORACLE = f"""
    WITH dsh AS (
        SELECT doc_id, unnest({sql_shingles('text')}) AS g
        FROM documents WHERE text IS NOT NULL
    ), rare AS (
        SELECT g FROM dsh GROUP BY g HAVING count(*) <= 5
    ), cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM dsh a JOIN dsh b ON a.g = b.g AND a.doc_id < b.doc_id
        JOIN rare r ON r.g = a.g
    ), tf AS (
        SELECT doc_id, w, count(*) AS tf FROM (
            SELECT doc_id, unnest({SQL_WORDS.format(t='text')}) AS w
            FROM documents WHERE text IS NOT NULL
        ) GROUP BY 1, 2
    ), tot AS (SELECT doc_id, sum(tf) AS tot FROM tf GROUP BY 1),
    inter AS (
        SELECT c.da, c.db, sum(least(ta.tf, tb.tf)) AS s_min
        FROM cand c
        JOIN tf ta ON ta.doc_id = c.da
        JOIN tf tb ON tb.doc_id = c.db AND tb.w = ta.w
        GROUP BY 1, 2
    )
    SELECT i.da AS doc_a, i.db AS doc_b,
           CAST(i.s_min AS BIGINT) AS sum_min_tf,
           CAST(na.tot + nb.tot - i.s_min AS BIGINT) AS sum_max_tf,
           CAST(i.s_min * 1000000 // (na.tot + nb.tot - i.s_min)
                AS BIGINT) AS wjaccard_ppm
    FROM inter i
    JOIN tot na ON na.doc_id = i.da
    JOIN tot nb ON nb.doc_id = i.db
    ORDER BY wjaccard_ppm DESC, doc_a, doc_b
    LIMIT 25
"""


@register(
    "x181_weighted_jaccard_pairs",
    "Weighted (multiset) Jaccard near-dup verification with "
    "RARE-SHINGLE blocking: candidate pairs must share at least one "
    "shingle appearing in <= 5 documents — the rare-term blocking "
    "trick that kills the quadratic blow-up common shingles cause "
    "(a shingle in half the corpus generates O(n^2) candidates and "
    "discriminates nothing; a df<=5 shingle generates <= 10 pairs "
    "and is strong evidence) — then scored by sum(min tf)/"
    "sum(max tf) over word FREQUENCIES, the repetition-sensitive "
    "variant set-Jaccard (x6) is blind to: a doc that repeats one "
    "paragraph 50x and one that has it once are identical as SETS "
    "but far apart as multisets. sum(max) folds to tot_a + tot_b - "
    "sum(min), so one common-word join per pair suffices; all "
    "integer counts, ppm by integer DIV, TakeOrdered top-25.",
    oracle=_WEIGHTED_JACCARD_ORACLE,
    tags=("ext", "dedup", "weighted-jaccard", "blocking"),
)
def x181_weighted_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents").filter(
        F.col("text").isNotNull()
    )
    dsh = docs.select(
        "doc_id", F.explode(X.word_shingles(F.col("text"))).alias("g")
    )
    rare = dsh.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= 5
    ).select("g")
    rare_post = dsh.join(F.broadcast(rare), "g")
    cand = (
        rare_post.alias("a")
        .join(
            dsh.alias("b"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .distinct()
    )
    # r12: doc totals RIDE the tf rows instead of joining twice after
    # the pair aggregation. The word explode repartitions by doc_id
    # once, so the (doc_id, w) count, the per-doc total window, and
    # the downstream reads all share that single exchange; tot is
    # functionally dependent on doc_id, so min() recovers it from the
    # pair groups and the two inter⋈tot joins vanish (guide §2.4;
    # A/B 1.77 → 1.57 s min-of-5, identical top-25).
    tf = (
        docs.select("doc_id", F.explode(TX.words(F.col("text"))).alias("w"))
        .repartition("doc_id")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "tot", F.sum("tf").over(Window.partitionBy("doc_id"))
        )
        .persist()
    )
    inter = (
        cand.join(
            tf.select(
                F.col("doc_id").alias("da"),
                F.col("w"),
                F.col("tf").alias("tfa"),
                F.col("tot").alias("ta"),
            ),
            "da",
        )
        .join(
            tf.select(
                F.col("doc_id").alias("db"),
                F.col("w"),
                F.col("tf").alias("tfb"),
                F.col("tot").alias("tb"),
            ),
            ["db", "w"],
        )
        .groupBy("da", "db")
        .agg(
            F.sum(F.least("tfa", "tfb")).alias("s_min"),
            F.min("ta").alias("ta"),
            F.min("tb").alias("tb"),
        )
    )
    scored = (
        inter.select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.col("s_min").cast("long").alias("sum_min_tf"),
            (F.col("ta") + F.col("tb") - F.col("s_min"))
            .cast("long")
            .alias("sum_max_tf"),
            F.expr(
                "CAST(s_min * 1000000 DIV (ta + tb - s_min) AS BIGINT)"
            ).alias("wjaccard_ppm"),
        )
    )
    return scored.orderBy(
        F.desc("wjaccard_ppm"), "doc_a", "doc_b"
    ).limit(25)


_CUSUM_ALARM_ORACLE = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ), tot AS (
        SELECT event_type, count(*) AS n_days, sum(cents) AS total
        FROM daily GROUP BY 1
    ), pre AS (
        SELECT d.event_type, d.d, t.total,
               sum(d.cents * t.n_days - t.total) OVER (
                   PARTITION BY d.event_type ORDER BY d.d) AS p
        FROM daily d JOIN tot t USING (event_type)
    ), walk AS (
        SELECT event_type, d, total, p,
               min(p) OVER (PARTITION BY event_type ORDER BY d) AS runmin
        FROM pre
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
           CAST(p - least(runmin, 0) AS BIGINT) AS cusum_pos_scaled,
           p - least(runmin, 0) > total AS alarm
    FROM walk
"""


@register(
    "w24_cusum_alarm_walk",
    "One-sided CUSUM alarm walk — the ONLINE companion to x165's "
    "offline change-point argmax: S_i = max(0, S_{i-1} + dev_i) "
    "fires when sustained positive drift accumulates past a "
    "threshold (one mean-day's scaled volume). The recursive reset "
    "is eliminated by the prefix-min identity S_i = P_i - "
    "min(0, min_{j<=i} P_j), so the whole walk is two stacked "
    "cumulative windows over the per-type day series — no fold, no "
    "UDF, no recursion, and every quantity is the x165 integer "
    "scaling (dev_i = cents_i*N - total). The nested "
    "min-over-cumsum window is the textbook Spark/DuckDB-portable "
    "form of running-reset recurrences; per-type partitions bound "
    "each window by days-per-type.",
    oracle=_CUSUM_ALARM_ORACLE,
    tags=("ext", "changepoint", "cusum", "monitoring"),
)
def w24_cusum_alarm_walk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("cents").alias("total")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    walk = (
        daily.join(tot, "event_type")
        .withColumn(
            "p",
            F.sum(
                F.col("cents") * F.col("n_days") - F.col("total")
            ).over(w),
        )
        .withColumn("runmin", F.min("p").over(w))
    )
    s = F.col("p") - F.least(F.col("runmin"), F.lit(0))
    return walk.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        s.cast("long").alias("cusum_pos_scaled"),
        (s > F.col("total")).alias("alarm"),
    )


_PSEUDONYM_ORACLE = f"""
    WITH ids AS (SELECT DISTINCT user_id FROM events),
    ps AS (
        SELECT user_id, md5(CAST(user_id AS VARCHAR)) AS pseudonym
        FROM ids
    ), by_id AS (
        SELECT sum(CAST(floor(COALESCE(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END, 0) * 100 + 0.5) AS BIGINT))
                   AS cents
        FROM events
    ), by_ps AS (
        SELECT sum(cents) AS cents FROM (
            SELECT md5(CAST(user_id AS VARCHAR)) AS pseudonym,
                   sum(CAST(floor(COALESCE(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END, 0) * 100 + 0.5) AS BIGINT))
                       AS cents
            FROM events GROUP BY 1
        )
    )
    SELECT CAST((SELECT count(*) FROM ids) AS BIGINT) AS n_users,
           CAST((SELECT count(DISTINCT pseudonym) FROM ps) AS BIGINT)
               AS n_pseudonyms,
           CAST((SELECT count(*) FROM ids)
                - (SELECT count(DISTINCT pseudonym) FROM ps) AS BIGINT)
               AS n_collisions,
           CAST((SELECT cents FROM by_id) AS BIGINT) AS cents_by_id,
           CAST((SELECT cents FROM by_ps) AS BIGINT) AS cents_by_pseudonym
"""


@register(
    "x182_pseudonym_collision_audit",
    "Pseudonymization integrity audit: replacing user ids with "
    "md5 pseudonyms (format-preserving, referentially consistent — "
    "the standard de-identification for analytics extracts) is only "
    "sound if the mapping is injective ON THIS CORPUS and totals "
    "survive re-keying; the audit counts distinct ids vs distinct "
    "pseudonyms (collisions would silently MERGE two users' "
    "histories — worse than a leak, it corrupts analytics) and "
    "checksums spend aggregated under both keys, which must agree "
    "to the cent. Distinct-count passes are partial-aggregated; "
    "output is one row at any volume. Complements x135/x146/x167 "
    "(which audit the quasi-identifier side; this audits the "
    "identifier replacement itself).",
    oracle=_PSEUDONYM_ORACLE,
    tags=("ext", "privacy", "pseudonymization", "audit"),
)
def x182_pseudonym_collision_audit(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    cents = F.floor(
        F.coalesce(fin("value"), F.lit(0.0)) * 100 + 0.5
    ).cast("long")
    by_ps = (
        ev.groupBy(F.md5(F.col("user_id").cast("string")).alias("pseudonym"))
        .agg(F.sum(cents).alias("cents"))
        .agg(
            F.count(F.lit(1)).alias("n_pseudonyms"),
            F.sum("cents").alias("cents_by_pseudonym"),
        )
    )
    by_id = ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.sum(cents).alias("cents_by_id"),
    )
    return by_id.crossJoin(F.broadcast(by_ps)).select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_pseudonyms").cast("long").alias("n_pseudonyms"),
        (F.col("n_users") - F.col("n_pseudonyms"))
        .cast("long")
        .alias("n_collisions"),
        F.col("cents_by_id").cast("long").alias("cents_by_id"),
        F.col("cents_by_pseudonym").cast("long").alias("cents_by_pseudonym"),
    )


def _msub(v: str, i: int) -> str:
    return f"{v}[{i} * 16 + 1 : {i} * 16 + 16]"


_MAXSIM_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ), p AS (
        SELECT vec_id AS probe_id, v AS pv FROM c WHERE vec_id < 6
    ), scored AS (
        SELECT p.probe_id, d.vec_id AS doc_id,
               ((greatest({sql_cosine(_msub('p.pv', 0), _msub('d.v', 0))}, {sql_cosine(_msub('p.pv', 0), _msub('d.v', 1))}, {sql_cosine(_msub('p.pv', 0), _msub('d.v', 2))}, {sql_cosine(_msub('p.pv', 0), _msub('d.v', 3))})
                 + greatest({sql_cosine(_msub('p.pv', 1), _msub('d.v', 0))}, {sql_cosine(_msub('p.pv', 1), _msub('d.v', 1))}, {sql_cosine(_msub('p.pv', 1), _msub('d.v', 2))}, {sql_cosine(_msub('p.pv', 1), _msub('d.v', 3))}))
                + greatest({sql_cosine(_msub('p.pv', 2), _msub('d.v', 0))}, {sql_cosine(_msub('p.pv', 2), _msub('d.v', 1))}, {sql_cosine(_msub('p.pv', 2), _msub('d.v', 2))}, {sql_cosine(_msub('p.pv', 2), _msub('d.v', 3))}))
               + greatest({sql_cosine(_msub('p.pv', 3), _msub('d.v', 0))}, {sql_cosine(_msub('p.pv', 3), _msub('d.v', 1))}, {sql_cosine(_msub('p.pv', 3), _msub('d.v', 2))}, {sql_cosine(_msub('p.pv', 3), _msub('d.v', 3))}) AS maxsim
        FROM p JOIN c d ON d.vec_id <> p.probe_id
    )
    SELECT probe_id, doc_id, maxsim,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT probe_id, doc_id, maxsim,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY maxsim DESC, doc_id) AS rnk
        FROM scored
    ) WHERE rnk <= 5
"""


@register(
    "x183_colbert_maxsim_topk",
    "Late-interaction (ColBERT-style) MaxSim retrieval: each vector "
    "is decomposed into four 16-dim sub-vectors standing in for "
    "token embeddings, and a candidate's score is the SUM over query "
    "sub-vectors of its best-matching document sub-vector — the "
    "multi-vector scoring that beats single-vector cosine when "
    "different parts of a query match different parts of a document "
    "(single-vector pooling averages those signals away; x10 is "
    "exactly that baseline). Float discipline for the hash: the max "
    "per (probe, doc, query-sub) is order-free, and the 4-term sum "
    "is closed in FIXED associativity ((s0+s1)+s2)+s3 via "
    "conditional aggregation — never a float sum over an unordered "
    "group. Scale shape: probes broadcast, corpus sub-vectors "
    "streamed, one partial-aggregated max + one 4-column pivot per "
    "pair, top-5 per probe by windowed rank; 4x the pair rows of "
    "x10 for 4x the signal, same bucketable structure as the IVF "
    "path if the corpus grows.",
    oracle=_MAXSIM_ORACLE,
    tags=("ext", "ann", "maxsim", "late-interaction"),
)
def x183_colbert_maxsim_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    # NULL vectors are excluded (engine-wide vector-NULL convention,
    # round 11) — the oracle carries the explicit IS NOT NULL twin
    emb = load_table(spark, sf, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    def sl(i: int) -> str:
        return f"slice(embedding, {i} * 16 + 1, 16)"

    # sub-vector slices AND their norms are hoisted to per-ROW columns
    # before the pair join (r11, the same bit-identical rework as
    # similarity.brute_force_topk): the in-join cosines re-sliced each
    # operand and re-folded both sub-norms per probe x candidate PAIR —
    # 48 array folds + 64 slices per pair drop to the 16 dot folds +
    # 16 multiplies MaxSim actually needs. dot/(pn_i * dn_j) is the
    # same IEEE arithmetic on the same values. All expressions build as
    # SQL strings (r12): the Column-API form issued hundreds of py4j
    # lambda/literal round-trips of serial driver time per invocation
    # (profiled: 1.3-1.4 s t_build with ONE Spark job).
    corpus = emb.select(
        F.col("vec_id").alias("doc_id"),
        *[F.expr(sl(j)).alias(f"d{j}") for j in range(4)],
        *[F.expr(S.norm_sql(sl(j))).alias(f"dn{j}") for j in range(4)],
    )
    probes = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("probe_id"),
        *[F.expr(sl(j)).alias(f"p{j}") for j in range(4)],
        *[F.expr(S.norm_sql(sl(j))).alias(f"pn{j}") for j in range(4)],
    )

    # per query-sub best match as greatest() of the four document-sub
    # cosines — the whole MaxSim score is ONE projected expression per
    # (probe, doc) pair: no explode, no grouped max, no pivot, and the
    # only shuffle left is the per-probe top-5 window (A/B'd vs the
    # explode+groupBy+pivot form: 4.73 s -> 2.60 s median at sf0.1, and the
    # fixed-associativity sum discipline is unchanged)
    m = [
        "greatest("
        + ", ".join(
            f"{S.dot_sql(f'p{qi}', f'd{dj}')} / (pn{qi} * dn{dj})"
            for dj in range(4)
        )
        + ")"
        for qi in range(4)
    ]
    scored = (
        F.broadcast(probes)
        .join(corpus, F.col("doc_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "doc_id",
            F.expr(f"((({m[0]} + {m[1]}) + {m[2]}) + {m[3]})").alias(
                "maxsim"
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("maxsim"), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "probe_id",
            "doc_id",
            "maxsim",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


_SKIPGRAM_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, t.i AS pos, w.ws[t.i] AS w
        FROM (SELECT doc_id, {SQL_WORDS.format(t='text')} AS ws
              FROM documents WHERE text IS NOT NULL) w,
             unnest(range(1, len(w.ws) + 1)) t(i)
    ), pairs AS (
        SELECT a.w AS center, b.w AS context, count(*) AS n
        FROM toks a
        JOIN toks b ON b.doc_id = a.doc_id
                   AND b.pos BETWEEN a.pos - 2 AND a.pos + 2
                   AND b.pos <> a.pos
        GROUP BY 1, 2
    )
    SELECT center, context, CAST(n AS BIGINT) AS n_pairs
    FROM pairs
    ORDER BY n_pairs DESC, center, context
    LIMIT 25
"""


@register(
    "x184_skipgram_pair_counts",
    "Skip-gram (center, context) pair extraction with a +-2 word "
    "window — the training-pair generation step of word2vec/GloVe "
    "pipelines, and the co-occurrence statistic (x120's event-basket "
    "lift, at TOKEN granularity) that seeds PMI-style association "
    "mining. The window join is per-document on positions, expressed "
    "as a banded position self-join: at corpus scale the identical "
    "semantics ship as the offset-explode equi-join (each token "
    "emits its 4 shifted (doc, pos+k) keys and joins on equality — "
    "no range predicate survives to the executor), and per-doc "
    "position locality keeps the join co-partitioned by doc_id "
    "either way. Counts are integers; top-25 is TakeOrdered with a "
    "total tie-break.",
    oracle=_SKIPGRAM_ORACLE,
    tags=("ext", "skipgram", "cooccurrence", "training-data"),
)
def x184_skipgram_pair_counts(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "doc_id", F.posexplode(TX.words(F.col("text"))).alias("pos", "w")
    )
    # offset-explode equi-join form: each center token emits its 4
    # in-window context positions as equality keys
    shifted = toks.select(
        "doc_id",
        F.col("w").alias("center"),
        F.explode(
            F.array(
                F.col("pos") - 2,
                F.col("pos") - 1,
                F.col("pos") + 1,
                F.col("pos") + 2,
            )
        ).alias("ctx_pos"),
    )
    pairs = shifted.join(
        toks.select(
            "doc_id",
            F.col("pos").alias("ctx_pos"),
            F.col("w").alias("context"),
        ),
        ["doc_id", "ctx_pos"],
    )
    counted = pairs.groupBy("center", "context").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    return counted.orderBy(F.desc("n_pairs"), "center", "context").limit(25)


_MATRYOSHKA_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ), p AS (
        SELECT vec_id AS probe_id, v AS pv FROM c WHERE vec_id < 8
    ), coarse AS (
        SELECT probe_id, doc_id, crank FROM (
            SELECT p.probe_id, d.vec_id AS doc_id,
                   row_number() OVER (PARTITION BY p.probe_id ORDER BY
                       {sql_cosine('p.pv[1:16]', 'd.v[1:16]')} DESC,
                       d.vec_id) AS crank
            FROM p JOIN c d ON d.vec_id <> p.probe_id
        ) WHERE crank <= 20
    )
    SELECT probe_id, doc_id, cos_full, CAST(rnk AS BIGINT) AS rnk,
           CAST(crank AS BIGINT) AS coarse_rank
    FROM (
        SELECT co.probe_id, co.doc_id, co.crank,
               {sql_cosine('p.pv', 'd.v')} AS cos_full,
               row_number() OVER (PARTITION BY co.probe_id ORDER BY
                   {sql_cosine('p.pv', 'd.v')} DESC, co.doc_id) AS rnk
        FROM coarse co
        JOIN p ON p.probe_id = co.probe_id
        JOIN c d ON d.vec_id = co.doc_id
    ) WHERE rnk <= 5
"""


@register(
    "x185_matryoshka_funnel_topk",
    "Matryoshka (coarse-to-fine) retrieval funnel: rank the corpus "
    "by the 16-dim PREFIX cosine (nested-embedding property: the "
    "prefix is itself a valid low-rank embedding), keep 20 "
    "candidates, then rerank only those by the full 64-dim cosine "
    "for the final top-5 — the two-stage funnel that makes "
    "billion-vector search affordable (the cheap stage touches "
    "everything at 1/4 the FLOPs and bandwidth; the exact stage "
    "touches 20 rows). The funnel is the explicit, verifiable form "
    "of what IVF (x14) and PQ (x38) approximate structurally; "
    "recall loss is confined to candidates the prefix mis-ranks "
    "past 20. Probe side broadcast both stages; the rerank join "
    "fetches full vectors ONLY for survivors — at scale that is "
    "the difference between streaming the corpus once at quarter "
    "width and random-accessing 20 rows, vs x10's full-width scan.",
    oracle=_MATRYOSHKA_ORACLE,
    tags=("ext", "ann", "matryoshka", "funnel"),
)
def x185_matryoshka_funnel_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    # NULL vectors are excluded (engine-wide vector-NULL convention,
    # round 11) — the oracle carries the explicit IS NOT NULL twin
    emb = load_table(spark, sf, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    corpus = emb.select("vec_id", "embedding")
    probes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pv")
    )
    w_c = Window.partitionBy("probe_id").orderBy(F.desc("cc"), "doc_id")
    # per-row slice norms hoisted above both funnel arms' pair joins
    # (r11, same bit-identical rework as similarity.brute_force_topk)
    coarse = (
        F.broadcast(probes.select(
            "probe_id",
            F.expr("slice(pv, 1, 16)").alias("pp"),
            S.norm(F.expr("slice(pv, 1, 16)")).alias("ppn"),
        ))
        .join(
            corpus.select(
                F.col("vec_id").alias("doc_id"),
                F.expr("slice(embedding, 1, 16)").alias("dp"),
                S.norm(F.expr("slice(embedding, 1, 16)")).alias("dpn"),
            ),
            F.col("doc_id") != F.col("probe_id"),
        )
        .select(
            "probe_id",
            "doc_id",
            (
                S.dot(F.col("pp"), F.col("dp"))
                / (F.col("ppn") * F.col("dpn"))
            ).alias("cc"),
        )
        .withColumn("crank", F.row_number().over(w_c))
        .filter(F.col("crank") <= 20)
        .select("probe_id", "doc_id", "crank")
    )
    rerank = (
        coarse.join(
            F.broadcast(
                probes.withColumn("pvn", S.norm(F.col("pv")))
            ),
            "probe_id",
        )
        .join(
            corpus.select(
                F.col("vec_id").alias("doc_id"),
                F.col("embedding").alias("dv"),
                S.norm(F.col("embedding")).alias("dvn"),
            ),
            "doc_id",
        )
        .select(
            "probe_id",
            "doc_id",
            "crank",
            (
                S.dot(F.col("pv"), F.col("dv"))
                / (F.col("pvn") * F.col("dvn"))
            ).alias("cos_full"),
        )
    )
    w_f = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_full"), "doc_id"
    )
    return (
        rerank.withColumn("rnk", F.row_number().over(w_f))
        .filter(F.col("rnk") <= 5)
        .select(
            "probe_id",
            "doc_id",
            "cos_full",
            F.col("rnk").cast("long").alias("rnk"),
            F.col("crank").cast("long").alias("coarse_rank"),
        )
    )


_BINARY_HAMMING_ORACLE = """
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), bits AS (
        SELECT vec_id,
               sum(CASE WHEN t.i <= 32 AND v[t.i] > 0
                        THEN (1::BIGINT) << (t.i - 1) ELSE 0 END) AS lo,
               sum(CASE WHEN t.i > 32 AND v[t.i] > 0
                        THEN (1::BIGINT) << (t.i - 33) ELSE 0 END) AS hi
        FROM c, unnest(range(1, 65)) t(i)
        GROUP BY 1
    ), p AS (
        SELECT vec_id AS probe_id, lo AS plo, hi AS phi
        FROM bits WHERE vec_id < 8
    )
    SELECT probe_id, doc_id, CAST(hamming AS BIGINT) AS hamming,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT p.probe_id, b.vec_id AS doc_id,
               bit_count(CAST(xor(b.lo, p.plo) AS BIGINT))
               + bit_count(CAST(xor(b.hi, p.phi) AS BIGINT)) AS hamming,
               row_number() OVER (PARTITION BY p.probe_id ORDER BY
                   bit_count(CAST(xor(b.lo, p.plo) AS BIGINT))
                   + bit_count(CAST(xor(b.hi, p.phi) AS BIGINT)),
                   b.vec_id) AS rnk
        FROM p JOIN bits b ON b.vec_id <> p.probe_id
    ) WHERE rnk <= 5
"""


@register(
    "x186_binary_hamming_topk",
    "1-bit binary quantization + Hamming retrieval: each 64-dim "
    "embedding collapses to its sign bits packed into two int64 "
    "half-words (bit 63 is avoided deliberately — the oracle engine "
    "refuses the overflowing 1<<63; two 32-bit halves are portable "
    "and cost one extra bit_count), and neighbors rank by "
    "popcount(xor) — the most aggressive point on the quantization "
    "ladder x136 (int8) and x38 (PQ) already occupy: 64x smaller "
    "than float32 with XOR+popcount per comparison, the regime "
    "binary-embedding search engines run their first-stage recall "
    "at. Everything is INTEGER (sign extraction, packing fold, "
    "Hamming, ranking) so the full surface hash-verifies with no "
    "float discipline needed. Packing is one aggregate fold per "
    "vector; probes broadcast; at corpus scale the packed table is "
    "16 bytes/vector and the scan is bandwidth-bound exactly as "
    "designed.",
    oracle=_BINARY_HAMMING_ORACLE,
    tags=("ext", "ann", "binary-quantization", "hamming"),
)
def x186_binary_hamming_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf, "embeddings")
    bits = emb.select(
        "vec_id",
        F.expr(
            "aggregate(sequence(0, 31), 0L, (acc, i) -> acc + "
            "IF(element_at(embedding, i + 1) > 0, shiftleft(1L, i), 0L))"
        ).alias("lo"),
        F.expr(
            "aggregate(sequence(32, 63), 0L, (acc, i) -> acc + "
            "IF(element_at(embedding, i + 1) > 0, shiftleft(1L, i - 32), 0L))"
        ).alias("hi"),
    )
    p = bits.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"),
        F.col("lo").alias("plo"),
        F.col("hi").alias("phi"),
    )
    ham = F.expr("bit_count(lo ^ plo) + bit_count(hi ^ phi)")
    w = Window.partitionBy("probe_id").orderBy("hamming", "doc_id")
    return (
        F.broadcast(p)
        .join(bits, F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("doc_id"),
            ham.cast("long").alias("hamming"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "probe_id",
            "doc_id",
            "hamming",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


_HAZARD_ORACLE = """
    WITH span AS (
        SELECT user_id,
               min(CAST(ts AS DATE)) AS f,
               max(CAST(ts AS DATE)) AS l
        FROM events GROUP BY 1
    ), obs AS (SELECT max(CAST(ts AS DATE)) AS end_d FROM events),
    lt AS (
        SELECT s.user_id,
               date_diff('day', s.f, s.l) AS k,
               s.l < o.end_d - INTERVAL 3 DAY AS churned
        FROM span s CROSS JOIN obs o
    ), per_k AS (
        SELECT k, count(*) AS n_ending,
               sum(CASE WHEN churned THEN 1 ELSE 0 END) AS n_churn
        FROM lt GROUP BY k
    ), risk AS (
        SELECT k, n_ending, n_churn,
               sum(n_ending) OVER (ORDER BY k DESC) AS n_at_risk
        FROM per_k
    )
    SELECT CAST(k AS BIGINT) AS days_survived,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(n_churn AS BIGINT) AS n_churned,
           CAST(n_churn * 1000000 // n_at_risk AS BIGINT) AS hazard_ppm
    FROM risk
"""


@register(
    "x187_discrete_hazard_table",
    "Discrete-time hazard table for user churn: lifetime = days "
    "between first and last event; users still active within 3 days "
    "of the observation end are CENSORED (their exit is unobserved, "
    "counting them as churned is the classic survivorship mistake "
    "x150 handles for records and this handles for durations). "
    "hazard(k) = churners with lifetime exactly k over users at "
    "risk at k, where the risk set is the reverse cumulative sum of "
    "lifetime counts — a DESC-ordered window over DISTINCT lifetime "
    "values (the a21/x61 distinct-value posture: the window runs "
    "over lifetime cardinality, bounded by the observation span in "
    "days, never over users). All integer; hazard in ppm by integer "
    "DIV. The log-free tabular core of survival analysis — the KM "
    "product curve is a running fold OVER these rows, deliberately "
    "left to the consumer (float product chains don't hash-verify).",
    oracle=_HAZARD_ORACLE,
    tags=("ext", "survival", "churn", "exact-stats"),
)
def x187_discrete_hazard_table(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    span = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("f"),
        F.max(F.to_date("ts")).alias("l"),
    )
    obs = ev.agg(F.max(F.to_date("ts")).alias("end_d"))
    lt = span.crossJoin(F.broadcast(obs)).select(
        "user_id",
        F.datediff("l", "f").alias("k"),
        (F.col("l") < F.date_sub("end_d", 3)).alias("churned"),
    )
    per_k = lt.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_ending"),
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).alias("n_churn"),
    )
    w = Window.orderBy(F.desc("k")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_k.withColumn("n_at_risk", F.sum("n_ending").over(w))
    return risk.select(
        F.col("k").cast("long").alias("days_survived"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("n_churn").cast("long").alias("n_churned"),
        F.expr("CAST(n_churn * 1000000 DIV n_at_risk AS BIGINT)").alias(
            "hazard_ppm"
        ),
    )


_COVARIATE_BALANCE_ORACLE = f"""
    WITH per_user AS (
        SELECT user_id,
               {SQL_H.format(s='CAST(user_id AS VARCHAR)')} % 2 AS arm,
               count(*) AS n_events,
               sum(CAST(floor(COALESCE(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END, 0) * 100 + 0.5) AS BIGINT))
                   AS cents,
               count(DISTINCT CAST(ts AS DATE)) AS n_days
        FROM events GROUP BY 1, 2
    ), long AS (
        SELECT arm, 'n_events' AS covariate, n_events AS x FROM per_user
        UNION ALL
        SELECT arm, 'cents', cents FROM per_user
        UNION ALL
        SELECT arm, 'n_days', n_days FROM per_user
    ), mo AS (
        SELECT covariate,
               sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS s1,
               sum(CASE WHEN arm = 0 THEN x * x ELSE 0 END) AS q1,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n2,
               sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS s2,
               sum(CASE WHEN arm = 1 THEN x * x ELSE 0 END) AS q2
        FROM long GROUP BY 1
    )
    SELECT covariate,
           CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
           - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_diff,
           (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
            - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
           / sqrt(((CAST(q1 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                      / CAST(n1 AS DOUBLE)) / CAST(n1 - 1 AS DOUBLE)
                   + (CAST(q2 AS DOUBLE)
                      - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                        / CAST(n2 AS DOUBLE)) / CAST(n2 - 1 AS DOUBLE))
                  / 2e0) AS smd
    FROM mo
"""


@register(
    "a24_covariate_balance_smd",
    "Covariate balance table (standardized mean differences) across "
    "the two md5 arms for three pre-treatment covariates — the "
    "randomization-quality check reviewers read FIRST in any "
    "experiment writeup (|SMD| > 0.1 on a covariate means the arms "
    "differ at baseline and effect estimates need adjustment, e.g. "
    "x159's CUPED): per-user event count, spend, and active days "
    "unpivot to (arm, covariate, x) long form, one grouped pass "
    "collects exact int64 moments per covariate, and SMD closes as "
    "diff / sqrt((var1 + var2)/2) in the character-identical IEEE "
    "shape both dialects share (the a20/a22 discipline). Three "
    "output rows at any volume; the unpivot triples the rollup "
    "input, not the fact scan.",
    oracle=_COVARIATE_BALANCE_ORACLE,
    tags=("ext", "ab-test", "balance", "exact-stats"),
)
def a24_covariate_balance_smd(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    per_user = ev.groupBy(
        "user_id",
        (X.base_hash(F.col("user_id").cast("string")) % 2).alias("arm"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.floor(F.coalesce(fin("value"), F.lit(0.0)) * 100 + 0.5).cast(
                "long"
            )
        ).alias("cents"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
    )
    long = per_user.selectExpr(
        "arm",
        "stack(3, 'n_events', n_events, 'cents', cents, "
        "'n_days', n_days) AS (covariate, x)",
    )
    a0 = F.when(F.col("arm") == 0, 1).otherwise(0)
    a1 = F.when(F.col("arm") == 1, 1).otherwise(0)
    mo = long.groupBy("covariate").agg(
        F.sum(a0).alias("n1"),
        F.sum(a0 * F.col("x")).alias("s1"),
        F.sum(a0 * F.col("x") * F.col("x")).alias("q1"),
        F.sum(a1).alias("n2"),
        F.sum(a1 * F.col("x")).alias("s2"),
        F.sum(a1 * F.col("x") * F.col("x")).alias("q2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    diff = d("s2") / d("n2") - d("s1") / d("n1")
    pooled = F.sqrt(
        (
            (d("q1") - d("s1") * d("s1") / d("n1"))
            / (F.col("n1") - 1).cast("double")
            + (d("q2") - d("s2") * d("s2") / d("n2"))
            / (F.col("n2") - 1).cast("double")
        )
        / 2.0
    )
    return mo.select(
        "covariate", diff.alias("mean_diff"), (diff / pooled).alias("smd")
    )


_KNN_LABEL_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ), p AS (
        SELECT vec_id AS probe_id, label AS true_label, v AS pv
        FROM c WHERE vec_id < 50
    ), nn AS (
        SELECT probe_id, true_label, label, rnk FROM (
            SELECT p.probe_id, p.true_label, d.label,
                   row_number() OVER (PARTITION BY p.probe_id ORDER BY
                       {sql_cosine('p.pv', 'd.v')} DESC, d.vec_id) AS rnk
            FROM p JOIN c d ON d.vec_id <> p.probe_id
        ) WHERE rnk <= 5
    ), votes AS (
        SELECT probe_id, true_label, label AS pred, count(*) AS nvote
        FROM nn GROUP BY 1, 2, 3
    ), pred AS (
        SELECT probe_id, true_label, pred FROM (
            SELECT probe_id, true_label, pred,
                   row_number() OVER (PARTITION BY probe_id
                       ORDER BY nvote DESC, pred) AS vr
            FROM votes
        ) WHERE vr = 1
    )
    SELECT CAST(true_label AS BIGINT) AS true_label,
           CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(CASE WHEN pred = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(sum(CASE WHEN pred = true_label THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS accuracy_ppm
    FROM pred GROUP BY 1
"""


@register(
    "x188_knn_label_eval",
    "kNN majority-vote label evaluation — the embedding-quality probe "
    "that needs no trained classifier: for 50 held-out probes, take "
    "the 5 nearest corpus vectors by cosine, vote on their labels "
    "(ties to the smaller label id), and report per-class accuracy "
    "in ppm. If cosine neighborhoods do not predict labels, the "
    "embedding space is not organized by the semantics the labels "
    "encode — the standard cheap sanity gate before spending on "
    "x32's semantic dedup or x21's centroids, which both ASSUME "
    "neighborhood coherence. Votes, argmax, and accuracy are all "
    "integer; the float cosine only ORDERS candidates (the "
    "x10-proven parity surface). Probes broadcast; one corpus scan; "
    "per-probe windows over 5-row frames; output bounded by label "
    "cardinality.",
    oracle=_KNN_LABEL_ORACLE,
    tags=("ext", "ann", "knn-eval", "embedding-quality"),
)
def x188_knn_label_eval(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    # NULL vectors are excluded (engine-wide vector-NULL convention,
    # round 11) — the oracle carries the explicit IS NOT NULL twin
    emb = load_table(spark, sf, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    corpus = emb.select(
        "vec_id", "label", "embedding", S.norm(F.col("embedding")).alias("cn")
    )
    probes = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("pv"),
        S.norm(F.col("embedding")).alias("pn"),
    )
    w_nn = Window.partitionBy("probe_id").orderBy(F.desc("c"), "vec_id")
    nn = (
        F.broadcast(probes)
        .join(corpus, F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "true_label",
            "label",
            "vec_id",
            # per-row norms hoisted above the pair join (r11, same
            # bit-identical rework as similarity.brute_force_topk)
            (
                S.dot(F.col("pv"), F.col("embedding"))
                / (F.col("pn") * F.col("cn"))
            ).alias("c"),
        )
        .withColumn("rnk", F.row_number().over(w_nn))
        .filter(F.col("rnk") <= 5)
    )
    votes = nn.groupBy("probe_id", "true_label", F.col("label").alias("pred")).agg(
        F.count(F.lit(1)).alias("nvote")
    )
    w_v = Window.partitionBy("probe_id").orderBy(F.desc("nvote"), "pred")
    pred = votes.withColumn("vr", F.row_number().over(w_v)).filter(
        F.col("vr") == 1
    )
    correct = F.sum(
        F.when(F.col("pred") == F.col("true_label"), 1).otherwise(0)
    )
    return pred.groupBy(F.col("true_label").cast("long").alias("true_label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        correct.cast("long").alias("n_correct"),
        F.expr(
            "CAST(sum(CASE WHEN pred = true_label THEN 1 ELSE 0 END) "
            "* 1000000 DIV count(*) AS BIGINT)"
        ).alias("accuracy_ppm"),
    )


_MIX_RATE_ORACLE = """
    WITH tagged AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 2 END
                   AS period,
               CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ), st AS (
        SELECT event_type,
               sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN period = 1 THEN cents ELSE 0 END) AS s1,
               sum(CASE WHEN period = 2 THEN 1 ELSE 0 END) AS n2,
               sum(CASE WHEN period = 2 THEN cents ELSE 0 END) AS s2
        FROM tagged GROUP BY 1
    ), tot AS (
        SELECT sum(n1) AS t1, sum(n2) AS t2 FROM st
    )
    SELECT event_type,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           (CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE)
            - CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE))
           * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) AS mix_effect,
           (CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE))
           * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) AS rate_effect
    FROM st CROSS JOIN tot
"""


@register(
    "a25_mix_rate_decomposition",
    "Mix/rate decomposition of a period-over-period metric change "
    "(Oaxaca-style): the average spend moved — was it WITHIN each "
    "event type (rate effect) or the COMPOSITION shifting toward "
    "cheaper types (mix effect)? Per stratum: mix = (w2 - w1) * m1, "
    "rate = w2 * (m2 - m1); the two columns sum exactly to the "
    "overall mean change (the identity the decomposition exists "
    "for), and mistaking one for the other is the classic "
    "Simpson's-paradox misread of a topline metric. Weights and "
    "per-stratum means derive from exact int64 counts/cents "
    "moments in one grouped pass + a one-row broadcast of period "
    "totals; effects close in one shared IEEE shape per dialect. "
    "Output bounded by stratum cardinality.",
    oracle=_MIX_RATE_ORACLE,
    tags=("ext", "analytics", "decomposition", "exact-stats"),
)
def a25_mix_rate_decomposition(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    tagged = ev.select(
        "event_type",
        F.when(
            F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1
        )
        .otherwise(2)
        .alias("period"),
        F.floor(fin("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    p1 = F.when(F.col("period") == 1, 1).otherwise(0)
    p2 = F.when(F.col("period") == 2, 1).otherwise(0)
    st = tagged.groupBy("event_type").agg(
        F.sum(p1).alias("n1"),
        F.sum(p1 * F.col("cents")).alias("s1"),
        F.sum(p2).alias("n2"),
        F.sum(p2 * F.col("cents")).alias("s2"),
    )
    tot = st.agg(
        F.sum("n1").alias("t1"), F.sum("n2").alias("t2")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    joined = st.crossJoin(F.broadcast(tot))
    return joined.select(
        "event_type",
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        (
            (d("n2") / d("t2") - d("n1") / d("t1")) * (d("s1") / d("n1"))
        ).alias("mix_effect"),
        (
            (d("n2") / d("t2")) * (d("s2") / d("n2") - d("s1") / d("n1"))
        ).alias("rate_effect"),
    )


_QTE_ORACLE = f"""
    WITH per_user AS (
        SELECT user_id,
               {SQL_H.format(s='CAST(user_id AS VARCHAR)')} % 2 AS arm,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ), q AS (
        SELECT arm,
               quantile_cont(cents, 0.25e0) AS q25,
               quantile_cont(cents, 0.5e0) AS q50,
               quantile_cont(cents, 0.75e0) AS q75
        FROM per_user GROUP BY 1
    )
    SELECT p, qte FROM (
        SELECT 'p25' AS p,
               (SELECT q25 FROM q WHERE arm = 1)
               - (SELECT q25 FROM q WHERE arm = 0) AS qte
        UNION ALL
        SELECT 'p50',
               (SELECT q50 FROM q WHERE arm = 1)
               - (SELECT q50 FROM q WHERE arm = 0)
        UNION ALL
        SELECT 'p75',
               (SELECT q75 FROM q WHERE arm = 1)
               - (SELECT q75 FROM q WHERE arm = 0)
    )
"""


@register(
    "a26_quantile_treatment_effects",
    "Quantile treatment effects at p25/p50/p75 between the two md5 "
    "arms' per-user spend — the distributional readout a mean "
    "difference (a20) compresses away: a feature that helps light "
    "spenders and hurts whales can show a ZERO mean effect while "
    "every quantile moved; QTE is the standard lens for such "
    "heterogeneous effects. Exact interpolated percentiles on "
    "integer cents are hash-stable (interpolation at quarter "
    "points multiplies an int64 gap by an exactly-representable "
    "0.25/0.5/0.75 — no rounding anywhere), computed per arm in "
    "one grouped exact-percentile pass (the a1 ObjectHashAggregate "
    "posture, approx_percentile the documented 100 TB switch) and "
    "differenced arm-1-minus-arm-0 per quantile; 3 rows out.",
    oracle=_QTE_ORACLE,
    tags=("ext", "ab-test", "qte", "exact-stats"),
)
def a26_quantile_treatment_effects(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    per_user = ev.groupBy(
        "user_id",
        (X.base_hash(F.col("user_id").cast("string")) % 2).alias("arm"),
    ).agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    q = per_user.groupBy("arm").agg(
        F.expr("percentile(cents, 0.25)").alias("q25"),
        F.expr("percentile(cents, 0.5)").alias("q50"),
        F.expr("percentile(cents, 0.75)").alias("q75"),
    )
    # one global conditional agg, not two filters + a crossJoin: the
    # global aggregate always emits ONE row (NULL quantiles when an arm
    # is absent), so the 3-row spine survives an empty or one-armed
    # corpus exactly like the oracle's scalar subqueries (empty-input
    # parity, round 10); identical values whenever both arms exist
    wide = q.agg(
        *[
            F.max(F.when(F.col("arm") == arm, F.col(c))).alias(out)
            for arm, pre in ((0, "a"), (1, "b"))
            for c, out in (
                ("q25", f"{pre}25"),
                ("q50", f"{pre}50"),
                ("q75", f"{pre}75"),
            )
        ]
    )
    return wide.selectExpr(
        "stack(3, 'p25', b25 - a25, 'p50', b50 - a50, "
        "'p75', b75 - a75) AS (p, qte)"
    )


_EB_SMOOTH_ORACLE = """
    WITH per_user AS (
        SELECT user_id,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k
        FROM events GROUP BY 1
    ), pop AS (
        SELECT sum(k) AS kk, sum(v) AS vv FROM per_user WHERE v > 0
    )
    SELECT user_id, CAST(v AS BIGINT) AS n_views,
           CAST(k AS BIGINT) AS n_purchases,
           CAST(k * 1000000 // v AS BIGINT) AS raw_ppm,
           CAST((k * vv + 20 * kk) * 1000000
                // (vv * (v + 20)) AS BIGINT) AS smoothed_ppm
    FROM per_user CROSS JOIN pop
    WHERE v > 0
    ORDER BY CAST(k * vv + 20 * kk AS DOUBLE)
             / CAST(vv * (v + 20) AS DOUBLE) DESC, user_id
    LIMIT 20
"""


@register(
    "x189_eb_smoothed_ranking",
    "Empirical-Bayes smoothed conversion ranking: each user's "
    "purchase/view rate is shrunk toward the population rate with "
    "prior strength 20 — smoothed = (k + 20*m)/(v + 20) with m the "
    "pooled P/V — so a 1-for-1 user no longer outranks a 45-for-50 "
    "one (the same pathology x148 fixes frequentist-ly with Wilson "
    "bounds; shrinkage is the Bayesian answer, and the two should "
    "broadly agree on who is top). The pooled prior keeps EVERYTHING "
    "rational: substituting m = kk/vv clears to the int64 fraction "
    "(k*vv + 20*kk) / (vv*(v+20)), reported in truncating ppm and "
    "ranked by its single-shape float value (numerator/denominator "
    "stay exact; only the ORDERING division floats). One grouped "
    "pass + a one-row broadcast of the pooled totals; top-20 is "
    "TakeOrdered.",
    oracle=_EB_SMOOTH_ORACLE,
    tags=("ext", "ranking", "empirical-bayes", "shrinkage"),
)
def x189_eb_smoothed_ranking(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "v"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("k"),
    ).filter(F.col("v") > 0)
    pop = per_user.agg(
        F.sum("k").alias("kk"), F.sum("v").alias("vv")
    )
    joined = per_user.crossJoin(F.broadcast(pop))
    num = F.col("k") * F.col("vv") + 20 * F.col("kk")
    den = F.col("vv") * (F.col("v") + 20)
    return (
        joined.select(
            "user_id",
            F.col("v").cast("long").alias("n_views"),
            F.col("k").cast("long").alias("n_purchases"),
            F.expr("CAST(k * 1000000 DIV v AS BIGINT)").alias("raw_ppm"),
            F.expr(
                "CAST((k * vv + 20 * kk) * 1000000 "
                "DIV (vv * (v + 20)) AS BIGINT)"
            ).alias("smoothed_ppm"),
            (num.cast("double") / den.cast("double")).alias("_ord"),
        )
        .orderBy(F.desc("_ord"), "user_id")
        .limit(20)
        .drop("_ord")
    )


_TV_DRIFT_ORACLE = """
    WITH tagged AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 2 END
                   AS period
        FROM events
    ), st AS (
        SELECT event_type,
               sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN period = 2 THEN 1 ELSE 0 END) AS n2
        FROM tagged GROUP BY 1
    ), tot AS (SELECT sum(n1) AS t1, sum(n2) AS t2 FROM st)
    SELECT CAST(count(*) AS BIGINT) AS n_categories,
           CAST(max(t1) AS BIGINT) AS n_period1,
           CAST(max(t2) AS BIGINT) AS n_period2,
           CAST(sum(abs(n1 * t2 - n2 * t1)) AS BIGINT) AS tv_num,
           CAST(2 * max(t1) * max(t2) AS BIGINT) AS tv_den,
           CAST(sum(abs(n1 * t2 - n2 * t1)) * 1000000
                // (2 * max(t1) * max(t2)) AS BIGINT) AS tv_ppm
    FROM st CROSS JOIN tot
"""


@register(
    "x190_total_variation_drift",
    "Total-variation distance between the first-half and second-half "
    "event-type distributions — the distribution-drift monitor that "
    "needs NO logarithms (KL and JS divergences are the usual choice "
    "and are cross-engine unstable through ln; TV = half the L1 gap "
    "is the metric with the cleanest operational reading: the "
    "maximum probability mass any event reassignment can differ by). "
    "Clearing denominators makes it EXACT: TV = sum|n1_i*T2 - "
    "n2_i*T1| / (2*T1*T2), an int64 fraction emitted alongside its "
    "truncating ppm — drift alarms compare tv_num*threshold_den "
    "against tv_den*threshold_num in pure integers. One grouped "
    "count pass, category-bounded rollup; the drift complement to "
    "x103's per-quantile monitor (which watches one metric's shape; "
    "this watches the categorical mix).",
    oracle=_TV_DRIFT_ORACLE,
    tags=("ext", "drift", "monitoring", "exact-stats"),
)
def x190_total_variation_drift(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    tagged = ev.select(
        "event_type",
        F.when(
            F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1
        )
        .otherwise(2)
        .alias("period"),
    )
    st = tagged.groupBy("event_type").agg(
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("period") == 2, 1).otherwise(0)).alias("n2"),
    )
    tot = st.agg(F.sum("n1").alias("t1"), F.sum("n2").alias("t2"))
    joined = st.crossJoin(F.broadcast(tot))
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        F.max("t1").cast("long").alias("n_period1"),
        F.max("t2").cast("long").alias("n_period2"),
        F.sum(
            F.abs(F.col("n1") * F.col("t2") - F.col("n2") * F.col("t1"))
        )
        .cast("long")
        .alias("tv_num"),
        (2 * F.max("t1") * F.max("t2")).cast("long").alias("tv_den"),
        F.expr(
            "CAST(sum(abs(n1 * t2 - n2 * t1)) * 1000000 "
            "DIV (2 * max(t1) * max(t2)) AS BIGINT)"
        ).alias("tv_ppm"),
    )


_REL_DIVISION_ORACLE = """
    WITH top_parts AS (
        SELECT l_partkey FROM lineitem
        GROUP BY 1 ORDER BY sum(l_quantity) DESC, l_partkey LIMIT 5
    ), cover AS (
        SELECT l.l_suppkey, count(DISTINCT l.l_partkey) AS n_cov
        FROM lineitem l JOIN top_parts t USING (l_partkey)
        GROUP BY 1
    )
    SELECT l_suppkey AS suppkey,
           CAST(n_cov AS BIGINT) AS n_top_parts_supplied
    FROM cover WHERE n_cov = 5
"""


@register(
    "j24_relational_division",
    "Relational DIVISION — suppliers that ship EVERY one of the 5 "
    "highest-volume parts: the classic universally-quantified query "
    "shape (FOR ALL x in S: exists a row) that no single join "
    "expresses, completing the join-algebra tour (j5 EXISTS, j15 "
    "anti, d6 set-subtract are the existential forms; this is the "
    "universal one). The standard scalable encoding: count DISTINCT "
    "covered divisor members per candidate and keep counts equal to "
    "|divisor| — one semi-joined grouped distinct-count against the "
    "broadcast 5-row divisor, no double-negation NOT-EXISTS nesting "
    "(the textbook form Catalyst turns into two correlated "
    "anti-joins). The divisor itself is a TakeOrdered top-5 on "
    "part volume.",
    oracle=_REL_DIVISION_ORACLE,
    tags=("ext", "join", "relational-division"),
)
def j24_relational_division(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    top_parts = (
        li.groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .orderBy(F.desc("q"), "l_partkey")
        .limit(5)
        .select("l_partkey")
    )
    cover = (
        li.join(F.broadcast(top_parts), "l_partkey")
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").alias("n_cov"))
    )
    return cover.filter(F.col("n_cov") == 5).select(
        F.col("l_suppkey").alias("suppkey"),
        F.col("n_cov").cast("long").alias("n_top_parts_supplied"),
    )


_CHURN_LABEL_ORACLE = """
    WITH obs AS (
        SELECT user_id,
               count(*) AS n_events,
               sum(CAST(floor(COALESCE(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END, 0) * 100 + 0.5) AS BIGINT))
                   AS cents,
               count(DISTINCT CAST(ts AS DATE)) AS n_days,
               date_diff('day', max(CAST(ts AS DATE)), DATE '2024-01-24')
                   AS days_since_last
        FROM events WHERE ts < TIMESTAMP '2024-01-24'
        GROUP BY 1
    ), outcome AS (
        SELECT DISTINCT user_id FROM events
        WHERE ts >= TIMESTAMP '2024-01-24'
    )
    SELECT o.user_id,
           CAST(o.n_events AS BIGINT) AS n_events,
           CAST(o.cents AS BIGINT) AS cents,
           CAST(o.n_days AS BIGINT) AS n_days,
           CAST(o.days_since_last AS BIGINT) AS days_since_last,
           u.user_id IS NULL AS churned
    FROM obs o LEFT JOIN outcome u USING (user_id)
"""


@register(
    "x191_churn_label_builder",
    "Supervised churn-label construction with a hard temporal wall: "
    "features come ONLY from the observation window (before "
    "2024-01-24 — counts, spend, active days, recency measured AT "
    "the wall), the label ONLY from the outcome window (no activity "
    "after the wall = churned) — the label factory where time "
    "leakage is born in real pipelines (a feature that peeks past "
    "the wall scores brilliantly offline and collapses in "
    "production; x174 audits splits, this CONSTRUCTS the training "
    "frame with the discipline built in). One filtered grouped pass "
    "for features (the wall predicate pushes to the scan), one "
    "distinct-user anti-probe for the label via left join + NULL "
    "test; both sides shuffle on user_id once.",
    oracle=_CHURN_LABEL_ORACLE,
    tags=("ext", "labels", "churn", "training-data"),
)
def x191_churn_label_builder(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    wall = F.lit("2024-01-24").cast("timestamp")
    obs = ev.filter(F.col("ts") < wall).groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            F.floor(F.coalesce(fin("value"), F.lit(0.0)) * 100 + 0.5).cast(
                "long"
            )
        )
        .cast("long")
        .alias("cents"),
        F.countDistinct(F.to_date("ts")).cast("long").alias("n_days"),
        F.datediff(F.lit("2024-01-24").cast("date"), F.max(F.to_date("ts")))
        .cast("long")
        .alias("days_since_last"),
    )
    outcome = (
        ev.filter(F.col("ts") >= wall)
        .select("user_id")
        .distinct()
        .withColumn("_active", F.lit(1))
    )
    return obs.join(outcome, "user_id", "left").select(
        "user_id",
        "n_events",
        "cents",
        "n_days",
        "days_since_last",
        F.col("_active").isNull().alias("churned"),
    )


_MDE_ORACLE = f"""
    WITH per_user AS (
        SELECT user_id,
               {SQL_H.format(s='CAST(user_id AS VARCHAR)')} % 2 AS arm,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ), mo AS (
        SELECT count(*) AS n, sum(cents) AS s,
               sum(cents * cents) AS q,
               sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a
        FROM per_user
    )
    SELECT CAST(n AS BIGINT) AS n_users, CAST(n_a AS BIGINT) AS n_arm_a,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
           2.8e0 * sqrt(2e0 * ((CAST(q AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
                   / (CAST(n AS DOUBLE) / 2e0)) AS mde_cents,
           2.8e0 * sqrt(2e0 * ((CAST(q AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
                   / (CAST(n AS DOUBLE) / 2e0))
           / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS mde_relative
    FROM mo
"""


@register(
    "a27_minimum_detectable_effect",
    "Experiment power planning: the minimum detectable effect at "
    "80% power / 5% two-sided alpha for the per-user spend metric "
    "at the CURRENT population size — MDE = (z_a + z_b) * "
    "sqrt(2*s^2/(n/2)) with the 1.96+0.84 = 2.8 constant folded in "
    "— answering 'is this experiment even worth running' BEFORE "
    "assignment (an effect below the MDE cannot be distinguished "
    "from noise at this n, and running anyway produces the "
    "underpowered false negatives that get misread as 'no effect'). "
    "Sample variance from exact int64 moments; MDE and its "
    "relative-to-mean form close in one shared IEEE shape. One "
    "grouped pass, one row, the planning complement to a23's "
    "post-hoc SRM gate.",
    oracle=_MDE_ORACLE,
    tags=("ext", "ab-test", "power-analysis", "exact-stats"),
)
def a27_minimum_detectable_effect(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    per_user = ev.groupBy(
        "user_id",
        (X.base_hash(F.col("user_id").cast("string")) % 2).alias("arm"),
    ).agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    mo = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("q"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    var = (d("q") - d("s") * d("s") / d("n")) / (F.col("n") - 1).cast(
        "double"
    )
    mde = F.lit(2.8) * F.sqrt(F.lit(2.0) * var / (d("n") / F.lit(2.0)))
    return mo.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("n_a").cast("long").alias("n_arm_a"),
        (d("s") / d("n")).alias("mean_cents"),
        mde.alias("mde_cents"),
        (mde / (d("s") / d("n"))).alias("mde_relative"),
    )


_LUHN_ORACLE = """
    WITH cand AS (
        SELECT doc_id,
               lpad(CAST(doc_id * 37 % 1000000 AS VARCHAR), 6, '0')
               || lpad(CAST(doc_id * 91 % 1000000 AS VARCHAR), 6, '0')
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS number
        FROM documents
    ), digits AS (
        SELECT doc_id, number,
               list_transform(range(1, 17),
                   i -> CAST(number[i:i] AS BIGINT)) AS ds
        FROM cand
    ), luhn AS (
        SELECT doc_id, number,
               list_reduce(
                   list_transform(range(1, 17), i ->
                       CASE WHEN (16 - i) % 2 = 1 THEN
                           CASE WHEN ds[i] * 2 > 9
                                THEN ds[i] * 2 - 9 ELSE ds[i] * 2 END
                       ELSE ds[i] END),
                   (a, b) -> a + b) AS s
        FROM digits
    )
    SELECT CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN s % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_luhn_valid,
           CAST(sum(CASE WHEN s % 10 = 0 THEN 0 ELSE 1 END) AS BIGINT)
               AS n_luhn_invalid,
           min(CASE WHEN s % 10 = 0
                    THEN '************' || number[13:16] END)
               AS sample_masked
    FROM luhn
"""


@register(
    "x192_luhn_pii_filter",
    "Luhn checksum validation of 16-digit card-number candidates — "
    "the precision filter a numeric PII sweep (x63) needs: a bare "
    "16-digit regex flags order ids and timestamps as card numbers, "
    "while ~90% of random digit strings FAIL the Luhn check, so "
    "validating before redaction cuts false positives an order of "
    "magnitude. The mod-10 double-every-second-digit fold runs as a "
    "pure array expression (transform + reduce over the char "
    "digits — integer arithmetic end-to-end, position parity "
    "counted from the check digit), candidates are deterministic "
    "doc_id-derived strings (the x81 synthetic-input pattern: the "
    "ALGORITHM is what's under the hash, and the oracle recomputes "
    "it independently), and survivors are masked to last-4 — "
    "validation and x22-style redaction in one zero-shuffle "
    "projection + one scalar rollup.",
    oracle=_LUHN_ORACLE,
    tags=("ext", "pii", "luhn", "validation"),
)
def x192_luhn_pii_filter(spark: SparkSession, sf: str) -> DataFrame:
    d = F.col("doc_id")
    number = F.concat(
        F.lpad((d * 37 % 1000000).cast("string"), 6, "0"),
        F.lpad((d * 91 % 1000000).cast("string"), 6, "0"),
        F.lpad((d % 10000).cast("string"), 4, "0"),
    )
    cand = load_table(spark, sf, "documents").select(
        "doc_id", number.alias("number")
    )
    luhn = cand.withColumn(
        "s",
        F.expr(
            "aggregate(transform(sequence(1, 16), i -> "
            "CASE WHEN (16 - i) % 2 = 1 THEN "
            "  CASE WHEN CAST(substring(number, i, 1) AS BIGINT) * 2 > 9 "
            "       THEN CAST(substring(number, i, 1) AS BIGINT) * 2 - 9 "
            "       ELSE CAST(substring(number, i, 1) AS BIGINT) * 2 END "
            "ELSE CAST(substring(number, i, 1) AS BIGINT) END), "
            "0L, (a, b) -> a + b)"
        ),
    )
    valid = F.col("s") % 10 == 0
    return luhn.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum(F.when(valid, 1).otherwise(0)).cast("long").alias(
            "n_luhn_valid"
        ),
        F.sum(F.when(valid, 0).otherwise(1)).cast("long").alias(
            "n_luhn_invalid"
        ),
        F.min(
            F.when(
                valid,
                F.concat(
                    F.lit("************"), F.substring("number", 13, 4)
                ),
            )
        ).alias("sample_masked"),
    )


_ASSORTATIVITY_ORACLE = f"""
    WITH {_COSUPPLY_EDGES_SQL},
    deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
    de AS (
        SELECT da.d AS x, db.d AS y
        FROM e
        JOIN deg da ON da.src = e.src
        JOIN deg db ON db.src = e.dst
    ), mo AS (
        SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        FROM de
    )
    SELECT CAST(n AS BIGINT) AS n_edges,
           CAST(sx AS BIGINT) AS sum_deg,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               AS assortativity
    FROM mo
"""


@register(
    "x193_degree_assortativity",
    "Degree assortativity of the co-supply graph: the Pearson "
    "correlation of endpoint degrees over all (symmetric) edges — "
    "the one-number answer to 'do hubs connect to hubs?' that "
    "decides which failure/contagion model applies (assortative "
    "networks fragment by hub removal; disassortative ones are "
    "hub-robust) and whether x166's common-neighbor prediction will "
    "be hub-dominated. On the symmetric edge list both endpoint "
    "degree sequences are identical, so r is exactly the a14-family "
    "Pearson over exact int64 moments (degrees are counts, products "
    "bounded by |E|*maxdeg^2), closed in one shared IEEE shape. One "
    "degree count, two broadcast-joinable degree attachments, one "
    "moment rollup — no iteration, no float before the final "
    "expression.",
    oracle=_ASSORTATIVITY_ORACLE,
    tags=("ext", "graph", "assortativity", "exact-stats"),
)
def x193_degree_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    e = _cosupply_edges(li)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # degree table is NODE-sized (grows with the graph) — plain shuffle
    # joins on src/dst, no broadcast hint; AQE still broadcasts when the
    # graph is genuinely small
    de = e.join(
        deg.select(F.col("src"), F.col("d").alias("x")), "src"
    ).join(
        deg.select(F.col("src").alias("dst"), F.col("d").alias("y")),
        "dst",
    )
    mo = de.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    r = (d("n") * d("sxy") - d("sx") * d("sy")) / (
        F.sqrt(d("n") * d("sxx") - d("sx") * d("sx"))
        * F.sqrt(d("n") * d("syy") - d("sy") * d("sy"))
    )
    return mo.select(
        F.col("n").cast("long").alias("n_edges"),
        F.col("sx").cast("long").alias("sum_deg"),
        r.alias("assortativity"),
    )


def _ppr_round(prev: str, s: str, cur: str, seed: int) -> str:
    return f"""
    {s} AS (
        SELECT e.dst, sum(r.r // r.out_deg) AS s
        FROM e JOIN {prev} r ON e.src = r.node
        GROUP BY e.dst
    ),
    {cur} AS (
        SELECT d.src AS node, d.out_deg,
               CASE WHEN d.src = {seed} THEN 150000000000 ELSE 0 END
               + COALESCE(s.s, 0) * 85 // 100 AS r
        FROM deg d LEFT JOIN {s} s ON d.src = s.dst
    )"""


_PPR_ORACLE = f"""
    WITH {_COSUPPLY_EDGES_SQL},
    deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
    p0 AS (
        SELECT src AS node, out_deg,
               CASE WHEN src = 1 THEN 1000000000000 ELSE 0 END AS r
        FROM deg
    ),{_ppr_round('p0', 'ps1', 'p1', 1)},{_ppr_round('p1', 'ps2', 'p2', 1)}
    SELECT node AS supplier, CAST(r AS BIGINT) AS rank_scaled
    FROM p2 WHERE r > 0
"""


@register(
    "x194_personalized_pagerank",
    "Personalized PageRank from seed supplier 1 on the co-supply "
    "graph: all restart mass returns to the SEED instead of spreading "
    "uniformly (x84's global variant), so rank measures random-walk "
    "proximity to supplier 1 — the 'related suppliers' / graph-"
    "expansion query behind recommendation candidates and "
    "investigation fan-outs. Identical fixed-point integer machinery "
    "to x84 (seed-indicator start vector, 15%-at-seed teleport, "
    "85//100 damped contributions, rank DIV out_degree per edge), "
    "two unrolled rounds replayed verbatim by the oracle; only "
    "walk-reachable nodes carry mass, and the r > 0 filter makes "
    "that reachability set part of the hashed surface. Per round: "
    "one equi-join, one partial-agg — the x84 scale shape "
    "unchanged.",
    oracle=_PPR_ORACLE,
    tags=("ext", "graph", "personalized-pagerank", "fixed-rounds"),
)
def x194_personalized_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    ranks = G.personalized_pagerank_fixed_rounds(
        _cosupply_edges(li), seed=1, rounds=2
    )
    return ranks.filter(F.col("rank_scaled") > 0).select(
        F.col("node").alias("supplier"),
        F.col("rank_scaled").cast("long").alias("rank_scaled"),
    )


_LTV_ORACLE = """
    WITH firsts AS (
        SELECT user_id,
               date_trunc('week', min(CAST(ts AS DATE))) AS cohort_week
        FROM events GROUP BY 1
    ), spend AS (
        SELECT e.user_id, f.cohort_week,
               date_diff('week', f.cohort_week,
                         date_trunc('week', CAST(e.ts AS DATE))) AS age_w,
               CAST(floor(COALESCE(CASE WHEN isfinite(e.value) AND abs(e.value) < 1e13 THEN e.value END, 0) * 100 + 0.5) AS BIGINT)
                   AS cents
        FROM events e JOIN firsts f USING (user_id)
    ), cell AS (
        SELECT cohort_week, age_w,
               sum(cents) AS cents,
               count(DISTINCT user_id) AS active_users
        FROM spend GROUP BY 1, 2
    ), sized AS (
        SELECT cohort_week, count(*) AS cohort_size
        FROM firsts GROUP BY 1
    )
    SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(c.age_w AS BIGINT) AS age_weeks,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST(c.active_users AS BIGINT) AS active_users,
           CAST(c.cents AS BIGINT) AS cents,
           CAST(sum(c.cents) OVER (PARTITION BY c.cohort_week
                                   ORDER BY c.age_w) AS BIGINT)
               AS cum_cents,
           CAST(sum(c.cents) OVER (PARTITION BY c.cohort_week
                                   ORDER BY c.age_w)
                * 100 // s.cohort_size AS BIGINT)
               AS cum_ltv_cents_per_user_x100
    FROM cell c JOIN sized s USING (cohort_week)
"""


@register(
    "x195_cohort_ltv_curve",
    "Cohort LTV curves: users grouped by first-seen week, spend "
    "accumulated by week-age into the cohort x age matrix with "
    "per-user cumulative LTV (x100 fixed-point) — the growth-"
    "analytics deliverable x58's retention matrix is the presence "
    "shadow of (retention says WHO came back; LTV says what that "
    "was worth, and whether later cohorts monetize faster at equal "
    "age). First-touch via one min-aggregate join-back (the x58 "
    "shape), cumulative curve via a per-cohort ordered window over "
    "age cells — the window runs over the bounded cohort x age "
    "grid, never raw events; everything integer (cents, the x100 "
    "per-user scaling by integer DIV).",
    oracle=_LTV_ORACLE,
    tags=("ext", "ltv", "cohort", "analytics"),
)
def x195_cohort_ltv_curve(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min(F.to_date("ts"))).alias("cohort_week")
    )
    spend = ev.join(firsts, "user_id").select(
        "user_id",
        "cohort_week",
        (
            F.floor(
                F.datediff(
                    F.date_trunc("week", F.to_date("ts")), "cohort_week"
                )
                / 7
            )
        )
        .cast("long")
        .alias("age_w"),
        F.floor(F.coalesce(fin("value"), F.lit(0.0)) * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    cell = spend.groupBy("cohort_week", "age_w").agg(
        F.sum("cents").alias("cents"),
        F.countDistinct("user_id").alias("active_users"),
    )
    sized = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    w = Window.partitionBy("cohort_week").orderBy("age_w")
    return (
        cell.join(sized, "cohort_week")
        .withColumn("cum_cents", F.sum("cents").over(w))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.col("age_w").alias("age_weeks"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.col("active_users").cast("long").alias("active_users"),
            F.col("cents").cast("long").alias("cents"),
            F.col("cum_cents").cast("long").alias("cum_cents"),
            F.expr(
                "CAST(cum_cents * 100 DIV cohort_size AS BIGINT)"
            ).alias("cum_ltv_cents_per_user_x100"),
        )
    )


_BOT_FLAGS_ORACLE = """
    WITH obs AS (
        SELECT user_id, event_id, epoch_us(ts) AS t_us, event_type
        FROM events
    ), gaps AS (
        SELECT user_id,
               lead(t_us) OVER (PARTITION BY user_id
                                ORDER BY t_us, event_id) - t_us AS g
        FROM obs
    ), gm AS (
        SELECT user_id, count(*) AS n_g, sum(g) AS sg,
               sum((g // 1000) * (g // 1000)) AS qg_ms2
        FROM gaps WHERE g IS NOT NULL GROUP BY 1
    ), em AS (
        SELECT user_id, count(*) AS n_ev,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS n_err
        FROM obs GROUP BY 1
    )
    SELECT e.user_id,
           CAST(e.n_ev AS BIGINT) AS n_events,
           CAST(g.sg // g.n_g AS BIGINT) AS mean_gap_us,
           e.n_ev * 3600000000 > 200 * (g.sg + 1) AS fast_flag,
           2 * (g.qg_ms2 // g.n_g)
               < 3 * ((g.sg // g.n_g) // 1000)
                   * ((g.sg // g.n_g) // 1000) AS regular_flag,
           e.n_err * 5 > e.n_ev AS error_flag
    FROM em e JOIN gm g USING (user_id)
    WHERE g.n_g >= 10
"""


@register(
    "x196_bot_likeness_flags",
    "Bot/automation heuristics per user — the traffic-cleaning gate "
    "a behavioral training corpus needs before any engagement "
    "metric: (a) FAST — sustained rate above 200 events/hour over "
    "the observed span, (b) REGULAR — inter-arrival variance "
    "collapsed to under half the squared mean (humans are bursty; "
    "cron is metronomic: the second-moment test catches fixed-"
    "interval replayers a rate cap misses), (c) ERROR-heavy — over "
    "20% error events. Every test is a CROSS-MULTIPLIED integer "
    "inequality on exact epoch-us gap moments (the w22 discipline "
    "-- no rate or variance is ever materialized as a float; the "
    "q//1e6 and sg//1e3 rescalings keep the squared terms inside "
    "int64 at month-of-microseconds spans). One lead window per "
    "user + two grouped moment passes; min-10-gaps support floor.",
    oracle=_BOT_FLAGS_ORACLE,
    tags=("ext", "bot-detection", "data-cleaning", "exact-stats"),
)
def x196_bot_likeness_flags(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    obs = ev.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    gaps = obs.select(
        "user_id", (F.lead("t_us").over(w) - F.col("t_us")).alias("g")
    ).filter(F.col("g").isNotNull())
    gm = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("g").alias("sg"),
        F.sum(F.expr("(g DIV 1000) * (g DIV 1000)")).alias("qg_ms2"),
    )
    em = obs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_err"),
    )
    joined = em.join(gm, "user_id").filter(F.col("n_g") >= 10)
    return joined.select(
        "user_id",
        F.col("n_ev").cast("long").alias("n_events"),
        F.expr("CAST(sg DIV n_g AS BIGINT)").alias("mean_gap_us"),
        (F.col("n_ev") * F.lit(3600000000) > 200 * (F.col("sg") + 1)).alias(
            "fast_flag"
        ),
        F.expr(
            "2 * (qg_ms2 DIV n_g) < 3 * ((sg DIV n_g) DIV 1000) "
            "* ((sg DIV n_g) DIV 1000)"
        ).alias("regular_flag"),
        (F.col("n_err") * 5 > F.col("n_ev")).alias("error_flag"),
    )


_ASOF_SCD2_ORACLE = """
    WITH dim AS (
        SELECT c_custkey, c_mktsegment,
               '1995-01-01' AS valid_from,
               CAST(NULL AS VARCHAR) AS valid_to,
               TRUE AS is_current
        FROM customer
    ),
    upd AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 14 = 0 THEN c_mktsegment
                    ELSE 'UPDATED' END AS c_mktsegment
        FROM customer WHERE c_custkey % 7 = 0
    ),
    changed AS (
        SELECT u.c_custkey, u.c_mktsegment
        FROM upd u JOIN dim d USING (c_custkey)
        WHERE u.c_mktsegment IS DISTINCT FROM d.c_mktsegment
    ),
    scd AS (
        SELECT d.c_custkey, d.c_mktsegment, d.valid_from,
               CASE WHEN c.c_custkey IS NULL THEN NULL
                    ELSE '1998-01-01' END AS valid_to
        FROM dim d LEFT JOIN changed c USING (c_custkey)
        UNION ALL
        SELECT c_custkey, c_mktsegment, '1998-01-01', NULL FROM changed
    )
    SELECT s.c_mktsegment AS segment_asof,
           CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders o
    JOIN scd s ON s.c_custkey = o.o_custkey
              AND o.o_orderdate >= CAST(s.valid_from AS TIMESTAMP)
              AND (s.valid_to IS NULL
                   OR o.o_orderdate < CAST(s.valid_to AS TIMESTAMP))
    GROUP BY 1, 2
"""


@register(
    "x197_fact_scd2_asof_join",
    "Point-in-time fact enrichment — the query SCD2 EXISTS to "
    "answer: each order joins to the dimension version valid AT ITS "
    "ORDER DATE (not today's), so a customer re-segmented in 1998 "
    "has pre-1998 orders attributed to the OLD segment and later "
    "ones to the new — the as-current join everyone writes first "
    "silently rewrites history (x86 builds the versioned dimension; "
    "this proves the temporal semantics by aggregating revenue under "
    "the as-of attribute, where any validity-window mistake moves "
    "whole year-buckets and breaks the hash). The validity predicate "
    "rides a key equi-join (1-2 versions per key, Catalyst evaluates "
    "the range as a post-join filter on a bounded match set — never "
    "a true range join); NULL valid_to means open interval. Output "
    "bounded by segments x years.",
    oracle=_ASOF_SCD2_ORACLE,
    tags=("ext", "scd2", "asof", "point-in-time"),
)
def x197_fact_scd2_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    dim = scd2_initial(cust, "c_custkey", ("c_mktsegment",), "1995-01-01")
    updates = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 14 == 0, F.col("c_mktsegment"))
        .otherwise(F.lit("UPDATED"))
        .alias("c_mktsegment"),
    )
    scd = scd2_merge(
        dim, updates, "c_custkey", ("c_mktsegment",), "1998-01-01"
    )
    orders = load_table(spark, sf, "orders")
    joined = orders.join(
        scd,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (
            F.col("o_orderdate")
            >= F.col("valid_from").cast("timestamp")
        )
        & (
            F.col("valid_to").isNull()
            | (F.col("o_orderdate") < F.col("valid_to").cast("timestamp"))
        ),
    )
    return joined.groupBy(
        F.col("c_mktsegment").alias("segment_asof"),
        F.year("o_orderdate").cast("long").alias("order_year"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("cents"),
    )


# ---------------------------------------------------------------------------
# Classifier-evaluation tier: the metrics a quality-filter / lang-ID model
# is judged by before it gates a 100 TB corpus. Detector under test: the
# x1 en-stopword evidence count (an integer score per document), labeled
# by the metadata lang column. On this synthetic corpus the metadata lang
# is only weakly coupled to the text, so AUC sits near 0.5 — the entries
# verify the MATH (exact rank algebra, integer confusion counts), not the
# detector's strength; swap in any integer score column unchanged.
# ---------------------------------------------------------------------------

_EN_SW = TX.STOPWORDS["en"]
_SQL_EN_SCORE = (
    "len(list_filter(string_split_regex(lower(text), '\\s+'), "
    f"t -> t IN {_EN_SW!r}))"
)

_ROC_AUC_ORACLE = f"""
    WITH scored AS (
        SELECT {_SQL_EN_SCORE} AS score,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents WHERE text IS NOT NULL
    ),
    lv AS (
        SELECT score, count(*) AS n_eq, sum(pos) AS n_pos_eq
        FROM scored GROUP BY score
    ),
    ranked AS (
        SELECT *,
               coalesce(sum(n_eq) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cnt_less
        FROM lv
    ),
    mo AS (
        SELECT sum(n_pos_eq) AS n_pos,
               sum(n_eq - n_pos_eq) AS n_neg,
               sum(n_pos_eq * (2 * cnt_less + n_eq + 1)) AS r_pos_x2
        FROM ranked
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           CAST(r_pos_x2 - n_pos * (n_pos + 1) AS BIGINT) AS u_x2,
           CAST(r_pos_x2 - n_pos * (n_pos + 1) AS DOUBLE)
               / (2e0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
               AS auc
    FROM mo
"""


@register(
    "x198_roc_auc_langid",
    "ROC-AUC of the x1 en-stopword score as an 'is English' detector — "
    "the threshold-free eval every quality/lang filter needs before it "
    "gates a corpus. Computed EXACTLY via the rank identity AUC = "
    "U/(n_pos*n_neg) with tie-averaged ranks kept integer by doubling "
    "(a21's 2*avgrank = 2*cnt_less + n_eq + 1 machinery): one groupBy "
    "on the DISTINCT score levels (the cumulative window runs over "
    "score cardinality — ~9 levels — never document cardinality), so "
    "the single-partition stage is O(distinct scores) at any corpus "
    "size. u_x2 = 2*U is emitted as the exact integer surface; the "
    "one closing division is the only float. int64 headroom: u_x2 <= "
    "2*n_pos*n_neg, fine to ~2e9 docs; beyond that the same algebra "
    "runs in decimal(38,0).",
    oracle=_ROC_AUC_ORACLE,
    tags=("ext", "eval", "classifier", "exact-stats"),
)
def x198_roc_auc_langid(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    scored = docs.select(
        TX.stopword_hits(TX.words("text"), _EN_SW).alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    lv = scored.groupBy("score").agg(
        F.count(F.lit(1)).alias("n_eq"), F.sum("pos").alias("n_pos_eq")
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    ranked = lv.withColumn(
        "cnt_less", F.coalesce(F.sum("n_eq").over(w), F.lit(0))
    )
    mo = ranked.agg(
        F.sum("n_pos_eq").alias("n_pos"),
        F.sum(F.col("n_eq") - F.col("n_pos_eq")).alias("n_neg"),
        F.sum(
            F.col("n_pos_eq") * (2 * F.col("cnt_less") + F.col("n_eq") + 1)
        ).alias("r_pos_x2"),
    )
    u_x2 = F.col("r_pos_x2") - F.col("n_pos") * (F.col("n_pos") + 1)
    return mo.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        u_x2.cast("long").alias("u_x2"),
        (
            u_x2.cast("double")
            / (
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")
            )
        ).alias("auc"),
    )


_CONFUSION_ORACLE = f"""
    WITH scored AS (
        SELECT CASE WHEN {_SQL_EN_SCORE} >= 2 THEN 1 ELSE 0 END AS pred,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents WHERE text IS NOT NULL
    ),
    c AS (
        SELECT sum(pred * pos)             AS tp,
               sum(pred * (1 - pos))       AS fp,
               sum((1 - pred) * pos)       AS fn,
               sum((1 - pred) * (1 - pos)) AS tn
        FROM scored
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CAST(CASE WHEN tp + fp = 0 THEN NULL
                     ELSE tp * 1000000 // (tp + fp) END AS BIGINT)
               AS precision_ppm,
           CAST(CASE WHEN tp + fn = 0 THEN NULL
                     ELSE tp * 1000000 // (tp + fn) END AS BIGINT)
               AS recall_ppm,
           CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                     ELSE 2 * tp * 1000000 // (2 * tp + fp + fn) END
                AS BIGINT) AS f1_ppm,
           CAST((tp + tn) * 1000000 // (tp + fp + fn + tn) AS BIGINT)
               AS accuracy_ppm
    FROM c
"""


@register(
    "x199_classifier_confusion",
    "Confusion matrix + precision/recall/F1/accuracy for the "
    "thresholded en-detector (score >= 2 predicts English) — the "
    "operating-point eval that complements x198's threshold-free AUC. "
    "One conditional-aggregation pass (four products of 0/1 columns "
    "partial-aggregate map-side); every derived metric is a truncating "
    "integer ppm (tp*1e6 DIV denominator), so the whole row is "
    "hash-exact with zero float arithmetic; empty denominators emit "
    "NULL rather than a fake 0.",
    oracle=_CONFUSION_ORACLE,
    tags=("ext", "eval", "classifier", "exact-stats"),
)
def x199_classifier_confusion(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    scored = docs.select(
        F.when(
            TX.stopword_hits(TX.words("text"), _EN_SW) >= 2, 1
        ).otherwise(0).alias("pred"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    c = scored.agg(
        F.sum(F.col("pred") * F.col("pos")).alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("pos"))).alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("pos")).alias("fn"),
        F.sum((1 - F.col("pred")) * (1 - F.col("pos"))).alias("tn"),
    )
    return c.select(
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        F.expr(
            "CAST(CASE WHEN tp + fp = 0 THEN NULL"
            " ELSE tp * 1000000 DIV (tp + fp) END AS BIGINT)"
        ).alias("precision_ppm"),
        F.expr(
            "CAST(CASE WHEN tp + fn = 0 THEN NULL"
            " ELSE tp * 1000000 DIV (tp + fn) END AS BIGINT)"
        ).alias("recall_ppm"),
        F.expr(
            "CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN NULL"
            " ELSE 2 * tp * 1000000 DIV (2 * tp + fp + fn) END AS BIGINT)"
        ).alias("f1_ppm"),
        F.expr(
            "CAST((tp + tn) * 1000000 DIV (tp + fp + fn + tn) AS BIGINT)"
        ).alias("accuracy_ppm"),
    )


_CALIBRATION_ORACLE = f"""
    WITH scored AS (
        SELECT {_SQL_EN_SCORE} AS score,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents WHERE text IS NOT NULL
    )
    SELECT CAST(score AS BIGINT) AS score,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(pos) * 1000000 // count(*) AS BIGINT) AS pos_rate_ppm
    FROM scored GROUP BY score
"""


@register(
    "x200_calibration_table",
    "Reliability (calibration) table for the en-detector: per discrete "
    "score level, document count, positive count, and the empirical "
    "positive rate in truncating integer ppm — read alongside x198's "
    "AUC to see WHERE the score is informative, and the input to any "
    "isotonic/Platt recalibration step. One grouped pass over ~9 "
    "score levels; every output cell is an integer, so the table is "
    "hash-exact. At 100 TB this is the same single small groupBy — "
    "score cardinality, not corpus cardinality.",
    oracle=_CALIBRATION_ORACLE,
    tags=("ext", "eval", "classifier", "calibration"),
)
def x200_calibration_table(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    scored = docs.select(
        TX.stopword_hits(TX.words("text"), _EN_SW).alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    return scored.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.expr("sum(pos) * 1000000 DIV count(*)").cast("long")
        .alias("pos_rate_ppm"),
    ).select(
        F.col("score").cast("long").alias("score"),
        "n_docs", "n_pos", "pos_rate_ppm",
    )


_CHI2_TOKEN_ORACLE = """
    WITH pres AS (
        SELECT DISTINCT doc_id,
               unnest(string_split_regex(lower(text), '\\s+')) AS token,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents WHERE text IS NOT NULL
    ),
    tot AS (
        SELECT count(*) AS n,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p
        FROM documents WHERE text IS NOT NULL
    ),
    tok AS (
        SELECT token, sum(pos) AS a, count(*) AS n_tok
        FROM pres WHERE token <> ''
        GROUP BY token
    ),
    cells AS (
        SELECT token, a, n_tok - a AS b, p - a AS c,
               (n - p) - (n_tok - a) AS d, n
        FROM tok CROSS JOIN tot
        WHERE n_tok >= 25 AND n_tok <= n - 25
    ),
    scored AS (
        SELECT token, a, b, c, d,
               CAST(n AS DOUBLE)
                   * (CAST(a * d - b * c AS DOUBLE)
                      * CAST(a * d - b * c AS DOUBLE))
                   / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                      * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE))
                   AS chi2
        FROM cells
    )
    SELECT token, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d, chi2
    FROM scored
    ORDER BY chi2 DESC, token
    LIMIT 30
"""


@register(
    "x201_chi2_token_class",
    "Chi-square token<->class association: the top-30 tokens whose "
    "document presence is most associated with the en label — the "
    "log-free feature-selection pass behind fastText-style quality/"
    "language classifiers (mutual information needs ln; the chi-square "
    "statistic ranks near-identically and stays in exactly-"
    "reproducible arithmetic). Presence (not tf) contingency per "
    "token: a/b/c/d cells from ONE distinct-explode + groupBy(token) "
    "with the 2-value class total broadcast; chi2 = N*(ad-bc)^2/"
    "((a+b)(c+d)(a+c)(b+d)) with the ad-bc difference formed in int64 "
    "and the close in fixed-shape IEEE doubles. df bounds [25, N-25] "
    "kill zero denominators and the useless always/never tokens. "
    "int64 headroom on ad-bc holds to ~3e9 docs; the double close is "
    "engine-exact at any scale.",
    oracle=_CHI2_TOKEN_ORACLE,
    tags=("ext", "text", "feature-selection", "exact-stats"),
)
def x201_chi2_token_class(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    pres = (
        docs.select(
            "doc_id",
            F.explode(TX.words("text")).alias("token"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    tot = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("p"),
    )
    tok = pres.groupBy("token").agg(
        F.sum("pos").alias("a"), F.count(F.lit(1)).alias("n_tok")
    )
    cells = (
        tok.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("n_tok") >= 25) & (F.col("n_tok") <= F.col("n") - 25)
        )
        .select(
            "token",
            "a",
            (F.col("n_tok") - F.col("a")).alias("b"),
            (F.col("p") - F.col("a")).alias("c"),
            ((F.col("n") - F.col("p")) - (F.col("n_tok") - F.col("a")))
            .alias("d"),
            "n",
        )
    )
    ad_bc = F.col("a") * F.col("d") - F.col("b") * F.col("c")
    chi2 = (
        F.col("n").cast("double")
        * (ad_bc.cast("double") * ad_bc.cast("double"))
        / (
            (F.col("a") + F.col("b")).cast("double")
            * (F.col("c") + F.col("d")).cast("double")
            * (F.col("a") + F.col("c")).cast("double")
            * (F.col("b") + F.col("d")).cast("double")
        )
    )
    return (
        cells.select(
            "token",
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.col("c").cast("long").alias("c"),
            F.col("d").cast("long").alias("d"),
            chi2.alias("chi2"),
        )
        .orderBy(F.desc("chi2"), "token")
        .limit(30)
    )


_PMI_ORACLE = """
    WITH w AS (
        SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> t <> '') AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    uni AS (
        SELECT unnest(ws) AS t FROM w
    ),
    ucnt AS (
        SELECT t, count(*) AS n_t FROM uni GROUP BY t
    ),
    utot AS (SELECT count(*) AS n_uni FROM uni),
    big AS (
        SELECT unnest(list_transform(range(1, len(ws)),
                      i -> ws[i] || ' ' || ws[i + 1])) AS pair,
               unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS t1,
               unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS t2
        FROM w WHERE len(ws) >= 2
    ),
    bcnt AS (
        SELECT pair, t1, t2, count(*) AS n_xy
        FROM big GROUP BY pair, t1, t2
    ),
    btot AS (SELECT count(*) AS n_pairs FROM big),
    scored AS (
        SELECT b.pair, b.n_xy,
               b.n_xy * t.n_pairs AS pmi_num,
               u1.n_t * u2.n_t AS pmi_den
        FROM bcnt b
        JOIN ucnt u1 ON b.t1 = u1.t
        JOIN ucnt u2 ON b.t2 = u2.t
        CROSS JOIN btot t
        WHERE b.n_xy >= 5
    )
    SELECT pair, CAST(n_xy AS BIGINT) AS n_xy,
           CAST(pmi_num AS BIGINT) AS pmi_num,
           CAST(pmi_den AS BIGINT) AS pmi_den
    FROM scored
    ORDER BY CAST(pmi_num AS DOUBLE) / CAST(pmi_den AS DOUBLE) DESC,
             pair
    LIMIT 25
"""


@register(
    "x202_pmi_collocations",
    "Top-25 adjacent-word collocations by pointwise mutual information "
    "— phrase discovery for tokenizer vocab seeding and stop-phrase "
    "lists. PMI = ln(n_xy*N/(n_x*n_y)) is ranked WITHOUT the ln (log "
    "is monotone, so ordering by the exact integer fraction "
    "n_xy*N/(n_x*n_y) is PMI order — the x166 log-free discipline); "
    "the fraction ships as int64 num/den under the hash and the one "
    "float division ORDERS only. Bigrams form by index-transform over "
    "the per-doc word array (no self-join); two token-keyed groupBys "
    "+ two broadcast unigram joins; min support n_xy >= 5 kills the "
    "noise tail. int64: num <= n_xy*N_pairs holds to ~3e9 pairs, den "
    "to n_x*n_y ~ (3e9)^2 via the df-bounded join inputs — beyond "
    "that, decimal(38,0).",
    oracle=_PMI_ORACLE,
    tags=("ext", "text", "collocation", "tokenizer"),
)
def x202_pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    w = docs.select(
        F.filter(TX.words("text"), lambda t: t != "").alias("ws")
    )
    uni = w.select(F.explode("ws").alias("t"))
    ucnt = uni.groupBy("t").agg(F.count(F.lit(1)).alias("n_t"))
    utot = uni.agg(F.count(F.lit(1)).alias("n_uni"))  # noqa: F841 (kept for parity with the SQL shape; N_pairs is the PMI normalizer)
    idx = F.sequence(F.lit(1), F.size("ws") - 1)
    big = w.filter(F.size("ws") >= 2).select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.concat(
                        F.element_at(F.col("ws"), i),
                        F.lit(" "),
                        F.element_at(F.col("ws"), i + F.lit(1)),
                    ).alias("pair"),
                    F.element_at(F.col("ws"), i).alias("t1"),
                    F.element_at(F.col("ws"), i + F.lit(1)).alias("t2"),
                ),
            )
        ).alias("s")
    ).select("s.pair", "s.t1", "s.t2")
    bcnt = big.groupBy("pair", "t1", "t2").agg(
        F.count(F.lit(1)).alias("n_xy")
    )
    btot = big.agg(F.count(F.lit(1)).alias("n_pairs"))
    scored = (
        bcnt.filter(F.col("n_xy") >= 5)
        .join(ucnt.select(F.col("t").alias("t1"), F.col("n_t").alias("n_1")), "t1")
        .join(ucnt.select(F.col("t").alias("t2"), F.col("n_t").alias("n_2")), "t2")
        .crossJoin(F.broadcast(btot))
        .select(
            "pair",
            F.col("n_xy").cast("long").alias("n_xy"),
            (F.col("n_xy") * F.col("n_pairs")).cast("long").alias("pmi_num"),
            (F.col("n_1") * F.col("n_2")).cast("long").alias("pmi_den"),
        )
    )
    return scored.orderBy(
        F.desc(F.col("pmi_num").cast("double") / F.col("pmi_den").cast("double")),
        "pair",
    ).limit(25)


_BM25_TERMS = ("join", "hash", "scan", "merge")
_BM25_SAT_SQL = (
    "(CAST(tf AS DOUBLE) * 2.2e0) / (CAST(tf AS DOUBLE) + 1.2e0 * "
    "(0.25e0 + 0.75e0 * CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE) "
    "/ CAST(dl_total AS DOUBLE)))"
)
_BM25_ORACLE = f"""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> t <> '') AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    d AS (SELECT doc_id, len(ws) AS dl FROM w),
    tot AS (SELECT count(*) AS n_docs, sum(dl) AS dl_total FROM d),
    tf AS (
        SELECT doc_id, t AS term, count(*) AS tf
        FROM (SELECT doc_id, unnest(ws) AS t FROM w)
        WHERE t IN {_BM25_TERMS!r}
        GROUP BY doc_id, t
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    st AS (
        SELECT tf.doc_id, tf.term,
               ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5e0)
                / (CAST(df AS DOUBLE) + 0.5e0)) * ({_BM25_SAT_SQL}) AS s
        FROM tf
        JOIN df USING (term)
        JOIN d USING (doc_id)
        CROSS JOIN tot
    ),
    agg AS (
        SELECT doc_id,
               coalesce(sum(CASE WHEN term = 'join' THEN s END), 0e0)
               + coalesce(sum(CASE WHEN term = 'hash' THEN s END), 0e0)
               + coalesce(sum(CASE WHEN term = 'scan' THEN s END), 0e0)
               + coalesce(sum(CASE WHEN term = 'merge' THEN s END), 0e0)
                   AS bm25
        FROM st GROUP BY doc_id
    )
    SELECT doc_id, bm25,
           CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                AS BIGINT) AS rank
    FROM agg
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
"""


@register(
    "x203_bm25_topk",
    "BM25 top-10 retrieval for a fixed 4-term query (k1=1.2, b=0.75) "
    "with the RATIONAL idf (N-df+0.5)/(df+0.5) in place of its ln — "
    "x23's portable-idf discipline applied to the standard lexical "
    "ranking function (per term, ln-idf and rational idf are monotone-"
    "equivalent; the summed score is an honest ln-free BM25 VARIANT, "
    "stated as such). Length normalization b*dl/avgdl clears avgdl's "
    "division as dl*N/dl_total. The per-doc sum over query terms is "
    "the x183 fixed-associativity shape — four conditional sums (each "
    "over at most ONE row, hence order-free) added in written order — "
    "never a float SUM over an unordered group. Plan: one tf groupBy "
    "on (doc, term in Q) after an explode that drops every non-query "
    "token map-side, a 4-row broadcast df join, a doc-length join, "
    "top-10 via TakeOrderedAndProject. Corpus-scale cost is the token "
    "scan; state is O(matching docs).",
    oracle=_BM25_ORACLE,
    tags=("ext", "retrieval", "bm25", "text"),
)
def x203_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    w = docs.select(
        "doc_id", F.filter(TX.words("text"), lambda t: t != "").alias("ws")
    )
    d = w.select("doc_id", F.size("ws").alias("dl"))
    tot = d.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("dl_total")
    )
    tf = (
        w.select("doc_id", F.explode("ws").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    idf = (dd("n_docs") - dd("df") + F.lit(0.5)) / (dd("df") + F.lit(0.5))
    sat = (dd("tf") * F.lit(2.2)) / (
        dd("tf")
        + F.lit(1.2)
        * (F.lit(0.25) + F.lit(0.75) * dd("dl") * dd("n_docs") / dd("dl_total"))
    )
    st = (
        tf.join(F.broadcast(df_), "term")
        .join(d, "doc_id")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "term", (idf * sat).alias("s"))
    )
    term_sum = lambda t: F.coalesce(  # noqa: E731
        F.sum(F.when(F.col("term") == t, F.col("s"))), F.lit(0.0)
    )
    agg = st.groupBy("doc_id").agg(
        (
            term_sum("join") + term_sum("hash")
            + term_sum("scan") + term_sum("merge")
        ).alias("bm25")
    )
    win = Window.orderBy(F.desc("bm25"), "doc_id")
    return (
        agg.orderBy(F.desc("bm25"), "doc_id")
        .limit(10)
        .withColumn("rank", F.row_number().over(win).cast("long"))
    )


_EPOCH_BUDGET = 5_000_000
_EPOCH_ORACLE = f"""
    WITH w AS (
        SELECT source,
               len(list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '')) AS dl
        FROM documents WHERE text IS NOT NULL
    ),
    per_src AS (
        SELECT source, sum(dl) AS tokens_avail FROM w GROUP BY source
    ),
    ns AS (SELECT count(*) AS n_sources FROM per_src)
    SELECT source,
           CAST(tokens_avail AS BIGINT) AS tokens_avail,
           CAST({_EPOCH_BUDGET} // n_sources AS BIGINT) AS target_tokens,
           CAST(({_EPOCH_BUDGET} // n_sources + tokens_avail - 1)
                // tokens_avail AS BIGINT) AS epochs,
           CAST((({_EPOCH_BUDGET} // n_sources + tokens_avail - 1)
                 // tokens_avail) * tokens_avail
                - {_EPOCH_BUDGET} // n_sources AS BIGINT)
               AS overshoot_tokens
    FROM per_src CROSS JOIN ns
"""


@register(
    "x204_token_budget_epochs",
    "Token-budget epoch planner: given a total training budget "
    f"({_EPOCH_BUDGET:,} tokens) split equally across sources, how "
    "many passes (epochs) over each source's available tokens are "
    "needed, and how much the ceil rounds over — the repetition "
    "planning step of data-mixture design (the practical knob behind "
    "upsampling small high-quality sources; pairs with x49's "
    "acceptance-rate rebalance, which DOWN-samples within one pass). "
    "All integer: per-source token totals from one groupBy, target = "
    "budget DIV n_sources, epochs by the (a+b-1) DIV b ceiling "
    "identity. The 1-row source count is broadcast; output is "
    "source-cardinality.",
    oracle=_EPOCH_ORACLE,
    tags=("ext", "mixture", "planning", "training-data"),
)
def x204_token_budget_epochs(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    w = docs.select(
        "source",
        F.size(F.filter(TX.words("text"), lambda t: t != "")).alias("dl"),
    )
    per_src = w.groupBy("source").agg(F.sum("dl").alias("tokens_avail"))
    ns = per_src.agg(F.count(F.lit(1)).alias("n_sources"))
    target = F.expr(f"{_EPOCH_BUDGET} DIV n_sources")
    epochs = F.expr(
        f"({_EPOCH_BUDGET} DIV n_sources + tokens_avail - 1) DIV tokens_avail"
    )
    return per_src.crossJoin(F.broadcast(ns)).select(
        "source",
        F.col("tokens_avail").cast("long").alias("tokens_avail"),
        target.cast("long").alias("target_tokens"),
        epochs.cast("long").alias("epochs"),
        (epochs * F.col("tokens_avail") - target)
        .cast("long")
        .alias("overshoot_tokens"),
    )


_ZIPF_ORACLE = """
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(text), '\\s+')) AS t
        FROM documents WHERE text IS NOT NULL
    ),
    cnt AS (
        SELECT t AS term, count(*) AS freq
        FROM toks WHERE t <> ''
        GROUP BY t
    ),
    tot AS (SELECT sum(freq) AS n_total FROM cnt),
    ranked AS (
        SELECT term, freq,
               row_number() OVER (ORDER BY freq DESC, term) AS rank
        FROM cnt
    )
    SELECT CAST(rank AS BIGINT) AS rank, term,
           CAST(freq AS BIGINT) AS freq,
           CAST(rank * freq AS BIGINT) AS rank_x_freq,
           CAST(freq * 1000000 // n_total AS BIGINT) AS share_ppm
    FROM ranked CROSS JOIN tot
    WHERE rank <= 50
    ORDER BY rank
"""


@register(
    "x205_zipf_rank_frequency",
    "Zipf rank-frequency head: the top-50 terms with rank, frequency, "
    "the rank*freq product (near-constant under Zipf's law — the "
    "eyeball check that a corpus is natural-language-shaped rather "
    "than template spam), and exact-ppm corpus share. One term "
    "groupBy; the ranking window runs over VOCABULARY cardinality "
    "(and at 100 TB the top-50 cut would ride a TakeOrderedAndProject "
    "over the term aggregate, never a global sort of tokens). "
    "Companion diagnostics: x30 repetition, x90 fluency, x206 "
    "vocabulary growth.",
    oracle=_ZIPF_ORACLE,
    tags=("ext", "text", "corpus-stats", "zipf"),
)
def x205_zipf_rank_frequency(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    cnt = (
        docs.select(F.explode(TX.words("text")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy(F.col("t").alias("term"))
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    tot = cnt.agg(F.sum("freq").alias("n_total"))
    # top-50 via orderBy+limit (TakeOrderedAndProject), then the rank
    # column from a window over the 50 surviving rows — never a rank
    # window over the full vocabulary (the x203 top-k shape)
    ranked = (
        cnt.orderBy(F.desc("freq"), "term")
        .limit(50)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("freq"), "term")),
        )
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("freq").cast("long").alias("freq"),
            (F.col("rank") * F.col("freq")).cast("long").alias("rank_x_freq"),
            F.expr("freq * 1000000 DIV n_total").cast("long")
            .alias("share_ppm"),
        )
        .orderBy("rank")
    )


_HEAPS_ORACLE = """
    WITH dr AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY doc_id) AS r,
               len(list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '')) AS dl
        FROM documents WHERE text IS NOT NULL
    ),
    nd AS (SELECT count(*) AS n_docs FROM dr),
    first_r AS (
        SELECT t AS term, min(r) AS first_rank
        FROM (
            SELECT dr.r, unnest(string_split_regex(lower(d.text), '\\s+')) AS t
            FROM documents d JOIN dr USING (doc_id)
            WHERE d.text IS NOT NULL
        )
        WHERE t <> ''
        GROUP BY t
    ),
    grid AS (
        SELECT pct, n_docs * pct // 100 AS n_prefix
        FROM (SELECT unnest([10, 20, 30, 40, 50, 60, 70, 80, 90, 100])
                  AS pct) CROSS JOIN nd
    )
    SELECT CAST(g.pct AS BIGINT) AS pct,
           CAST(g.n_prefix AS BIGINT) AS n_prefix_docs,
           CAST((SELECT sum(dl) FROM dr WHERE r <= g.n_prefix) AS BIGINT)
               AS tokens_prefix,
           CAST((SELECT count(*) FROM first_r
                 WHERE first_rank <= g.n_prefix) AS BIGINT) AS vocab_size
    FROM grid g
    ORDER BY pct
"""


@register(
    "x206_heaps_vocab_growth",
    "Heaps'-law vocabulary growth curve: distinct-term count and total "
    "tokens after the first 10%..100% of documents (doc_id order) — "
    "sublinear growth is the natural-corpus signature, and the curve "
    "says whether tokenizer vocab training has seen enough data to "
    "plateau. The cumulative-distinct trap is avoided by FIRST-"
    "OCCURRENCE RANKS: each term reduces to min(doc rank) in one "
    "groupBy, and every grid threshold is then a COUNT over that "
    "small table — no per-threshold re-scan, no distinct-over-window. "
    "Doc ranks come from x87's two-phase distributed numbering (no "
    "unpartitioned window), and the 10-row grid is the broadcast side "
    "of both non-equi joins; corpus cost is one token scan + one "
    "vocab-sized agg.",
    oracle=_HEAPS_ORACLE,
    tags=("ext", "text", "corpus-stats", "vocab"),
)
def x206_heaps_vocab_growth(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    # x87's two-phase numbering orders the corpus by doc_id without an
    # unpartitioned row_number window (which would sort every document
    # — token arrays included — through ONE task)
    dr = PK.global_row_number(
        docs.select(
            "doc_id",
            F.filter(TX.words("text"), lambda t: t != "").alias("ws"),
        ),
        ("doc_id",),
        out_col="r",
    ).select("doc_id", "r", "ws", F.size("ws").alias("dl"))
    nd = dr.agg(F.count(F.lit(1)).alias("n_docs"))
    first_r = (
        dr.select("r", F.explode("ws").alias("t"))
        .filter(F.col("t") != "")
        .groupBy(F.col("t").alias("term"))
        .agg(F.min("r").alias("first_rank"))
    )
    grid = (
        dr.sparkSession.range(1, 11)
        .select((F.col("id") * 10).alias("pct"))
        .crossJoin(F.broadcast(nd))
        .select("pct", F.expr("n_docs * pct DIV 100").alias("n_prefix"))
    )
    # the 10-row grid is ALWAYS the broadcast side of both non-equi
    # joins — the doc table and the first-rank histogram are
    # data-scaled and stay partitioned
    tok_prefix = (
        dr.join(F.broadcast(grid), dr["r"] <= grid["n_prefix"])
        .groupBy("pct", "n_prefix")
        .agg(F.sum("dl").alias("tokens_prefix"))
    )
    vocab = (
        first_r.groupBy("first_rank")
        .agg(F.count(F.lit(1)).alias("n_new"))
        .join(F.broadcast(grid), F.col("first_rank") <= F.col("n_prefix"))
        .groupBy("pct")
        .agg(F.sum("n_new").alias("vocab_size"))
    )
    # the 10-row grid is the preserved spine: a threshold whose prefix
    # holds no documents (empty corpus, or n_docs < 10 making some
    # n_prefix = 0) must still emit its row — the oracle's scalar
    # subqueries read NULL tokens / 0 vocab there, so the inner joins
    # become left joins FROM the grid with the (<= 10-row) aggregate
    # results broadcast (empty-input parity, round 10)
    return (
        grid.join(F.broadcast(tok_prefix), ["pct", "n_prefix"], "left")
        .join(F.broadcast(vocab), ["pct"], "left")
        .select(
            F.col("pct").cast("long").alias("pct"),
            F.col("n_prefix").cast("long").alias("n_prefix_docs"),
            F.col("tokens_prefix").cast("long").alias("tokens_prefix"),
            F.coalesce(F.col("vocab_size"), F.lit(0))
            .cast("long")
            .alias("vocab_size"),
        )
        .orderBy("pct")
    )


_BOTTOMK_ORACLE = """
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':bk1') AS h
    FROM documents
    ORDER BY h, doc_id
    LIMIT 100
"""


@register(
    "x207_bottomk_uniform_sample",
    "Exact-k uniform sample (k=100) via bottom-k-by-hash: order by "
    "md5(key || salt) and cut — the distributed equivalent of "
    "reservoir sampling with NONE of its sequential state. Where "
    "x16's hash-acceptance sampling yields a BINOMIAL sample size "
    "(rate fixed, k random), bottom-k fixes k exactly — the form "
    "stratified eval sets and debugging samples need. The plan is the "
    "scale story: TakeOrderedAndProject keeps k rows per partition "
    "and merges k at the driver — O(k) memory at any corpus size, "
    "never a global sort (guarded in tests/test_plans.py). "
    "Deterministic and repeatable across runs/engines by md5.",
    oracle=_BOTTOMK_ORACLE,
    tags=("ext", "sampling", "bottomk"),
)
def x207_bottomk_uniform_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":bk1")))
    return (
        docs.select("doc_id", h.alias("h"))
        .orderBy("h", "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TextRank keywords, hash-verified sketches (HLL / KMV), burstiness,
# seasonal-naive forecasting — session-3 continuation
# ---------------------------------------------------------------------------

_TEXTRANK_ORACLE = f"""
    WITH w AS (
        SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> t <> '') AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    adj AS (
        SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS t1,
               unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS t2
        FROM w WHERE len(ws) >= 2
    ),
    e AS (
        SELECT t1 AS src, t2 AS dst FROM adj WHERE t1 <> t2
        UNION
        SELECT t2 AS src, t1 AS dst FROM adj WHERE t1 <> t2
    ),
    deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
    n AS (SELECT count(*) AS n_nodes FROM deg),
    r0 AS (
        SELECT d.src AS node, d.out_deg,
               1000000000000 // n_nodes AS r
        FROM deg d CROSS JOIN n
    ),{_pr_round('r0', 's1', 'r1')},{_pr_round('r1', 's2', 'r2')}
    SELECT node AS keyword,
           CAST(r AS BIGINT) AS rank_scaled
    FROM r2
    ORDER BY r DESC, node
    LIMIT 20
"""


@register(
    "x208_textrank_keywords",
    "TextRank keyword extraction: PageRank (d=0.85, 2 fixed rounds) "
    "over the word co-occurrence graph — adjacent-word edges "
    "symmetrized, self-loops dropped — surfacing the corpus's most "
    "central vocabulary (Mihalcea & Tarau's unsupervised keyphrase "
    "baseline). Reuses graph.pagerank_fixed_rounds VERBATIM: the "
    "whole iteration is fixed-point int64 (rank div out_degree, "
    "sum*85 div 100), so ranks are bit-identical at any parallelism "
    "and the oracle replays both rounds in SQL (x84's machinery on a "
    "text graph). Symmetric-by-construction edges satisfy the "
    "no-dangling precondition structurally. Edge build is one "
    "index-transform explode + a distinct on (src,dst) word pairs — "
    "vocabulary-sized state, corpus-sized scan.",
    oracle=_TEXTRANK_ORACLE,
    tags=("ext", "text", "graph", "pagerank", "keywords"),
)
def x208_textrank_keywords(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    w = docs.select(
        F.filter(TX.words("text"), lambda t: t != "").alias("ws")
    )
    idx = F.sequence(F.lit(1), F.size("ws") - 1)
    adj = (
        w.filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at(F.col("ws"), i).alias("t1"),
                        F.element_at(F.col("ws"), i + F.lit(1)).alias("t2"),
                    ),
                )
            ).alias("s")
        )
        .select("s.t1", "s.t2")
        .filter(F.col("t1") != F.col("t2"))
    )
    e = (
        adj.select(F.col("t1").alias("src"), F.col("t2").alias("dst"))
        .union(adj.select(F.col("t2").alias("src"), F.col("t1").alias("dst")))
        .distinct()
    )
    ranks = G.pagerank_fixed_rounds(e, rounds=2, check_dangling=False)
    return (
        ranks.select(F.col("node").alias("keyword"), "rank_scaled")
        .orderBy(F.desc("rank_scaled"), "keyword")
        .limit(20)
    )


_HLL_ORACLE = """
    WITH u AS (
        SELECT DISTINCT CAST(user_id AS VARCHAR) AS s FROM events
    ),
    h AS (
        SELECT CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) % 64 AS bucket,
               CAST('0x' || substr(md5(s), 9, 8) AS BIGINT) AS h2
        FROM u
    ),
    reg AS (
        SELECT bucket,
               max(CASE WHEN h2 = 0 THEN 33
                        ELSE 33 - length(bin(h2)) END) AS m_j
        FROM h GROUP BY bucket
    ),
    grid AS (SELECT unnest(range(64)) AS bucket),
    full_reg AS (
        SELECT g.bucket, coalesce(r.m_j, 0) AS m_j
        FROM grid g LEFT JOIN reg r USING (bucket)
    ),
    est AS (
        SELECT sum(1e0 / CAST(1 << m_j AS DOUBLE)) AS sum_inv,
               sum(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS n_zero
        FROM full_reg
    ),
    exact AS (SELECT count(*) AS n_exact FROM u)
    SELECT CAST(64 AS BIGINT) AS m,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(n_zero AS BIGINT) AS n_zero_registers,
           sum_inv,
           0.709e0 * 64e0 * 64e0 / sum_inv AS hll_estimate
    FROM est CROSS JOIN exact
"""


@register(
    "x209_hll_distinct_sketch",
    "HyperLogLog distinct-user estimate, HASH-VERIFIED end to end: "
    "md5 splits into a 6-bit register index and a 32-bit pattern whose "
    "leading-zero rank rho = 33 - len(bin(h)) both engines compute "
    "identically; per-register maxima are exact integers, and the "
    "harmonic close sum(2^-M_j) is EXACT in IEEE double (every term "
    "is a power of two and the 64-term exponent spread < 53 bits, so "
    "every partial sum is representable — the one float SUM in the "
    "repo that is provably order-free), making even the estimate "
    "hash-stable. Emits the exact count beside it (the accuracy "
    "check) and the zero-register count a consumer needs for the "
    "small-range linear-counting correction (deliberately not applied "
    "— it needs ln). THE sketch for 100 TB distinct-counting: "
    "register maxima are mergeable partial aggregates, 64 longs of "
    "state per group vs a distinct shuffle.",
    oracle=_HLL_ORACLE,
    tags=("ext", "sketch", "hll", "distinct"),
)
def x209_hll_distinct_sketch(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    u = ev.select(F.col("user_id").cast("string").alias("s")).distinct()
    md5 = F.md5("s")
    h = u.select(
        (F.conv(F.substring(md5, 1, 8), 16, 10).cast("long") % 64)
        .alias("bucket"),
        F.conv(F.substring(md5, 9, 8), 16, 10).cast("long").alias("h2"),
    )
    reg = h.groupBy("bucket").agg(
        F.max(
            F.when(F.col("h2") == 0, 33).otherwise(
                33 - F.length(F.bin("h2"))
            )
        ).alias("m_j")
    )
    grid = u.sparkSession.range(64).select(F.col("id").alias("bucket"))
    full_reg = grid.join(F.broadcast(reg), "bucket", "left").select(
        "bucket", F.coalesce("m_j", F.lit(0)).alias("m_j")
    )
    est = full_reg.agg(
        F.sum(
            F.expr("1.0 / CAST(shiftleft(1L, CAST(m_j AS INT)) AS DOUBLE)")
        ).alias("sum_inv"),
        F.sum(F.when(F.col("m_j") == 0, 1).otherwise(0)).alias("n_zero"),
    )
    exact = u.agg(F.count(F.lit(1)).alias("n_exact"))
    return est.crossJoin(F.broadcast(exact)).select(
        F.lit(64).cast("long").alias("m"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("n_zero").cast("long").alias("n_zero_registers"),
        "sum_inv",
        (F.lit(0.709) * F.lit(64.0) * F.lit(64.0) / F.col("sum_inv"))
        .alias("hll_estimate"),
    )


_FANO_ORACLE = """
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS d, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    mo AS (
        SELECT user_id, count(*) AS n_days, sum(c) AS total,
               sum(c * c) AS sum_sq
        FROM daily GROUP BY user_id
        HAVING count(*) >= 5
    )
    SELECT user_id,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(total AS BIGINT) AS total_events,
           CAST(n_days * sum_sq - total * total AS BIGINT) AS fano_num,
           CAST((n_days - 1) * total AS BIGINT) AS fano_den,
           n_days * sum_sq - total * total > 2 * ((n_days - 1) * total)
               AS overdispersed
    FROM mo
"""


@register(
    "x210_fano_burstiness",
    "Per-user burstiness via the Fano factor of daily event counts: "
    "variance-to-mean of the count series, the index-of-dispersion "
    "that separates Poisson-like organic activity (~1) from bursty "
    "humans (>1 clumped sessions) and metronomic bots (<1) — the "
    "continuous companion to x196's threshold flags. Fano = "
    "(n*sum_sq - total^2) / ((n-1)*total) ships as the exact int64 "
    "num/den pair (the cleared-denominator discipline), with the "
    "overdispersed>2 verdict as a cross-multiplied integer "
    "inequality — no float anywhere. Two grouped passes (daily, then "
    "per-user moments), both partitioned by user; min 5 active days.",
    oracle=_FANO_ORACLE,
    tags=("ext", "behavioral", "burstiness", "exact-stats"),
)
def x210_fano_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    mo = (
        daily.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("c").alias("total"),
            F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
        )
        .filter(F.col("n_days") >= 5)
    )
    num = F.col("n_days") * F.col("sum_sq") - F.col("total") * F.col("total")
    den = (F.col("n_days") - 1) * F.col("total")
    return mo.select(
        "user_id",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("total").cast("long").alias("total_events"),
        num.cast("long").alias("fano_num"),
        den.cast("long").alias("fano_den"),
        (num > 2 * den).alias("overdispersed"),
    )


_MASE_ORACLE = """
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01'
                   AS ed,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    e7 AS (
        SELECT a.event_type, sum(abs(a.cents - b.cents)) AS sae,
               count(*) AS n
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.ed = b.ed + 7
        GROUP BY a.event_type
    ),
    e1 AS (
        SELECT a.event_type, sum(abs(a.cents - b.cents)) AS sae,
               count(*) AS n
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.ed = b.ed + 1
        GROUP BY a.event_type
    )
    SELECT e7.event_type,
           CAST(e7.n AS BIGINT) AS n7, CAST(e7.sae AS BIGINT) AS sae7,
           CAST(e1.n AS BIGINT) AS n1, CAST(e1.sae AS BIGINT) AS sae1,
           (CAST(e7.sae AS DOUBLE) / CAST(e7.n AS DOUBLE))
               / (CAST(e1.sae AS DOUBLE) / CAST(e1.n AS DOUBLE)) AS mase
    FROM e7 JOIN e1 USING (event_type)
"""


@register(
    "w25_seasonal_naive_mase",
    "Seasonal-naive forecast evaluation: per event type, the MAE of "
    "the forecast 'same as 7 days ago' scaled by the MAE of the "
    "one-day naive — MASE, the scale-free forecast-accuracy standard "
    "(Hyndman-Koehler); < 1 means weekly seasonality genuinely "
    "predicts. Lag pairing is by EXACT epoch-day equi-join (a18's "
    "discipline: calendar gaps pair nothing, a window lag would "
    "silently pair across them), absolute errors sum in int64 cents, "
    "and only the final ratio-of-ratios floats in one fixed IEEE "
    "shape. Joins and aggs all partition by event_type + day — "
    "embarrassingly parallel at any history length.",
    oracle=_MASE_ORACLE,
    tags=("ext", "timeseries", "forecast", "eval"),
)
def w25_seasonal_naive_mase(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("1970-01-01")
        ).alias("ed"),
    ).agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("cents")
    )

    def lag_err(k: int) -> DataFrame:
        a, b = daily.alias("a"), daily.alias("b")
        return (
            a.join(
                b,
                (F.col("a.event_type") == F.col("b.event_type"))
                & (F.col("a.ed") == F.col("b.ed") + k),
            )
            .groupBy(F.col("a.event_type").alias("event_type"))
            .agg(
                F.sum(F.abs(F.col("a.cents") - F.col("b.cents"))).alias("sae"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    e7 = lag_err(7).select(
        "event_type", F.col("n").alias("n7"), F.col("sae").alias("sae7")
    )
    e1 = lag_err(1).select(
        "event_type", F.col("n").alias("n1"), F.col("sae").alias("sae1")
    )
    return e7.join(e1, "event_type").select(
        "event_type",
        F.col("n7").cast("long").alias("n7"),
        F.col("sae7").cast("long").alias("sae7"),
        F.col("n1").cast("long").alias("n1"),
        F.col("sae1").cast("long").alias("sae1"),
        (
            (F.col("sae7").cast("double") / F.col("n7").cast("double"))
            / (F.col("sae1").cast("double") / F.col("n1").cast("double"))
        ).alias("mase"),
    )


_KMV_K = 64
_KMV_ORACLE = f"""
    WITH labeled AS (
        SELECT 'click' AS set_name, user_id FROM events
        WHERE event_type = 'click'
        UNION ALL
        SELECT 'view', user_id FROM events WHERE event_type = 'view'
        UNION ALL
        SELECT 'union', user_id FROM events
        WHERE event_type IN ('click', 'view')
    ),
    hashed AS (
        SELECT DISTINCT set_name,
               CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                    AS BIGINT) AS h
        FROM labeled
    ),
    ranked AS (
        SELECT set_name, h,
               row_number() OVER (PARTITION BY set_name ORDER BY h) AS rn,
               count(*) OVER (PARTITION BY set_name) AS n_exact
        FROM hashed
    )
    SELECT set_name,
           CAST({_KMV_K} AS BIGINT) AS k,
           CAST(max(CASE WHEN rn = {_KMV_K} THEN h END) AS BIGINT)
               AS kth_hash,
           CAST(({_KMV_K} - 1e0) * 4294967296e0
                / max(CASE WHEN rn = {_KMV_K} THEN h END) AS DOUBLE)
               AS est_distinct,
           CAST(max(n_exact) AS BIGINT) AS exact_distinct
    FROM ranked
    WHERE n_exact >= {_KMV_K}
    GROUP BY set_name
"""


@register(
    "x211_kmv_sketch_setops",
    "KMV (k-minimum-values) distinct sketches with a set operation: "
    "the k=64 smallest md5 hashes of click users, view users, and "
    "their UNION — the union sketch merges member sketches without "
    "touching raw data, which is the entire 100 TB point (HLL's "
    "register-max merge, x209, is the other classic; KMV adds "
    "unbiased intersection/Jaccard algebra on top). Estimator "
    "(k-1)*2^32/h_k is deterministic given md5, so even the float "
    "estimate hash-verifies; the exact distinct count rides beside "
    "it. Per-set state is k longs; the rank window partitions by "
    "set. Sets below k members are excluded (the estimator is exact-"
    "count territory there anyway).",
    oracle=_KMV_ORACLE,
    tags=("ext", "sketch", "kmv", "distinct"),
)
def x211_kmv_sketch_setops(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    click = ev.filter(F.col("event_type") == "click").select(
        F.lit("click").alias("set_name"), "user_id"
    )
    view = ev.filter(F.col("event_type") == "view").select(
        F.lit("view").alias("set_name"), "user_id"
    )
    both = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.lit("union").alias("set_name"), "user_id"
    )
    labeled = click.union(view).union(both)
    hashed = labeled.select(
        "set_name",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    wr = Window.partitionBy("set_name").orderBy("h")
    wc = Window.partitionBy("set_name")
    ranked = hashed.select(
        "set_name",
        "h",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_exact"),
    )
    kth = F.max(F.when(F.col("rn") == _KMV_K, F.col("h")))
    return (
        ranked.filter(F.col("n_exact") >= _KMV_K)
        .groupBy("set_name")
        .agg(
            F.lit(_KMV_K).cast("long").alias("k"),
            kth.cast("long").alias("kth_hash"),
            (
                F.lit(float(_KMV_K - 1))
                * F.lit(4294967296.0)
                / kth.cast("double")
            ).alias("est_distinct"),
            F.max("n_exact").cast("long").alias("exact_distinct"),
        )
    )


_EXPECT_ORACLE = """
    WITH checks AS (
        SELECT 'lineitem.quantity_in_[1,50]' AS check_name,
               count(*) AS n_checked,
               sum(CASE WHEN l_quantity BETWEEN 1 AND 50
                        THEN 0 ELSE 1 END) AS n_failed
        FROM lineitem
        UNION ALL
        SELECT 'lineitem.discount_in_[0,0.1]',
               count(*),
               sum(CASE WHEN l_discount BETWEEN 0e0 AND 0.1e0
                        THEN 0 ELSE 1 END)
        FROM lineitem
        UNION ALL
        SELECT 'orders.orderkey_unique',
               count(*),
               count(*) - count(DISTINCT o_orderkey)
        FROM orders
        UNION ALL
        SELECT 'orders.status_accepted_values',
               count(*),
               sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                        THEN 0 ELSE 1 END)
        FROM orders
        UNION ALL
        SELECT 'orders.totalprice_not_null',
               count(*),
               sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
        FROM orders
        UNION ALL
        SELECT 'lineitem.orderkey_fk_orders',
               count(*),
               sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'events.ts_not_in_future',
               count(*),
               sum(CASE WHEN ts > TIMESTAMP '2031-01-01 00:00:00'
                        THEN 1 ELSE 0 END)
        FROM events
    )
    SELECT check_name,
           CAST(n_checked AS BIGINT) AS n_checked,
           CAST(n_failed AS BIGINT) AS n_failed,
           n_failed = 0 AS passed
    FROM checks
"""


@register(
    "x212_data_expectations",
    "Declarative data-quality expectation suite (the Great-"
    "Expectations/dbt-test pattern as one relation): range bounds, "
    "accepted value sets, not-null, primary-key uniqueness, an FK "
    "existence probe, and a freshness sanity bound — each check one "
    "conditional aggregation, unioned into a (check, n_checked, "
    "n_failed, passed) ledger that gates a pipeline run. Every check "
    "is a single scan-side aggregate (the FK probe is the one join, "
    "same broadcast-dim shape as x68's full referential audit); "
    "counts are exact integers, so the whole ledger hashes. At 100 TB "
    "the union fans out to independent stages that AQE schedules "
    "together, and per-check cost is a map-side fold — the cheapest "
    "possible full-corpus assertion.",
    oracle=_EXPECT_ORACLE,
    tags=("ext", "data-quality", "expectations", "gate"),
)
def x212_data_expectations(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    ev = load_table(spark, sf, "events")

    def check(df, name, fail_cond) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(F.when(fail_cond, 1).otherwise(0)).alias("n_failed"),
        )

    checks = [
        check(
            li,
            "lineitem.quantity_in_[1,50]",
            ~F.col("l_quantity").between(1, 50),
        ),
        check(
            li,
            "lineitem.discount_in_[0,0.1]",
            ~F.col("l_discount").between(0.0, 0.1),
        ),
        orders.agg(
            F.lit("orders.orderkey_unique").alias("check_name"),
            F.count(F.lit(1)).alias("n_checked"),
            (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey")))
            .alias("n_failed"),
        ),
        check(
            orders,
            "orders.status_accepted_values",
            ~F.col("o_orderstatus").isin("O", "F", "P"),
        ),
        check(
            orders,
            "orders.totalprice_not_null",
            F.col("o_totalprice").isNull(),
        ),
        check(
            li.join(
                orders.select("o_orderkey"),
                li["l_orderkey"] == F.col("o_orderkey"),
                "left",
            ),
            "lineitem.orderkey_fk_orders",
            F.col("o_orderkey").isNull(),
        ),
        check(
            ev,
            "events.ts_not_in_future",
            F.col("ts") > F.lit("2031-01-01 00:00:00").cast("timestamp"),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.union(c)
    return out.select(
        "check_name",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_failed").cast("long").alias("n_failed"),
        (F.col("n_failed") == 0).alias("passed"),
    )


_WINSOR_ORACLE = """
    WITH v AS (
        SELECT CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    lv AS (
        SELECT cents, count(*) AS cnt FROM v GROUP BY cents
    ),
    tot AS (SELECT sum(cnt) AS n FROM lv),
    cum AS (
        SELECT cents, cnt,
               sum(cnt) OVER (ORDER BY cents) AS c
        FROM lv
    ),
    cuts AS (
        SELECT min(CASE WHEN c >= greatest(n * 10 // 100, 1)
                        THEN cents END) AS lo,
               min(CASE WHEN c >= n - n * 10 // 100 + 1
                        THEN cents END) AS hi,
               max(n) AS n
        FROM cum CROSS JOIN tot
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(lo AS BIGINT) AS lo_cents,
           CAST(hi AS BIGINT) AS hi_cents,
           CAST((SELECT sum(cnt * CASE WHEN cents < lo THEN lo
                                       WHEN cents > hi THEN hi
                                       ELSE cents END)
                 FROM lv, cuts) AS BIGINT) AS winsorized_sum_cents,
           CAST((SELECT sum(cnt * CASE WHEN cents < lo THEN lo
                                       WHEN cents > hi THEN hi
                                       ELSE cents END)
                 FROM lv, cuts) AS DOUBLE) / CAST(n AS DOUBLE)
               AS winsorized_mean_cents
    FROM cuts
"""


@register(
    "a28_winsorized_mean",
    "10% winsorized mean of event spend: values below the 10th rank "
    "percentile CLAMP to it and above the 90th clamp down, then the "
    "mean — the robust-mean family member that (unlike a13's trimmed "
    "mean, which DROPS the tails) keeps n constant and only caps "
    "influence; the estimator behind metric guardrails that must not "
    "let one whale move the average. Everything runs on the DISTINCT-"
    "VALUE aggregate (the a21/x61 posture): the cumulative window and "
    "the rank probes cover value cardinality, never row cardinality, "
    "and the clamped total is sum(cnt * clamp(value)) over the same "
    "small table — so the single-partition stage is bounded by "
    "distinct cents at any corpus size. The clamped sum is int64 "
    "under the hash; the one closing division is the only float.",
    oracle=_WINSOR_ORACLE,
    tags=("ext", "robust-stats", "winsorize", "exact-stats"),
)
def a28_winsorized_mean(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    lv = (
        ev.select(
            F.floor(fin("value") * 100 + 0.5).cast("long").alias("cents")
        )
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = lv.agg(F.sum("cnt").alias("n"))
    cum = lv.withColumn(
        "c", F.sum("cnt").over(Window.orderBy("cents"))
    )
    cuts = cum.crossJoin(F.broadcast(tot)).agg(
        F.min(
            F.when(
                F.col("c") >= F.greatest(F.expr("n * 10 DIV 100"), F.lit(1)),
                F.col("cents"),
            )
        ).alias("lo"),
        F.min(
            F.when(
                F.col("c") >= F.col("n") - F.expr("n * 10 DIV 100") + 1,
                F.col("cents"),
            )
        ).alias("hi"),
        F.max("n").alias("n"),
    )
    clamped = lv.crossJoin(F.broadcast(cuts)).agg(
        F.sum(
            F.col("cnt")
            * F.when(F.col("cents") < F.col("lo"), F.col("lo"))
            .when(F.col("cents") > F.col("hi"), F.col("hi"))
            .otherwise(F.col("cents"))
        ).alias("wsum"),
        F.max("n").alias("n"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
    )
    return clamped.select(
        F.col("n").cast("long").alias("n"),
        F.col("lo").cast("long").alias("lo_cents"),
        F.col("hi").cast("long").alias("hi_cents"),
        F.col("wsum").cast("long").alias("winsorized_sum_cents"),
        (F.col("wsum").cast("double") / F.col("n").cast("double"))
        .alias("winsorized_mean_cents"),
    )


_STREAM_REPLAY_ORACLE = """
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
"""


@register(
    "s9_streaming_hourly_replay",
    "Structured Streaming, HASH-VERIFIED against batch SQL: the events "
    "table is re-read through readStream (file source), watermarked 1 "
    "hour on event time, aggregated into tumbling hourly windows per "
    "type, drained with Trigger.AvailableNow into a memory sink in "
    "complete mode, and the sink's final table is returned — so the "
    "driver's DuckDB comparison proves the STREAMING pipeline computes "
    "exactly the batch answer (the Dataflow/kappa equivalence claim, "
    "tested rather than asserted). Complete mode emits closed AND "
    "open windows at drain, which is precisely batch semantics for a "
    "bounded replay; the watermark bounds state for the unbounded "
    "case. Exactly-once file ingestion, checkpointed restarts, and "
    "late-data drop are pinned separately in tests/test_streaming.py; "
    "this entry is the cross-engine correctness anchor. Uses a "
    "throwaway checkpoint/sink name per invocation (safe under the "
    "driver's repeated runs).",
    oracle=_STREAM_REPLAY_ORACLE,
    tags=("ext", "streaming", "watermark", "replay"),
)
def s9_streaming_hourly_replay(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile
    import uuid

    batch = load_table(spark, sf, "events")
    name = f"s9_sink_{uuid.uuid4().hex[:12]}"
    ckpt = _ephemeral_ckpt("s9_ckpt_")
    # the parquet ts is TIMESTAMP_NTZ; watermarks require instant
    # semantics — round-trip through TIMESTAMP under the pinned session
    # timezone (value-preserving) and cast the window edge back below
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .parquet(sf)
        .filter(F.col("value").isNotNull())
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.floor(fin("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(name).select(
        F.col("w.start").cast("timestamp_ntz").alias("hour_start"),
        "event_type",
        "n_events",
        "cents",
    )


_KRUSKAL_ORACLE = """
    WITH per_user AS (
        SELECT user_id, event_type,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    lv AS (
        SELECT cents, event_type, count(*) AS n_eq
        FROM per_user GROUP BY 1, 2
    ),
    allv AS (
        SELECT cents, sum(n_eq) AS n_all FROM lv GROUP BY cents
    ),
    ranked AS (
        SELECT a.cents, a.n_all,
               coalesce(sum(a2.n_all), 0) AS cnt_less
        FROM allv a LEFT JOIN allv a2 ON a2.cents < a.cents
        GROUP BY a.cents, a.n_all
    ),
    grp AS (
        SELECT l.event_type,
               sum(l.n_eq) AS n_j,
               sum(l.n_eq * (2 * r.cnt_less + r.n_all + 1)) AS r_j_x2
        FROM lv l JOIN ranked r USING (cents)
        GROUP BY l.event_type
    ),
    tie AS (
        SELECT sum(n_all * n_all * n_all - n_all) AS tt,
               sum(n_all) AS nn
        FROM allv
    )
    SELECT g.event_type,
           CAST(g.n_j AS BIGINT) AS n_j,
           CAST(g.r_j_x2 AS BIGINT) AS rank_sum_x2,
           (12e0 / (CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) + 1e0))
            * ((CAST(g.r_j_x2 AS DOUBLE) / 2e0)
               * (CAST(g.r_j_x2 AS DOUBLE) / 2e0)
               / CAST(g.n_j AS DOUBLE))) AS h_term
    FROM grp g CROSS JOIN tie t
"""


@register(
    "a29_kruskal_wallis_terms",
    "Kruskal-Wallis k-sample rank test over per-user spend by event "
    "type — a21's two-arm Mann-Whitney generalized to all five groups "
    "(the nonparametric ANOVA). Tie-averaged ranks stay EXACT by "
    "doubling (2*avgrank = 2*cnt_less + n_all + 1) over the DISTINCT "
    "spend levels, each group's rank sum ships as the integer "
    "r_j_x2 surface, and the per-group H contribution 12/(N(N+1)) * "
    "R_j^2/n_j closes in one fixed IEEE shape (consumer sums the k=5 "
    "terms and subtracts 3(N+1), applying the tie correction from "
    "a21's tt — k-row arithmetic). Cumulative counts via the "
    "value-level self-join keep every stage at value cardinality.",
    oracle=_KRUSKAL_ORACLE,
    tags=("ext", "ab-test", "nonparametric", "exact-stats"),
)
def a29_kruskal_wallis_terms(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    per_user = ev.groupBy("user_id", "event_type").agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    lv = per_user.groupBy("cents", "event_type").agg(
        F.count(F.lit(1)).alias("n_eq")
    )
    allv = lv.groupBy("cents").agg(F.sum("n_eq").alias("n_all"))
    a, a2 = allv.alias("a"), allv.alias("a2")
    ranked = (
        a.join(a2, F.col("a2.cents") < F.col("a.cents"), "left")
        .groupBy(F.col("a.cents").alias("cents"), F.col("a.n_all").alias("n_all"))
        .agg(F.coalesce(F.sum("a2.n_all"), F.lit(0)).alias("cnt_less"))
    )
    grp = (
        lv.join(ranked, "cents")
        .groupBy("event_type")
        .agg(
            F.sum("n_eq").alias("n_j"),
            F.sum(
                F.col("n_eq")
                * (2 * F.col("cnt_less") + F.col("n_all") + 1)
            ).alias("r_j_x2"),
        )
    )
    tie = allv.agg(
        F.sum(
            F.col("n_all") * F.col("n_all") * F.col("n_all") - F.col("n_all")
        ).alias("tt"),
        F.sum("n_all").alias("nn"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    h_term = (
        F.lit(12.0) / (d("nn") * (d("nn") + F.lit(1.0)))
        * ((d("r_j_x2") / F.lit(2.0)) * (d("r_j_x2") / F.lit(2.0)) / d("n_j"))
    )
    return grp.crossJoin(F.broadcast(tie)).select(
        "event_type",
        F.col("n_j").cast("long").alias("n_j"),
        F.col("r_j_x2").cast("long").alias("rank_sum_x2"),
        h_term.alias("h_term"),
    )


_OHLC_ORACLE = """
    WITH t AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT) AS cents,
               printf('%020d', epoch_us(ts)) || printf('%010d', event_id)
                   AS ord
        FROM events WHERE value IS NOT NULL AND isfinite(value) AND abs(value) < 1e13
    )
    SELECT event_type, d,
           CAST(arg_min(cents, ord) AS BIGINT) AS open_cents,
           CAST(max(cents) AS BIGINT) AS high_cents,
           CAST(min(cents) AS BIGINT) AS low_cents,
           CAST(arg_max(cents, ord) AS BIGINT) AS close_cents,
           CAST(count(*) AS BIGINT) AS n_ticks
    FROM t GROUP BY 1, 2
"""


@register(
    "w26_daily_ohlc",
    "Daily OHLC candles per event type: open/close are argmin/argmax "
    "by the (ts, event_id) TOTAL order (the event_id tiebreak makes "
    "same-timestamp ticks deterministic — min_by on a bare ts would "
    "be run-order-dependent and break the hash), high/low are plain "
    "extrema, all in int64 cents. One grouped pass with min_by/max_by "
    "over a zero-padded (epoch_us, event_id) string key — the portable "
    "total order both engines agree on (w23 anchor) "
    "— the classic bar resample as a single partial-aggregable "
    "aggregation, embarrassingly parallel over (type, day).",
    oracle=_OHLC_ORACLE,
    tags=("ext", "timeseries", "resample", "ohlc"),
)
def w26_daily_ohlc(spark: SparkSession, sf: str) -> DataFrame:
    # a non-finite tick is not a price: excluded whole (argmin/argmax
    # NULL-skip conventions differ between engines, so a screened-NULL
    # close is not portable; round-11 NaN convention, row-exclusion arm)
    ev = load_table(spark, sf, "events").filter(fin("value").isNotNull())
    cents = F.floor(fin("value") * 100 + 0.5).cast("long")
    # zero-padded (epoch_us, event_id) string: a portable TOTAL order
    # (unix_micros ≡ epoch_us, the w23-verified anchor)
    key = F.concat(
        F.format_string(
            "%020d", F.unix_micros(F.col("ts").cast("timestamp"))
        ),
        F.format_string("%010d", F.col("event_id")),
    )
    return ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.min_by(cents, key).cast("long").alias("open_cents"),
        F.max(cents).cast("long").alias("high_cents"),
        F.min(cents).cast("long").alias("low_cents"),
        F.max_by(cents, key).cast("long").alias("close_cents"),
        F.count(F.lit(1)).cast("long").alias("n_ticks"),
    )


_STREAM_JOIN_ORACLE = """
    SELECT a.event_id AS click_id,
           b.event_id AS purchase_id,
           a.user_id,
           CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS delay_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts >= a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
"""


@register(
    "s10_streaming_stream_join_replay",
    "Stream-stream interval join, HASH-VERIFIED against batch SQL: "
    "clicks and purchases re-read as two watermarked streams, inner-"
    "joined per user on purchase time within [click, click+1h], "
    "drained by Trigger.AvailableNow — the driver's comparison proves "
    "the streaming join emits EXACTLY the batch join's pairs (s9's "
    "equivalence anchor extended to the hardest streaming operator: "
    "dual-sided state with time-range matching). The time bound plus "
    "both watermarks is what lets Spark expire join state at 100 TB "
    "stream scale — an unbounded-state join would be rejected. Delay "
    "rides as exact integer microseconds.",
    oracle=_STREAM_JOIN_ORACLE,
    tags=("ext", "streaming", "stream-join", "replay"),
)
def s10_streaming_stream_join_replay(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile
    import uuid

    batch = load_table(spark, sf, "events")
    name = f"s10_sink_{uuid.uuid4().hex[:12]}"
    ckpt = _ephemeral_ckpt("s10_ckpt_")

    def side(ev_type: str, prefix: str):
        return (
            spark.readStream.schema(batch.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf)
            .filter(F.col("event_type") == ev_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").cast("timestamp").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "1 hour")
        )

    clicks = side("click", "click")
    purchases = side("purchase", "purchase")
    joined = clicks.join(
        purchases,
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
        ),
    )
    (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(name).select(
        F.col("click_id"),
        F.col("purchase_id"),
        F.col("click_user").alias("user_id"),
        (
            F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
        ).cast("long").alias("delay_us"),
    )


_TRIANGLE_ORACLE = """
    WITH li AS (
        SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 45e0
    ),
    e AS (
        SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
    ),
    deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),
    o AS (
        SELECT e.src AS u, e.dst AS v
        FROM e
        JOIN deg du ON e.src = du.node
        JOIN deg dv ON e.dst = dv.node
        WHERE (du.d, e.src) < (dv.d, e.dst)
    ),
    tri AS (
        SELECT a.u AS x, a.v AS y, b.v AS z
        FROM o a JOIN o b ON a.v = b.u
        JOIN o c ON c.u = a.u AND c.v = b.v
    ),
    per_node AS (
        SELECT node, count(*) AS n_tri
        FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
        )
        GROUP BY node
    )
    SELECT d.node AS supplier,
           CAST(d.d AS BIGINT) AS degree,
           CAST(coalesce(p.n_tri, 0) AS BIGINT) AS n_triangles,
           CAST(2 * coalesce(p.n_tri, 0) AS BIGINT) AS cc_num,
           CAST(d.d * (d.d - 1) AS BIGINT) AS cc_den
    FROM deg d LEFT JOIN per_node p USING (node)
    WHERE d.d >= 2
"""


@register(
    "x213_triangle_clustering",
    "Triangle counting + local clustering coefficients on the high-"
    "quantity co-supply graph via DEGREE-ORDERED ORIENTATION (the "
    "scalable standard: orient each undirected edge low-(deg,id) -> "
    "high, so every triangle is enumerated exactly once from its "
    "lowest corner and the wedge join fans out from LOW-degree "
    "vertices — the skew cap that makes triangle counting feasible "
    "on power-law graphs where the naive wedge join explodes at the "
    "hubs). Two equi-joins over the oriented DAG, one explode-count "
    "for per-node participation; cc = 2T/(d(d-1)) ships as the exact "
    "int64 num/den pair. Transitivity-vs-degree is the community-"
    "structure read x193's assortativity can't give.",
    oracle=_TRIANGLE_ORACLE,
    tags=("ext", "graph", "triangles", "clustering"),
)
def x213_triangle_clustering(spark: SparkSession, sf: str) -> DataFrame:
    li = (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_quantity") >= 45.0)
        .select("l_orderkey", "l_suppkey")
    )
    e = _cosupply_edges(li)
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    o = (
        e.join(deg.select(F.col("node").alias("src"), F.col("d").alias("du")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dv")), "dst")
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("src") < F.col("dst")))
        )
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .persist()  # three joins consume the oriented DAG
    )
    a = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    b = o.select(F.col("u").alias("y"), F.col("v").alias("z"))
    c = o.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = a.join(b, "y").join(c, ["x", "z"])
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return (
        deg.filter(F.col("d") >= 2)
        .join(per_node, "node", "left")
        .select(
            F.col("node").alias("supplier"),
            F.col("d").cast("long").alias("degree"),
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_triangles"),
            (2 * F.coalesce("n_tri", F.lit(0))).cast("long").alias("cc_num"),
            (F.col("d") * (F.col("d") - 1)).cast("long").alias("cc_den"),
        )
    )


_PRF_ORACLE = f"""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> t <> '') AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    d AS (SELECT doc_id, len(ws) AS dl FROM w),
    tot AS (SELECT count(*) AS n_docs, sum(dl) AS dl_total FROM d),
    tf AS (
        SELECT doc_id, t AS term, count(*) AS tf
        FROM (SELECT doc_id, unnest(ws) AS t FROM w)
        WHERE t IN {_BM25_TERMS!r}
        GROUP BY doc_id, t
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    st AS (
        SELECT tf.doc_id, tf.term,
               ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5e0)
                / (CAST(df AS DOUBLE) + 0.5e0)) * ({_BM25_SAT_SQL}) AS s
        FROM tf JOIN df USING (term) JOIN d USING (doc_id) CROSS JOIN tot
    ),
    agg AS (
        SELECT doc_id,
               coalesce(sum(CASE WHEN term = 'join' THEN s END), 0e0)
               + coalesce(sum(CASE WHEN term = 'hash' THEN s END), 0e0)
               + coalesce(sum(CASE WHEN term = 'scan' THEN s END), 0e0)
               + coalesce(sum(CASE WHEN term = 'merge' THEN s END), 0e0)
                   AS bm25
        FROM st GROUP BY doc_id
    ),
    rel AS (
        SELECT doc_id FROM agg ORDER BY bm25 DESC, doc_id LIMIT 10
    ),
    pres AS (
        SELECT DISTINCT w.doc_id,
               unnest(list_distinct(w.ws)) AS term
        FROM w JOIN rel USING (doc_id)
    ),
    cand AS (
        SELECT term, count(*) AS df_rel
        FROM pres
        WHERE term NOT IN {_BM25_TERMS!r}
        GROUP BY term
    ),
    corpus_df AS (
        SELECT term, count(DISTINCT doc_id) AS df_corpus
        FROM (SELECT doc_id, unnest(list_distinct(ws)) AS term FROM w)
        GROUP BY term
    )
    SELECT c.term,
           CAST(c.df_rel AS BIGINT) AS df_rel,
           CAST(cd.df_corpus AS BIGINT) AS df_corpus,
           CAST(c.df_rel * t.n_docs AS BIGINT) AS weight_num,
           CAST(10 * cd.df_corpus AS BIGINT) AS weight_den
    FROM cand c JOIN corpus_df cd USING (term) CROSS JOIN tot t
    ORDER BY CAST(c.df_rel * t.n_docs AS DOUBLE)
                 / CAST(10 * cd.df_corpus AS DOUBLE) DESC,
             c.term
    LIMIT 10
"""


@register(
    "x214_prf_expansion_terms",
    "Pseudo-relevance-feedback query expansion (Rocchio/RM1 lite): "
    "take x203's BM25 top-10 as the pseudo-relevant set, then rank "
    "non-query terms by how over-represented they are there vs the "
    "corpus — weight = (df_rel/10)/(df_corpus/N) as the exact integer "
    "fraction df_rel*N / (10*df_corpus) (the x202 log-free ranking "
    "discipline; the division orders only, num/den hash). The "
    "composition entry: retrieval feeding retrieval, the standard "
    "two-pass IR loop. Corpus df is one distinct-presence groupBy; "
    "the relevant-set side touches 10 documents.",
    oracle=_PRF_ORACLE,
    tags=("ext", "retrieval", "prf", "composition"),
)
def x214_prf_expansion_terms(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    w = docs.select(
        "doc_id", F.filter(TX.words("text"), lambda t: t != "").alias("ws")
    )
    d = w.select("doc_id", F.size("ws").alias("dl"))
    tot = d.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("dl_total")
    )
    tf = (
        w.select("doc_id", F.explode("ws").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    idf = (dd("n_docs") - dd("df") + F.lit(0.5)) / (dd("df") + F.lit(0.5))
    sat = (dd("tf") * F.lit(2.2)) / (
        dd("tf")
        + F.lit(1.2)
        * (F.lit(0.25) + F.lit(0.75) * dd("dl") * dd("n_docs") / dd("dl_total"))
    )
    st = (
        tf.join(F.broadcast(df_), "term")
        .join(d, "doc_id")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "term", (idf * sat).alias("s"))
    )
    term_sum = lambda t: F.coalesce(  # noqa: E731
        F.sum(F.when(F.col("term") == t, F.col("s"))), F.lit(0.0)
    )
    rel = (
        st.groupBy("doc_id")
        .agg(
            (
                term_sum("join") + term_sum("hash")
                + term_sum("scan") + term_sum("merge")
            ).alias("bm25")
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(10)
        .select("doc_id")
    )
    pres_all = w.select(
        "doc_id", F.explode(F.array_distinct("ws")).alias("term")
    )
    cand = (
        pres_all.join(F.broadcast(rel), "doc_id")
        .filter(~F.col("term").isin(*_BM25_TERMS))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_rel"))
    )
    corpus_df = pres_all.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df_corpus")
    )
    return (
        cand.join(corpus_df, "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            F.col("df_rel").cast("long").alias("df_rel"),
            F.col("df_corpus").cast("long").alias("df_corpus"),
            (F.col("df_rel") * F.col("n_docs")).cast("long")
            .alias("weight_num"),
            (F.lit(10) * F.col("df_corpus")).cast("long").alias("weight_den"),
        )
        .orderBy(
            F.desc(
                F.col("weight_num").cast("double")
                / F.col("weight_den").cast("double")
            ),
            "term",
        )
        .limit(10)
    )


_BPE2_ORACLE = """
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(text), '\\s+')) AS t
        FROM documents WHERE text IS NOT NULL
    ),
    t2 AS (SELECT t FROM toks WHERE length(t) >= 2),
    p1 AS (
        SELECT pair FROM (
            SELECT unnest(list_transform(range(1, length(t)),
                                         i -> substr(t, i, 2))) AS pair
            FROM t2
        )
        GROUP BY pair
        ORDER BY count(*) DESC, pair
        LIMIT 1
    ),
    merged AS (
        SELECT replace(t, pair, chr(57344)) AS t
        FROM t2 CROSS JOIN p1
    ),
    pairs2 AS (
        SELECT unnest(list_transform(range(1, length(t)),
                                     i -> substr(t, i, 2))) AS pair
        FROM merged WHERE length(t) >= 2
    )
    SELECT replace(pair, chr(57344), '<M>') AS pair,
           CAST(count(*) AS BIGINT) AS n
    FROM pairs2 GROUP BY 1
    ORDER BY n DESC, pair
    LIMIT 20
"""


@register(
    "x215_bpe_second_merge",
    "BPE training, round two — VERIFIED iteration: the argmax pair "
    "from x34's first count is APPLIED to every token (literal "
    "replace(), greedy leftmost non-overlapping in both engines — "
    "regex replace would be injectable by hostile pair bytes) with a "
    "private-use fused symbol, then adjacent pairs are recounted over "
    "the merged stream — exactly the tokenizer-training inner loop, "
    "demonstrating that the iterative merge process (not just one "
    "statistic) replays cross-engine. The merge pair arrives by "
    "1-row broadcast (total-ordered argmax, no collect); the fused "
    "symbol renders as '<M>' in the output so the surface stays "
    "printable. Each round is one map pass + one pair groupBy — "
    "linear in corpus bytes, the 100 TB tokenizer-training shape.",
    oracle=_BPE2_ORACLE,
    tags=("ext", "text", "tokenizer", "iterative"),
)
def x215_bpe_second_merge(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    t2 = docs.select(F.explode(TX.words("text")).alias("t")).filter(
        F.length("t") >= 2
    )
    pair_col = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.length("t") - 1),
            lambda i: F.col("t").substr(i, F.lit(2)),
        )
    ).alias("pair")
    p1 = (
        t2.select(pair_col)
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(1)
        .select("pair")
    )
    merged = t2.crossJoin(F.broadcast(p1)).select(
        F.expr("replace(t, pair, chr(57344))").alias("t")
    )
    pairs2 = merged.filter(F.length("t") >= 2).select(pair_col)
    return (
        pairs2.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.expr("replace(pair, chr(57344), '<M>')").alias("pair"), "n"
        )
        .groupBy("pair")
        .agg(F.sum("n").cast("long").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


_SHAPLEY_ORACLE = """
    WITH per_user AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
               max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS hs,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id
    ),
    ex AS (
        SELECT hc, hv, hs, count(*) AS cnt
        FROM per_user WHERE conv = 1
        GROUP BY hc, hv, hs
    ),
    v AS (
        SELECT
          sum(CASE WHEN hc=0 AND hv=0 AND hs=0 THEN cnt ELSE 0 END) AS v0,
          sum(CASE WHEN        hv=0 AND hs=0 THEN cnt ELSE 0 END) AS v_c,
          sum(CASE WHEN hc=0        AND hs=0 THEN cnt ELSE 0 END) AS v_v,
          sum(CASE WHEN hc=0 AND hv=0        THEN cnt ELSE 0 END) AS v_s,
          sum(CASE WHEN               hs=0 THEN cnt ELSE 0 END) AS v_cv,
          sum(CASE WHEN        hv=0        THEN cnt ELSE 0 END) AS v_cs,
          sum(CASE WHEN hc=0               THEN cnt ELSE 0 END) AS v_vs,
          sum(cnt) AS v_cvs
        FROM ex
    ),
    phi AS (
        SELECT 'click' AS channel,
               2*(v_c - v0) + 1*(v_cv - v_v) + 1*(v_cs - v_s)
                   + 2*(v_cvs - v_vs) AS phi_x6, v0, v_cvs FROM v
        UNION ALL
        SELECT 'view',
               2*(v_v - v0) + 1*(v_cv - v_c) + 1*(v_vs - v_s)
                   + 2*(v_cvs - v_cs), v0, v_cvs FROM v
        UNION ALL
        SELECT 'signup',
               2*(v_s - v0) + 1*(v_cs - v_c) + 1*(v_vs - v_v)
                   + 2*(v_cvs - v_cv), v0, v_cvs FROM v
    )
    SELECT channel,
           CAST(phi_x6 AS BIGINT) AS shapley_x6,
           CAST(v0 AS BIGINT) AS v_empty,
           CAST(v_cvs AS BIGINT) AS v_full
    FROM phi
"""


@register(
    "x216_shapley_attribution",
    "Closed-form Shapley-value channel attribution over the 3-channel "
    "game (click/view/signup -> purchase): the characteristic "
    "function v(S) counts converting users whose exposure set fits "
    "inside S (cumulative-coverage semantics), and each channel's "
    "Shapley value phi = sum over S of |S|!(n-|S|-1)!/n! * marginal "
    "ships SIX-FOLD (n=3 -> weights 2/1/1/2 over integer marginals), "
    "so the fair-division attribution is EXACT int64 — no sampling, "
    "no floats; the efficiency axiom sum(phi_x6) = 6*(v_full - "
    "v_empty) is pinned by test. One per-user presence rollup, one "
    "8-cell exact-exposure group, one 1-row subset-cumulative "
    "projection — constant state after the user pass; the "
    "permutation-sampling estimators production systems use are "
    "approximations of exactly this quantity.",
    oracle=_SHAPLEY_ORACLE,
    tags=("ext", "attribution", "shapley", "exact-stats"),
)
def x216_shapley_attribution(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    flag = lambda t: F.max(  # noqa: E731
        F.when(F.col("event_type") == t, 1).otherwise(0)
    )
    per_user = ev.groupBy("user_id").agg(
        flag("click").alias("hc"),
        flag("view").alias("hv"),
        flag("signup").alias("hs"),
        flag("purchase").alias("conv"),
    )
    ex = (
        per_user.filter(F.col("conv") == 1)
        .groupBy("hc", "hv", "hs")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cov = lambda cond: F.sum(F.when(cond, F.col("cnt")).otherwise(0))  # noqa: E731
    c0, v0c = F.col("hc") == 0, F.col("hv") == 0
    s0 = F.col("hs") == 0
    v = ex.agg(
        cov(c0 & v0c & s0).alias("v0"),
        cov(v0c & s0).alias("v_c"),
        cov(c0 & s0).alias("v_v"),
        cov(c0 & v0c).alias("v_s"),
        cov(s0).alias("v_cv"),
        cov(v0c).alias("v_cs"),
        cov(c0).alias("v_vs"),
        F.sum("cnt").alias("v_cvs"),
    )
    rows = []
    specs = {
        "click": "2*(v_c - v0) + (v_cv - v_v) + (v_cs - v_s) + 2*(v_cvs - v_vs)",
        "view": "2*(v_v - v0) + (v_cv - v_c) + (v_vs - v_s) + 2*(v_cvs - v_cs)",
        "signup": "2*(v_s - v0) + (v_cs - v_c) + (v_vs - v_v) + 2*(v_cvs - v_cv)",
    }
    for ch, expr in specs.items():
        rows.append(
            v.select(
                F.lit(ch).alias("channel"),
                F.expr(expr).cast("long").alias("shapley_x6"),
                F.col("v0").cast("long").alias("v_empty"),
                F.col("v_cvs").cast("long").alias("v_full"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.union(r)
    return out


_UPLIFT_ORACLE = """
    WITH per_user AS (
        SELECT user_id,
               CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % 2 AS arm,
               sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                             AND value IS NOT NULL
                        THEN CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS pre_cents,
               max(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                             AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    n_tot AS (SELECT count(*) AS n FROM per_user),
    lv AS (
        SELECT pre_cents, count(*) AS cnt FROM per_user GROUP BY pre_cents
    ),
    cumv AS (
        SELECT a.pre_cents, coalesce(sum(b.cnt), 0) AS cnt_less
        FROM lv a LEFT JOIN lv b ON b.pre_cents < a.pre_cents
        GROUP BY a.pre_cents
    ),
    dec AS (
        SELECT p.user_id, p.arm, p.conv,
               c.cnt_less * 10 // n.n AS decile
        FROM per_user p JOIN cumv c USING (pre_cents) CROSS JOIN n_tot n
    ),
    cells AS (
        SELECT decile,
               sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_t,
               sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS conv_t,
               sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_c,
               sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS conv_c
        FROM dec GROUP BY decile
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_t AS BIGINT) AS n_t, CAST(conv_t AS BIGINT) AS conv_t,
           CAST(n_c AS BIGINT) AS n_c, CAST(conv_c AS BIGINT) AS conv_c,
           CAST(CASE WHEN n_t = 0 OR n_c = 0 THEN NULL
                     ELSE conv_t * 1000000 // n_t
                          - conv_c * 1000000 // n_c END AS BIGINT)
               AS uplift_ppm
    FROM cells
"""


@register(
    "x217_uplift_deciles",
    "Uplift-by-decile table (the Qini/uplift-curve input): users split "
    "into md5 arms, scored by PRE-period spend, post-period purchase "
    "conversion compared treatment-vs-control within each score decile "
    "— heterogeneous-treatment-effect targeting, the step beyond "
    "x161's single average effect. Deciles come from the DISTINCT-"
    "value cumulative (cnt_less*10 DIV n — ties share a decile, value-"
    "cardinality state, never a user-cardinality ntile window); "
    "uplift is the exact difference of truncating integer ppm rates, "
    "NULL where an arm is empty. Temporal wall (pre-score / post-"
    "outcome) keeps the score causal, x191's leakage discipline.",
    oracle=_UPLIFT_ORACLE,
    tags=("ext", "ab-test", "uplift", "targeting"),
)
def x217_uplift_deciles(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    wall = F.lit("2024-01-16 00:00:00").cast("timestamp_ntz")
    per_user = ev.groupBy("user_id").agg(
        (X.base_hash(F.col("user_id").cast("string")) % 2).alias("arm"),
        F.sum(
            F.when(
                (F.col("ts") < wall) & F.col("value").isNotNull(),
                F.floor(fin("value") * 100 + 0.5).cast("long"),
            ).otherwise(0)
        ).alias("pre_cents"),
        F.max(
            F.when(
                (F.col("ts") >= wall) & (F.col("event_type") == "purchase"),
                1,
            ).otherwise(0)
        ).alias("conv"),
    )
    n_tot = per_user.agg(F.count(F.lit(1)).alias("n"))
    lv = per_user.groupBy("pre_cents").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = lv.alias("a"), lv.alias("b")
    cumv = (
        a.join(b, F.col("b.pre_cents") < F.col("a.pre_cents"), "left")
        .groupBy(F.col("a.pre_cents").alias("pre_cents"))
        .agg(F.coalesce(F.sum("b.cnt"), F.lit(0)).alias("cnt_less"))
    )
    dec = (
        per_user.join(cumv, "pre_cents")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "arm", "conv", F.expr("cnt_less * 10 DIV n").alias("decile")
        )
    )
    cells = dec.groupBy("decile").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .alias("conv_t"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .alias("conv_c"),
    )
    return cells.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("n_t").cast("long").alias("n_t"),
        F.col("conv_t").cast("long").alias("conv_t"),
        F.col("n_c").cast("long").alias("n_c"),
        F.col("conv_c").cast("long").alias("conv_c"),
        F.expr(
            "CAST(CASE WHEN n_t = 0 OR n_c = 0 THEN NULL"
            " ELSE conv_t * 1000000 DIV n_t - conv_c * 1000000 DIV n_c"
            " END AS BIGINT)"
        ).alias("uplift_ppm"),
    )


_HAAR_ORACLE = """
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE)
                   - DATE '2024-01-01' AS di,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS c
        FROM events WHERE value IS NOT NULL
          AND ts < TIMESTAMP '2024-01-09 00:00:00'
        GROUP BY 1, 2
    ),
    g AS (
        SELECT event_type,
               sum(CASE WHEN di BETWEEN 0 AND 7 THEN c ELSE 0 END) AS a,
               sum(CASE WHEN di < 4 THEN c ELSE -c END) AS d1,
               sum(CASE WHEN di < 2 THEN c WHEN di < 4 THEN -c
                        ELSE 0 END) AS d2a,
               sum(CASE WHEN di BETWEEN 4 AND 5 THEN c
                        WHEN di BETWEEN 6 AND 7 THEN -c ELSE 0 END) AS d2b,
               sum(CASE WHEN di = 0 THEN c WHEN di = 1 THEN -c
                        ELSE 0 END) AS d3a,
               sum(CASE WHEN di = 2 THEN c WHEN di = 3 THEN -c
                        ELSE 0 END) AS d3b,
               sum(CASE WHEN di = 4 THEN c WHEN di = 5 THEN -c
                        ELSE 0 END) AS d3c,
               sum(CASE WHEN di = 6 THEN c WHEN di = 7 THEN -c
                        ELSE 0 END) AS d3d
        FROM daily GROUP BY event_type
    )
    SELECT event_type,
           CAST(a AS BIGINT) AS a,
           CAST(d1 AS BIGINT) AS d1,
           CAST(d2a AS BIGINT) AS d2a, CAST(d2b AS BIGINT) AS d2b,
           CAST(d3a AS BIGINT) AS d3a, CAST(d3b AS BIGINT) AS d3b,
           CAST(d3c AS BIGINT) AS d3c, CAST(d3d AS BIGINT) AS d3d
    FROM g
"""


@register(
    "w27_haar_pyramid",
    "Unnormalized Haar wavelet pyramid over each type's first 8 daily "
    "totals: the approximation sum plus 7 detail coefficients at 3 "
    "dyadic scales — multi-resolution decomposition (trend vs half-"
    "week vs day-pair vs daily structure) and the basis behind "
    "wavelet synopses/compressed time-series storage. Unnormalized "
    "coefficients are pure signed int64 sums, the transform is "
    "PERFECTLY INVERTIBLE in integers (c_i recovers by halving sums "
    "whose parity is even by construction — pinned by test), and the "
    "whole pyramid is ONE conditional-aggregation pass over the daily "
    "rollup — no window, no join, mergeable partials.",
    oracle=_HAAR_ORACLE,
    tags=("ext", "timeseries", "wavelet", "exact-stats"),
)
def w27_haar_pyramid(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(
        F.col("value").isNotNull()
        & (F.col("ts") < F.lit("2024-01-09 00:00:00").cast("timestamp_ntz"))
    )
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01")
        ).alias("di"),
    ).agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("c")
    )
    c, di = F.col("c"), F.col("di")
    sgn = lambda expr: F.sum(expr).cast("long")  # noqa: E731
    return daily.groupBy("event_type").agg(
        sgn(F.when(di.between(0, 7), c).otherwise(0)).alias("a"),
        sgn(F.when(di < 4, c).otherwise(-c)).alias("d1"),
        sgn(F.when(di < 2, c).when(di < 4, -c).otherwise(0)).alias("d2a"),
        sgn(
            F.when(di.between(4, 5), c)
            .when(di.between(6, 7), -c)
            .otherwise(0)
        ).alias("d2b"),
        sgn(F.when(di == 0, c).when(di == 1, -c).otherwise(0)).alias("d3a"),
        sgn(F.when(di == 2, c).when(di == 3, -c).otherwise(0)).alias("d3b"),
        sgn(F.when(di == 4, c).when(di == 5, -c).otherwise(0)).alias("d3c"),
        sgn(F.when(di == 6, c).when(di == 7, -c).otherwise(0)).alias("d3d"),
    )


_SKEW_ORACLE = """
    WITH b AS (
        SELECT CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8)
                    AS BIGINT) % 32 AS bucket,
               count(*) AS n_rows
        FROM lineitem GROUP BY 1
    ),
    t AS (SELECT sum(n_rows) AS total, max(n_rows) AS mx FROM b)
    SELECT CAST(b.bucket AS BIGINT) AS bucket,
           CAST(b.n_rows AS BIGINT) AS n_rows,
           CAST(b.n_rows * 32 * 1000000 // t.total AS BIGINT)
               AS load_ppm_of_ideal,
           CAST(t.mx * 32 * 1000000 // t.total AS BIGINT)
               AS max_load_ppm_of_ideal
    FROM b CROSS JOIN t
"""


@register(
    "k7_shuffle_skew_report",
    "Shuffle-partition skew report for the l_orderkey exchange: rows "
    "per hash bucket (portable md5 bucketing standing in for the "
    "engine's murmur3 — same skew geometry) with each bucket's load "
    "as exact-ppm of the ideal total/32 and the max-bucket headline "
    "beside it — the straggler predictor read BEFORE sizing "
    "spark.sql.shuffle.partitions or reaching for k1/k3's salting. A "
    "load of 1e6 is perfectly balanced; the hot-key pathologies the "
    "k-family repairs show up here as multi-million ppm buckets. One "
    "groupBy on the bucket key + a 1-row broadcast of totals.",
    oracle=_SKEW_ORACLE,
    tags=("ext", "ops", "skew", "planning"),
)
def k7_shuffle_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    b = li.groupBy(
        (X.base_hash(F.col("l_orderkey").cast("string")) % 32).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    t = b.agg(F.sum("n_rows").alias("total"), F.max("n_rows").alias("mx"))
    return b.crossJoin(F.broadcast(t)).select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.expr("n_rows * 32 * 1000000 DIV total").cast("long")
        .alias("load_ppm_of_ideal"),
        F.expr("mx * 32 * 1000000 DIV total").cast("long")
        .alias("max_load_ppm_of_ideal"),
    )


_AUDIO_RESAMPLE_ORACLE = """
    WITH d AS (
        SELECT doc_id,
               1 + doc_id % 2 AS channels,
               8000 * (1 + doc_id % 4) AS rate,
               1000 + doc_id % 9000 AS data_size
        FROM documents
    )
    SELECT doc_id AS asset_id,
           CAST(channels AS INTEGER) AS channels,
           CAST(rate AS INTEGER) AS sample_rate,
           CAST(data_size // (channels * 2) AS BIGINT) AS n_frames,
           CAST((data_size // (channels * 2)) * 16000 // rate AS BIGINT)
               AS out_frames_16k,
           CAST(16000 AS BIGINT) AS ratio_num,
           CAST(rate AS BIGINT) AS ratio_den,
           rate = 16000 AS is_noop
    FROM d
"""


@register(
    "x218_audio_resample_plan",
    "Audio resample plan to 16 kHz — the decode-free front half of a "
    "speech-model ingest job, completing x170/x171's vision pair: "
    "every document becomes a deterministic PCM WAV container "
    "(byte-for-byte in SQL, the x81 constructor), the REAL byte "
    "parser (ext/multimodal.parse_wav_meta over Arrow mapInPandas) "
    "recovers channels/rate/frame geometry from the RIFF header, and "
    "the plan emits exact frame math: n_frames = data_bytes / "
    "block_align, out_frames = n_frames*16000 DIV rate, the rational "
    "conversion ratio, and the no-op flag — all integers under the "
    "hash (the resampler itself needs DSP libs; the Spark-side "
    "plumbing, batch shape, and arithmetic are the verifiable part). "
    "Pure projection + map pass, zero shuffle at any corpus size.",
    oracle=_AUDIO_RESAMPLE_ORACLE,
    tags=("ext", "multimodal", "audio", "mapInPandas"),
)
def x218_audio_resample_plan(spark: SparkSession, sf: str) -> DataFrame:
    d = F.col("doc_id")
    ch = F.lit(1) + d % 2
    rate = F.lit(8000) * (F.lit(1) + d % 4)
    byte_rate = rate * ch * 2
    data_size = F.lit(1000) + d % 9000
    wav = F.concat(
        F.lit("52494646"), _le32(F.lit(36) + data_size),
        F.lit("57415645"),
        F.lit("666D7420"), F.lit("10000000"),
        F.lit("0100"),
        _le16(ch), _le32(rate), _le32(byte_rate),
        _le16(ch * 2), _le16(F.lit(16)),
        F.lit("64617461"), _le32(data_size),
    )
    assets = load_table(spark, sf, "documents").select(
        d.alias("asset_id"),
        F.lit("audio").alias("media_type"),
        F.unhex(wav).alias("content"),
    )
    meta = MM.probe_media_metadata(assets).select(
        "asset_id", "channels", "sample_rate"
    )
    # the declared payload size lives in the LE32 'data' chunk length at
    # byte offset 41-44 of the header-only container: byte-swap the hex
    le = F.hex(F.substring(F.col("content"), 41, 4))
    data_size = F.conv(
        F.concat(
            F.substring(le, 7, 2), F.substring(le, 5, 2),
            F.substring(le, 3, 2), F.substring(le, 1, 2),
        ),
        16, 10,
    ).cast("long")
    sizes = assets.select("asset_id", data_size.alias("data_size"))
    n_frames = F.expr("data_size DIV (channels * 2)").cast("long")
    return meta.join(sizes, "asset_id").select(
        "asset_id",
        "channels",
        "sample_rate",
        n_frames.alias("n_frames"),
        F.expr(
            "(data_size DIV (channels * 2)) * 16000 DIV sample_rate"
        ).cast("long").alias("out_frames_16k"),
        F.lit(16000).cast("long").alias("ratio_num"),
        F.col("sample_rate").cast("long").alias("ratio_den"),
        (F.col("sample_rate") == 16000).alias("is_noop"),
    )


_STL_ORACLE = """
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE)
                   - DATE '2024-01-01' AS di,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS c
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    trend AS (
        SELECT a.event_type, a.di, a.c,
               sum(b.c) AS trend_x7, count(*) AS n_win
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type
         AND b.di BETWEEN a.di - 3 AND a.di + 3
        GROUP BY a.event_type, a.di, a.c
        HAVING count(*) = 7
    ),
    detr AS (
        SELECT event_type, di, c, trend_x7,
               7 * c - trend_x7 AS detrended_x7,
               di % 7 AS dow
        FROM trend
    ),
    seas AS (
        SELECT event_type, dow,
               sum(detrended_x7) AS s_num, count(*) AS s_den
        FROM detr GROUP BY event_type, dow
    )
    SELECT d.event_type, CAST(d.di AS BIGINT) AS di,
           CAST(d.c AS BIGINT) AS cents,
           CAST(d.trend_x7 AS BIGINT) AS trend_x7,
           CAST(d.detrended_x7 AS BIGINT) AS detrended_x7,
           CAST(s.s_num AS BIGINT) AS seasonal_num_x7,
           CAST(s.s_den AS BIGINT) AS seasonal_den,
           CAST(d.detrended_x7 * s.s_den - s.s_num AS BIGINT)
               AS remainder_x7den
    FROM detr d JOIN seas s
      ON d.event_type = s.event_type AND d.dow = s.dow
"""


@register(
    "w28_stl_lite_decomposition",
    "Additive trend/seasonal/remainder decomposition (STL-lite, one "
    "pass of the classical method): trend = centered 7-day moving "
    "total (kept x7 — never divided), detrended = 7*value - trend "
    "(exact), weekly seasonal = day-of-week mean of the detrended "
    "series kept as a num/den pair, remainder cleared to the common "
    "denominator — the WHOLE decomposition is int64, so every "
    "component hashes (the classical decompose() loses exactness to "
    "float division at each step; clearing denominators keeps the "
    "identity value = trend/7 + seasonal/(7*den) + remainder/(7*den) "
    "checkable to the last unit, pinned by test). Window pairing is "
    "the epoch-day range equi-join (gaps shrink the window and "
    "interior-only HAVING n=7 drops the edges, as classical MA "
    "does); all stages partition by type.",
    oracle=_STL_ORACLE,
    tags=("ext", "timeseries", "decomposition", "exact-stats"),
)
def w28_stl_lite_decomposition(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01")
        ).alias("di"),
    ).agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("c")
    )
    a, b = daily.alias("a"), daily.alias("b")
    trend = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & F.col("b.di").between(F.col("a.di") - 3, F.col("a.di") + 3),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.di").alias("di"),
            F.col("a.c").alias("c"),
        )
        .agg(F.sum("b.c").alias("trend_x7"), F.count(F.lit(1)).alias("n_win"))
        .filter(F.col("n_win") == 7)
    )
    detr = trend.select(
        "event_type",
        "di",
        "c",
        "trend_x7",
        (7 * F.col("c") - F.col("trend_x7")).alias("detrended_x7"),
        (F.col("di") % 7).alias("dow"),
    )
    seas = detr.groupBy("event_type", "dow").agg(
        F.sum("detrended_x7").alias("s_num"),
        F.count(F.lit(1)).alias("s_den"),
    )
    return detr.join(seas, ["event_type", "dow"]).select(
        "event_type",
        F.col("di").cast("long").alias("di"),
        F.col("c").cast("long").alias("cents"),
        F.col("trend_x7").cast("long").alias("trend_x7"),
        F.col("detrended_x7").cast("long").alias("detrended_x7"),
        F.col("s_num").cast("long").alias("seasonal_num_x7"),
        F.col("s_den").cast("long").alias("seasonal_den"),
        (F.col("detrended_x7") * F.col("s_den") - F.col("s_num"))
        .cast("long")
        .alias("remainder_x7den"),
    )


_INT8_QUANT_ORACLE = """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
        WHERE (list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)), 'max') < 1e9)
    ),
    mm AS (
        SELECT vec_id, v,
               list_reduce(v, (x, y) -> CASE WHEN y < x THEN y ELSE x END)
                   AS lo,
               list_reduce(v, (x, y) -> CASE WHEN y > x THEN y ELSE x END)
                   AS hi
        FROM e
    ),
    q AS (
        SELECT vec_id, v, lo, hi,
               list_transform(v, x -> CASE WHEN hi = lo THEN 0
                   ELSE CAST(floor((x - lo) * 255e0 / (hi - lo) + 0.5e0)
                        AS BIGINT) END) AS codes
        FROM mm
    )
    SELECT vec_id, lo, hi,
           len(codes) AS dim,
           list_reduce(list_transform(range(1, len(codes) + 1),
               i -> abs(v[i] - (CASE WHEN hi = lo THEN lo
                    ELSE lo + codes[i] * (hi - lo) / 255e0 END))),
               (x, y) -> CASE WHEN y > x THEN y ELSE x END)
               AS max_abs_err,
           CAST(list_reduce(codes, (x, y) -> x + y) AS BIGINT)
               AS code_checksum
    FROM q
"""


@register(
    "x219_int8_quantization_error",
    "Per-vector affine int8 quantization with its reconstruction-"
    "error audit — the serving-time compression step between full "
    "floats and x186's 1-bit extreme: scale range [min, max] onto "
    "0..255 with the portable floor(x*255/range + 0.5) rounding "
    "(round-half-even vs half-away engine differences never enter), "
    "dequantize, and report the max absolute error plus an integer "
    "code checksum. Min/max/error folds are list_reduce/aggregate in "
    "INDEX ORDER — deterministic float arithmetic both engines "
    "replay, no unordered float sum anywhere. Pure projection over "
    "the embedding column; the error table is what decides whether "
    "int8 is safe for a given recall target before a 100 TB corpus "
    "re-encode.",
    oracle=_INT8_QUANT_ORACLE,
    tags=("ext", "similarity", "quantization", "serving"),
)
def x219_int8_quantization_error(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").filter(finite_vec("embedding"))
    v = F.col("embedding").cast("array<double>")
    e = emb.select("vec_id", v.alias("v"))
    fold_min = F.aggregate(
        F.col("v"),
        F.element_at(F.col("v"), 1),
        lambda x, y: F.when(y < x, y).otherwise(x),
    )
    fold_max = F.aggregate(
        F.col("v"),
        F.element_at(F.col("v"), 1),
        lambda x, y: F.when(y > x, y).otherwise(x),
    )
    mm = e.select("vec_id", "v", fold_min.alias("lo"), fold_max.alias("hi"))
    codes = F.transform(
        F.col("v"),
        lambda x: F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                (x - F.col("lo")) * F.lit(255.0)
                / (F.col("hi") - F.col("lo"))
                + F.lit(0.5)
            ).cast("long")
        ),
    )
    q = mm.select("vec_id", "v", "lo", "hi", codes.alias("codes"))
    recon = lambda i: F.when(  # noqa: E731
        F.col("hi") == F.col("lo"), F.col("lo")
    ).otherwise(
        F.col("lo")
        + F.element_at(F.col("codes"), i)
        * (F.col("hi") - F.col("lo"))
        / F.lit(255.0)
    )
    err_fold = F.aggregate(
        F.sequence(F.lit(1), F.size("codes")),
        F.lit(0.0),
        lambda acc, i: F.when(
            F.abs(F.element_at(F.col("v"), i) - recon(i)) > acc,
            F.abs(F.element_at(F.col("v"), i) - recon(i)),
        ).otherwise(acc),
    )
    return q.select(
        "vec_id",
        "lo",
        "hi",
        F.size("codes").cast("long").alias("dim"),
        err_fold.alias("max_abs_err"),
        F.aggregate(
            F.col("codes"), F.lit(0).cast("long"), lambda x, y: x + y
        ).alias("code_checksum"),
    )


_HARD_NEG_ORACLE = f"""
    WITH hashed AS (
        SELECT doc_id,
               list_transform({{shingles}}, s -> {{sqlh}}) AS hs
        FROM documents
    ),
    sig AS (
        SELECT doc_id, {{mh_cols}}
        FROM hashed
    ),
    bands AS (
{{band_selects}}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
                    AND a.doc_id < b.doc_id
    ),
    e AS (
        SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    scored AS (
        SELECT c.doc_a, c.doc_b, {{cosine}} AS cos_sim
        FROM cand c
        JOIN e x ON x.doc_id = c.doc_a
        JOIN e y ON y.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, cos_sim
    FROM scored WHERE cos_sim < 0.2e0
"""

_HARD_NEG_ORACLE_SQL = _HARD_NEG_ORACLE.format(
    shingles=sql_shingles("text"),
    sqlh=SQL_H.format(s="s"),
    mh_cols=_MH_COLS,
    band_selects=_BAND_SELECTS,
    cosine=sql_cosine("x.v", "y.v"),
)


@register(
    "x220_hard_negative_mining",
    "Contrastive hard-negative mining — the embedding-training data "
    "op: pairs that LOOK alike lexically (share a MinHash-LSH bucket, "
    "x8's banding) but are semantically FAR (cosine < 0.2 over the "
    "aligned embedding, vec_id ≡ doc_id) are exactly the negatives "
    "that teach a retriever the lexical/semantic distinction (random "
    "negatives are too easy; these sit on the decision boundary). "
    "Composition: the bucketed candidate join generates, the exact "
    "cosine (index-ordered fold, x10's arithmetic) filters — no "
    "all-pairs stage anywhere, so the 100 TB cost is the LSH shuffle "
    "plus per-bucket verification, identical to the dedup path it "
    "shares machinery with.",
    oracle=_HARD_NEG_ORACLE_SQL,
    tags=("ext", "similarity", "training-data", "contrastive"),
)
def x220_hard_negative_mining(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    cand = X.lsh_candidate_pairs(docs).select("doc_a", "doc_b")
    # per-doc norm computed once in e and reused by BOTH join sides
    # (r11, same bit-identical rework as similarity.brute_force_topk)
    e = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("v"),
        S.norm(F.col("embedding").cast("array<double>")).alias("nv"),
    )
    scored = (
        cand.join(e.select(F.col("doc_id").alias("doc_a"),
                           F.col("v").alias("va"),
                           F.col("nv").alias("na")), "doc_a")
        .join(e.select(F.col("doc_id").alias("doc_b"),
                       F.col("v").alias("vb"),
                       F.col("nv").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                S.dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb"))
            ).alias("cos_sim"),
        )
    )
    return scored.filter(F.col("cos_sim") < 0.2)


_DELTA_RATIO_ORACLE = """
    WITH per_user AS (
        SELECT user_id,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS cents,
               count(*) AS n_ev
        FROM events WHERE value IS NOT NULL
        GROUP BY user_id
    ),
    mo AS (
        SELECT count(*) AS n,
               sum(cents) AS sx, sum(n_ev) AS sy,
               sum(cents * cents) AS sxx,
               sum(n_ev * n_ev) AS syy,
               sum(cents * n_ev) AS sxy
        FROM per_user
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(sx AS BIGINT) AS sum_cents,
           CAST(sy AS BIGINT) AS sum_events,
           CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS ratio,
           sqrt(greatest(0e0,
               (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               - 2e0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                     * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
               / (CAST(sy AS DOUBLE)
                  * sqrt(greatest(0e0, CAST(n AS DOUBLE) - 1e0)))
               AS ratio_se
    FROM mo
"""
# ^ greatest(0, n-1) inside the denominator sqrt: on an EMPTY corpus
# n = 0 and DuckDB RAISES on sqrt(-1) where Spark's IEEE sqrt yields
# NaN folded away by the NULL sums (empty-input parity, round 10);
# for every n >= 1 the guard is the identity.


@register(
    "a30_delta_method_ratio_se",
    "Delta-method standard error for a RATIO metric (cents per event, "
    "the revenue-per-session family): user-level ratio metrics are "
    "NOT averages of independent rows — the correct variance is "
    "var(X) - 2R*cov(X,Y) + R^2*var(Y) over the per-user (numerator, "
    "denominator) pairs, the linearization every experimentation "
    "platform applies before a ratio-metric z-test (naive per-row SEs "
    "are anti-conservative). All six moments are exact int64 from "
    "one per-user rollup; the ratio and the SE close in ONE fixed "
    "IEEE shape per dialect (sums-of-squares cleared by n, the a20/"
    "a22 discipline).",
    oracle=_DELTA_RATIO_ORACLE,
    tags=("ext", "ab-test", "delta-method", "exact-stats"),
)
def a30_delta_method_ratio_se(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("cents"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    mo = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sx"),
        F.sum("n_ev").alias("sy"),
        F.sum(F.col("cents") * F.col("cents")).alias("sxx"),
        F.sum(F.col("n_ev") * F.col("n_ev")).alias("syy"),
        F.sum(F.col("cents") * F.col("n_ev")).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    r = d("sx") / d("sy")
    var_term = (
        (d("n") * d("sxx") - d("sx") * d("sx"))
        - F.lit(2.0) * r * (d("n") * d("sxy") - d("sx") * d("sy"))
        + r * r * (d("n") * d("syy") - d("sy") * d("sy"))
    )
    # sqrt(var_term) = n * sigma_pop of (x - R*y); the sample-variance
    # correction folds into the single closing shape: SE = that / (sy*sqrt(n-1))
    se = F.sqrt(F.greatest(F.lit(0.0), var_term)) / (
        d("sy") * F.sqrt(d("n") - F.lit(1.0))
    )
    return mo.select(
        F.col("n").cast("long").alias("n"),
        F.col("sx").cast("long").alias("sum_cents"),
        F.col("sy").cast("long").alias("sum_events"),
        r.alias("ratio"),
        se.alias("ratio_se"),
    )


_CANARIES = (
    "c4n4ry-7f3a9b2e-guid-alpha",
    "c4n4ry-d18c5e07-guid-beta",
    "c4n4ry-92ab44f6-guid-gamma",
)
_CANARY_ORACLE = "\nUNION ALL\n".join(
    f"""    SELECT '{c}' AS canary,
           CAST(sum(CASE WHEN contains(text, '{c}') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs,
           CAST(coalesce(sum(CASE WHEN contains(text, '{c}')
                THEN length(text) END), 0) AS BIGINT) AS total_chars
    FROM documents WHERE text IS NOT NULL"""
    for c in _CANARIES
)


@register(
    "x221_canary_scan",
    "Eval-integrity canary scan: every training shard is checked for "
    "the published do-not-train canary GUIDs (the BIG-bench-style "
    "marker that benchmark owners embed so contaminated corpora can "
    "be detected IN the model later) — one literal contains() per "
    "canary, fused into a single scan pass by the union's shared "
    "source, each canary always emitting its ledger row (zero counts "
    "prove the scan RAN — absence of evidence, made evidence). "
    "Substring match, not tokenized: canaries are designed to survive "
    "formatting. The cheapest possible full-corpus assertion at "
    "100 TB, same posture as x212's expectation checks; the exact-"
    "match complement of x17/x25's n-gram decontamination.",
    oracle=_CANARY_ORACLE,
    tags=("ext", "decontamination", "canary", "eval-integrity"),
)
def x221_canary_scan(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    parts = []
    for c in _CANARIES:
        hit = F.col("text").contains(c)
        parts.append(
            docs.agg(
                F.lit(c).alias("canary"),
                F.sum(F.when(hit, 1).otherwise(0)).cast("long")
                .alias("n_docs"),
                F.coalesce(
                    F.sum(F.when(hit, F.length("text"))), F.lit(0)
                ).cast("long").alias("total_chars"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


_DROPOUT_ORACLE = """
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> t <> '') AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    kept AS (
        SELECT doc_id,
               list_filter(
                   list_transform(range(1, len(ws) + 1),
                                  i -> {'i': i, 't': ws[i]}),
                   s -> CAST('0x' || substr(md5(
                            CAST(doc_id AS VARCHAR) || ':' ||
                            CAST(s.i AS VARCHAR) || ':' || s.t), 1, 8)
                        AS BIGINT) % 10 <> 0) AS keep,
               len(ws) AS n_orig
        FROM w
    )
    SELECT doc_id,
           CAST(n_orig AS BIGINT) AS n_orig,
           CAST(len(keep) AS BIGINT) AS n_kept,
           md5(array_to_string(list_transform(keep, s -> s.t), ' '))
               AS aug_fp
    FROM kept
"""


@register(
    "x223_token_dropout_augment",
    "Deterministic data augmentation (EDA-style token dropout): each "
    "token drops iff md5(doc:position:token) lands in a 10% hash "
    "band, so the augmented corpus is REPRODUCIBLE across runs, "
    "engines, and partitionings — seeded-RNG augmentation pipelines "
    "can't replay across frameworks; hash-gated ones can (the x16 "
    "acceptance-sampling discipline applied inside the document). "
    "Emits original/kept token counts and the md5 fingerprint of the "
    "augmented text, so the exact augmented content is under the "
    "hash without shipping it twice. Pure projection — index-"
    "transform, filter, fold; zero shuffle at any corpus size.",
    oracle=_DROPOUT_ORACLE,
    tags=("ext", "augmentation", "training-data", "deterministic"),
)
def x223_token_dropout_augment(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    w = docs.select(
        "doc_id", F.filter(TX.words("text"), lambda t: t != "").alias("ws")
    )
    structs = F.transform(
        F.sequence(F.lit(1), F.size("ws")),
        lambda i: F.struct(
            i.alias("i"), F.element_at(F.col("ws"), i).alias("t")
        ),
    )
    gate = lambda s: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit(":"),
                        s["i"].cast("string"), F.lit(":"), s["t"],
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("bigint") % 10 != 0
    )
    kept = w.select(
        "doc_id",
        F.filter(structs, gate).alias("keep"),
        F.size("ws").alias("n_orig"),
    )
    return kept.select(
        "doc_id",
        F.col("n_orig").cast("long").alias("n_orig"),
        F.size("keep").cast("long").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(F.col("keep"), lambda s: s["t"]), " "
            )
        ).alias("aug_fp"),
    )


_IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
_PII_CENSUS_ORACLE = f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_extract_all(text, '{_EMAIL_RE}')))
                AS BIGINT) AS n_email_spans,
           CAST(sum(len(regexp_extract_all(text, '{_IPV4_RE}')))
                AS BIGINT) AS n_ipv4_spans,
           CAST(sum(len(regexp_extract_all(text, '{_PHONE_RE}')))
                AS BIGINT) AS n_phone_spans,
           CAST(sum(CASE WHEN regexp_matches(text, '{_EMAIL_RE}')
                           OR regexp_matches(text, '{_IPV4_RE}')
                           OR regexp_matches(text, '{_PHONE_RE}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_flagged
    FROM documents WHERE text IS NOT NULL
    GROUP BY source
"""


@register(
    "x222_pii_census",
    "Per-source PII census: email, IPv4-shaped, and phone-shaped span "
    "counts plus the any-hit document count, grouped by source — the "
    "compliance dashboard that decides which sources need x22-style "
    "redaction (span-level) or x192-style checksum validation "
    "(precision) before release. All three regexes live in the Java-"
    "regex ∩ RE2 common dialect (the x22 discipline) so spans agree "
    "cross-engine; one projection + one source-keyed groupBy, counts "
    "partial-aggregate map-side — full-corpus compliance at scan "
    "cost.",
    oracle=_PII_CENSUS_ORACLE,
    tags=("ext", "pii", "compliance", "census"),
)
def x222_pii_census(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    n_email = F.regexp_count("text", F.lit(_EMAIL_RE))
    n_ip = F.regexp_count("text", F.lit(_IPV4_RE))
    n_phone = F.regexp_count("text", F.lit(_PHONE_RE))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(n_email).cast("long").alias("n_email_spans"),
        F.sum(n_ip).cast("long").alias("n_ipv4_spans"),
        F.sum(n_phone).cast("long").alias("n_phone_spans"),
        F.sum(
            F.when((n_email > 0) | (n_ip > 0) | (n_phone > 0), 1).otherwise(0)
        ).cast("long").alias("n_docs_flagged"),
    )


_DBSCAN_EPS = 0.1
_DBSCAN_MINPTS = 3
_DENSITY_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE embedding IS NOT NULL
    ),
    b AS (
        SELECT vec_id, v, {{bucket}} AS bucket FROM c
    ),
    nb AS (
        SELECT x.vec_id AS src, y.vec_id AS dst
        FROM b x JOIN b y
          ON x.bucket = y.bucket AND x.vec_id <> y.vec_id
        WHERE {{cosine}} >= {_DBSCAN_EPS}e0
    ),
    deg AS (SELECT src, count(*) AS n_nb FROM nb GROUP BY src),
    core AS (SELECT src FROM deg WHERE n_nb >= {_DBSCAN_MINPTS}),
    border AS (
        SELECT DISTINCT nb.src
        FROM nb JOIN core ON nb.dst = core.src
        WHERE nb.src NOT IN (SELECT src FROM core)
    )
    SELECT c.vec_id,
           CAST(coalesce(d.n_nb, 0) AS BIGINT) AS n_neighbors,
           CASE WHEN co.src IS NOT NULL THEN 'core'
                WHEN bo.src IS NOT NULL THEN 'border'
                ELSE 'noise' END AS density_class
    FROM c
    LEFT JOIN deg d ON c.vec_id = d.src
    LEFT JOIN core co ON c.vec_id = co.src
    LEFT JOIN border bo ON c.vec_id = bo.src
"""


@register(
    "x224_density_core_points",
    "DBSCAN's density-classification step over embeddings: neighbors "
    "= same sign-bit LSH bucket AND cosine >= 0.1; points with >= 3 "
    "neighbors are CORE, non-core points touching a core are BORDER, "
    "the rest NOISE — the density triage that separates clusterable "
    "mass from outliers before any cluster expansion (x18/x32's "
    "components then connect the cores; k-means x83 can't mark noise "
    "at all). Bucket-keyed self-join (x60's every-row-is-a-probe "
    "shape), one degree count, one core semi-join — no all-pairs "
    "stage; the bucket bound makes the neighborhood predicate "
    "feasible at 100 TB exactly as in the dedup tier.",
    oracle=_DENSITY_ORACLE.format(
        bucket=_sql_lsh_bucket("v"), cosine=sql_cosine("x.v", "y.v")
    ),
    tags=("ext", "clustering", "density", "dbscan"),
)
def x224_density_core_points(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    planes = S.hyperplanes(8, 64)
    keyed = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v"),
        S.norm(F.col("embedding")).alias("nv"),
        # one parsed SQL expression (r12 — the py4j-literal fix)
        S.signature_bits_sql("`embedding`", planes).alias("bucket"),
    ).persist()
    x, y = keyed.alias("x"), keyed.alias("y")
    nb = (
        x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") != F.col("y.id")),
        )
        # per-row norms hoisted above the bucket self-join (r11, same
        # bit-identical rework as similarity.brute_force_topk)
        .filter(
            S.dot(F.col("x.v"), F.col("y.v"))
            / (F.col("x.nv") * F.col("y.nv"))
            >= _DBSCAN_EPS
        )
        .select(F.col("x.id").alias("src"), F.col("y.id").alias("dst"))
    ).persist()
    deg = nb.groupBy("src").agg(F.count(F.lit(1)).alias("n_nb"))
    core = deg.filter(F.col("n_nb") >= _DBSCAN_MINPTS).select("src")
    border = (
        nb.join(core.select(F.col("src").alias("dst")), "dst", "semi")
        .select("src")
        .join(core, "src", "anti")
        .distinct()
    )
    base = keyed.select(F.col("id").alias("vec_id"))
    return (
        base.join(deg, base["vec_id"] == deg["src"], "left")
        .drop("src")
        .join(
            core.select(F.col("src").alias("vec_id"), F.lit(1).alias("is_core")),
            "vec_id",
            "left",
        )
        .join(
            border.select(
                F.col("src").alias("vec_id"), F.lit(1).alias("is_border")
            ),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.coalesce("n_nb", F.lit(0)).cast("long").alias("n_neighbors"),
            F.when(F.col("is_core") == 1, "core")
            .when(F.col("is_border") == 1, "border")
            .otherwise("noise")
            .alias("density_class"),
        )
    )


_ITEM_COSINE_ORACLE = """
    WITH bask AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    freq AS (
        SELECT l_partkey, count(*) AS n FROM bask GROUP BY l_partkey
    ),
    co AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_ab
        FROM bask a JOIN bask b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 3
    )
    SELECT co.part_a, co.part_b,
           CAST(co.n_ab AS BIGINT) AS n_ab,
           CAST(fa.n AS BIGINT) AS n_a,
           CAST(fb.n AS BIGINT) AS n_b,
           CAST(co.n_ab AS DOUBLE)
               / (sqrt(CAST(fa.n AS DOUBLE)) * sqrt(CAST(fb.n AS DOUBLE)))
               AS cosine
    FROM co
    JOIN freq fa ON co.part_a = fa.l_partkey
    JOIN freq fb ON co.part_b = fb.l_partkey
"""


@register(
    "x225_item_item_cosine",
    "Item-item collaborative similarity over order baskets: cosine on "
    "binary co-purchase vectors, n_ab/sqrt(n_a*n_b) — the classic "
    "neighborhood recommender (Amazon's item-to-item CF), and a "
    "different statistic from x120's lift (cosine rewards absolute "
    "co-occurrence mass; lift rewards surprise). Co-counts ride a "
    "basket self-join keyed on the order (fanout bounded by basket "
    "size ~7, never all item pairs), min-support 3 prunes the noise "
    "tail, frequencies broadcast back in int64; the cosine closes in "
    "a fixed sqrt shape. At 100 TB this is the exact plan item-CF "
    "batch jobs run: one basket shuffle + one pair aggregation.",
    oracle=_ITEM_COSINE_ORACLE,
    tags=("ext", "recommender", "cf", "cosine"),
)
def x225_item_item_cosine(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    bask = li.select("l_orderkey", "l_partkey").distinct().persist()
    freq = bask.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a, b = bask.alias("a"), bask.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    return (
        co.join(freq.select(F.col("l_partkey").alias("part_a"),
                            F.col("n").alias("n_a")), "part_a")
        .join(freq.select(F.col("l_partkey").alias("part_b"),
                          F.col("n").alias("n_b")), "part_b")
        .select(
            "part_a",
            "part_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (
                F.col("n_ab").cast("double")
                / (
                    F.sqrt(F.col("n_a").cast("double"))
                    * F.sqrt(F.col("n_b").cast("double"))
                )
            ).alias("cosine"),
        )
    )


_LF_CENSUS_ORACLE = """
    WITH lf AS (
        SELECT doc_id,
               CASE WHEN len(list_filter(
                        string_split_regex(lower(text), '\\s+'),
                        t -> t IN ('the', 'and', 'is', 'of', 'to', 'in',
                                   'that', 'it'))) >= 2
                    THEN 1 ELSE 0 END AS lf_stopword,
               CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS lf_length,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lf_metadata
        FROM documents WHERE text IS NOT NULL
    ),
    vote AS (
        SELECT doc_id, lf_stopword, lf_length, lf_metadata,
               lf_stopword + lf_length + lf_metadata AS n_pos
        FROM lf
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(lf_stopword) AS BIGINT) AS lf_stopword_pos,
           CAST(sum(lf_length) AS BIGINT) AS lf_length_pos,
           CAST(sum(lf_metadata) AS BIGINT) AS lf_metadata_pos,
           CAST(sum(CASE WHEN n_pos >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS majority_pos,
           CAST(sum(CASE WHEN n_pos IN (1, 2) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_conflicts,
           CAST(sum(CASE WHEN lf_stopword = lf_metadata THEN 1 ELSE 0 END)
                AS BIGINT) AS agree_stopword_metadata,
           CAST(sum(CASE WHEN lf_stopword = lf_length THEN 1 ELSE 0 END)
                AS BIGINT) AS agree_stopword_length,
           CAST(sum(CASE WHEN lf_length = lf_metadata THEN 1 ELSE 0 END)
                AS BIGINT) AS agree_length_metadata
    FROM vote
"""


@register(
    "x226_labeling_function_census",
    "Weak-supervision (Snorkel-style data programming) census: three "
    "labeling functions — stopword evidence, length, metadata lang — "
    "vote per document; the census reports each LF's fire rate, the "
    "majority-vote positive count, the conflict count (non-unanimous "
    "documents — the supervision signal a label model feeds on), and "
    "all pairwise agreement counts (the overlap matrix that exposes "
    "correlated LFs double-counting evidence). One projection + one "
    "global conditional aggregation; every cell is an exact integer. "
    "This is the diagnostic read BEFORE training any label model over "
    "a 100 TB weakly-labeled corpus.",
    oracle=_LF_CENSUS_ORACLE,
    tags=("ext", "weak-supervision", "labeling", "census"),
)
def x226_labeling_function_census(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    lf_stop = F.when(
        TX.stopword_hits(TX.words("text"), _EN_SW) >= 2, 1
    ).otherwise(0)
    lf_len = F.when(F.col("n_chars") >= 300, 1).otherwise(0)
    lf_meta = F.when(F.col("lang") == "en", 1).otherwise(0)
    lf = docs.select(
        lf_stop.alias("lf_stopword"),
        lf_len.alias("lf_length"),
        lf_meta.alias("lf_metadata"),
    ).withColumn(
        "n_pos", F.col("lf_stopword") + F.col("lf_length") + F.col("lf_metadata")
    )
    agree = lambda a, b: F.sum(  # noqa: E731
        F.when(F.col(a) == F.col(b), 1).otherwise(0)
    )
    return lf.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("lf_stopword").cast("long").alias("lf_stopword_pos"),
        F.sum("lf_length").cast("long").alias("lf_length_pos"),
        F.sum("lf_metadata").cast("long").alias("lf_metadata_pos"),
        F.sum(F.when(F.col("n_pos") >= 2, 1).otherwise(0)).cast("long")
        .alias("majority_pos"),
        F.sum(F.when(F.col("n_pos").isin(1, 2), 1).otherwise(0)).cast("long")
        .alias("n_conflicts"),
        agree("lf_stopword", "lf_metadata").cast("long")
        .alias("agree_stopword_metadata"),
        agree("lf_stopword", "lf_length").cast("long")
        .alias("agree_stopword_length"),
        agree("lf_length", "lf_metadata").cast("long")
        .alias("agree_length_metadata"),
    )


_MARGIN_ORACLE = f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
        WHERE (list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)), 'max') < 1e9)
    ),{{rounds}},
    scored AS (
        SELECT e.vec_id, c.cell,
               {_dot('c.c', 'c.c')} - 2.0 * {_dot('e.v', 'c.c')} AS dist
        FROM e CROSS JOIN m_cent c
    ),
    ranked AS (
        SELECT vec_id, cell, dist,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cell) AS rn
        FROM scored
    ),
    marg AS (
        SELECT vec_id,
               max(CASE WHEN rn = 1 THEN cell END) AS cell,
               max(CASE WHEN rn = 2 THEN dist END)
                   - max(CASE WHEN rn = 1 THEN dist END) AS margin
        FROM ranked GROUP BY vec_id
    )
    SELECT vec_id, CAST(cell AS INT) AS cell, margin,
           CAST(row_number() OVER (ORDER BY margin, vec_id) AS BIGINT)
               AS rank
    FROM marg
    ORDER BY margin, vec_id
    LIMIT 20
"""


@register(
    "x227_margin_uncertainty_sampling",
    "Active-learning margin sampling: the 20 vectors whose distance "
    "gap between their nearest and second-nearest x83 centroid is "
    "smallest — the most cluster-ambiguous points, which is exactly "
    "where an annotation budget buys the most signal (margin sampling "
    "is the standard uncertainty heuristic; random labeling wastes "
    "budget on easy interior points). The reduced distance ||c||^2 - "
    "2x.c drops the common ||x||^2 term, and the top-2 DIFFERENCE is "
    "invariant to that drop, so margins are exact without ever "
    "materializing true distances. Centroids come from the verified "
    "fixed-rounds Lloyd (k=4, 2 rounds) and ride as literals in one "
    "codegen'd projection; the oracle replays training AND the margin "
    "ranking. TakeOrdered cut, k x dim driver state.",
    oracle=_MARGIN_ORACLE.format(rounds=_km_rounds_sql("e", 4, 2, "m_")),
    tags=("ext", "active-learning", "uncertainty", "ml"),
)
def x227_margin_uncertainty_sampling(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from ..ext.similarity import _fixed_rounds_centroids, _sql_double

    emb = load_table(spark, sf, "embeddings").filter(finite_vec("embedding"))
    vecs = emb.select(
        F.col("vec_id").alias("vid"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    ).persist()
    centroids = _fixed_rounds_centroids(vecs, 4, 2)
    if not centroids:  # empty corpus → empty, correctly-typed result
        return vecs.select(
            F.col("vid").alias("vec_id"),
            F.lit(0).cast("int").alias("cell"),
            F.lit(0.0).alias("margin"),
            F.lit(0).cast("long").alias("rank"),
        )
    # centroids + their norms as constant-folded array literals (the r6
    # plan-shape-stable formulation — see _nearest_centroid_cell); the
    # fold's 0.0 init is exact against the first product, so each
    # distance is bit-identical to the unrolled chain the oracle replays
    norms = []
    for cvec in centroids:
        cnorm = 0.0
        for x in cvec:
            cnorm = cnorm + float(x) * float(x)
        norms.append(cnorm)
    cb = (
        "array("
        + ", ".join(
            "array(" + ", ".join(_sql_double(float(x)) for x in c) + ")"
            for c in centroids
        )
        + ")"
    )
    ss = "array(" + ", ".join(_sql_double(n) for n in norms) + ")"
    d_arr = (
        f"zip_with({ss}, {cb}, (s, c) -> s - 2.0 * "
        f"aggregate(zip_with(v, c, (a, b) -> CAST(a AS DOUBLE) * b), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
    )
    scored = vecs.select(
        F.col("vid").alias("vec_id"),
        F.expr(
            f"CAST(array_position({d_arr}, array_min({d_arr})) - 1 AS INT)"
        ).alias("cell"),
        F.expr(
            f"element_at(array_sort({d_arr}), 2) "
            f"- element_at(array_sort({d_arr}), 1)"
        ).alias("margin"),
    )
    win = Window.orderBy("margin", "vec_id")
    return (
        scored.orderBy("margin", "vec_id")
        .limit(20)
        .withColumn("rank", F.row_number().over(win).cast("long"))
    )


_STREAM_DEDUP_ORACLE = """
    SELECT user_id, event_type,
           CAST(min(event_id) AS BIGINT) AS first_event_id
    FROM events
    GROUP BY user_id, event_type
"""


@register(
    "s11_streaming_dedup_replay",
    "Streaming keyed dedup, HASH-VERIFIED against batch: the event "
    "stream deduplicates on (user, type) — keeping the FIRST arrival "
    "in event-id order by pre-sorting each micro-batch is not "
    "possible in a streaming dedup, so the entry aggregates min("
    "event_id) per key under the watermark instead (update-mode "
    "equivalent semantics, drained complete) — and the drained table "
    "must equal the batch GROUP BY exactly. Proves keyed streaming "
    "state (not just windowed aggregation, s9, or dual-stream joins, "
    "s10) computes the batch answer. Watermark bounds state for the "
    "unbounded case; AvailableNow + complete mode makes the bounded "
    "replay total.",
    oracle=_STREAM_DEDUP_ORACLE,
    tags=("ext", "streaming", "dedup", "replay"),
)
def s11_streaming_dedup_replay(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile
    import uuid

    batch = load_table(spark, sf, "events")
    name = f"s11_sink_{uuid.uuid4().hex[:12]}"
    ckpt = _ephemeral_ckpt("s11_ckpt_")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy("user_id", "event_type")
        .agg(F.min("event_id").cast("long").alias("first_event_id"))
    )
    (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(name)


_CHAIN_ORACLE = """
    WITH fp AS (
        SELECT source, doc_id,
               CAST(floor(doc_id / 40) AS BIGINT) AS shard,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS f
        FROM documents WHERE text IS NOT NULL
    ),
    chained AS (
        SELECT source, shard,
               count(*) AS n_docs,
               list_reduce(
                   list_prepend('genesis',
                       list_transform(
                           list_sort(list({'i': doc_id, 'f': f})),
                           s -> s.f)),
                   (acc, x) -> md5(acc || x)) AS chain_hash
        FROM fp GROUP BY source, shard
    )
    SELECT source, shard, CAST(n_docs AS BIGINT) AS n_docs, chain_hash
    FROM chained
"""


@register(
    "x228_shard_manifest_chain",
    "Tamper-evident shard manifests: within each (source, shard) "
    "group the doc fingerprints chain through a rolling "
    "md5(prev || fp) fold in doc-id order from a 'genesis' seed — "
    "any insertion, deletion, reorder, or byte change anywhere in "
    "the shard changes its chain hash (the git/ledger integrity "
    "pattern applied to training-data manifests; x145's checksum is "
    "order-INSENSITIVE by design, this is its order-SENSITIVE "
    "complement for frozen shard layouts). The sequential fold runs "
    "over a per-shard sorted collect bounded by the x82 shard cap "
    "(40 rows) — never corpus-wide; shards chain independently in "
    "parallel.",
    oracle=_CHAIN_ORACLE,
    tags=("ext", "integrity", "manifest", "lineage"),
)
def x228_shard_manifest_chain(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    fp = docs.select(
        "source",
        "doc_id",
        F.floor(F.col("doc_id") / 40).cast("long").alias("shard"),
        F.md5(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
        ).alias("f"),
    )
    chained = fp.groupBy("source", "shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("doc_id"), F.col("f")))
                ),
                lambda s: s["f"],
            ),
            F.lit("genesis"),
            lambda acc, x: F.md5(F.concat(acc, x)),
        ).alias("chain_hash"),
    )
    return chained.select("source", "shard", "n_docs", "chain_hash")


_EMB_AUDIT_ORACLE = """
    WITH e AS (
        SELECT vec_id, embedding,
               CASE WHEN embedding IS NULL THEN NULL
                    ELSE CAST(embedding AS DOUBLE[]) END AS v
        FROM embeddings
    ),
    per_vec AS (
        SELECT vec_id,
               embedding IS NULL AS is_null,
               CASE WHEN embedding IS NULL THEN NULL ELSE len(v) END AS dim,
               CASE WHEN embedding IS NULL THEN NULL
                    ELSE len(list_filter(v, x -> isnan(x))) > 0 END
                   AS has_nan,
               CASE WHEN embedding IS NULL THEN NULL
                    ELSE list_reduce(list_transform(v, x -> x * x),
                                     (a, b) -> a + b) END AS sq_norm
        FROM e
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(CASE WHEN is_null THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
           CAST(count(DISTINCT dim) AS BIGINT) AS n_distinct_dims,
           CAST(max(dim) AS BIGINT) AS max_dim,
           CAST(sum(CASE WHEN has_nan THEN 1 ELSE 0 END) AS BIGINT)
               AS n_with_nan,
           CAST(sum(CASE WHEN sq_norm = 0e0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_norm,
           min(sq_norm) AS min_sq_norm,
           max(sq_norm) AS max_sq_norm
    FROM per_vec
"""


@register(
    "x229_embedding_quality_audit",
    "Embedding-column quality audit — x212's expectation discipline "
    "for the vector tier: null vectors, dimension consistency "
    "(distinct dims + max), NaN contamination, zero-norm vectors "
    "(which poison every cosine downstream: division by zero), and "
    "the squared-norm envelope — run BEFORE any ANN/clustering entry "
    "trusts the column. Squared norms come from the index-ordered "
    "fold (deterministic IEEE, x219's discipline), min/max are "
    "order-free, all counts exact integers. One projection + one "
    "global conditional aggregation at corpus scan cost.",
    oracle=_EMB_AUDIT_ORACLE,
    tags=("ext", "data-quality", "embeddings", "audit"),
)
def x229_embedding_quality_audit(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    v = F.col("embedding").cast("array<double>")
    per_vec = emb.select(
        F.col("embedding").isNull().alias("is_null"),
        F.when(F.col("embedding").isNull(), None).otherwise(F.size(v))
        .alias("dim"),
        F.when(F.col("embedding").isNull(), None).otherwise(
            F.size(F.filter(v, lambda x: F.isnan(x))) > 0
        ).alias("has_nan"),
        F.when(F.col("embedding").isNull(), None).otherwise(
            F.aggregate(
                F.transform(v, lambda x: x * x),
                F.lit(0.0),
                lambda a, b: a + b,
            )
        ).alias("sq_norm"),
    )
    return per_vec.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum(F.when(F.col("is_null"), 1).otherwise(0)).cast("long")
        .alias("n_null"),
        F.count_distinct("dim").cast("long").alias("n_distinct_dims"),
        F.max("dim").cast("long").alias("max_dim"),
        F.sum(F.when(F.col("has_nan"), 1).otherwise(0)).cast("long")
        .alias("n_with_nan"),
        F.sum(F.when(F.col("sq_norm") == 0.0, 1).otherwise(0)).cast("long")
        .alias("n_zero_norm"),
        F.min("sq_norm").alias("min_sq_norm"),
        F.max("sq_norm").alias("max_sq_norm"),
    )


_FERTILITY_ORACLE = """
    WITH t AS (
        SELECT lang,
               length(text) AS n_chars,
               len(list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '')) AS ws_tokens,
               len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens
        FROM documents WHERE text IS NOT NULL
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           CAST(sum(ws_tokens) AS BIGINT) AS ws_tokens,
           CAST(sum(bpe_tokens) AS BIGINT) AS bpe_tokens,
           CAST(CASE WHEN sum(ws_tokens) = 0 THEN NULL
                     ELSE sum(n_chars) * 1000 // sum(ws_tokens) END
                AS BIGINT) AS chars_per_ws_token_x1000,
           CAST(CASE WHEN sum(bpe_tokens) = 0 THEN NULL
                     ELSE sum(n_chars) * 1000 // sum(bpe_tokens) END
                AS BIGINT) AS chars_per_bpe_token_x1000
    FROM t GROUP BY lang
"""


@register(
    "x230_tokenizer_fertility",
    "Tokenizer fertility by language: chars per token under both the "
    "whitespace and the BPE-ish regex tokenization (x3's counters, "
    "aggregated per lang as exact milli-ratios) — the cross-lingual "
    "cost metric that decides whether a tokenizer taxes some "
    "languages with more tokens per character (CJK whitespace "
    "tokenization degenerating to whole-sentence 'words' shows up "
    "here instantly). One projection + one small groupBy; truncating "
    "integer x1000 ratios, NULL-guarded denominators.",
    oracle=_FERTILITY_ORACLE,
    tags=("ext", "text", "tokenizer", "eval"),
)
def x230_tokenizer_fertility(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    t = docs.select(
        "lang",
        F.length("text").alias("n_chars"),
        F.size(F.filter(TX.words("text"), lambda x: x != "")).alias("ws_tokens"),
        F.regexp_count("text", F.lit(TX.TOKEN_PATTERN)).alias("bpe_tokens"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
        F.sum("ws_tokens").cast("long").alias("ws_tokens"),
        F.sum("bpe_tokens").cast("long").alias("bpe_tokens"),
        F.expr(
            "CAST(CASE WHEN sum(ws_tokens) = 0 THEN NULL"
            " ELSE sum(n_chars) * 1000 DIV sum(ws_tokens) END AS BIGINT)"
        ).alias("chars_per_ws_token_x1000"),
        F.expr(
            "CAST(CASE WHEN sum(bpe_tokens) = 0 THEN NULL"
            " ELSE sum(n_chars) * 1000 DIV sum(bpe_tokens) END AS BIGINT)"
        ).alias("chars_per_bpe_token_x1000"),
    )


_MSG_PASS_ORACLE = """
    WITH li AS (
        SELECT l_orderkey, l_suppkey,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem WHERE l_quantity >= 45e0
    ),
    e AS (
        SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
    ),
    feat AS (
        SELECT l_suppkey AS node, sum(cents) AS h0 FROM li GROUP BY 1
    ),
    agg AS (
        SELECT e.src AS node,
               sum(f.h0) AS msg_sum, count(*) AS n_nb
        FROM e JOIN feat f ON e.dst = f.node
        GROUP BY e.src
    )
    SELECT f.node AS supplier,
           CAST(f.h0 AS BIGINT) AS h0_cents,
           CAST(a.msg_sum AS BIGINT) AS nb_sum_cents,
           CAST(a.n_nb AS BIGINT) AS n_neighbors,
           CAST(f.h0 * a.n_nb + a.msg_sum AS BIGINT) AS h1_num,
           CAST(2 * a.n_nb AS BIGINT) AS h1_den
    FROM feat f JOIN agg a ON f.node = a.node
"""


@register(
    "x231_message_passing_round",
    "One GNN message-passing layer as pure relational algebra: each "
    "supplier's next representation is the average of its own feature "
    "and its neighbors' mean — h1 = (h0 + mean_nb(h0))/2 over the "
    "high-quantity co-supply graph, with the feature an exact int64 "
    "(revenue cents) so the layer output ships as the num/den pair "
    "h1 = (h0*n + sum_nb)/(2n). This is GraphSAGE-mean's aggregate "
    "step — per layer: ONE edge-feature equi-join + ONE partial-"
    "aggregated destination shuffle, adjacency never materialized — "
    "the exact plan shape distributed GNN samplers implement, and "
    "the same join geometry as x84's PageRank round with features "
    "replacing rank mass.",
    oracle=_MSG_PASS_ORACLE,
    tags=("ext", "graph", "gnn", "message-passing"),
)
def x231_message_passing_round(spark: SparkSession, sf: str) -> DataFrame:
    li = (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_quantity") >= 45.0)
        .select(
            "l_orderkey",
            "l_suppkey",
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
            .alias("cents"),
        )
    )
    e = _cosupply_edges(li.select("l_orderkey", "l_suppkey"))
    feat = li.groupBy(F.col("l_suppkey").alias("node")).agg(
        F.sum("cents").alias("h0")
    )
    agg = (
        e.join(feat.select(F.col("node").alias("dst"), "h0"), "dst")
        .groupBy(F.col("src").alias("node"))
        .agg(F.sum("h0").alias("msg_sum"), F.count(F.lit(1)).alias("n_nb"))
    )
    return feat.join(agg, "node").select(
        F.col("node").alias("supplier"),
        F.col("h0").cast("long").alias("h0_cents"),
        F.col("msg_sum").cast("long").alias("nb_sum_cents"),
        F.col("n_nb").cast("long").alias("n_neighbors"),
        (F.col("h0") * F.col("n_nb") + F.col("msg_sum")).cast("long")
        .alias("h1_num"),
        (2 * F.col("n_nb")).cast("long").alias("h1_den"),
    )


_HLL_MERGE_ORACLE = """
    WITH u AS (
        SELECT DISTINCT event_type,
               CAST(user_id AS VARCHAR) AS s
        FROM events WHERE event_type IN ('click', 'view')
    ),
    h AS (
        SELECT event_type,
               CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) % 64 AS bucket,
               CAST('0x' || substr(md5(s), 9, 8) AS BIGINT) AS h2
        FROM u
    ),
    reg AS (
        SELECT event_type, bucket,
               max(CASE WHEN h2 = 0 THEN 33
                        ELSE 33 - length(bin(h2)) END) AS m_j
        FROM h GROUP BY 1, 2
    ),
    merged AS (
        SELECT bucket, max(m_j) AS m_j FROM reg GROUP BY bucket
    ),
    direct AS (
        SELECT bucket,
               max(CASE WHEN h2 = 0 THEN 33
                        ELSE 33 - length(bin(h2)) END) AS m_j
        FROM h GROUP BY bucket
    )
    SELECT m.bucket AS bucket,
           CAST(m.m_j AS BIGINT) AS merged_m,
           CAST(d.m_j AS BIGINT) AS direct_m,
           m.m_j = d.m_j AS merge_equals_direct
    FROM merged m JOIN direct d USING (bucket)
"""


@register(
    "x232_hll_merge_proof",
    "HLL mergeability, PROVEN on data rather than asserted: per-"
    "source (click/view) register tables merge by register-wise max, "
    "and the merged sketch is compared register-by-register against "
    "the sketch built directly on the union — every row must say "
    "merge_equals_direct = true (max is the lattice join; the "
    "algebraic property IS the 100 TB selling point: per-partition "
    "sketches union without revisiting data, x209's global sketch "
    "decomposed). Occupied-register comparison; emptiness conventions "
    "cancel in the join. All integers under the hash, including the "
    "proof column.",
    oracle=_HLL_MERGE_ORACLE,
    tags=("ext", "sketch", "hll", "mergeable"),
)
def x232_hll_merge_proof(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    u = ev.select(
        "event_type", F.col("user_id").cast("string").alias("s")
    ).distinct()
    md5 = F.md5("s")
    rho = F.when(
        F.conv(F.substring(md5, 9, 8), 16, 10).cast("long") == 0, 33
    ).otherwise(
        33
        - F.length(
            F.bin(F.conv(F.substring(md5, 9, 8), 16, 10).cast("long"))
        )
    )
    h = u.select(
        "event_type",
        (F.conv(F.substring(md5, 1, 8), 16, 10).cast("long") % 64)
        .alias("bucket"),
        rho.alias("r"),
    )
    reg = h.groupBy("event_type", "bucket").agg(F.max("r").alias("m_j"))
    merged = reg.groupBy("bucket").agg(F.max("m_j").alias("merged_m"))
    direct = h.groupBy("bucket").agg(F.max("r").alias("direct_m"))
    return merged.join(direct, "bucket").select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("merged_m").cast("long").alias("merged_m"),
        F.col("direct_m").cast("long").alias("direct_m"),
        (F.col("merged_m") == F.col("direct_m")).alias("merge_equals_direct"),
    )


_PURITY_ORACLE = f"""
    WITH {_COSUPPLY_EDGES_SQL},
    l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e),{_lp_round('l0', 'pc1', 'pl1')},{_lp_round('pl1', 'pc2', 'pl2')},
    lj AS (
        SELECT p.lab, s.s_nationkey AS nation
        FROM pl2 p JOIN supplier s ON p.node = s.s_suppkey
    ),
    cell AS (
        SELECT lab, nation, count(*) AS n FROM lj GROUP BY 1, 2
    ),
    top AS (
        SELECT lab, nation, n FROM (
            SELECT lab, nation, n,
                   row_number() OVER (PARTITION BY lab
                                      ORDER BY n DESC, nation) AS rn
            FROM cell
        ) WHERE rn = 1
    ),
    sz AS (SELECT lab, sum(n) AS size FROM cell GROUP BY lab)
    SELECT CAST(t.lab AS BIGINT) AS community,
           CAST(s.size AS BIGINT) AS size,
           CAST(t.nation AS BIGINT) AS top_nation,
           CAST(t.n AS BIGINT) AS top_nation_n,
           CAST(t.n * 1000000 // s.size AS BIGINT) AS purity_ppm
    FROM top t JOIN sz s USING (lab)
"""


@register(
    "x233_community_purity",
    "External validation of x91's label-propagation communities "
    "against supplier nations: per community, its size, dominant "
    "nation, and purity (dominant share, exact ppm) — the cluster-"
    "quality read that needs GROUND-TRUTH labels where x180's "
    "modularity needs only the graph; together they say whether "
    "communities are both structurally real and semantically "
    "meaningful. Shares the unrolled 2-round LP oracle with x91/x180 "
    "(single source of truth — the entries cannot drift), then one "
    "broadcast dim join + a community-keyed contingency groupBy.",
    oracle=_PURITY_ORACLE,
    tags=("ext", "graph", "community", "eval"),
)
def x233_community_purity(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    labels = G.label_propagation_fixed_rounds(
        _cosupply_edges(li), rounds=2
    )
    sup = load_table(spark, sf, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    lj = labels.join(sup, labels["node"] == sup["s_suppkey"]).select(
        F.col("label").alias("lab"), F.col("s_nationkey").alias("nation")
    )
    # r12 rollup fusion (guide §2.4): the contingency count repartitions
    # by lab ONCE; both the (lab, nation) count and the per-lab rollup
    # are then lab-clustered and run exchange-free, and the dominant
    # cell + community size come out of ONE aggregation — max over
    # (n, -nation) structs is exactly the old row_number window's
    # (n DESC, nation ASC) top-1 (nation keys are numeric), and sum(n)
    # replaces the separate size groupBy + join. Window sort, second
    # exchange, and the top⋈sz join all gone (A/B 5.73 → 3.91 s
    # min-of-5, identical rows).
    cell = (
        lj.repartition("lab")
        .groupBy("lab", "nation")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    comm = cell.groupBy("lab").agg(
        F.max(
            F.struct(F.col("n"), (-F.col("nation")).alias("neg_nation"))
        ).alias("m"),
        F.sum("n").alias("size"),
    )
    return comm.select(
        F.col("lab").cast("long").alias("community"),
        F.col("size").cast("long").alias("size"),
        (-F.col("m.neg_nation")).cast("long").alias("top_nation"),
        F.col("m.n").cast("long").alias("top_nation_n"),
        F.expr("m.n * 1000000 DIV size").cast("long").alias("purity_ppm"),
    )


_THEIL_SEN_ORACLE = """
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE)
                   - DATE '2024-01-01' AS di,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS c
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type,
               b.c - a.c AS num,
               b.di - a.di AS den
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.di < b.di
    ),
    ranked AS (
        SELECT event_type, num, den,
               row_number() OVER (PARTITION BY event_type
                   ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE),
                            num, den) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n_pairs
        FROM pairs
    )
    SELECT event_type,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(num AS BIGINT) AS slope_num,
           CAST(den AS BIGINT) AS slope_den,
           CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
               AS slope_cents_per_day
    FROM ranked
    WHERE rn = (n_pairs + 1) // 2
"""


@register(
    "w29_theil_sen_slope",
    "Theil-Sen robust trend: the MEDIAN of all pairwise day-to-day "
    "slopes per event type — up to 29% contamination tolerance where "
    "a12's OLS slope follows any single outlier day; the estimator "
    "of record for monitoring trends on dirty operational series, "
    "and the magnitude companion to x104's Mann-Kendall sign test. "
    "Each slope stays an exact int64 fraction (cents diff / day "
    "diff); the float division ORDERS only (ties broken on num, den "
    "— deterministic in both engines) and the lower-median rank "
    "probe picks one actual pair whose num/den ship under the hash. "
    "Pair fanout is bounded by days^2 per type (~435 at a 30-day "
    "window) — the window, not the corpus, prices the quadratic.",
    oracle=_THEIL_SEN_ORACLE,
    tags=("ext", "timeseries", "robust-stats", "trend"),
)
def w29_theil_sen_slope(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01")
        ).alias("di"),
    ).agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("c")
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.di") < F.col("b.di")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("b.c") - F.col("a.c")).alias("num"),
        (F.col("b.di") - F.col("a.di")).cast("long").alias("den"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("num").cast("double") / F.col("den").cast("double"),
        "num",
        "den",
    )
    wc = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "num",
        "den",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_pairs"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n_pairs + 1) DIV 2")
    ).select(
        "event_type",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("num").cast("long").alias("slope_num"),
        F.col("den").cast("long").alias("slope_den"),
        (F.col("num").cast("double") / F.col("den").cast("double"))
        .alias("slope_cents_per_day"),
    )


def _gm_round(prev: str, pick: str, cur: str) -> str:
    """One greedy-allocation round: argmax of quality/(1+epochs) by
    cross-multiplied integer comparison (ORDER BY the exact fraction
    via double, ties to the smaller source), then bump the winner."""
    return f"""
    {pick} AS (
        SELECT source FROM {prev}
        ORDER BY CAST(q AS DOUBLE) / (1 + e) DESC, source
        LIMIT 1
    ),
    {cur} AS (
        SELECT s.source, s.q,
               s.e + CASE WHEN s.source = p.source THEN 1 ELSE 0 END AS e
        FROM {prev} s CROSS JOIN {pick} p
    )"""


_GREEDY_MIX_ORACLE = f"""
    WITH base AS (
        SELECT source,
               sum(CASE WHEN lang = 'en' THEN n_chars ELSE 0 END) AS q,
               0 AS e
        FROM documents WHERE text IS NOT NULL
        GROUP BY source
    ),{_gm_round('base', 'p1', 'g1')},{_gm_round('g1', 'p2', 'g2')},{_gm_round('g2', 'p3', 'g3')},{_gm_round('g3', 'p4', 'g4')},{_gm_round('g4', 'p5', 'g5')}
    SELECT source,
           CAST(q AS BIGINT) AS quality_chars,
           CAST(e AS BIGINT) AS tranches_allocated
    FROM g5
"""


@register(
    "x234_greedy_mixture_allocation",
    "Greedy mixture optimization (DoReMi-lite): five budget tranches "
    "allocated one at a time to the source with the highest marginal "
    "utility quality/(1+tranches_so_far) — diminishing returns per "
    "repeated epoch, so quality-dense sources win early tranches but "
    "saturate; the unrolled-rounds verified-optimizer pattern (x179's "
    "submodular greedy applied to mixture design instead of "
    "coverage). Per round: one 1-row TakeOrdered argmax broadcast "
    "into a source-cardinality projection — no collect, state is "
    "|sources| rows; the oracle replays all five rounds.",
    oracle=_GREEDY_MIX_ORACLE,
    tags=("ext", "mixture", "optimizer", "iterative"),
)
def x234_greedy_mixture_allocation(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    # source-cardinality state, checkpointed eagerly ONCE: without this,
    # every round's eager 1-row pick ACTION replayed the documents
    # aggregation from the scan — 5 rounds = 6 scans (the x178 replay
    # class, r8 audit). The state is |sources| rows, the cheapest thing
    # in the entry to materialize.
    state = (
        docs.groupBy("source")
        .agg(
            F.sum(
                F.when(F.col("lang") == "en", F.col("n_chars")).otherwise(0)
            ).alias("q"),
        )
        .localCheckpoint(eager=True)
    )

    # r12 (guide §5, bounded driver data): each round's pick is ONE row
    # — collect it as a driver literal and carry the epoch bumps as a
    # literal CASE expression over the checkpointed base state, instead
    # of an eager 1-row pick checkpoint + broadcast cross-join + a
    # full state re-checkpoint per round. Every round is now exactly
    # one TakeOrdered job over the stored |sources| rows: 18
    # jobs/invocation -> 6, A/B min-of-5 1.15 -> 0.82 s, identical
    # allocation. Tie-break comparator unchanged (exact fraction via
    # double, ties to the smaller source).
    bumps: dict = {}

    def e_col():
        c = F.lit(0)
        for s, n in sorted(bumps.items()):
            c = c + F.when(F.col("source") == F.lit(s), F.lit(n)).otherwise(0)
        return c

    for _ in range(5):
        top = (
            state.withColumn("e", e_col())
            .orderBy(
                F.desc(F.col("q").cast("double") / (1 + F.col("e"))),
                "source",
            )
            .limit(1)
            .collect()
        )
        if not top:
            break  # no sources: the allocation is vacuously empty
        s = top[0]["source"]
        bumps[s] = bumps.get(s, 0) + 1
    return state.select(
        "source",
        F.col("q").cast("long").alias("quality_chars"),
        e_col().cast("long").alias("tranches_allocated"),
    )


_NULL_SAFE_JOIN_ORACLE = """
    WITH k AS (
        SELECT event_id,
               CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                         % 7 = 0
                    THEN NULL
                    ELSE CAST(json_extract_string(props, '$.k') AS BIGINT)
                         % 10 END AS grp
        FROM events
    )
    SELECT COALESCE(CAST(grp AS VARCHAR), 'NULL') AS grp_key,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_pairs
    FROM k GROUP BY grp
"""


@register(
    "j25_null_safe_equi_join",
    "Null-safe equi-join semantics (<=> / IS NOT DISTINCT FROM): a "
    "nullable JSON-derived key where NULL must match NULL — standard "
    "equi-joins silently drop every NULL-keyed row, the classic "
    "silent-data-loss bug in late-bound keys. Verified through the "
    "pair-count identity: the per-group self-join cardinality "
    "n*(n-1)/2 computed FROM the null-safe join must equal the "
    "grouped closed form — including the NULL group, which an "
    "ordinary join would report as 0. (The Spark side genuinely "
    "executes the eqNullSafe self-join and counts; the oracle takes "
    "the closed form.) NULL renders as a sentinel key so the row "
    "survives the hash compare.",
    oracle=_NULL_SAFE_JOIN_ORACLE,
    tags=("ext", "join", "null-semantics", "sql-surface"),
)
def j25_null_safe_equi_join(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    kv = F.get_json_object("props", "$.k").cast("long")
    k = ev.select(
        "event_id",
        F.when(kv % 7 == 0, F.lit(None).cast("long"))
        .otherwise(kv % 10)
        .alias("grp"),
    )
    a, b = k.alias("a"), k.alias("b")
    pairs = a.join(
        b,
        F.col("a.grp").eqNullSafe(F.col("b.grp"))
        & (F.col("a.event_id") < F.col("b.event_id")),
    ).groupBy(F.col("a.grp").alias("grp")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    members = k.groupBy("grp").agg(F.count(F.lit(1)).alias("n_members"))
    return members.join(
        pairs, members["grp"].eqNullSafe(pairs["grp"]), "left"
    ).select(
        F.coalesce(members["grp"].cast("string"), F.lit("NULL"))
        .alias("grp_key"),
        F.col("n_members").cast("long").alias("n_members"),
        F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
    )


_TRY_CAST_ORACLE = """
    WITH k AS (
        SELECT json_extract_string(props, '$.k') AS raw
        FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN TRY_CAST(raw AS BIGINT) IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_int_ok,
           CAST(sum(CASE WHEN TRY_CAST(raw AS DOUBLE) IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_double_ok,
           CAST(sum(CASE WHEN TRY_CAST(raw AS DATE) IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_date_ok,
           CAST(sum(CASE WHEN raw IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_missing
    FROM k
"""


@register(
    "e19_try_cast_census",
    "try_cast type census over a late-bound string field (the JSON "
    "props key): how many values parse as BIGINT / DOUBLE / DATE, "
    "and how many are missing — the schema-inference probe run "
    "before promoting a semi-structured field to a typed column. "
    "Matters doubly under ANSI mode (the engine self-pins it): a "
    "plain CAST would THROW on the first bad value at row 3 billion "
    "of a 100 TB scan; try_cast turns the failure mode into a "
    "countable NULL in both engines. One projection + one global "
    "conditional aggregation.",
    oracle=_TRY_CAST_ORACLE,
    tags=("ext", "schema", "try-cast", "sql-surface"),
)
def e19_try_cast_census(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    raw = F.get_json_object("props", "$.k")
    k = ev.select(raw.alias("raw"))
    ok = lambda t: F.sum(  # noqa: E731
        F.when(F.expr(f"try_cast(raw AS {t})").isNotNull(), 1).otherwise(0)
    )
    return k.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        ok("BIGINT").cast("long").alias("n_int_ok"),
        ok("DOUBLE").cast("long").alias("n_double_ok"),
        ok("DATE").cast("long").alias("n_date_ok"),
        F.sum(F.when(F.col("raw").isNull(), 1).otherwise(0)).cast("long")
        .alias("n_missing"),
    )


_SEPARATION_ORACLE = f"""
    WITH probes AS (
        SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM (
            SELECT label, vec_id, embedding,
                   row_number() OVER (PARTITION BY label
                                      ORDER BY vec_id) AS rn
            FROM embeddings
            WHERE (list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)), 'max') < 1e9)
        ) WHERE rn <= 10
    ),
    pairs AS (
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(floor({{cosine}} * 1000000) AS BIGINT) AS cos_ppm
        FROM probes a JOIN probes b ON a.vec_id < b.vec_id
    ),
    agg AS (
        SELECT label_a = label_b AS intra,
               sum(cos_ppm) AS s, count(*) AS n
        FROM pairs GROUP BY 1
    )
    SELECT CAST(max(CASE WHEN intra THEN n END) AS BIGINT) AS n_intra,
           CAST(max(CASE WHEN intra THEN s END) AS BIGINT)
               AS intra_cos_ppm_sum,
           CAST(max(CASE WHEN NOT intra THEN n END) AS BIGINT) AS n_inter,
           CAST(max(CASE WHEN NOT intra THEN s END) AS BIGINT)
               AS inter_cos_ppm_sum,
           CAST(max(CASE WHEN intra THEN s END)
                    * max(CASE WHEN NOT intra THEN n END)
                - max(CASE WHEN NOT intra THEN s END)
                    * max(CASE WHEN intra THEN n END) AS BIGINT)
               AS separation_num
    FROM agg
"""


@register(
    "x235_embedding_separation",
    "Embedding-space separation audit (the alignment half of "
    "alignment/uniformity): over a deterministic 10-per-label probe "
    "set, mean same-label cosine vs mean cross-label cosine — if the "
    "gap is ~0 the embeddings carry no label signal and every "
    "downstream kNN/centroid entry (x188, x21) is guessing. Cosines "
    "are quantized to integer ppm BEFORE summing (floor(cos*1e6) — "
    "both engines compute identical doubles, so identical ints), "
    "making the group sums order-free; the separation sign ships as "
    "the cross-multiplied integer s_intra*n_inter - s_inter*n_intra. "
    "The probe set bounds the pair count at (10L)^2 regardless of "
    "corpus size — the fixed-budget audit shape.",
    oracle=_SEPARATION_ORACLE.format(cosine=sql_cosine("a.v", "b.v")),
    tags=("ext", "embeddings", "eval", "separation"),
)
def x235_embedding_separation(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf, "embeddings").filter(finite_vec("embedding"))
    w = Window.partitionBy("label").orderBy("vec_id")
    probes = (
        emb.select(
            "label",
            "vec_id",
            F.col("embedding").cast("array<double>").alias("v"),
            S.norm(F.col("embedding").cast("array<double>")).alias("nv"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 10)
        .drop("rn")
        .persist()
    )
    a, b = probes.alias("a"), probes.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        (F.col("a.label") == F.col("b.label")).alias("intra"),
        # per-row norms hoisted above the pair self-join (r11, same
        # bit-identical rework as similarity.brute_force_topk)
        F.floor(
            S.dot(F.col("a.v"), F.col("b.v"))
            / (F.col("a.nv") * F.col("b.nv"))
            * 1000000
        )
        .cast("long")
        .alias("cos_ppm"),
    )
    agg = pairs.groupBy("intra").agg(
        F.sum("cos_ppm").alias("s"), F.count(F.lit(1)).alias("n")
    )
    pick = lambda cond, c: F.max(F.when(cond, F.col(c)))  # noqa: E731
    return agg.agg(
        pick(F.col("intra"), "n").cast("long").alias("n_intra"),
        pick(F.col("intra"), "s").cast("long").alias("intra_cos_ppm_sum"),
        pick(~F.col("intra"), "n").cast("long").alias("n_inter"),
        pick(~F.col("intra"), "s").cast("long").alias("inter_cos_ppm_sum"),
        (
            pick(F.col("intra"), "s") * pick(~F.col("intra"), "n")
            - pick(~F.col("intra"), "s") * pick(F.col("intra"), "n")
        ).cast("long").alias("separation_num"),
    )


_EXPIRY_ORACLE = """
    WITH p AS (
        SELECT date_trunc('month', l_shipdate) AS ship_month,
               count(*) AS n_rows,
               sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                   AS cents
        FROM lineitem GROUP BY 1
    ),
    mx AS (SELECT max(ship_month) AS newest FROM p)
    SELECT p.ship_month,
           CAST(p.n_rows AS BIGINT) AS n_rows,
           CAST(p.cents AS BIGINT) AS cents,
           CAST((CAST(year(mx.newest) AS BIGINT) * 12
                     + month(mx.newest))
                - (CAST(year(p.ship_month) AS BIGINT) * 12
                     + month(p.ship_month)) AS BIGINT) AS age_months,
           ((CAST(year(mx.newest) AS BIGINT) * 12 + month(mx.newest))
            - (CAST(year(p.ship_month) AS BIGINT) * 12
               + month(p.ship_month))) > 48 AS expire
    FROM p CROSS JOIN mx
"""


@register(
    "z8_retention_expiry_plan",
    "Partition retention/expiry plan over the e13 ship-month layout: "
    "per partition, row count, revenue mass, age in whole months "
    "behind the newest partition (exact integer month arithmetic — "
    "no date subtraction ambiguity), and the 48-month TTL verdict — "
    "the DROP PARTITION work list a lifecycle job executes, with the "
    "at-risk revenue visible BEFORE anything is deleted. Partition-"
    "level pruning means execution cost is metadata-shaped: one "
    "grouped scan builds the whole plan; the z-family's storage-"
    "lifecycle completion (z6 prunes reads, this prunes retention).",
    oracle=_EXPIRY_ORACLE,
    tags=("ext", "ops", "retention", "lifecycle"),
)
def z8_retention_expiry_plan(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("ship_month")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"))
        .alias("cents"),
    )
    mx = p.agg(F.max("ship_month").alias("newest"))
    months = lambda c: (  # noqa: E731
        F.year(c).cast("long") * 12 + F.month(c)
    )
    age = months(F.col("newest")) - months(F.col("ship_month"))
    return p.crossJoin(F.broadcast(mx)).select(
        "ship_month",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("cents").cast("long").alias("cents"),
        age.cast("long").alias("age_months"),
        (age > 48).alias("expire"),
    )


_CONFORMAL_ORACLE = """
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE)
                   - DATE '2024-01-01' AS di,
               sum(CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT)) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    err AS (
        SELECT a.event_type, a.di,
               abs(a.cents - b.cents) AS ae,
               CASE WHEN a.di BETWEEN 7 AND 18 THEN 'cal'
                    WHEN a.di >= 19 THEN 'test' END AS split
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.di = b.di + 7
        WHERE a.di >= 7
    ),
    lv AS (
        SELECT event_type, ae, count(*) AS cnt
        FROM err WHERE split = 'cal'
        GROUP BY 1, 2
    ),
    n_cal AS (
        SELECT event_type, sum(cnt) AS n FROM lv GROUP BY 1
    ),
    cum AS (
        SELECT a.event_type, a.ae,
               sum(b.cnt) AS cum_le
        FROM lv a JOIN lv b
          ON a.event_type = b.event_type AND b.ae <= a.ae
        GROUP BY 1, 2
    ),
    q AS (
        SELECT c.event_type,
               min(c.ae) AS q_hat
        FROM cum c JOIN n_cal n USING (event_type)
        WHERE c.cum_le * 10 >= 9 * (n.n + 1)
        GROUP BY 1
    ),
    cover AS (
        SELECT e.event_type,
               count(*) AS n_test,
               sum(CASE WHEN e.ae <= q.q_hat THEN 1 ELSE 0 END) AS n_covered
        FROM err e JOIN q USING (event_type)
        WHERE e.split = 'test'
        GROUP BY 1
    )
    SELECT c.event_type,
           CAST(n.n AS BIGINT) AS n_cal,
           CAST(q.q_hat AS BIGINT) AS q_hat_cents,
           CAST(c.n_test AS BIGINT) AS n_test,
           CAST(c.n_covered AS BIGINT) AS n_covered,
           CAST(c.n_covered * 1000000 // c.n_test AS BIGINT)
               AS coverage_ppm
    FROM cover c JOIN q USING (event_type) JOIN n_cal n USING (event_type)
"""


@register(
    "x236_conformal_interval",
    "Split-conformal prediction interval for the seasonal-naive "
    "forecast (w25's model): calibration days 7-18 supply absolute "
    "errors, q_hat = the ceil(0.9*(n+1))-smallest calibration error "
    "(the finite-sample-valid conformal quantile, computed as a "
    "distinct-value cumulative rank probe — cum_le*10 >= 9*(n+1) in "
    "pure integers), and held-out days >= 19 report empirical "
    "coverage in exact ppm — distribution-free uncertainty with a "
    "guarantee, vs a22/a30's Gaussian closes. Every stage partitions "
    "by event type; state is error-value cardinality. The marginal-"
    "coverage guarantee (>= 90% in expectation under exchange-"
    "ability) is what a forecast SLA can actually promise.",
    oracle=_CONFORMAL_ORACLE,
    tags=("ext", "forecast", "conformal", "uncertainty"),
)
def x236_conformal_interval(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01")
        ).alias("di"),
    ).agg(
        F.sum(F.floor(fin("value") * 100 + 0.5).cast("long")).alias("cents")
    )
    a, b = daily.alias("a"), daily.alias("b")
    err = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.di") == F.col("b.di") + 7),
        )
        .filter(F.col("a.di") >= 7)
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.di").alias("di"),
            F.abs(F.col("a.cents") - F.col("b.cents")).alias("ae"),
            F.when(F.col("a.di").between(7, 18), "cal")
            .when(F.col("a.di") >= 19, "test")
            .alias("split"),
        )
        .persist()  # calibration quantile + test coverage both read it
    )
    lv = (
        err.filter(F.col("split") == "cal")
        .groupBy("event_type", "ae")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_cal = lv.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    la, lb = lv.alias("la"), lv.alias("lb")
    cum = (
        la.join(
            lb,
            (F.col("la.event_type") == F.col("lb.event_type"))
            & (F.col("lb.ae") <= F.col("la.ae")),
        )
        .groupBy(
            F.col("la.event_type").alias("event_type"),
            F.col("la.ae").alias("ae"),
        )
        .agg(F.sum("lb.cnt").alias("cum_le"))
    )
    q = (
        cum.join(n_cal, "event_type")
        .filter(F.col("cum_le") * 10 >= 9 * (F.col("n") + 1))
        .groupBy("event_type")
        .agg(F.min("ae").alias("q_hat"))
    )
    cover = (
        err.filter(F.col("split") == "test")
        .join(q, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(F.col("ae") <= F.col("q_hat"), 1).otherwise(0)
            ).alias("n_covered"),
        )
    )
    return (
        cover.join(q, "event_type")
        .join(n_cal, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_cal"),
            F.col("q_hat").cast("long").alias("q_hat_cents"),
            F.col("n_test").cast("long").alias("n_test"),
            F.col("n_covered").cast("long").alias("n_covered"),
            F.expr("n_covered * 1000000 DIV n_test").cast("long")
            .alias("coverage_ppm"),
        )
    )


_CAPTURE_ORACLE = """
    WITH c AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    ),
    v AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
    ),
    m AS (
        SELECT count(*) AS n_both FROM c JOIN v USING (user_id)
    ),
    t AS (
        SELECT (SELECT count(*) FROM c) AS n1,
               (SELECT count(*) FROM v) AS n2,
               (SELECT count(DISTINCT user_id) FROM events) AS n_true
    )
    SELECT CAST(t.n1 AS BIGINT) AS n_sample1,
           CAST(t.n2 AS BIGINT) AS n_sample2,
           CAST(m.n_both AS BIGINT) AS n_recaptured,
           CAST(CASE WHEN m.n_both = 0 THEN NULL
                     ELSE ((t.n1 + 1) * (t.n2 + 1)) // (m.n_both + 1) - 1
                END AS BIGINT) AS chapman_estimate,
           CAST(t.n_true AS BIGINT) AS n_true
    FROM t CROSS JOIN m
"""


@register(
    "x237_capture_recapture",
    "Capture-recapture population estimation (Chapman's bias-"
    "corrected Lincoln-Petersen): treat clickers and viewers as two "
    "capture samples, and estimate the TOTAL user population from "
    "the overlap — N_hat = (n1+1)(n2+1)/(m+1) - 1, which needs no "
    "scan of the full population at all, only two membership sets "
    "and their intersection (the statistical third leg of the "
    "distinct-estimation tier: HLL x209 hashes everything once, KMV "
    "x211 keeps k values, capture-recapture never even SEES the "
    "uncaptured mass). Pure integer floor arithmetic under the hash; "
    "the true distinct count rides beside it as the accuracy check. "
    "One semi-join + three distinct counts.",
    oracle=_CAPTURE_ORACLE,
    tags=("ext", "sketch", "estimation", "exact-stats"),
)
def x237_capture_recapture(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    c = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    v = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    m = c.join(v, "user_id").agg(F.count(F.lit(1)).alias("n_both"))
    t = (
        c.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(v.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(
            ev.agg(F.count_distinct("user_id").alias("n_true"))
        )
    )
    return t.crossJoin(F.broadcast(m)).select(
        F.col("n1").cast("long").alias("n_sample1"),
        F.col("n2").cast("long").alias("n_sample2"),
        F.col("n_both").cast("long").alias("n_recaptured"),
        F.expr(
            "CAST(CASE WHEN n_both = 0 THEN NULL"
            " ELSE ((n1 + 1) * (n2 + 1)) DIV (n_both + 1) - 1"
            " END AS BIGINT)"
        ).alias("chapman_estimate"),
        F.col("n_true").cast("long").alias("n_true"),
    )


_GOOD_TURING_ORACLE = """
    WITH cnt AS (
        SELECT t AS term, count(*) AS freq
        FROM (
            SELECT unnest(string_split_regex(lower(text), '\\s+')) AS t
            FROM documents WHERE text IS NOT NULL
        )
        WHERE t <> ''
        GROUP BY t
    ),
    fof AS (
        SELECT freq, count(*) AS n_r FROM cnt GROUP BY freq
    ),
    tot AS (
        SELECT sum(freq * n_r) AS n_tokens, sum(n_r) AS vocab FROM fof
    )
    SELECT CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST(t.vocab AS BIGINT) AS vocab,
           CAST(coalesce(max(CASE WHEN f.freq = 1 THEN f.n_r END), 0)
                AS BIGINT) AS n_singletons,
           CAST(coalesce(max(CASE WHEN f.freq = 2 THEN f.n_r END), 0)
                AS BIGINT) AS n_doubletons,
           CAST(coalesce(max(CASE WHEN f.freq = 1 THEN f.n_r END), 0)
                * 1000000 // t.n_tokens AS BIGINT) AS unseen_mass_ppm
    FROM fof f CROSS JOIN tot t
    GROUP BY t.n_tokens, t.vocab
"""


@register(
    "x238_good_turing_unseen",
    "Good-Turing unseen-mass estimate: the probability that the NEXT "
    "token is a never-seen type is n_singletons/N — the frequency-of-"
    "frequencies argument that prices vocabulary openness (how much "
    "probability a language model must reserve for OOV, and whether "
    "a corpus is big enough for its tokenizer; near-zero singleton "
    "mass on this closed synthetic vocabulary, high on any real "
    "crawl). One term count, one frequency-of-frequency rollup, "
    "exact-ppm mass — the single cheapest corpus-openness statistic "
    "beside x206's growth curve.",
    oracle=_GOOD_TURING_ORACLE,
    tags=("ext", "text", "corpus-stats", "good-turing"),
)
def x238_good_turing_unseen(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    cnt = (
        docs.select(F.explode(TX.words("text")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    fof = cnt.groupBy("freq").agg(F.count(F.lit(1)).alias("n_r"))
    tot = fof.agg(
        F.sum(F.col("freq") * F.col("n_r")).alias("n_tokens"),
        F.sum("n_r").alias("vocab"),
    )
    pick = lambda k: F.coalesce(  # noqa: E731
        F.max(F.when(F.col("freq") == k, F.col("n_r"))), F.lit(0)
    )
    return fof.crossJoin(F.broadcast(tot)).groupBy(
        "n_tokens", "vocab"
    ).agg(
        pick(1).cast("long").alias("n_singletons"),
        pick(2).cast("long").alias("n_doubletons"),
        F.expr(
            "coalesce(max(CASE WHEN freq = 1 THEN n_r END), 0)"
            " * 1000000 DIV n_tokens"
        ).cast("long").alias("unseen_mass_ppm"),
    ).select(
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("vocab").cast("long").alias("vocab"),
        "n_singletons",
        "n_doubletons",
        "unseen_mass_ppm",
    )


_SIMPSON_ORACLE = """
    WITH cell AS (
        SELECT lang, source, count(*) AS n
        FROM documents WHERE text IS NOT NULL
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT lang, sum(n) AS nn FROM cell GROUP BY lang
    )
    SELECT c.lang,
           CAST(t.nn AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_sources,
           CAST(t.nn * t.nn - sum(c.n * c.n) AS BIGINT) AS simpson_num,
           CAST(t.nn * t.nn AS BIGINT) AS simpson_den,
           CAST((t.nn * t.nn - sum(c.n * c.n)) * 1000000
                // (t.nn * t.nn) AS BIGINT) AS diversity_ppm
    FROM cell c JOIN tot t USING (lang)
    GROUP BY c.lang, t.nn
"""


@register(
    "x239_simpson_diversity",
    "Gini-Simpson source diversity per language: 1 - sum((n_i/N)^2) — "
    "the probability two random docs come from DIFFERENT sources — "
    "as the exact integer fraction (N^2 - sum n_i^2)/N^2 (Shannon "
    "entropy needs ln; Simpson is the diversity index that stays in "
    "exact arithmetic, the same log-free discipline as x190's TV "
    "drift). A language whose diversity collapses toward 0 is single-"
    "source — a contamination/monoculture risk the mixture tier "
    "(x49/x204/x234) must know about. One (lang, source) groupBy + "
    "one per-lang rollup; int64 safe to ~3e9 docs per language.",
    oracle=_SIMPSON_ORACLE,
    tags=("ext", "corpus-stats", "diversity", "exact-stats"),
)
def x239_simpson_diversity(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    cell = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    tot = cell.groupBy("lang").agg(F.sum("n").alias("nn"))
    return (
        cell.join(tot, "lang")
        .groupBy("lang", "nn")
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.sum(F.col("n") * F.col("n")).alias("ss"),
        )
        .select(
            "lang",
            F.col("nn").cast("long").alias("n_docs"),
            F.col("n_sources").cast("long").alias("n_sources"),
            (F.col("nn") * F.col("nn") - F.col("ss")).cast("long")
            .alias("simpson_num"),
            (F.col("nn") * F.col("nn")).cast("long").alias("simpson_den"),
            F.expr("(nn * nn - ss) * 1000000 DIV (nn * nn)").cast("long")
            .alias("diversity_ppm"),
        )
    )


_MARKOV_ORACLE = """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    trans AS (
        SELECT event_type AS from_type, next_type AS to_type,
               count(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ),
    row_tot AS (
        SELECT from_type, sum(n) AS nn FROM trans GROUP BY 1
    )
    SELECT t.from_type, t.to_type,
           CAST(t.n AS BIGINT) AS n,
           CAST(r.nn AS BIGINT) AS row_total,
           CAST(t.n * 1000000 // r.nn AS BIGINT) AS p_ppm
    FROM trans t JOIN row_tot r USING (from_type)
"""


@register(
    "x240_markov_transitions",
    "First-order Markov transition matrix over each user's event "
    "sequence: consecutive-pair counts by a per-user lead() window "
    "(total-ordered on (ts, event_id) so same-timestamp events "
    "sequence deterministically) row-normalized to exact-ppm "
    "transition probabilities — the behavioral model under next-"
    "event prediction, funnel simulation, and x102's top-paths "
    "(which enumerates; this parameterizes). The window partitions "
    "by user (never global), the matrix is |types|^2 — constant-size "
    "output from any event volume; counts and ppm all hash-exact.",
    oracle=_MARKOV_ORACLE,
    tags=("ext", "behavioral", "markov", "sequence"),
)
def x240_markov_transitions(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    row_tot = trans.groupBy("from_type").agg(F.sum("n").alias("nn"))
    return trans.join(row_tot, "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.col("nn").cast("long").alias("row_total"),
        F.expr("n * 1000000 DIV nn").cast("long").alias("p_ppm"),
    )


_BITEXT_ORACLE = """
    WITH d AS (
        SELECT doc_id, lang, source, n_chars,
               n_chars // 50 AS len_band
        FROM documents WHERE text IS NOT NULL
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.lang AS lang_a, b.lang AS lang_b,
           CAST(abs(a.n_chars - b.n_chars) AS BIGINT) AS len_diff,
           CAST(least(a.n_chars, b.n_chars) * 1000000
                // greatest(a.n_chars, b.n_chars) AS BIGINT)
               AS len_ratio_ppm
    FROM d a JOIN d b
      ON a.source = b.source
     AND a.len_band = b.len_band
     AND a.lang < b.lang
     AND a.lang = 'en'
    WHERE abs(a.n_chars - b.n_chars) <= 25
      AND greatest(a.n_chars, b.n_chars) > 0
"""


@register(
    "x241_bitext_alignment_candidates",
    "Bitext mining, stage one (Gale-Church's founding observation: "
    "translations have correlated lengths): candidate en<->other "
    "pairs from the SAME source whose lengths agree within 25 chars, "
    "blocked on (source, 50-char length band) so the pair join never "
    "goes all-pairs — the cheap filter that runs before any expensive "
    "embedding alignment (x10/x185 would rerank these candidates) "
    "when assembling parallel corpora for translation training. "
    "Length affinity ships as exact-ppm min/max ratio. Band blocking "
    "can split a qualifying pair across a boundary — stated, and the "
    "25<=50 band width keeps the miss one-sided and bounded.",
    oracle=_BITEXT_ORACLE,
    tags=("ext", "bitext", "alignment", "training-data"),
)
def x241_bitext_alignment_candidates(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    d = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.expr("n_chars DIV 50").alias("len_band"),
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.len_band") == F.col("b.len_band"))
            & (F.col("a.lang") < F.col("b.lang"))
            & (F.col("a.lang") == "en"),
        )
        .filter(
            (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 25)
            & (F.greatest(F.col("a.n_chars"), F.col("b.n_chars")) > 0)
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.lang").alias("lang_a"),
            F.col("b.lang").alias("lang_b"),
            F.abs(F.col("a.n_chars") - F.col("b.n_chars")).cast("long")
            .alias("len_diff"),
            F.expr(
                "least(a.n_chars, b.n_chars) * 1000000"
                " DIV greatest(a.n_chars, b.n_chars)"
            ).cast("long").alias("len_ratio_ppm"),
        )
    )


_RAMP_ORACLE = """
    WITH u AS (
        SELECT DISTINCT user_id,
               CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ramp'),
                                   1, 8) AS BIGINT) % 10000 AS slot
        FROM events
    )
    SELECT user_id,
           CAST(slot AS BIGINT) AS slot,
           slot < 100 AS in_1pct,
           slot < 500 AS in_5pct,
           slot < 2500 AS in_25pct,
           TRUE AS in_100pct
    FROM u
"""


@register(
    "x242_monotone_ramp_assignment",
    "Feature-flag ramp assignment with the MONOTONE guarantee: each "
    "user hashes once into a 10k-slot ring, and the 1% / 5% / 25% / "
    "100% cohorts are nested prefixes (slot < threshold), so ramping "
    "up never REMOVES a user from treatment — the property that "
    "keeps pre-ramp exposure data usable and user experience sticky "
    "(independent per-stage sampling silently churns users between "
    "cohorts and poisons the longitudinal analysis; the subset "
    "property is pinned by test). Salted md5 so this ring is "
    "independent of every other arm split in the repo (a23's SRM "
    "gate applies per ramp stage). Pure projection.",
    oracle=_RAMP_ORACLE,
    tags=("ext", "ab-test", "ramp", "infra"),
)
def x242_monotone_ramp_assignment(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    slot = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":ramp"))),
                1, 8,
            ),
            16, 10,
        ).cast("long") % 10000
    )
    return ev.select("user_id").distinct().select(
        "user_id",
        slot.cast("long").alias("slot"),
        (slot < 100).alias("in_1pct"),
        (slot < 500).alias("in_5pct"),
        (slot < 2500).alias("in_25pct"),
        F.lit(True).alias("in_100pct"),
    )


_POS_PAIR_SQL_VIEW = """
        list_filter(
            list_transform(range(1, len(ws) + 1),
                           i -> {{'i': i, 't': ws[i]}}),
            s -> CAST('0x' || substr(md5(
                     CAST(doc_id AS VARCHAR) || ':{salt}:' ||
                     CAST(s.i AS VARCHAR) || ':' || s.t), 1, 8)
                 AS BIGINT) % 10 <> 0)"""

_POS_PAIR_ORACLE = f"""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> t <> '') AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    views AS (
        SELECT doc_id,
               list_transform({_POS_PAIR_SQL_VIEW.format(salt='v1')},
                              s -> s.t) AS va,
               list_transform({_POS_PAIR_SQL_VIEW.format(salt='v2')},
                              s -> s.t) AS vb
        FROM w
    )
    SELECT doc_id,
           CAST(len(va) AS BIGINT) AS n_tokens_a,
           CAST(len(vb) AS BIGINT) AS n_tokens_b,
           md5(array_to_string(va, ' ')) AS view_a_fp,
           md5(array_to_string(vb, ' ')) AS view_b_fp,
           md5(array_to_string(va, ' '))
               <> md5(array_to_string(vb, ' ')) AS views_differ
    FROM views
"""


@register(
    "x243_positive_pair_views",
    "Contrastive positive-pair factory (SimCSE/dropout-views style): "
    "TWO independent deterministic 10% token-dropout views per "
    "document — x223's hash-gated augmentation under two different "
    "salts — fingerprinted as a training-pair table; together with "
    "x220's hard negatives this completes the contrastive-training "
    "data diet (positives = same doc, different corruption; "
    "negatives = lexically-close, semantically-far pairs). The "
    "views_differ flag surfaces the degenerate identical-view pairs "
    "a contrastive loss learns nothing from (short docs where "
    "neither view dropped anything). Pure projection, reproducible "
    "across engines and partitionings.",
    oracle=_POS_PAIR_ORACLE,
    tags=("ext", "augmentation", "contrastive", "training-data"),
)
def x243_positive_pair_views(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    w = docs.select(
        "doc_id", F.filter(TX.words("text"), lambda t: t != "").alias("ws")
    )

    def view(salt: str):
        structs = F.transform(
            F.sequence(F.lit(1), F.size("ws")),
            lambda i: F.struct(
                i.alias("i"), F.element_at(F.col("ws"), i).alias("t")
            ),
        )
        gate = lambda s: (  # noqa: E731
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"),
                            F.lit(f":{salt}:"),
                            s["i"].cast("string"),
                            F.lit(":"),
                            s["t"],
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("bigint") % 10 != 0
        )
        return F.transform(F.filter(structs, gate), lambda s: s["t"])

    views = w.select(
        "doc_id", view("v1").alias("va"), view("v2").alias("vb")
    )
    fp = lambda c: F.md5(F.array_join(F.col(c), " "))  # noqa: E731
    return views.select(
        "doc_id",
        F.size("va").cast("long").alias("n_tokens_a"),
        F.size("vb").cast("long").alias("n_tokens_b"),
        fp("va").alias("view_a_fp"),
        fp("vb").alias("view_b_fp"),
        (fp("va") != fp("vb")).alias("views_differ"),
    )


_JARQUE_BERA_ORACLE = """
    WITH v AS (
        SELECT CAST(floor(CASE WHEN isfinite(value) AND abs(value) < 1e13 THEN value END * 100 + 0.5) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL
    ),
    mo AS (
        SELECT count(*) AS n, sum(c) AS s1, sum(c * c) AS s2,
               sum(c * c * c) AS s3,
               sum(CAST(c * c AS HUGEINT) * CAST(c * c AS HUGEINT)) AS s4
        FROM v
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(s1 AS BIGINT) AS sum_cents,
           (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s3 AS DOUBLE)
            - 3e0 * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE)
                  * CAST(s2 AS DOUBLE)
            + 2e0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                  * CAST(s1 AS DOUBLE))
           / sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
               AS skewness,
           (CAST(n AS DOUBLE)
            * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s4 AS DOUBLE)
               - 4e0 * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE)
                     * CAST(s3 AS DOUBLE)
               + 6e0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                     * CAST(s2 AS DOUBLE)
               - 3e0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                     * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                     / CAST(n AS DOUBLE)))
           / ((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
               - 3e0 AS excess_kurtosis
    FROM mo
"""


@register(
    "a31_skewness_kurtosis",
    "Distribution-shape diagnostics (the Jarque-Bera ingredients): "
    "population skewness and excess kurtosis of event spend from "
    "EXACT integer power sums — s1..s3 in int64 (cents^3 x 1e6 rows "
    "stays under 2^63), and s4 (cents^4 overflows int64) in 128-bit "
    "integer arithmetic: decimal(38,0) products in Spark, HUGEINT in "
    "DuckDB — every moment is an exact order-free integer, and only "
    "the closing skew/kurtosis shapes touch IEEE doubles (one "
    "identical-bits cast of each exact total, then fixed-form "
    "+-*/sqrt — the a20/a22 discipline). Heavy-tail screening before "
    "trusting any Gaussian-based test in the a-family.",
    oracle=_JARQUE_BERA_ORACLE,
    tags=("ext", "stats", "moments", "shape"),
)
def a31_skewness_kurtosis(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    c = F.floor(fin("value") * 100 + 0.5).cast("long")
    v = ev.select(c.alias("c"))
    mo = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.sum(F.col("c") * F.col("c") * F.col("c")).alias("s3"),
        F.sum(
            (F.col("c") * F.col("c")).cast("decimal(38,0)")
            * (F.col("c") * F.col("c")).cast("decimal(38,0)")
        ).alias("s4"),
    )
    d = lambda x: F.col(x).cast("double")  # noqa: E731
    m2n = d("n") * d("s2") - d("s1") * d("s1")
    skew = (
        d("n") * d("n") * d("s3")
        - F.lit(3.0) * d("n") * d("s1") * d("s2")
        + F.lit(2.0) * d("s1") * d("s1") * d("s1")
    ) / F.sqrt(m2n * m2n * m2n)
    kurt = (
        d("n")
        * (
            d("n") * d("n") * F.col("s4").cast("double")
            - F.lit(4.0) * d("n") * d("s1") * d("s3")
            + F.lit(6.0) * d("s1") * d("s1") * d("s2")
            - F.lit(3.0) * d("s1") * d("s1") * d("s1") * d("s1") / d("n")
        )
    ) / (m2n * m2n) - F.lit(3.0)
    return mo.select(
        F.col("n").cast("long").alias("n"),
        F.col("s1").cast("long").alias("sum_cents"),
        skew.alias("skewness"),
        kurt.alias("excess_kurtosis"),
    )


_CLUSTER_SAMPLE_ORACLE = """
    WITH fp AS (
        SELECT doc_id, source,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS f
        FROM documents WHERE text IS NOT NULL
    ),
    grp AS (
        SELECT source, f, count(*) AS copies, min(doc_id) AS keeper
        FROM fp GROUP BY source, f
    ),
    src AS (
        SELECT source,
               count(*) AS n_unique,
               sum(copies) AS n_raw
        FROM grp GROUP BY source
    ),
    tot AS (SELECT sum(n_raw) AS raw_total FROM src),
    alloc AS (
        SELECT s.source, s.n_unique, s.n_raw,
               (s.n_raw * 100) // t.raw_total AS base_quota,
               (s.n_raw * 100) % t.raw_total AS rem
        FROM src s CROSS JOIN tot t
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (ORDER BY rem DESC, source) AS rr,
               100 - sum(base_quota) OVER () AS leftover
        FROM alloc
    )
    SELECT source,
           CAST(n_unique AS BIGINT) AS n_unique,
           CAST(n_raw AS BIGINT) AS n_raw,
           CAST(base_quota + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS sample_quota
    FROM ranked
"""


@register(
    "x244_cluster_weighted_sample",
    "Dedup-aware sample allocation: exact deduplication changes the "
    "source mixture (template-heavy sources shrink), so a post-dedup "
    "eval sample drawn uniformly from SURVIVORS misrepresents the "
    "raw distribution — this entry allocates a 100-doc budget across "
    "sources proportional to RAW (pre-dedup) mass using the largest-"
    "remainder method (x144's exact integer apportionment: floor "
    "quotas + the remainder ranking hands out the leftover, total "
    "exactly 100 — pinned by test), with per-source unique/raw "
    "counts beside the quota so the duplication factor is visible. "
    "One fingerprint groupBy + source rollup; the remainder window "
    "runs over source cardinality.",
    oracle=_CLUSTER_SAMPLE_ORACLE,
    tags=("ext", "sampling", "dedup", "mixture"),
)
def x244_cluster_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    fp = docs.select(
        "doc_id",
        "source",
        F.md5(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
        ).alias("f"),
    )
    grp = fp.groupBy("source", "f").agg(
        F.count(F.lit(1)).alias("copies"), F.min("doc_id").alias("keeper")
    )
    src = grp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_unique"), F.sum("copies").alias("n_raw")
    )
    tot = src.agg(F.sum("n_raw").alias("raw_total"))
    alloc = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_unique",
        "n_raw",
        F.expr("(n_raw * 100) DIV raw_total").alias("base_quota"),
        F.expr("(n_raw * 100) % raw_total").alias("rem"),
    )
    wr = Window.orderBy(F.desc("rem"), "source")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = alloc.select(
        "source",
        "n_unique",
        "n_raw",
        "base_quota",
        F.row_number().over(wr).alias("rr"),
        (F.lit(100) - F.sum("base_quota").over(wall)).alias("leftover"),
    )
    return ranked.select(
        "source",
        F.col("n_unique").cast("long").alias("n_unique"),
        F.col("n_raw").cast("long").alias("n_raw"),
        (
            F.col("base_quota")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        ).cast("long").alias("sample_quota"),
    )


_PERM_AUDIT_ORACLE = """
    WITH d AS (
        SELECT doc_id, text,
               array_to_string(list_sort(
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '')), ' ') AS permuted
        FROM documents WHERE text IS NOT NULL
    ),
    fps AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS fp_orig,
               md5(permuted) AS fp_perm,
               md5(array_to_string(list_sort(
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '')), ' ')) AS bag_orig,
               md5(array_to_string(list_sort(
                   list_filter(string_split_regex(lower(permuted), '\\s+'),
                               t -> t <> '')), ' ')) AS bag_perm
        FROM d
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN fp_orig = fp_perm THEN 1 ELSE 0 END)
                AS BIGINT) AS exact_fp_catches,
           CAST(sum(CASE WHEN bag_orig = bag_perm THEN 1 ELSE 0 END)
                AS BIGINT) AS bag_fp_catches
    FROM fps
"""


@register(
    "x245_permutation_dedup_audit",
    "Detector-sensitivity audit: every document is paired with its "
    "word-sorted permutation (a trivially-rewritten duplicate an "
    "adversary or a scraper reflow produces for free) and each dedup "
    "fingerprint is scored on whether it still matches — the exact "
    "text fingerprint (x4/x5's key) catches only already-sorted "
    "docs, while the sorted-bag fingerprint catches ALL of them by "
    "construction; the two counts quantify exactly how much of the "
    "dedup surface is order-fragile (the shingle/MinHash tiers sit "
    "between, degrading with shingle order). Permuted twins are "
    "built in-query (the x81 constructed-input discipline), so the "
    "audit is self-contained and hash-verified. Pure projection + "
    "one global aggregate.",
    oracle=_PERM_AUDIT_ORACLE,
    tags=("ext", "dedup", "audit", "adversarial"),
)
def x245_permutation_dedup_audit(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    words_sorted = F.array_join(
        F.array_sort(F.filter(TX.words("text"), lambda t: t != "")), " "
    )
    d = docs.select("doc_id", "text", words_sorted.alias("permuted"))
    bag = lambda col: F.md5(  # noqa: E731
        F.array_join(
            F.array_sort(
                F.filter(TX.words(col), lambda t: t != "")
            ),
            " ",
        )
    )
    fps = d.select(
        F.md5(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
        ).alias("fp_orig"),
        F.md5("permuted").alias("fp_perm"),
        bag("text").alias("bag_orig"),
        bag("permuted").alias("bag_perm"),
    )
    return fps.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("fp_orig") == F.col("fp_perm"), 1).otherwise(0)
        ).cast("long").alias("exact_fp_catches"),
        F.sum(
            F.when(F.col("bag_orig") == F.col("bag_perm"), 1).otherwise(0)
        ).cast("long").alias("bag_fp_catches"),
    )


def _ivf_sweep_sql(np_: int, p: str) -> str:
    """IVF top-3 per probe at ``nprobe`` = np_, CTE names prefixed with
    ``p`` (mirrors the x14 oracle with a parametric probe fan-out)."""
    return f"""
    {p}probes AS (
        SELECT vec_id AS probe_id, v AS probe_vec, cell
        FROM cellsim WHERE rn <= {np_} AND vec_id < 8
    ),
    {p}scored AS (
        SELECT pr.probe_id, a.neighbor_id,
               {sql_cosine('pr.probe_vec', 'a.cand_vec')} AS cos_sim
        FROM assigned a JOIN {p}probes pr USING (cell)
        WHERE a.neighbor_id <> pr.probe_id
    ),
    {p}top AS (
        SELECT probe_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY probe_id
                ORDER BY cos_sim DESC, neighbor_id) AS rank
            FROM {p}scored
        ) WHERE rank <= 3
    ),
    {p}rec AS (
        SELECT CAST({np_} AS BIGINT) AS nprobe,
               count(*) AS n_hits
        FROM {p}top t JOIN btop b
          ON t.probe_id = b.probe_id AND t.neighbor_id = b.neighbor_id
    )"""


_IVF_SWEEP_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    cent AS (
        SELECT vec_id AS cell, v AS cv,
               sqrt(list_reduce(list_transform(v, x -> x * x),
                                (a, b) -> a + b)) AS cnorm
        FROM c
        WHERE vec_id IN (SELECT vec_id FROM c ORDER BY vec_id LIMIT 16)
    ),
    cellsim AS (
        SELECT c.vec_id, c.v, cent.cell,
               row_number() OVER (PARTITION BY c.vec_id
                                  ORDER BY {SQL_DOT.format(a='c.v', b='cent.cv')}
                                           / cent.cnorm DESC,
                                           cent.cell DESC) AS rn
        FROM c CROSS JOIN cent
    ),
    assigned AS (
        SELECT vec_id AS neighbor_id, v AS cand_vec, cell
        FROM cellsim WHERE rn = 1
    ),
    bprobes AS (
        SELECT vec_id AS probe_id, v AS probe_vec FROM c WHERE vec_id < 8
    ),
    bscored AS (
        SELECT p.probe_id, x.vec_id AS neighbor_id,
               {sql_cosine('p.probe_vec', 'x.v')} AS cos_sim
        FROM bprobes p CROSS JOIN c x
        WHERE x.vec_id <> p.probe_id
    ),
    btop AS (
        SELECT probe_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY probe_id
                ORDER BY cos_sim DESC, neighbor_id) AS rank
            FROM bscored
        ) WHERE rank <= 3
    ),{_ivf_sweep_sql(1, 's1_')},{_ivf_sweep_sql(2, 's2_')},{_ivf_sweep_sql(4, 's4_')},
    -- the denominator is the ACTUAL truth-set size (|btop|, what the
    -- Spark side counts), not the nominal probes x 3: a corpus smaller
    -- than k+1 vectors has fewer true neighbors than the nominal count
    -- (one-row-input parity, round 10; equal whenever the corpus holds
    -- more than k vectors)
    denom AS (SELECT count(*) AS n_truth FROM btop)
    SELECT r.nprobe,
           CAST(r.n_hits AS BIGINT) AS n_hits,
           CAST(d.n_truth AS BIGINT) AS n_truth,
           CAST(coalesce(r.n_hits * 1000000 // nullif(d.n_truth, 0), 0)
                AS BIGINT) AS recall_ppm
    FROM (SELECT * FROM s1_rec UNION ALL SELECT * FROM s2_rec
          UNION ALL SELECT * FROM s4_rec) r
    CROSS JOIN denom d
"""


@register(
    "x246_ivf_nprobe_recall_sweep",
    "IVF tuning curve: recall@3 against exact brute-force truth at "
    "nprobe = 1, 2, 4 in ONE pass over a shared cell assignment — the "
    "measured accuracy/cost frontier that picks nprobe BEFORE a "
    "100 TB index build (x160 sweeps the LSH banding threshold; this "
    "sweeps the IVF probe width — together they tune both ANN "
    "families from data). The quantizer, fan-out, and ranking are "
    "x14's deterministic machinery, so every point on the curve is "
    "hash-verified; recall is exact integer ppm over the 8-probe x "
    "top-3 truth set. The brute truth is probe-broadcast-sized (8 "
    "rows x corpus — the same bounded shape as x10). r8 rework made "
    "the one-pass claim literal: probes fan out once at the WIDEST "
    "nprobe with their cell rank, a candidate probed at rank r is "
    "visible to every nprobe >= r, and the three sweep points are "
    "filters over one scored candidate set (was 3x ivf_topk = three "
    "centroid expression trees + three probe joins; 2x measured).",
    oracle=_IVF_SWEEP_ORACLE,
    tags=("ext", "similarity", "ann", "tuning"),
)
def x246_ivf_nprobe_recall_sweep(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = load_table(spark, sf, "embeddings").persist()
    probes = emb.filter(F.col("vec_id") < 8)
    truth = S.brute_force_topk(emb, probes, k=3).select(
        "probe_id", "neighbor_id"
    ).persist()
    n_truth = truth.count()  # 8 probes x 3 — bounded scalar
    # ONE shared pass (r8 rework, was 3x ivf_topk: three centroid
    # expression trees, three probe joins — 8.3 -> ~1.5 s at sf0.1):
    # the corpus cell assignment and the probe fan-out are computed
    # once at the WIDEST nprobe; a candidate probed via the probe's
    # pos-th cell is visible to every nprobe >= pos, so the three
    # sweep points are filters over one scored candidate set.
    cents = S.ivf_centroids(emb)
    if not cents:
        # empty corpus: no quantizer exists (the ivf_topk guard) — emit
        # the sweep spine with zero hits instead of an unresolvable
        # zero-width centroid array expression
        spine = spark.createDataFrame([(1,), (2,), (4,)], "nprobe int")
        # n_truth is necessarily 0 on this branch (empty corpus -> empty
        # probes -> empty truth), so 0*1e6/n_truth would be 0/0 -> NULL
        # under the pinned non-ANSI mode (ADVICE r8). Recall over an
        # empty truth set is vacuously 0 — emit the literal.
        return spine.select(
            F.col("nprobe").cast("long").alias("nprobe"),
            F.lit(0).cast("long").alias("n_hits"),
            F.lit(n_truth).cast("long").alias("n_truth"),
            F.lit(0).cast("long").alias("recall_ppm"),
        )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cand_vec"),
        S.norm(F.col("embedding")).alias("cand_norm"),
        F.element_at(
            S.ivf_nearest_cells(cents, "embedding", 1), 1
        ).alias("cell"),
    )
    p = probes.select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        S.norm(F.col("embedding")).alias("probe_norm"),
        F.posexplode(
            S.ivf_nearest_cells(cents, "embedding", 4)
        ).alias("pos", "cell"),
    )
    swept = (
        c.join(F.broadcast(p), "cell")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            # per-row norms hoisted above the pair join (r11, same
            # bit-identical rework as similarity.brute_force_topk)
            (
                S.dot(F.col("probe_vec"), F.col("cand_vec"))
                / (F.col("probe_norm") * F.col("cand_norm"))
            ).alias("cos_sim"),
            F.explode(
                F.filter(
                    F.array(F.lit(1), F.lit(2), F.lit(4)),
                    lambda v: v > F.col("pos"),  # pos is 0-based
                )
            ).alias("nprobe"),
        )
    )
    w = Window.partitionBy("nprobe", "probe_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    hits = (
        swept.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .join(truth, ["probe_id", "neighbor_id"])
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    # literal sweep spine: a zero-hit nprobe still emits its row (the
    # oracle's per-point aggregates always produce one row each)
    spine = spark.createDataFrame([(1,), (2,), (4,)], "nprobe int")
    # n_truth is a driver-side int: when the corpus is smaller than k+1
    # vectors the truth set is empty even though a quantizer exists —
    # recall over an empty truth set is the vacuous 0, same convention
    # as the empty-corpus branch and the oracle's nullif/coalesce
    # (one-row-input parity, round 10)
    recall = (
        (F.coalesce(F.col("n_hits"), F.lit(0)) * 1000000 / F.lit(n_truth))
        if n_truth
        else F.lit(0)
    )
    return (
        F.broadcast(spine)
        .join(hits, "nprobe", "left")
        .select(
            F.col("nprobe").cast("long").alias("nprobe"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.lit(n_truth).cast("long").alias("n_truth"),
            recall.cast("long").alias("recall_ppm"),
        )
    )


_KAPPA_ORACLE = """
    WITH lf AS (
        SELECT CASE WHEN len(list_filter(
                   string_split_regex(lower(text), '\\s+'),
                   t -> t IN ('the', 'and', 'is', 'of', 'to', 'in',
                              'that', 'it'))) >= 2
                    THEN 1 ELSE 0 END AS a,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS b
        FROM documents WHERE text IS NOT NULL
    ),
    c AS (
        SELECT count(*) AS n,
               sum(a * b) AS n11,
               sum(a * (1 - b)) AS n10,
               sum((1 - a) * b) AS n01,
               sum((1 - a) * (1 - b)) AS n00
        FROM lf
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
           CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
           CAST(n * (n11 + n00)
                - ((n11 + n10) * (n11 + n01)
                   + (n01 + n00) * (n10 + n00)) AS BIGINT) AS kappa_num,
           CAST(n * n
                - ((n11 + n10) * (n11 + n01)
                   + (n01 + n00) * (n10 + n00)) AS BIGINT) AS kappa_den
    FROM c
"""


@register(
    "x247_cohens_kappa",
    "Cohen's kappa between the stopword labeling function and the "
    "metadata lang label: chance-corrected agreement — x226's raw "
    "agreement counts flatter correlated-but-uninformative LFs "
    "(two raters who both say 'yes' 90% of the time agree 82% by "
    "luck); kappa subtracts exactly that. Cleared to the exact int64 "
    "fraction kappa = (n*agree - chance)/(n^2 - chance) where chance "
    "= sum of marginal products — no float anywhere, the num/den "
    "pair IS the statistic (consumer divides, or compares fractions "
    "cross-multiplied). One conditional-aggregation pass.",
    oracle=_KAPPA_ORACLE,
    tags=("ext", "weak-supervision", "agreement", "exact-stats"),
)
def x247_cohens_kappa(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    lf = docs.select(
        F.when(
            TX.stopword_hits(TX.words("text"), _EN_SW) >= 2, 1
        ).otherwise(0).alias("a"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("b"),
    )
    c = lf.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("a") * F.col("b")).alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("n00"),
    )
    chance = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    return c.select(
        F.col("n").cast("long").alias("n"),
        F.col("n11").cast("long").alias("n11"),
        F.col("n10").cast("long").alias("n10"),
        F.col("n01").cast("long").alias("n01"),
        F.col("n00").cast("long").alias("n00"),
        (F.col("n") * (F.col("n11") + F.col("n00")) - chance)
        .cast("long").alias("kappa_num"),
        (F.col("n") * F.col("n") - chance).cast("long").alias("kappa_den"),
    )


_IVF_BALANCE_ORACLE = f"""
    WITH c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    cent AS (
        SELECT vec_id AS cell, v AS cv,
               sqrt(list_reduce(list_transform(v, x -> x * x),
                                (a, b) -> a + b)) AS cnorm
        FROM c
        WHERE vec_id IN (SELECT vec_id FROM c ORDER BY vec_id LIMIT 16)
    ),
    assigned AS (
        SELECT vec_id, cell FROM (
            SELECT c.vec_id, cent.cell,
                   row_number() OVER (PARTITION BY c.vec_id
                       ORDER BY {SQL_DOT.format(a='c.v', b='cent.cv')}
                                / cent.cnorm DESC,
                                cent.cell DESC) AS rn
            FROM c CROSS JOIN cent
        ) WHERE rn = 1
    ),
    sz AS (
        SELECT cent.cell, count(a.vec_id) AS n_vectors
        FROM cent LEFT JOIN assigned a USING (cell)
        GROUP BY cent.cell
    ),
    t AS (SELECT sum(n_vectors) AS total, max(n_vectors) AS mx FROM sz)
    SELECT CAST(sz.cell AS BIGINT) AS cell,
           CAST(sz.n_vectors AS BIGINT) AS n_vectors,
           CAST(sz.n_vectors * 16 * 1000000 // t.total AS BIGINT)
               AS load_ppm_of_ideal,
           CAST(t.mx * 16 * 1000000 // t.total AS BIGINT)
               AS max_load_ppm_of_ideal
    FROM sz CROSS JOIN t
"""


@register(
    "x248_ivf_cell_balance",
    "IVF index balance report: vectors per cell under x14's "
    "deterministic coarse quantizer, each cell's load as exact-ppm "
    "of the total/16 ideal with the max-cell headline — the ANN-"
    "index analogue of k7's shuffle-skew report: a hot cell is a "
    "probe-latency straggler (every query probing it scans its whole "
    "posting list) and the signal to retrain the quantizer or split "
    "the cell before a 100 TB index build; read beside x246's recall "
    "curve, this is the cost half of the accuracy/cost frontier. "
    "Empty cells emit zero rows via the centroid left join — "
    "invisible-empty cells would understate imbalance. One "
    "assignment projection + one cell groupBy.",
    oracle=_IVF_BALANCE_ORACLE,
    tags=("ext", "similarity", "ann", "ops"),
)
def x248_ivf_cell_balance(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    # NULL vectors are excluded (engine-wide vector-NULL convention,
    # round 11) — the oracle carries the explicit IS NOT NULL twin
    emb = load_table(spark, sf, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    c = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).persist()
    cent = (
        c.orderBy("vec_id")
        .limit(16)
        .select(
            F.col("vec_id").alias("cell"),
            F.col("v").alias("cv"),
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("v"), lambda x: x * x),
                    F.lit(0.0),
                    lambda a, b: a + b,
                )
            ).alias("cnorm"),
        )
    )
    sim = S.dot(F.col("v"), F.col("cv")) / F.col("cnorm")
    w = Window.partitionBy("vec_id").orderBy(
        F.desc(sim), F.desc("cell")
    )
    assigned = (
        c.crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )
    sz = (
        cent.select("cell")
        .join(assigned, "cell", "left")
        .groupBy("cell")
        .agg(F.count("vec_id").alias("n_vectors"))
    )
    t = sz.agg(
        F.sum("n_vectors").alias("total"), F.max("n_vectors").alias("mx")
    )
    return sz.crossJoin(F.broadcast(t)).select(
        F.col("cell").cast("long").alias("cell"),
        F.col("n_vectors").cast("long").alias("n_vectors"),
        F.expr("n_vectors * 16 * 1000000 DIV total").cast("long")
        .alias("load_ppm_of_ideal"),
        F.expr("mx * 16 * 1000000 DIV total").cast("long")
        .alias("max_load_ppm_of_ideal"),
    )


_DEDUP_SAVINGS_ORACLE = """
    WITH fp AS (
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS f
        FROM documents WHERE text IS NOT NULL
    ),
    grp AS (
        SELECT f, count(*) AS k FROM fp GROUP BY f
    ),
    by_k AS (
        SELECT k, count(*) AS n_clusters,
               k * count(*) AS n_docs,
               (k - 1) * count(*) AS n_removable
        FROM grp GROUP BY k
    ),
    tot AS (SELECT sum(n_docs) AS total_docs FROM by_k)
    SELECT CAST(b.k AS BIGINT) AS cluster_size,
           CAST(b.n_clusters AS BIGINT) AS n_clusters,
           CAST(b.n_docs AS BIGINT) AS n_docs,
           CAST(b.n_removable AS BIGINT) AS n_removable,
           CAST(b.n_docs * 1000000 // t.total_docs AS BIGINT)
               AS corpus_share_ppm
    FROM by_k b CROSS JOIN tot t
"""


@register(
    "x249_dedup_savings_profile",
    "Dedup savings forecast: the exact-duplicate cluster-SIZE "
    "distribution — for each size k, how many clusters, how many "
    "documents they hold, and how many are removable ((k-1) per "
    "cluster) with each size's exact-ppm corpus share — the number a "
    "dedup job promises BEFORE it runs, and the shape (a heavy tail "
    "of giant clusters vs scattered pairs) that decides whether "
    "exact dedup alone is worth the pass or near-dup (x7/x85) is "
    "needed. Frequency-of-frequencies over the fingerprint groupBy "
    "(x238's rollup applied to clusters); output is cluster-size "
    "cardinality — tiny at any corpus scale.",
    oracle=_DEDUP_SAVINGS_ORACLE,
    tags=("ext", "dedup", "planning", "profile"),
)
def x249_dedup_savings_profile(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").filter(F.col("text").isNotNull())
    fp = docs.select(
        F.md5(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
        ).alias("f")
    )
    grp = fp.groupBy("f").agg(F.count(F.lit(1)).alias("k"))
    by_k = grp.groupBy("k").agg(F.count(F.lit(1)).alias("n_clusters"))
    tot = by_k.agg(F.sum(F.col("k") * F.col("n_clusters")).alias("total_docs"))
    return by_k.crossJoin(F.broadcast(tot)).select(
        F.col("k").cast("long").alias("cluster_size"),
        F.col("n_clusters").cast("long").alias("n_clusters"),
        (F.col("k") * F.col("n_clusters")).cast("long").alias("n_docs"),
        ((F.col("k") - 1) * F.col("n_clusters")).cast("long")
        .alias("n_removable"),
        F.expr("k * n_clusters * 1000000 DIV total_docs").cast("long")
        .alias("corpus_share_ppm"),
    )


_NONFINITE_AUDIT_ORACLE = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT) AS n_null,
           CAST(count(*) FILTER (WHERE isnan(value)) AS BIGINT) AS n_nan,
           CAST(count(*) FILTER (WHERE abs(value) = 'Infinity'::DOUBLE)
                AS BIGINT) AS n_inf,
           CAST(count(*) FILTER (WHERE isfinite(value)
                                   AND abs(value) >= 1e13)
                AS BIGINT) AS n_overflow,
           CAST(count(*) FILTER (WHERE isfinite(value)
                                   AND abs(value) < 1e13)
                AS BIGINT) AS n_usable,
           min(CASE WHEN isfinite(value) AND abs(value) < 1e13
                    THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END)
               AS usable_min_cents,
           max(CASE WHEN isfinite(value) AND abs(value) < 1e13
                    THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END)
               AS usable_max_cents
    FROM events
    GROUP BY event_type
"""


@register(
    "x250_nonfinite_value_audit",
    "Out-of-domain payload audit — the gate in front of the exact-"
    "decimal (cents) arithmetic tier: per event type, counts of NULL "
    "/ NaN / +-Inf / overflow (finite but |x| >= 1e13, where the "
    "value*100 DOUBLE multiply itself stops being integer-exact: "
    "2^53/100) / usable values, plus the usable range in exact cents. "
    "The fixed-point idioms (a12/a20-a31, the w-family walks, the "
    "k-means/PQ quantizers) are DEFINED on in-domain inputs — a NaN "
    "or 1e23 reaching floor(value*100)::BIGINT raises in ANSI engines "
    "and silently folds/clamps in others, so production pipelines run "
    "THIS audit (and x251's screen) at ingest, once, instead of "
    "paying the guard per row in every downstream query. One "
    "partial-agg groupBy over the type key — |event_types| rows out "
    "at any scale. NaN checks avoid cross-engine NaN equality: "
    "isnan() plus abs() comparisons, defined identically in Spark "
    "and DuckDB (NaN compares greater than everything in both).",
    oracle=_NONFINITE_AUDIT_ORACLE,
    tags=("ext", "quality", "audit", "nonfinite"),
)
def x250_nonfinite_value_audit(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    v = F.col("value")
    inf = F.lit(float("inf"))
    is_nan = F.isnan(v)
    is_inf = F.abs(v) == inf
    finite = v.isNotNull() & ~is_nan & ~is_inf
    overflow = finite & (F.abs(v) >= F.lit(1e13))
    usable = finite & (F.abs(v) < F.lit(1e13))
    cents = F.floor(v * 100 + F.lit(0.5)).cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(v.isNull(), 1)).cast("long").alias("n_null"),
        F.count(F.when(is_nan, 1)).cast("long").alias("n_nan"),
        F.count(F.when(is_inf, 1)).cast("long").alias("n_inf"),
        F.count(F.when(overflow, 1)).cast("long").alias("n_overflow"),
        F.count(F.when(usable, 1)).cast("long").alias("n_usable"),
        F.min(F.when(usable, cents)).alias("usable_min_cents"),
        F.max(F.when(usable, cents)).alias("usable_max_cents"),
    )


_NONFINITE_SCREEN_ORACLE = """
    SELECT event_id,
           event_type,
           CASE WHEN isfinite(value) AND abs(value) < 1e13
                THEN value END AS value_clean,
           (value IS NOT NULL AND NOT (isfinite(value)
             AND abs(value) < 1e13)) AS was_screened
    FROM events
"""


@register(
    "x251_nonfinite_screen",
    "Out-of-domain payload screen — the ingest-time cleaning op the "
    "x250 audit motivates: NaN, +-Inf, and |x| >= 1e13 overflow "
    "values map to NULL (value_clean), with a was_screened provenance "
    "flag so downstream can count what was removed. After this pass the whole exact-decimal tier's "
    "finite-inputs contract holds by construction and every SQL "
    "aggregate ignores the screened rows like any other NULL — the "
    "same treat-failed-payloads-as-NULL convention the round-11 NULL "
    "wave established for text and vectors. Pure projection, zero "
    "shuffle; at 100 TB this runs once inside the ingest write, not "
    "per query.",
    oracle=_NONFINITE_SCREEN_ORACLE,
    tags=("ext", "quality", "cleaning", "nonfinite"),
)
def x251_nonfinite_screen(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    v = F.col("value")
    usable = ~F.isnan(v) & (F.abs(v) < F.lit(1e13))
    return ev.select(
        "event_id",
        "event_type",
        F.when(v.isNotNull() & usable, v).alias("value_clean"),
        (v.isNotNull() & ~usable).alias("was_screened"),
    )
