"""Deduplication operators over document tables (driver extension tier):
exact content-hash dedup, word-shingle Jaccard near-dup, MinHash+LSH,
SimHash — all as native Spark SQL plans (no UDFs).

Scale design (the point of each variant):

- **exact**: shuffle key is a 16-byte md5 of normalized text, never the
  text itself — at 100 TB the dedup shuffle moves hashes, not documents.
- **shingle Jaccard**: exact pairwise similarity, but blocked on shared
  shingles so the join only materializes candidate pairs; quadratic in
  the worst case → the test-scale/verification tool.
- **MinHash LSH**: the 100 TB path. Signatures are computed in a pure
  projection (higher-order ``transform``/``array_min`` over the shingle
  array — zero shuffle), then one shuffle groups docs by (band, band
  hash); only same-bucket pairs are joined. Cost is O(n·k) + bucket
  joins instead of O(n²).
- **SimHash**: constant-size signature per doc, also projection-only;
  near-dups = signatures at small Hamming distance, LSH-able by nibble.

Portability (DuckDB oracle twins in plans/ext_catalog.py): the base
token/shingle hash is the first 8 hex digits of md5 → bigint, identical
in any engine with md5; the k MinHash functions are fixed-constant
universal hashes ``(a·H + b) mod p``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Universal-hash constants for MinHash: k=16 fixed (a, b) pairs drawn once,
# prime modulus > 2^32. Every ``a`` is an odd prime < 2^30 so a·H stays
# under 2^62 for H < 2^32 — int64-safe in any engine (DuckDB raises on
# bigint overflow; Spark would silently wrap). Hardcoded so Spark plans and
# oracle SQL agree forever.
MINHASH_PRIME = 4_294_967_311
MINHASH_COEFFS: tuple[tuple[int, int], ...] = (
    (805_306_457, 2_654_435_761),
    (402_653_189, 201_326_611),
    (201_326_611, 1_566_374_653),
    (100_663_319, 97_531),
    (50_331_653, 3_266_489_917),
    (536_870_923, 198_491_317),
    (268_435_459, 805_306_457),
    (134_217_757, 40_503),
    (67_108_879, 1_131_217_927),
    (33_554_467, 679_306_543),
    (16_777_259, 2_246_822_519),
    (8_388_617, 3_366_900_941),
    (4_194_319, 600_851_475),
    (2_097_169, 1_274_126_177),
    (1_048_583, 2_869_860_233),
    (524_309, 1_540_483_477),
)
LSH_BANDS = 4  # 16 hashes → 4 bands × 4 rows


def base_hash(col: Column) -> Column:
    """Portable 32-bit-ish string hash: first 8 md5 hex digits as bigint.
    Identical in Spark (conv) and DuckDB (0x cast) — the cross-engine
    anchor for every MinHash/SimHash below."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def bind_once(col: Column, fn) -> Column:
    """Let-binding for column expressions: evaluate ``col`` once per row
    and pass the bound value to ``fn``.

    Spark SQL has no LET, and referencing the same Python-built Column in
    N places duplicates its whole expression tree N times — interpreted
    higher-order functions then genuinely recompute it N times per row
    (measured 16× on the MinHash bank: 43 s → <3 s at sf0.1). A
    single-element ``transform`` gives a true lambda binding that both the
    interpreter and codegen evaluate exactly once.
    """
    return F.element_at(F.transform(F.array(col), fn), 1)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of lowercased text; documents shorter
    than n words contribute their full text as one shingle.

    NULL text shingles to NULL (round 11, the text-NULL convention): a
    document with no text has no shingle set, so it participates in no
    similarity — every downstream ``explode`` emits nothing for it and
    every set-arithmetic expression over its shingles is NULL, which the
    threshold filters drop. Without this, ``concat_ws`` swallowed the
    NULL into the empty-string shingle {""} and every pair of NULL-text
    documents scored Jaccard 1.0 (the round-10 NULL-payload audit).

    The word array is let-bound: referencing the raw ``split`` expression
    inside the gram lambda re-tokenizes the document once PER GRAM
    (O(words²) — measured 3.7 s → 0.35 s on 5k sf0.1 docs), the same
    16×-reevaluation trap :func:`bind_once` documents for the MinHash
    bank. Grams index the bound array with O(1) ``element_at`` rather
    than allocating an n-element ``slice`` per position."""
    w = F.split(F.lower(text), r"\s+")

    def grams(ww: Column) -> Column:
        gs = F.transform(
            F.sequence(F.lit(1), F.size(ww) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(ww, i + j) for j in range(n)]
            ),
        )
        # NULL guard INSIDE the bound lambda (on the let-bound word
        # array, so split(NULL) -> NULL words -> NULL shingles), NOT as
        # an outer F.when around the whole expression: a top-level
        # CaseWhen wrapper de-optimizes every consumer, because Spark's
        # subexpression elimination refuses to extract from conditional
        # branches — the first r11 shape cost x8 20x in-suite (clean
        # standalone; BASELINE.md round-11 note)
        return F.when(
            ww.isNotNull(),
            F.array_distinct(
                F.when(F.size(ww) >= n, gs).otherwise(
                    F.array(F.concat_ws(" ", ww))
                )
            ),
        )

    return bind_once(w, grams)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content-hash groups: one row per distinct normalized text with the
    keeper id (min id — deterministic) and the duplicate count."""
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return (
        df.select(F.md5(normalized).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(id_col).alias("copies"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row per distinct normalized text (the min-id row).

    Window-free formulation: groups → semi join back on (hash, keeper id).
    At scale both sides shuffle once on the 16-byte hash.
    """
    groups = exact_dedup_groups(df, text_col, id_col)
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    keyed = df.withColumn("content_hash", F.md5(normalized))
    return (
        keyed.join(
            groups.select("content_hash", F.col("keeper_id").alias(id_col)),
            on=["content_hash", id_col],
            how="left_semi",
        )
    ).drop("content_hash")


# ---------------------------------------------------------------------------
# shingle-Jaccard near-dup (exact, blocked)
# ---------------------------------------------------------------------------


# Blocking cap: shingles appearing in more documents than this are dropped
# from CANDIDATE GENERATION (never from the Jaccard itself). An ultra-common
# shingle ("terms of service apply") otherwise creates one quadratic block —
# df docs → df²/2 joined pairs on a single reducer, the classic skew blowup.
# Pairs whose every shared shingle is above the cap are boilerplate-only
# overlap by definition (the standard frequent-shingle trick). 1024 is far
# above any doc frequency in the test fixtures (≤500 docs at sf0.01), so
# oracle results are unchanged there while the worst block at scale is
# bounded at ~0.5M pairs.
MAX_SHINGLE_DF = 1024


def jaccard_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact word-n-gram Jaccard over shingle-blocked candidate pairs.

    Candidates = pairs sharing ≥1 shingle with doc-frequency ≤
    ``max_shingle_df`` (``None`` disables the cap). The Jaccard itself is
    EXACT regardless of the cap: |A∩B| splits into the rare part — counted
    directly by the blocking self-join's group-by, since shingles are
    per-doc distinct — plus the frequent part, recovered from the per-doc
    FREQUENT-shingle arrays (tiny: ≥cap docs each, so few distinct values
    exist). Capping only prunes which pairs are considered — never their
    scores. Output: (doc_a, doc_b, jaccard), doc_a < doc_b.

    Scale shape: the pair-scoring path never ships a full shingle array —
    candidates carry (id, id, count) plus two int sizes and two small
    frequent-arrays; the old formulation (array_intersect of the full
    arrays per pair) re-shuffled every document's whole shingle set per
    candidate and measured 4× slower at sf0.1. Since r12 the per-doc
    set sizes RIDE the blocked shingle rows through the self-join and
    come out of the pair aggregation (min over the functionally-
    dependent n_sh), deleting the two post-aggregation size joins the
    r11 verdict flagged — one int per exploded row buys back two
    data-scaled exchanges (guide §2.4; A/B 3.09 → 2.88 s min-of-5,
    identical pairs).
    """
    # the doc→shingle-array index feeds candidate generation and the
    # per-doc set sizes; persist so shingling runs once — at scale this is
    # the materialized index every pass shares
    docs = (
        df.select(
            F.col(id_col).alias("doc"),
            word_shingles(F.col(text_col), n).alias("shs"),
        )
        .withColumn("n_sh", F.size("shs"))
        .persist()
    )
    sh = docs.select("doc", "n_sh", F.explode("shs").alias("s"))
    if max_shingle_df is not None:
        # anti-join against the FREQUENT set, not inner-join against the
        # rare set: heavy hitters are few by definition (≤ total/df_cap
        # distinct values), so the anti-join broadcasts them and the big
        # exploded side never shuffles for the filter
        frequent = (
            sh.groupBy("s")
            .agg(F.count("*").alias("df_s"))
            .filter(F.col("df_s") > max_shingle_df)
            .select("s")
        )
        sh_rare = sh.join(frequent, "s", "left_anti")
        # per-doc frequent-shingle arrays: bounded by the number of
        # frequent shingles (small), broadcastable at any corpus size
        doc_freq = (
            sh.join(F.broadcast(frequent), "s")
            .groupBy("doc")
            .agg(F.collect_set("s").alias("fr"))
        )
    else:
        sh_rare = sh
        doc_freq = None
    # persist the blocked frame: BOTH self-join sides read it, and without
    # the cache each side re-runs explode(+anti-join) from scratch — the
    # same recompute trap BASELINE.md records for the LSH bucket join
    sh_rare = sh_rare.persist()
    a, b = sh_rare.alias("a"), sh_rare.alias("b")
    # one aggregation yields candidate pairs, their rare-intersection
    # size (shingles are per-doc distinct ⇒ one joined row per shared
    # rare shingle per pair), AND both set sizes: n_sh rides the
    # blocked rows, is constant within each (doc_a, doc_b) group
    # (functionally dependent on the key), and the min() picks it out
    # without the two per-side size joins this replaced (r12)
    scored = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(
            F.count("*").alias("common_rare"),
            F.min(F.col("a.n_sh")).alias("n_a"),
            F.min(F.col("b.n_sh")).alias("n_b"),
        )
    )
    if doc_freq is not None:
        empty = F.array().cast("array<string>")
        scored = (
            scored.join(
                F.broadcast(
                    doc_freq.select(F.col("doc").alias("doc_a"), F.col("fr").alias("fr_a"))
                ),
                "doc_a",
                "left",
            )
            .join(
                F.broadcast(
                    doc_freq.select(F.col("doc").alias("doc_b"), F.col("fr").alias("fr_b"))
                ),
                "doc_b",
                "left",
            )
            .withColumn(
                "common",
                F.col("common_rare")
                + F.size(
                    F.array_intersect(
                        F.coalesce("fr_a", empty), F.coalesce("fr_b", empty)
                    )
                ),
            )
        )
    else:
        scored = scored.withColumn("common", F.col("common_rare"))
    return (
        scored.withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def prefix_filtered_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact word-n-gram Jaccard pairs via PREFIX FILTERING (the
    AllPairs / SSJoin family): provably complete candidate pruning for a
    similarity threshold, vs :func:`jaccard_near_dup_pairs`'s
    share-any-shingle blocking.

    Shingles get a global total order (ascending doc-frequency, shingle
    as tie-break); a doc of set size m only indexes its first
    m - ceil(t*m) + 1 shingles in that order. Any pair with J >= t has
    |A∩B| >= ceil(t*max(|A|,|B|)) and therefore — pigeonhole over the
    sorted sets — shares at least one PREFIX shingle, so joining on
    prefix shingles alone loses no qualifying pair. Because prefixes are
    the RAREST shingles of each doc, candidate volume collapses: the
    hot boilerplate shingles that explode share-any blocking sort to the
    suffix and never generate candidates. Verification then ships full
    shingle arrays only for surviving candidate pairs.

    Two further provably-complete prunes run INSIDE the prefix join
    (the PPJoin refinements of the same AllPairs family), added after
    an r7 profile showed verification dominating at 1600x candidate
    overshoot (409k candidates for 256 true pairs at sf0.1):

    * size filter — J >= t forces min(|A|,|B|) >= ceil(t*max(|A|,|B|)),
      so pairs whose set sizes differ by more than 1/t never qualify;
    * positional filter — both docs' shingles follow the SAME global
      order, so a pair's common shingles form aligned ascending runs;
      at a match on positions (i, j) the remaining possible overlap is
      1 + min(|A|-i, |B|-j), and a qualifying pair needs
      |A∩B| >= ceil(t*(|A|+|B|)/(1+t)). The pair's FIRST common shingle
      always satisfies that bound when J >= t (every common shingle
      sits at-or-after it on both sides), so keeping pairs where ANY
      prefix match passes loses nothing.

    Together: 3.3x fewer candidates, 2.6x faster verification at sf0.1,
    byte-identical result set (A/B in BASELINE.md round 7).

    Scale posture: two shuffles ((shingle) for df-ranking + the prefix
    self-join) and one window sort per doc; the quadratic term is
    sum over prefix shingles of df_prefix^2 — bounded by construction
    since prefixes prefer low-df shingles. The higher the threshold,
    the shorter the prefixes (p ~ (1-t)m+1) and the cheaper the join;
    x6's frequent-shingle cap is the complementary tool when t must be
    low. Output: (doc_a, doc_b, jaccard), doc_a < doc_b — identical
    semantics/values to jaccard_near_dup_pairs at the same threshold.
    """
    # docs feeds prefix ranking AND the verification joins; the returned
    # frame consumes it lazily, so the cache is intentionally left to LRU
    # eviction (same lifetime posture as remove_dup_spans)
    docs = (
        df.select(
            F.col(id_col).alias("doc"),
            word_shingles(F.col(text_col), n).alias("shs"),
        )
        .withColumn("n_sh", F.size("shs"))
        .persist()
    )
    sh = docs.select("doc", "n_sh", F.explode("shs").alias("s"))
    dfreq = sh.groupBy("s").agg(F.count("*").alias("df_s"))
    w = Window.partitionBy("doc").orderBy("df_s", "s")
    # epsilon-nudged ceil: IEEE t*m can land just ABOVE the exact
    # rational (0.07*100 = 7.000000000000001 -> ceil 8, not 7), which
    # would shorten the prefix below the completeness bound and silently
    # DROP boundary pairs. Nudging down before ceil can only lengthen
    # the prefix (safe direction: a longer prefix is still complete).
    alpha = F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(1e-9))
    prefix = (
        sh.join(dfreq, "s")
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= F.col("n_sh") - alpha + 1)
        .select("doc", "s", "pos", "n_sh")
        # BOTH self-join sides read this frame; without the cache each
        # side re-runs the whole explode + df-rank + window chain from
        # scratch (the r12 plan audit showed the dfreq exchange and the
        # prefix window duplicated once per side) — the same recompute
        # trap jaccard_near_dup_pairs caches sh_rare against.
        # Interleaved A/B: 2.62 -> 1.94 s min-of-6, identical pairs.
        .persist()
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    na, nb = F.col("a.n_sh"), F.col("b.n_sh")
    # PPJoin prunes (docstring): size filter + first-match positional
    # bound, both epsilon-nudged DOWN (can only keep more, never drop a
    # qualifying pair — the same safe direction as alpha above)
    size_ok = F.least(na, nb) >= F.ceil(
        F.lit(threshold) * F.greatest(na, nb) - F.lit(1e-9)
    )
    min_overlap = F.ceil(
        F.lit(threshold) / (1.0 + threshold) * (na + nb) - F.lit(1e-9)
    )
    pos_ok = (
        1 + F.least(na - F.col("a.pos"), nb - F.col("b.pos"))
    ) >= min_overlap
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")),
        )
        .filter(size_ok & pos_ok)
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    x = docs.select(
        F.col("doc").alias("doc_a"),
        F.col("shs").alias("shs_a"),
        F.col("n_sh").alias("n_a"),
    )
    y = docs.select(
        F.col("doc").alias("doc_b"),
        F.col("shs").alias("shs_b"),
        F.col("n_sh").alias("n_b"),
    )
    common = F.size(F.array_intersect("shs_a", "shs_b"))
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .withColumn("common", common)
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# fuzzy n-gram decontamination
# ---------------------------------------------------------------------------


def ngram_overlap_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuzzy benchmark decontamination (the n-gram-overlap generalization
    of the exact-fingerprint anti-join): for every corpus doc, count its
    distinct word n-grams that also occur anywhere in the benchmark set,
    and flag docs with zero overlap as clean. This is the GPT-3/C4-style
    "13-gram decontamination" shape scaled to the fixture (n=5).

    Scale posture: the benchmark gram set is tiny (an eval suite, not a
    corpus), so it broadcasts; the corpus side explodes its grams and
    probes the broadcast — one groupBy(doc) shuffle of (id, matched-gram)
    HITS only, never the corpus text. Output: (id, shared_grams, clean)
    for every corpus doc.
    """
    bench_grams = benchmark.select(
        F.explode(word_shingles(F.col(text_col), n)).alias("g")
    ).distinct()
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("g")
    )
    # word_shingles is per-doc distinct, so count(*) == distinct grams
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("shared_grams"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("shared_grams", F.lit(0)).alias("shared_grams"),
            (F.coalesce("shared_grams", F.lit(0)) == 0).alias("clean"),
        )
    )


# ---------------------------------------------------------------------------
# paragraph-level exact dedup (Gopher/MassiveText repetition removal shape)
# ---------------------------------------------------------------------------


def chunk_words(text: Column, k: int = 10) -> Column:
    """Re-chunk free text into newline-joined k-word windows — the
    'paragraph' segmentation for corpora that arrive as one long line.
    Pure projection; the word array is let-bound so the tokenizing split
    runs once per row, not once per chunk (the bind_once 16× trap)."""
    ws = F.split(F.lower(text), r"\s+")

    def build(w: Column) -> Column:
        n_chunks = F.greatest(
            F.ceil(F.size(w) / F.lit(float(k))), F.lit(1)
        ).cast("int")
        return F.concat_ws(
            "\n",
            F.transform(
                F.sequence(F.lit(0), n_chunks - F.lit(1)),
                lambda i: F.concat_ws(" ", F.slice(w, i * k + 1, k)),
            ),
        )

    return bind_once(ws, build)


def paragraph_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-wide paragraph dedup: split every doc into non-empty lines,
    keep only the globally FIRST occurrence of each distinct line (first =
    min (doc, position) — deterministic), and reassemble each doc from its
    surviving lines in original order. Duplicates are removed both across
    docs and within a doc.

    Scale posture: the keeper decision groups on md5(line) — 16-byte keys
    shuffle, not paragraph text (same design as exact_dedup). Reassembly
    is one groupBy(doc) over surviving lines. Docs whose text is null or
    has no non-empty lines are dropped (nothing to dedup).

    Output: (id, n_lines, n_kept, text_dedup).
    """
    lines = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.filter(F.split(F.col(text_col), "\n"), lambda x: F.length(x) > 0)
        ).alias("ord", "line"),
    )
    # global first-occurrence key; positions are far below the 1e6 stride
    keyed = lines.withColumn(
        "k", F.col("doc") * F.lit(1_000_000) + F.col("ord")
    ).withColumn("h", F.md5("line"))
    keepers = keyed.groupBy("h").agg(F.min("k").alias("min_k"))
    survivors = keyed.join(keepers, "h").filter(F.col("k") == F.col("min_k"))
    reassembled = survivors.groupBy("doc").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ord", "line"))),
                lambda s: s.line,
            ),
        ).alias("text_dedup"),
    )
    totals = lines.groupBy("doc").agg(F.count("*").alias("n_lines"))
    return (
        totals.join(reassembled, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


def dup_ngram_coverage(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Corpus-level duplicated-substring coverage — the distributed shape
    of suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): for every word position
    of every document, decide whether a word n-gram starting there occurs
    at least ``min_count`` times across the WHOLE corpus (within-doc
    repeats count), then report per document the total word count, the
    number of word positions covered by at least one globally-repeated
    n-gram, and the covered fraction — the "how much of me is corpus
    boilerplate" number a curation pipeline thresholds or trims on.

    Scale shape: the corpus-wide decision shuffles (md5(gram), doc, pos)
    — 32-byte hex keys, never gram text; the global occurrence count is a
    partially-aggregated groupBy over those keys; and the per-doc coverage
    union is an array fold over the collected start positions (bounded by
    words-per-doc), not an n-fold row explosion. The exploded gram frame
    feeds both the duplicate-key aggregation and the position join, so it
    is persisted — without it the tokenize+explode runs twice.
    """
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc"),
        F.split(F.lower(F.col(text_col)), r"\s+").alias("w"),
    )
    docs_words = base.select("doc", F.size("w").cast("long").alias("n_words"))
    gram_structs = F.when(
        F.size("w") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - (n - 1)),
            lambda i: F.struct(
                i.alias("pos"),
                F.md5(F.concat_ws(" ", F.slice("w", i, n))).alias("gh"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,gh:string>>"))
    exploded = (
        base.select("doc", F.explode(gram_structs).alias("g"))
        .select("doc", F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh"))
        .persist()
    )
    dup_keys = (
        exploded.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .filter(F.col("occurrences") >= min_count)
        .select("gh")
    )
    covered = (
        exploded.join(dup_keys, "gh")
        .groupBy("doc")
        .agg(F.sort_array(F.collect_set("pos")).alias("starts"))
        .select(
            "doc",
            F.size(
                F.array_distinct(
                    F.flatten(
                        F.transform(
                            F.col("starts"),
                            lambda s: F.sequence(s, s + (n - 1)),
                        )
                    )
                )
            )
            .cast("long")
            .alias("dup_words"),
        )
    )
    dup_w = F.coalesce(F.col("dup_words"), F.lit(0).cast("long"))
    return docs_words.join(covered, "doc", "left").select(
        F.col("doc").alias(id_col),
        "n_words",
        dup_w.alias("dup_words"),
        (dup_w.cast("double") / F.greatest(F.col("n_words"), F.lit(1))).alias(
            "dup_word_frac"
        ),
    )


def remove_dup_spans(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Corpus-duplicated-span REMOVAL — the transform half of
    :func:`dup_ngram_coverage`'s report (Lee et al. 2022 substring dedup,
    reference-free distributed shape): every word position covered by a
    word n-gram occurring ≥ ``min_count`` times anywhere in the corpus is
    dropped, and the surviving words are re-joined in original order as
    ``text_dedup``. Fully-boilerplate documents come out empty (the
    curation pipeline then drops them on ``kept_words = 0``), untouched
    documents come out with their whitespace normalized to single spaces
    (the same canonicalization every fingerprint above applies).

    Scale shape: identical to :func:`dup_ngram_coverage` — the global
    repeat decision shuffles (md5(gram), doc, pos) keys, never text; the
    reconstruction is a per-row array filter over the let-bound word
    array joined with the doc's covered-start list (bounded by words per
    doc), not an n-fold row explosion. Output: (id, n_words, kept_words,
    text_dedup).

    Both ``base`` (the tokenized words, read by the explode AND the final
    reassembly join) and ``exploded`` (read by the duplicate-key agg AND
    the position join) are persisted and intentionally NOT unpersisted
    here: the returned frame is lazy and its lineage still references
    both caches, so an eager unpersist would force the tokenize/explode
    to run twice per downstream action — the caches are left to Spark's
    LRU eviction, same as :func:`dup_ngram_coverage`'s ``exploded``.
    Callers that materialize the result and keep the session hot can
    release them via ``spark.catalog.clearCache()``.
    """
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc"),
            F.split(F.lower(F.col(text_col)), r"\s+").alias("w"),
        )
        .persist()
    )
    gram_structs = F.when(
        F.size("w") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - (n - 1)),
            lambda i: F.struct(
                i.alias("pos"),
                F.md5(F.concat_ws(" ", F.slice("w", i, n))).alias("gh"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,gh:string>>"))
    exploded = (
        base.select("doc", F.explode(gram_structs).alias("g"))
        .select("doc", F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh"))
        .persist()
    )
    dup_keys = (
        exploded.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .filter(F.col("occurrences") >= min_count)
        .select("gh")
    )
    starts = (
        exploded.join(dup_keys, "gh")
        .groupBy("doc")
        .agg(F.sort_array(F.collect_set("pos")).alias("starts"))
    )
    joined = base.join(starts, "doc", "left")
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.coalesce("starts", F.array().cast("array<int>")),
                lambda s: F.sequence(s, s + (n - 1)),
            )
        )
    )
    kept_idx = bind_once(
        covered,
        lambda cov: F.filter(
            F.sequence(F.lit(1), F.size("w")),
            lambda i: ~F.array_contains(cov, i),
        ),
    )
    return joined.select(
        F.col("doc").alias(id_col),
        F.size("w").cast("long").alias("n_words"),
        bind_once(
            kept_idx,
            lambda ki: F.struct(
                F.size(ki).cast("long").alias("k"),
                F.concat_ws(
                    " ", F.transform(ki, lambda i: F.element_at("w", i))
                ).alias("t"),
            ),
        ).alias("_kt"),
    ).select(
        id_col,
        "n_words",
        F.col("_kt.k").alias("kept_words"),
        F.col("_kt.t").alias("text_dedup"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(text: Column, n: int = 3) -> Column:
    """Array of k MinHash values — a pure projection (no explode/shuffle):
    ``array_min`` over each universal hash of the shingle array."""
    shingles = word_shingles(text, n)
    hashed = F.transform(shingles, base_hash)

    def universal(a: int, b: int):
        # closure factory: default-arg captures would change the lambda's
        # arity, which F.transform inspects
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)

    # hashed is referenced by all 16 universal hashes → bind it once, or
    # the shingle md5 pass runs 16× per row
    return bind_once(
        hashed,
        lambda hs: F.array(
            *[
                F.array_min(F.transform(hs, universal(a, b)))
                for a, b in MINHASH_COEFFS
            ]
        ),
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    return df.select(
        F.col(id_col), minhash_signature(F.col(text_col), n).alias("signature")
    )


def band_hash_array(bands: int = LSH_BANDS) -> Column:
    """Per-band md5 keys over the ``signature`` column produced by
    :func:`minhash_signatures` (band index is salted into the hash so
    identical row-groups in different bands never collide)."""
    rows_per_band = len(MINHASH_COEFFS) // bands
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "_",
                    F.lit(j),
                    *[
                        F.element_at("signature", j * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                )
            )
            for j in range(bands)
        ]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    bands: int = LSH_BANDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """MinHash-LSH candidate pairs: band the k-signature, bucket-join.

    One explode (×bands), one shuffle on (band, band_hash), pair join
    within buckets only. Expected Jaccard of surviving pairs ≥ ~(1/bands
    banding curve); verify with jaccard_near_dup_pairs on candidates when
    exactness matters.
    """
    sig = minhash_signatures(df, text_col, id_col, n)
    # both sides of the self-join consume banded; persist so signatures are
    # computed once per doc (at 100 TB: write signatures to a table instead)
    banded = sig.select(
        F.col(id_col).alias("doc"),
        F.posexplode(band_hash_array(bands)).alias("band", "band_hash"),
    ).persist()
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def banded_signature_keys(
    df: DataFrame,
    bands: int = LSH_BANDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """The materializable LSH state of a corpus: ``(id, band, band_hash)``
    — one row per (document, band). Everything LSH dedup ever joins on
    derives from this frame, so writing it once per corpus
    (:func:`write_signature_table`) and reading it back per increment is
    the 100 TB posture: each new crawl batch signatures only ITS OWN
    documents and joins against the stored keys."""
    sig = minhash_signatures(df, text_col, id_col, n)
    return sig.select(
        F.col(id_col),
        F.posexplode(band_hash_array(bands)).alias("band", "band_hash"),
    )


def write_signature_table(
    df: DataFrame,
    path: str,
    bands: int = LSH_BANDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> str:
    """Materialize :func:`banded_signature_keys` as a parquet table,
    partitioned by ``band`` so an increment probing a subset of bands
    prunes whole directories. Appending a new batch's keys after it
    clears dedup keeps the table current (``mode('append')`` on the same
    path) — the signature pass over any document happens exactly once in
    the corpus's lifetime.

    No intra-file ordering contract: band keys are probed by equi-join,
    never read sequentially, so the V1 partitioned writer's own inserted
    sort on ``band`` (its required ordering — see BASELINE.md's
    inserted-sort trap) is harmless here."""
    (
        banded_signature_keys(df, bands, text_col, id_col, n)
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(path)
    )
    return path


def lsh_cross_corpus_matches(
    new: DataFrame,
    existing: DataFrame | None = None,
    bands: int = LSH_BANDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    existing_signatures: DataFrame | None = None,
) -> DataFrame:
    """Incremental-ingest dedup: for every NEW document, does it
    MinHash-LSH-collide with anything in the EXISTING corpus? This is the
    shape every recurring crawl runs — dedup the fresh batch against data
    already ingested, without re-pairing the existing corpus against
    itself.

    The existing side is given EITHER as raw documents (``existing`` —
    signatured here) OR as precomputed ``(id, band, band_hash)`` keys
    (``existing_signatures``, from :func:`write_signature_table` read
    back) — the production path, where the stored corpus is never
    re-signatured per increment.

    Scale posture: both sides reduce to (id, band, band_hash) keys before
    the join — one shuffle on (band, band_hash), never on text; with
    ``existing_signatures`` the only signature computation in the whole
    plan is over the new batch. Output keeps EVERY new doc:
    (id, n_existing_matches, min_existing_match, is_new_unique).
    """
    if (existing is None) == (existing_signatures is None):
        raise ValueError(
            "provide exactly one of `existing` (raw documents) or "
            "`existing_signatures` (precomputed band keys)"
        )

    def banded(df: DataFrame, name: str) -> DataFrame:
        return banded_signature_keys(df, bands, text_col, id_col).select(
            F.col(id_col).alias(name), "band", "band_hash"
        )

    old_keys = (
        banded(existing, "old_doc")
        if existing is not None
        else existing_signatures.select(
            F.col(id_col).alias("old_doc"), "band", "band_hash"
        )
    )
    matches = (
        banded(new, "new_doc")
        .join(old_keys, ["band", "band_hash"])
        .groupBy("new_doc")
        .agg(
            F.countDistinct("old_doc").alias("n_existing_matches"),
            F.min("old_doc").alias("min_existing_match"),
        )
    )
    return (
        new.select(F.col(id_col))
        .join(matches.withColumnRenamed("new_doc", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_existing_matches", F.lit(0)).alias(
                "n_existing_matches"
            ),
            "min_existing_match",
            F.col("n_existing_matches").isNull().alias("is_new_unique"),
        )
    )


def minhash_jaccard_estimates(
    df: DataFrame,
    threshold: float = 0.0,
    bands: int = LSH_BANDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """LSH candidates refined by the MinHash Jaccard estimator:
    est = |agreeing hashes| / k.

    This is the 100 TB near-dup decision path end-to-end: signatures are
    a projection, candidates one bucket shuffle, and the estimate reads
    only the two k-length signatures — the shingle sets (the expensive
    part the estimator replaces) are never rematerialized. Use
    jaccard_near_dup_pairs to audit the estimator at test scale.

    Output: (doc_a, doc_b, jaccard_est) with doc_a < doc_b.
    """
    k = len(MINHASH_COEFFS)
    cand = lsh_candidate_pairs(df, bands, text_col, id_col, n)
    sig = minhash_signatures(df, text_col, id_col, n).persist()
    sa = sig.select(F.col(id_col).alias("doc_a"), F.col("signature").alias("sig_a"))
    sb = sig.select(F.col(id_col).alias("doc_b"), F.col("signature").alias("sig_b"))
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda same: same
        )
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard_est", agree.cast("double") / F.lit(float(k)))
        .filter(F.col("jaccard_est") >= threshold)
        .select("doc_a", "doc_b", "jaccard_est")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def simhash(text: Column) -> Column:
    """16-bit SimHash over word tokens, projection-only.

    Per bit: sum of ±1 votes from each token's base hash; bit set iff the
    vote is strictly positive (ties → 0, deterministic).
    """
    toks = F.split(F.lower(text), r"\s+")
    hashed = F.transform(toks, base_hash)

    def vote(bit: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    def from_hashed(hs: Column) -> Column:
        bit_terms = []
        for bit in range(SIMHASH_BITS):
            votes = F.aggregate(hs, F.lit(0).cast("bigint"), vote(bit))
            bit_terms.append(F.when(votes > 0, F.lit(1 << bit)).otherwise(F.lit(0)))
        return sum(bit_terms[1:], bit_terms[0]).cast("bigint")

    # 16 per-bit aggregates all fold over the same token-hash array → bind
    # it once so the tokenize+md5 pass runs once per row, not 16×
    return bind_once(hashed, from_hashed)


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    return df.select(F.col(id_col), simhash(F.col(text_col)).alias("simhash16"))


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, LSH-blocked on the 4
    nibbles (a pair within Hamming ≤3 of a 16-bit hash shares ≥1 exact
    nibble — pigeonhole), so no full cross join."""
    sig = simhash_signatures(df, text_col, id_col)
    nibbles = F.array(
        *[
            F.concat_ws(
                "_", F.lit(i), F.shiftright("simhash16", i * 4).bitwiseAND(F.lit(0xF))
            )
            for i in range(4)
        ]
    )
    blocked = sig.select(
        F.col(id_col).alias("doc"), F.col("simhash16"), F.explode(nibbles).alias("nib")
    ).persist()  # self-join: compute signatures once
    a, b = blocked.alias("a"), blocked.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash16").bitwiseXOR(F.col("b.simhash16"))
    )
    return (
        a.join(b, (F.col("a.nib") == F.col("b.nib")) & (F.col("a.doc") < F.col("b.doc")))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# near-dup clustering (connected components over the candidate-pair graph)
# ---------------------------------------------------------------------------


def _cc_label_propagation(edges: DataFrame, max_iterations: int) -> DataFrame:
    """Min-label propagation over a symmetric (src, dst) edge frame.
    O(component diameter) rounds, one join+groupBy shuffle each — great
    for the dense quasi-cliques near-dup graphs form, linear-round-count
    on long chains (use _cc_star for those).

    Each round ends in an eager ``localCheckpoint``: every round's plan
    embeds the previous round's plan several times over, so without
    lineage truncation the query tree grows EXPONENTIALLY with rounds and
    the driver dies in analysis (observed: heap OOM at ~15 rounds on a
    toy graph). Checkpointing resets each round to a materialized scan —
    the standard shape for iterative DataFrame algorithms. Since r11 the
    changed-count convergence test rides the checkpoint job as an
    ``observe()`` metric, so each round is exactly ONE action.
    """
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    from pyspark.sql import Observation

    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # ONE action per round (r11 optimization): the changed-count
        # rides the eager checkpoint's materialization as an observe()
        # metric — accumulator-based, exactly-once per successful task,
        # zero extra stages — where the previous shape paid a separate
        # filter+count action (and before that, two full actions per
        # round). Verified: eager localCheckpoint fires the metrics
        # listener with the computed values; the non-eager form does
        # NOT (returns zeros) — eager is load-bearing here.
        obs = Observation()
        proposed = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                labels.node,
                F.col("label").alias("old_label"),
                F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
            )
            # count(when(...)) never yields NULL, so the empty-input
            # round still reads changed == 0 and terminates
            .observe(
                obs,
                F.count(
                    F.when(F.col("label") != F.col("old_label"), True)
                ).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = obs.get["changed"]
        labels = proposed.select("node", "label")
        if changed == 0:
            break
    else:
        # labels were still moving at the cap: silently returning them
        # would break the method-equivalence contract with _cc_star
        # (propagation needs O(diameter) rounds — a >max_iterations-hop
        # chain lands here; use the star method or raise the cap)
        raise RuntimeError(
            f"min-label propagation did not converge in {max_iterations} "
            f"rounds ({changed} labels still changing)"
        )
    return labels


def _cc_star(edges: DataFrame, max_iterations: int) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): alternating
    edge rewrites that converge in O(log n) rounds regardless of component
    diameter — the 100 TB path for graphs with long chains, where label
    propagation would need O(diameter) shuffles.

    - large-star(u): every neighbor v > u is re-pointed at m = min(N(u) ∪
      {u}). Connectivity-preserving, strictly shrinks long paths.
    - small-star(u): over edges canonicalized as (u > v), every smaller
      neighbor (and u itself) is pointed at the minimum one.

    At the fixpoint every edge is (node, component-min); labels read off
    the edges directly. Input: symmetric (src, dst) frame; output: (node,
    label) for every node with ≥1 edge, label = min reachable node —
    identical to _cc_label_propagation's contract.

    Every round ends in an eager ``localCheckpoint`` — see
    _cc_label_propagation for why lineage truncation is load-bearing in
    iterative DataFrame algorithms. Since r11 the fixpoint signature
    rides each checkpoint job as ``observe()`` metrics, so each round
    is exactly ONE action with no separate aggregation stages. Since
    r12 each star computes its neighborhood minimum as an unordered
    window aggregate instead of a groupBy + re-join, so each round is
    two u-keyed exchanges + the distinct instead of two exchanges +
    two broadcast-join builds (skew note: a hot node's group lands in
    one window task, but the join form concentrated the same group on
    one reducer at cluster scale too — large-star is itself the
    Kiveris skew-splitting step).
    """

    from pyspark.sql import Observation

    def _sig_metrics():
        # order-free fixpoint signature of an edge set, ridden on the
        # eager checkpoint's materialization as observe() metrics (r11
        # optimization — ONE action per round with zero extra stages;
        # the previous shapes paid a separate signature agg action).
        # Accumulator-based observed metrics are exactly-once per
        # successful task; the xxhash sum is order-free, so the
        # signature is the same value the old agg computed. NOTE the
        # checkpoint must stay EAGER: a non-eager localCheckpoint fires
        # the metrics listener before anything computes and returns
        # zeros (verified on this Spark build).
        obs = Observation()
        cols = (
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v")).alias("h"),
        )
        return obs, cols

    # canonical orientation (u > v); input is symmetric so nothing is lost
    obs0, cols0 = _sig_metrics()
    canon = (
        edges.filter(F.col("src") > F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
        .observe(obs0, *cols0)
        .localCheckpoint(eager=True)
    )
    m0 = obs0.get
    prev_sig = (m0["n"], m0["h"])

    # Each star's per-node neighborhood minimum is a WINDOW aggregate
    # (min over partition(u), no ordering) rather than a groupBy + join
    # (r12, guide §2.4): the min rides every row of its group directly,
    # so the per-round nbr_min/s_min side frames, their broadcast
    # builds, and the re-join of the edge rows all disappear — one
    # u-keyed exchange per star instead of an exchange + a broadcast
    # join build. At cluster scale the node-sized min frames could not
    # broadcast anyway (the join would shuffle the edges a second
    # time); the window form shuffles each edge set exactly once per
    # star. A/B min-of-5: x18 3.30 -> 2.69 s, x32 3.64 -> 3.05 s,
    # identical labels.
    w_u = Window.partitionBy("u")
    for _ in range(max_iterations):
        # large-star over the symmetric view of canon
        sym = canon.select("u", "v").union(
            canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # no .distinct() on ls (r11): its only consumers are duplicate-
        # insensitive (the small-star window MIN and the ss projection
        # whose output ends in .distinct()) — the dedup bought nothing
        # and cost a full (u, v) exchange per round. Fixpoint edges
        # identical.
        ls = (
            sym.withColumn("mn", F.min("v").over(w_u))
            .filter(F.col("v") > F.col("u"))
            # emit (v, m): v > u ≥ m = least(u, mn) ⇒ already canonical
            .select(
                F.col("v").alias("u"),
                F.least(F.col("u"), F.col("mn")).alias("v"),
            )
        )
        # small-star over the canonical (u > v) edges: every group has
        # ≥1 row with v == m (the min exists), so rewriting those rows
        # to (u, m) — instead of dropping them and unioning a separate
        # per-group (u, m) frame — yields exactly the old
        # {(v, m): v ≠ m} ∪ {(u, m)} set after the .distinct()
        obs, cols = _sig_metrics()
        ss = (
            ls.withColumn("m", F.min("v").over(w_u))
            .select(
                F.when(F.col("v") == F.col("m"), F.col("u"))
                .otherwise(F.col("v"))
                .alias("u"),
                F.col("m").alias("v"),
            )
            .distinct()
            .observe(obs, *cols)
            .localCheckpoint(eager=True)
        )
        m = obs.get
        sig = (m["n"], m["h"])
        canon = ss
        if sig == prev_sig:
            break
        prev_sig = sig

    # converged: every edge is (node, component-min); minima label themselves
    labels = canon.select(F.col("u").alias("node"), F.col("v").alias("label")).union(
        canon.select(F.col("v").alias("node"), F.col("v").alias("label")).distinct()
    ).distinct()
    return labels


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    method: str = "star",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components over an undirected pair list: (node, label)
    with label = min node reachable. ``method='star'`` is the O(log n)
    default; ``'propagation'`` is min-label propagation (fewer shuffles
    per round, O(diameter) rounds — fine for quasi-clique graphs)."""
    edges = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(
            pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .persist()
    )
    if method == "star":
        labels = _cc_star(edges, max_iterations)
    elif method == "propagation":
        labels = _cc_label_propagation(edges, max_iterations)
    else:
        raise ValueError(f"unknown method: {method!r}")
    edges.unpersist()
    return labels


def near_dup_clusters(
    df: DataFrame,
    bands: int = LSH_BANDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_iterations: int = 25,
    method: str = "star",
) -> DataFrame:
    """Cluster assignment for near-duplicate documents: connected
    components over the MinHash-LSH candidate-pair graph, each doc labeled
    with the min doc id reachable from it (``cluster_id``). Keeping
    ``cluster_id == doc_id`` rows afterward is the canonical
    one-doc-per-near-dup-cluster dedup policy.

    Default method is large-star/small-star (O(log n) rounds at any
    component shape — the 100 TB posture); ``method='propagation'`` keeps
    the min-label-propagation variant, which does fewer shuffles per round
    and converges just as fast on the dense quasi-cliques near-dup graphs
    usually form. Both produce identical labels.

    Only docs that appear in at least one candidate pair are returned;
    everything else is its own singleton cluster by definition.
    """
    pairs = lsh_candidate_pairs(df, bands, text_col, id_col, n)
    labels = connected_components(
        pairs, "doc_a", "doc_b", method=method, max_iterations=max_iterations
    )
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )


# ---------------------------------------------------------------------------
# hybrid (lexical + semantic) near-dup
# ---------------------------------------------------------------------------


def hybrid_near_dup_pairs(
    docs: DataFrame,
    embeddings: DataFrame,
    cosine_threshold: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Ensemble near-dup detection: the union of lexical MinHash-LSH
    candidate pairs and embedding-cosine near-dup pairs (vec ids are doc
    ids), with per-method provenance flags. Surface-level edits evade
    embeddings; paraphrases evade shingles — a curation pipeline reviews
    the union and trusts the intersection.

    Scale posture: both branches are the already-bucketed plans (band
    join / sign-bit bucket join — never all-pairs); the ensemble adds
    one full-outer join on (id, id) pairs, which shuffles only pair keys.
    Output: (doc_a, doc_b, lexical, semantic), doc_a < doc_b.
    """
    from .similarity import embedding_near_dup_pairs

    lex = lsh_candidate_pairs(docs, text_col=text_col, id_col=id_col).select(
        "doc_a", "doc_b", F.lit(True).alias("lexical")
    )
    sem = embedding_near_dup_pairs(
        embeddings, threshold=cosine_threshold, id_col=vec_id_col
    ).select("doc_a", "doc_b", F.lit(True).alias("semantic"))
    return (
        lex.join(sem.withColumnRenamed("semantic", "_sem"), ["doc_a", "doc_b"], "full_outer")
        .select(
            "doc_a",
            "doc_b",
            F.coalesce("lexical", F.lit(False)).alias("lexical"),
            F.coalesce("_sem", F.lit(False)).alias("semantic"),
        )
    )


def benchmark_leak_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The reverse view of ngram_overlap_contamination: per BENCHMARK
    item, how badly has it leaked into the corpus — the report an eval
    owner reads to decide which benchmark rows are still trustworthy
    (x25 answers "which corpus docs to drop"; this answers "which eval
    items are burned").

    Same scale posture as x25: the benchmark gram set broadcasts, the
    corpus explodes its grams once and probes it, and only HITS shuffle
    for the per-item aggregate. Self-matches (a benchmark doc drawn from
    the corpus matching itself) are excluded. Output: one row per
    benchmark item — (id, leaking_docs, shared_gram_instances).
    """
    bg = benchmark.select(
        F.col(id_col).alias("bench_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("g"),
    )
    cg = corpus.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("g")
    )
    hits = (
        cg.join(F.broadcast(bg), "g")
        .filter(F.col(id_col) != F.col("bench_id"))
        .groupBy("bench_id")
        .agg(
            F.countDistinct(id_col).alias("leaking_docs"),
            F.count("*").alias("shared_gram_instances"),
        )
    )
    return (
        benchmark.select(F.col(id_col).alias("bench_id"))
        .join(hits, "bench_id", "left")
        .select(
            F.col("bench_id"),
            F.coalesce("leaking_docs", F.lit(0)).alias("leaking_docs"),
            F.coalesce("shared_gram_instances", F.lit(0)).alias(
                "shared_gram_instances"
            ),
        )
    )


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ASYMMETRIC near-dup detection: ordered pairs where containment
    C(A->B) = |A∩B| / |A| >= threshold — A's shingles mostly inside B,
    the excerpt/quotation/derived-copy relation that symmetric Jaccard
    systematically underrates (a 50-shingle excerpt of a 5000-shingle
    page has J ~ 0.01 but C = 1.0).

    Candidate pruning is ONE-SIDED prefix filtering (the
    :func:`prefix_filtered_jaccard_pairs` machinery adapted to the
    containment bound): a qualifying pair shares >= ceil(t*|A|)
    shingles, so by pigeonhole over A's global rarest-first order at
    least one shared shingle sits in A's first |A| - ceil(t*|A|) + 1
    shingles — only the CONTAINED side needs a prefix; the containing
    side is probed over its full shingle postings. Complete for the
    threshold, so the oracle can brute-force all shingle-sharing pairs.
    Same epsilon-nudged ceil as the Jaccard variant (IEEE t*m can land
    above the exact rational; nudging down only lengthens the prefix —
    the safe direction).

    Scale posture: the prefix side is ~(1-t)|A|+1 rare shingles per doc
    (tiny at high thresholds); the postings side is the full exploded
    shingle table, which is what any inverted-index join scans.
    Verification ships arrays only to surviving candidates. Output:
    (doc_small, doc_big, containment), directional.
    """
    docs = (
        df.select(
            F.col(id_col).alias("doc"),
            word_shingles(F.col(text_col), n).alias("shs"),
        )
        .withColumn("n_sh", F.size("shs"))
        .persist()
    )
    sh = docs.select("doc", "n_sh", F.explode("shs").alias("s"))
    dfreq = sh.groupBy("s").agg(F.count("*").alias("df_s"))
    w = Window.partitionBy("doc").orderBy("df_s", "s")
    alpha = F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(1e-9))
    prefix = (
        sh.join(dfreq, "s")
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= F.col("n_sh") - alpha + 1)
        .select(F.col("doc").alias("doc_small"), "s")
    )
    postings = sh.select(F.col("doc").alias("doc_big"), "s")
    cand = (
        prefix.join(postings, "s")
        .filter(F.col("doc_small") != F.col("doc_big"))
        .select("doc_small", "doc_big")
        .distinct()
    )
    x = docs.select(
        F.col("doc").alias("doc_small"),
        F.col("shs").alias("shs_a"),
        F.col("n_sh").alias("n_a"),
    )
    y = docs.select(
        F.col("doc").alias("doc_big"), F.col("shs").alias("shs_b")
    )
    return (
        cand.join(x, "doc_small")
        .join(y, "doc_big")
        .withColumn(
            "containment",
            F.size(F.array_intersect("shs_a", "shs_b")).cast("double")
            / F.col("n_a"),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_small", "doc_big", "containment")
    )
