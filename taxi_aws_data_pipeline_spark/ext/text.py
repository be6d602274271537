"""Text analysis over document tables: language-ID, quality scoring,
token counting, fingerprinting (driver extension tier; SURVEY.md §7.1
step 8).

Everything is native Spark SQL functions — higher-order lambdas, regex,
md5 — no Python UDFs, so the hot path stays in whole-stage codegen and
scales linearly with partitions. Each function takes/returns DataFrames
and appends columns; the oracle twins live in plans/ext_catalog.py.

Portability note (oracle parity): token counts use occurrence counts via
``filter(tokens, ...)`` lambdas (not array_intersect — distinct-element
semantics differ subtly across engines), and the document fingerprint is
md5 over whitespace-normalized text (stable in any engine), with a
polynomial rolling hash as the scale-path alternative.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Deliberately small + hardcoded: language ID here is a deterministic,
# testable heuristic, not a model.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "and", "is", "of", "to", "in", "that", "it"),
    "es": ("el", "la", "de", "que", "y", "los", "una", "por"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}

#: BPE-ish token pattern: letter runs, digit runs, single non-space symbols
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), r"\s+")


def stopword_hits(tokens: Column, stopwords: tuple[str, ...]) -> Column:
    """Occurrence count of stopwords among tokens (non-distinct)."""
    arr = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def add_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID with deterministic tie-breaks.

    Scores each language by stopword occurrences; picks the
    lexicographically-first language among the max scorers; all-zero →
    'und' (undetermined); NULL text → NULL (round 11, the text-NULL
    convention: a missing document is unknown input, not an 'und'
    verdict — without the guard the size(NULL) = -1 sentinel leaked
    through best <= 0 as 'und'). One projection, no shuffle.
    """
    toks = words(text_col)
    scored = df.withColumn("_toks", toks)
    for lang, sw in STOPWORDS.items():
        scored = scored.withColumn(f"_score_{lang}", stopword_hits(F.col("_toks"), sw))
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"_score_{lang}") for lang in langs])
    pred = F.when(F.col(text_col).isNull(), F.lit(None)).when(
        best <= 0, F.lit("und")
    )
    for lang in langs:  # first max wins → lexicographic tie-break
        pred = pred.when(F.col(f"_score_{lang}") == best, F.lit(lang))
    return scored.withColumn("lang_pred", pred).drop(
        "_toks", *[f"_score_{lang}" for lang in langs]
    )


def add_quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / uppercase signals + a composite
    quality score in [0,1] (the usual pre-training heuristics tier).

    NULL text → every signal NULL (round 11, the text-NULL convention:
    without the guard, size(NULL) = -1 leaked a -1 word_count and a
    negative quality score; both Spark's and DuckDB's least/greatest
    IGNORE NULL args, so leaving propagation to the expressions gives
    accident semantics — the guard makes the convention explicit on
    both sides)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    word_count = F.size(words(text_col))
    punct_count = n_chars - F.length(F.regexp_replace(t, r"[.,!?;:'\"()-]", ""))
    upper_count = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    stop_hits = stopword_hits(words(text_col), STOPWORDS["en"])

    punct_ratio = punct_count.cast("double") / F.greatest(n_chars, F.lit(1))
    upper_ratio = upper_count.cast("double") / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits.cast("double") / F.greatest(word_count, F.lit(1))
    length_score = F.least(word_count.cast("double") / 50.0, F.lit(1.0))
    quality = (
        length_score * (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0)))
        * (1.0 - F.least(upper_ratio * 4.0, F.lit(1.0)))
    )
    sig = lambda c: F.when(t.isNotNull(), c)  # noqa: E731
    return (
        df.withColumn("word_count", sig(word_count))
        .withColumn("punct_ratio", sig(punct_ratio))
        .withColumn("upper_ratio", sig(upper_ratio))
        .withColumn("stopword_ratio", sig(stop_ratio))
        .withColumn("quality_score", sig(quality))
    )


def add_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count. NULL text →
    NULL counts (round 11, the text-NULL convention — size(NULL)'s -1
    sentinel is a Spark legacy artifact, not a token count; regexp_count
    already propagates NULL natively)."""
    t = F.col(text_col)
    return df.withColumn(
        "ws_tokens", F.when(t.isNotNull(), F.size(words(text_col)))
    ).withColumn("bpe_tokens", F.regexp_count(t, F.lit(TOKEN_PATTERN)))


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of lowercased, whitespace-collapsed text.

    Exact-dup detection key that survives formatting noise; at 100 TB the
    fingerprint is the dedup shuffle key (16 bytes instead of full text).
    """
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn("fingerprint", F.md5(normalized))


def add_rolling_hash(
    df: DataFrame, text_col: str = "text", base: int = 257, mod: int = 1_000_000_007
) -> DataFrame:
    """Polynomial rolling hash over characters (Karp-Rabin style), computed
    with the ``aggregate`` higher-order function — demonstrates an
    order-dependent scan done natively without a UDF. Spark-only (no
    portable SQL twin: char codepoints via ascii() differ per engine for
    non-ASCII), so its catalog entry is rows-only checked.
    """
    chars = F.split(F.col(text_col), "")
    rolled = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.coalesce(F.ascii(ch), F.lit(0))) % mod,
    )
    return df.withColumn("rolling_hash", rolled)


def add_gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/MassiveText document-level quality rules (Rae et al. 2021
    §A1.1.1), the standard pre-training heuristic gate: word-count bounds,
    mean-word-length bounds, minimum stopword evidence, and minimum
    alphabetic-word fraction, plus the conjunction ``gopher_pass``.

    Pure projection over the token array (``bind_once`` keeps the split
    from re-running per rule) — one codegen'd map pass, zero shuffle, so
    the gate costs a scan at any corpus size.
    """
    from .dedup import bind_once

    def signals(w: Column) -> Column:
        wc = F.size(w)
        safe_wc = F.greatest(wc, F.lit(1))
        mean_len = (
            F.aggregate(w, F.lit(0), lambda acc, t: acc + F.length(t))
            .cast("double")
            / safe_wc
        )
        stop_hits = stopword_hits(w, STOPWORDS["en"])
        alpha_frac = (
            F.size(F.filter(w, lambda t: t.rlike("[a-z]"))).cast("double")
            / safe_wc
        )
        return F.struct(
            wc.alias("word_count"),
            mean_len.alias("mean_word_len"),
            stop_hits.alias("stopword_count"),
            alpha_frac.alias("alpha_word_frac"),
        )

    s = bind_once(words(text_col), signals)
    out = df.withColumn("_g", s)
    rules = {
        "word_count": F.col("_g.word_count"),
        "mean_word_len": F.col("_g.mean_word_len"),
        "stopword_count": F.col("_g.stopword_count"),
        "alpha_word_frac": F.col("_g.alpha_word_frac"),
        "rule_word_count": F.col("_g.word_count").between(50, 100_000),
        "rule_mean_word_len": F.col("_g.mean_word_len").between(3.0, 10.0),
        "rule_stopwords": F.col("_g.stopword_count") >= 2,
        "rule_alpha_words": F.col("_g.alpha_word_frac") >= 0.8,
    }
    for name, col in rules.items():
        out = out.withColumn(name, col)
    return out.withColumn(
        "gopher_pass",
        F.col("rule_word_count")
        & F.col("rule_mean_word_len")
        & F.col("rule_stopwords")
        & F.col("rule_alpha_words"),
    ).drop("_g")


def add_lexical_diversity(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Lexical-diversity quality signals, all exact rationals (no log /
    libm — entropy-style measures drift in the last ulp across engines,
    these hash identically everywhere): type-token ratio, hapax fraction
    (words occurring exactly once), and top-character concentration.

    O(distinct·n) comparisons inside a per-row projection — bounded by
    document length, zero shuffle.
    """
    from .dedup import bind_once

    def tok_signals(w: Column) -> Column:
        wc = F.greatest(F.size(w), F.lit(1))
        distinct = F.array_distinct(w)
        hapax = F.size(
            F.filter(
                distinct,
                lambda t: F.size(F.filter(w, lambda x: x == t)) == 1,
            )
        )
        return F.struct(
            (F.size(distinct).cast("double") / wc).alias("ttr"),
            (hapax.cast("double") / wc).alias("hapax_frac"),
        )

    def char_signals(chars: Column) -> Column:
        total = F.greatest(F.size(chars), F.lit(1))
        maxc = F.array_max(
            F.transform(
                F.array_distinct(chars),
                lambda c: F.size(F.filter(chars, lambda x: x == c)),
            )
        )
        return (F.coalesce(maxc, F.lit(0)).cast("double") / total).alias(
            "top_char_frac"
        )

    toks = bind_once(words(text_col), tok_signals)
    chars = F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", ""), ""),
        lambda c: c != "",
    )
    top_char = bind_once(chars, char_signals)
    return (
        df.withColumn("_lx", toks)
        .withColumn("ttr", F.col("_lx.ttr"))
        .withColumn("hapax_frac", F.col("_lx.hapax_frac"))
        .withColumn("top_char_frac", top_char)
        .drop("_lx")
    )


def add_top_ngram_fraction(
    df: DataFrame, n: int, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Gopher repetition signal: fraction of document characters covered
    by the single most frequent word n-gram (count × gram length ÷ doc
    length, capped at 1.0 — overlapping occurrences of a self-repeating
    gram double-count characters, e.g. 'a a a' has two overlapping
    'a a' grams). Deterministic tie-break: among max-count grams, the
    lexicographically smallest. Docs shorter than n words score 0.0.

    Like the other repetition signals this is a pure projection —
    the n-gram list is materialized per row (O(words) strings), counted
    with array lambdas, never exploded into a shuffle.
    """
    from .dedup import bind_once

    name = out_col or f"top_{n}gram_char_frac"
    toks = words(text_col)
    # let-bind the token array: an unbound split reference inside the gram
    # lambda re-tokenizes once per gram (O(words²) — see word_shingles)
    grams_expr = bind_once(
        toks,
        lambda tt: F.when(
            F.size(tt) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(tt) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tt, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )

    def frac(grams: Column) -> Column:
        distinct = F.array_distinct(grams)
        counts = F.transform(
            distinct, lambda g: F.size(F.filter(grams, lambda x: x == g))
        )
        maxc = F.array_max(counts)
        top = F.array_min(
            F.filter(
                distinct,
                lambda g: F.size(F.filter(grams, lambda x: x == g)) == maxc,
            )
        )
        return F.when(F.size(grams) == 0, F.lit(0.0)).otherwise(
            F.least(
                (maxc * F.length(top)).cast("double")
                / F.greatest(F.length(F.col(text_col)), F.lit(1)),
                F.lit(1.0),
            )
        )

    return df.withColumn(name, bind_once(grams_expr, frac))


def add_dup_ngram_fraction(
    df: DataFrame, n: int = 5, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Gopher duplicate-n-gram repetition signal: the fraction of word
    positions covered by a word n-gram that occurs at least twice WITHIN
    the document. Complements :func:`add_top_ngram_fraction` (which only
    measures the single most frequent gram): a doc alternating between two
    boilerplate blocks scores high here while the top-gram number stays
    moderate. Docs shorter than n words score 0.0.

    Coverage is a true positional union — each repeated gram start expands
    to its n covered positions and the union is deduplicated — so
    overlapping repeats never push the fraction past 1.0. Pure projection
    (array lambdas per row, no explode/shuffle); the per-row cost is
    O(grams²) string compares like the other repetition signals, bounded
    by document length. Cross-corpus repeats are x36's job
    (``dedup.dup_ngram_coverage``) — this signal is per-document by
    construction and needs no shuffle at any scale.
    """
    from .dedup import bind_once

    name = out_col or f"dup_{n}gram_word_frac"
    toks = words(text_col)

    def over_words(w: Column) -> Column:
        m = F.size(w)
        grams_expr = F.when(
            m >= n,
            F.transform(
                F.sequence(F.lit(1), m - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(w, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

        def frac(grams: Column) -> Column:
            starts = F.filter(
                F.sequence(F.lit(1), F.size(grams)),
                lambda i: F.size(
                    F.filter(grams, lambda g: g == F.element_at(grams, i))
                )
                >= 2,
            )
            covered = F.size(
                F.array_distinct(
                    F.flatten(
                        F.transform(starts, lambda s: F.sequence(s, s + (n - 1)))
                    )
                )
            )
            return F.when(F.size(grams) == 0, F.lit(0.0)).otherwise(
                covered.cast("double") / F.greatest(m, F.lit(1))
            )

        return bind_once(grams_expr, frac)

    return df.withColumn(name, bind_once(toks, over_words))


def add_repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Duplicate-line repetition signals (the Gopher/MassiveText-style
    repetition filter): per document, the count of non-empty lines, the
    count of distinct lines, and the duplicate-line fraction
    ``1 - distinct/total`` (0.0 for empty docs; all three NULL for NULL
    text — round 11, the text-NULL convention: size(NULL)'s -1 sentinel
    is not a line count).

    Pure projection — array ops over split(), no explode, no shuffle —
    so at 100 TB it costs one codegen'd map pass. ``bind_once`` keeps the
    split+filter array from being evaluated once per consumer.
    """
    from .dedup import bind_once

    raw_lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda x: F.length(x) > 0
    )

    def signals(lines: Column) -> Column:
        total = F.when(lines.isNotNull(), F.size(lines))
        distinct = F.when(lines.isNotNull(), F.size(F.array_distinct(lines)))
        ratio = F.when(
            total > 0, 1.0 - distinct.cast("double") / total
        ).when(total == 0, F.lit(0.0))
        return F.struct(
            total.alias("n_lines"),
            distinct.alias("n_distinct_lines"),
            ratio.alias("dup_line_ratio"),
        )

    bound = bind_once(raw_lines, signals)
    return (
        df.withColumn("_rep", bound)
        .withColumn("n_lines", F.col("_rep.n_lines"))
        .withColumn("n_distinct_lines", F.col("_rep.n_distinct_lines"))
        .withColumn("dup_line_ratio", F.col("_rep.dup_line_ratio"))
        .drop("_rep")
    )


def add_normalized_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text normalization: lowercase, strip punctuation/symbol
    characters (everything outside [a-z0-9] and whitespace), collapse
    whitespace runs, trim. The standard preprocessing step before
    hashing/shingling when formatting noise shouldn't affect dedup keys.

    Pure projection (regexp chain, whole-stage codegen). Output columns:
    text_norm, n_chars_norm, and removed_ratio (fraction of characters
    dropped — a cheap "how noisy was this doc" signal).
    """
    from .dedup import bind_once

    t = F.col(text_col)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(t), r"[^a-z0-9\s]", ""), r"\s+", " "
        )
    )
    bound = bind_once(
        norm,
        lambda n: F.struct(
            n.alias("text_norm"),
            F.length(n).alias("n_chars_norm"),
            (
                (F.length(t) - F.length(n)).cast("double")
                / F.greatest(F.length(t), F.lit(1))
            ).alias("removed_ratio"),
        ),
    )
    return (
        df.withColumn("_nrm", bound)
        .withColumn("text_norm", F.col("_nrm.text_norm"))
        .withColumn("n_chars_norm", F.col("_nrm.n_chars_norm"))
        .withColumn("removed_ratio", F.col("_nrm.removed_ratio"))
        .drop("_nrm")
    )


def length_band_filter(
    df: DataFrame,
    lo: float = 0.05,
    hi: float = 0.95,
    length_col: str = "n_chars",
    group_col: str = "lang",
) -> DataFrame:
    """Keep documents inside the [lo, hi] length-percentile band of their
    group — the outlier-trim a curation pipeline runs per language
    (too-short docs are fragments, too-long ones are concatenation
    artifacts).

    Exact and deterministic: percent_rank() = (rank-1)/(n-1) with
    min-rank ties, identical across engines, so equal lengths share a
    band decision. One window shuffle on the group key; the window state
    is O(1) per row (rank only). Output: input columns + length_pr.
    """
    w = Window.partitionBy(group_col).orderBy(length_col)
    return (
        df.withColumn("length_pr", F.percent_rank().over(w))
        .filter((F.col("length_pr") >= lo) & (F.col("length_pr") <= hi))
    )


def vocab_coverage(
    df: DataFrame, top_n: int = 100, text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary report: the top_n most frequent whitespace tokens
    with rank, count, corpus frequency, and CUMULATIVE coverage — the
    "how much of the corpus does a size-N vocab explain" curve a
    tokenizer budget decision reads.

    Deterministic total order (count desc, token asc). Scale shape: one
    partial-aggregated token-count shuffle (the key space is the
    vocabulary, far smaller than the corpus), then ranking/cumsum over
    only top_n rows; the grand total rides in as a 1-row broadcast, so
    coverage fractions are exact count/total divisions (no libm).
    """
    toks = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(words(text_col)).alias("token"))
        .filter(F.length("token") > 0)
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("n"))
    top = (
        counts.orderBy(F.desc("n"), F.asc("token"))
        .limit(top_n)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("n"), F.asc("token"))
            ),
        )
    )
    total = counts.agg(F.sum("n").alias("_total"))
    w_cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("cum_n", F.sum("n").over(w_cum))
        .select(
            "rank",
            "token",
            "n",
            (F.col("n").cast("double") / F.col("_total")).alias("token_frac"),
            (F.col("cum_n").cast("double") / F.col("_total")).alias(
                "cum_coverage"
            ),
        )
    )


def length_minmax_scaled(
    df: DataFrame, length_col: str = "n_chars", group_col: str = "source"
) -> DataFrame:
    """Per-group min-max scaling of a document statistic to [0, 1] — the
    normalization step before mixing quality/length signals across
    corpora with different scales. Integer min/max/differences keep the
    one double division exact across engines; a constant group (max ==
    min) scales to 0.5 (the conventional "no information" midpoint)
    rather than dividing by zero. One window shuffle, O(1) state.
    """
    w = Window.partitionBy(group_col)
    lo, hi = F.min(length_col).over(w), F.max(length_col).over(w)
    scaled = F.when(hi == lo, F.lit(0.5)).otherwise(
        (F.col(length_col) - lo).cast("double") / (hi - lo)
    )
    return df.withColumn("scaled", scaled)


def token_count_histogram(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Log2-bucketed histogram of per-document token counts — the corpus
    length-distribution report. The bucket is floor(log2(n_words)),
    computed EXACTLY as length(binary representation) - 1 (no libm log,
    which is not correctly rounded at powers of two in every engine).
    Output: (log2_bucket, lo_words, n_docs) — lo_words = 2^bucket, the
    bucket's inclusive lower edge. One tiny-key-space aggregation.
    """
    nw = F.size(words(text_col))
    bucket = (F.length(F.conv(nw.cast("string"), 10, 2)) - 1).alias(
        "log2_bucket"
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(bucket)
        .groupBy("log2_bucket")
        .agg(F.count("*").alias("n_docs"))
        .select(
            "log2_bucket",
            F.pow(F.lit(2.0), F.col("log2_bucket")).cast("long").alias("lo_words"),
            "n_docs",
        )
    )


FLUENCY_SCALE = 1_000_000


def bigram_fluency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained bigram language-model fluency score — the
    LM-quality-filter family (CCNet/DCLM filter on LM perplexity; this
    is the engine-portable exact variant): every document is scored by
    the mean conditional probability of its word bigrams under the
    corpus's own bigram counts, P(w2|w1) = c(w1,w2) / c(w1,·).
    Boilerplate and fluent prose score high; shuffled or noisy text
    scores low.

    Determinism at scale, the usual trap, is handled the x21/x83 way:
    probabilities become fixed-point integers floor(c12 * SCALE / c1)
    BEFORE the per-doc sum, so accumulation is exact integer arithmetic
    in any partition order; the single closing division renders the
    mean as a double. (True log-perplexity needs libm `log`, whose last
    ulp differs across engines — the mean-probability form keeps the
    ranking signal hash-verifiable.)

    Plan shape: one bigram explode, one (w1,w2) count shuffle + one w1
    rollup of those counts (vocab²-sized, tiny next to the corpus), one
    (w1,w2) join of bigram positions against the count table, one
    per-doc aggregate. No driver-side state.

    Output: (id, n_bigrams, fluency) — fluency NULL for docs with < 2
    words.
    """
    from .dedup import bind_once

    ws = words(F.col(text_col))

    def pair_structs(w: Column) -> Column:
        return F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 1),
                lambda i: F.struct(
                    F.element_at(w, i).alias("w1"),
                    F.element_at(w, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    # base is read twice (count pass + scoring join) and deliberately NOT
    # cached: at 100 TB the exploded bigram frame dwarfs memory, and its
    # recompute is a cheap projection — recompute beats spill here
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode(bind_once(ws, pair_structs)).alias("p")
    ).select(id_col, "p.w1", "p.w2")
    big = base.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    table = big.join(uni, "w1").select(
        "w1",
        "w2",
        F.expr(f"c12 * {FLUENCY_SCALE} div c1").alias("q"),
    )
    scored = (
        base.join(table, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("q").alias("qsum"),
        )
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            (
                F.col("qsum").cast("double")
                / (F.lit(float(FLUENCY_SCALE)) * F.col("n_bigrams"))
            ).alias("fluency"),
        )
    )
