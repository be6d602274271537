"""Similarity search over embedding columns (array<float>): brute-force
cosine top-k as the exact baseline, random-hyperplane LSH bucketing as the
scale path (driver extension tier).

All vector math is native higher-order functions (``zip_with`` +
``aggregate``) in doubles — sequential accumulation over a 64-dim array is
deterministic and cheap; no UDFs, no Python in the hot path.

Scale posture: brute-force is O(probes × corpus) with the corpus side
broadcast when probes are few (or the probe side broadcast when the corpus
is the big side — pick by size). The LSH variant buckets both sides by
hyperplane sign bits so each probe only scans its bucket: at 100 TB the
corpus is hash-partitioned by bucket and the probe fan-out is
``2^signbits`` smaller.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import base_hash


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in doubles, sequential left-fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per probe. Probe side is broadcast (probes are
    few by construction); ranking tie-breaks on candidate id so the k-row
    cut is total-ordered and reproducible.

    Output: (probe_id, neighbor_id, cos_sim, rank).

    NULL vectors are excluded from BOTH sides (round 11, the engine-wide
    vector-NULL convention): a row whose embedding failed upstream has
    no similarity to anything — without the filter it would rank with a
    NULL cos_sim instead of being absent. The filter is a pushed-down
    IsNotNull on the scan (free at 100 TB); every vector oracle carries
    the explicit `WHERE embedding IS NOT NULL` twin.
    """
    # norms are hoisted to per-ROW columns before the pair join (r11
    # optimization, guide §1.2 step 2): cosine() inside the join
    # recomputed BOTH vector norms per probe x candidate PAIR — at k
    # probes that is k redundant norm folds per corpus row (and a
    # corpus-size-redundant probe-norm fold). dot/(probe_norm *
    # cand_norm) is the same IEEE arithmetic on the same values
    # (multiplication of identical doubles), so cos_sim is
    # bit-identical; the same hoist is applied to every pair-join
    # cosine in this module.
    p = probes.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        norm(F.col(vec_col)).alias("probe_norm"),
    )
    c = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cand_vec"),
        norm(F.col(vec_col)).alias("cand_norm"),
    )
    scored = (
        c.join(F.broadcast(p), F.col("neighbor_id") != F.col("probe_id"))
        .withColumn(
            "cos_sim",
            dot(F.col("probe_vec"), F.col("cand_vec"))
            / (F.col("probe_norm") * F.col("cand_norm")),
        )
        .select("probe_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def brute_force_topk_pandas(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched alternative to :func:`brute_force_topk`: per corpus
    partition, score all probes against the partition's candidate block
    with one NumPy matmul, emit local top-k, then a global window keeps
    the true top-k.

    Same results as the native plan (tested equal); exists as the
    vectorized-Python comparison point and the template for kernels that
    genuinely need NumPy (e.g. PQ distance tables). Scales like the
    native version: probes broadcast (driver-collected), corpus streamed
    partition-parallel, only |partitions|·|probes|·k rows shuffle into
    the final window.
    """
    import numpy as np
    import pandas as pd

    # NULL-vector probes are unanswerable and would poison the whole
    # probe matrix (np.float64 over a None row raises — round-10 NULL
    # audit); skip them driver-side, same contract as the seeders
    probe_rows = [
        r for r in probes.select(id_col, vec_col).collect()
        if r[1] is not None
    ]
    probe_ids = np.array([r[0] for r in probe_rows])
    probe_mat = np.array([r[1] for r in probe_rows], dtype=np.float64)
    probe_norms = np.linalg.norm(probe_mat, axis=1)

    out_schema = (
        "probe_id long, neighbor_id long, cos_sim double"
    )

    def score(batches):
        for pdf in batches:
            cand_ids = pdf[id_col].to_numpy()
            cand = np.array(list(pdf[vec_col]), dtype=np.float64)
            sims = (probe_mat @ cand.T) / (
                probe_norms[:, None] * np.linalg.norm(cand, axis=1)[None, :]
            )
            for i, pid in enumerate(probe_ids):
                row_sims = sims[i]
                mask = cand_ids != pid
                ids, s = cand_ids[mask], row_sims[mask]
                if len(ids) == 0:
                    continue
                # lexsort matches the global (-sim, neighbor_id) tie-break
                top = np.lexsort((ids, -s))[:k]
                yield pd.DataFrame(
                    {
                        "probe_id": np.full(len(top), pid),
                        "neighbor_id": ids[top],
                        "cos_sim": s[top],
                    }
                )

    local = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return local.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# random-hyperplane LSH (sign-bit bucketing)
# ---------------------------------------------------------------------------


def _hyperplane_component(plane: int, i: int) -> float:
    """Deterministic pseudo-random hyperplane components in [-1, 1),
    derived from the portable md5 base hash of 'plane:i' — reproducible
    in any engine, no RNG state."""
    # evaluated at plan-build time in Python, so plain hashlib is fine
    import hashlib

    h = int(hashlib.md5(f"{plane}:{i}".encode()).hexdigest()[:8], 16)
    return (h % 2000) / 1000.0 - 1.0


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    return [
        [_hyperplane_component(p, i) for i in range(dim)] for p in range(n_planes)
    ]


def signature_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit p set iff vec·plane_p > 0.

    Column-API form, kept for external callers holding a ``Column``;
    the library's own call sites use :func:`signature_bits_sql` (r12),
    which builds the identical expression as ONE parsed SQL string —
    this form issues ~n_planes x dim ``F.lit`` py4j round-trips of
    serial driver time per call site (the ivf_nearest_cells r11
    finding; x11 paid it twice per query)."""
    terms = []
    for p, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(v) for v in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        terms.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    return sum(terms[1:], terms[0]).alias("bucket")


def _qid(name: str) -> str:
    """Backtick-quote a column name for embedding in a SQL expression
    string (the uniform quoting helper — ADVICE r11: ivf_topk and x246
    had drifted into inconsistent conventions)."""
    return "`" + name.replace("`", "``") + "`"


def dot_sql(a_sql: str, b_sql: str) -> str:
    """SQL text of :func:`dot` — the same sequential left-fold over
    zip_with, byte-for-byte the arithmetic the Column form builds, as a
    string fragment for single-parse expression assembly (r12)."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + x)"
    )


def norm_sql(a_sql: str) -> str:
    """SQL text of :func:`norm` (sqrt of the self dot fold)."""
    return f"SQRT({dot_sql(a_sql, a_sql)})"


def signature_bits_sql(vec_sql: str, planes: list[list[float]]) -> Column:
    """:func:`signature_bits` built as ONE parsed SQL expression (r12,
    guide §1.2 step 2 — the ivf_nearest_cells r11 rework applied to the
    sign-bit quantizer): plane components embed as exact shortest-
    round-trip decimal literals (string->double parse is correctly
    rounded, so the constants are bit-identical to the Python floats),
    the zip_with/aggregate fold order is unchanged, and the bit terms
    sum left-to-right exactly as the Column form's ``sum()`` did.
    ``vec_sql`` is a SQL expression string — quote identifiers with
    :func:`_qid`."""
    terms = []
    for p, plane in enumerate(planes):
        arr = "array(" + ", ".join(_sql_double(float(v)) for v in plane) + ")"
        proj = (
            f"aggregate(zip_with({vec_sql}, {arr}, (x, y) -> "
            "CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), "
            "(acc, x) -> acc + x)"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return F.expr("(" + " + ".join(terms) + ")").alias("bucket")


#: fixed-point scale for random-projection inputs: float32 components
#: times 2^20 are exactly representable in double, so floor() is
#: deterministic in every engine
RP_SCALE = 1 << 20


def int_hyperplanes(n_planes: int, dim: int) -> list[list[int]]:
    """Integer hyperplane components in [-1000, 1000) — the same
    md5-derived values as ``hyperplanes`` before the /1000 rescale."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8], 16) % 2000
            - 1000
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def random_projection(
    df: DataFrame,
    out_dim: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Signed random projection to ``out_dim`` dimensions — the
    Johnson-Lindenstrauss dimensionality reduction used to cheapen
    downstream distance work (and the real-valued stage the sign-bit LSH
    above quantizes). Projection vectors are the same deterministic
    md5-derived hyperplanes as the LSH tier: reproducible in any engine,
    no RNG state, identical across runs and partitions.

    Arithmetic is FIXED-POINT (the x21 centroid pattern): components are
    quantized by floor(x · 2^20) — exact for float32 inputs — and folded
    against integer hyperplanes entirely in int64, so the sum is
    associative and bit-identical at any parallelism and in any engine
    (a float left-fold is NOT: DuckDB's list_reduce drifts 1 ulp from a
    strict sequential fold). One final double division by the constant
    scale rescales to the real-valued projection; quantization error is
    ≤ dim · |plane|∞ / 2^20 ≈ 6e-2 absolute on unit-scale inputs — far
    below JL distortion. |qx| ≤ 2^22-ish · 1000 · 64 keeps the fold
    under 2^40, int64-safe with 2^23 headroom.

    Pure projection — no shuffle at any scale. Output columns
    rp00..rp{out_dim-1} are scalarized doubles (driver-hashable).
    """
    # each projection is ONE parsed SQL expression (r12 — the
    # py4j-literal fix): the Column form issued out_dim x dim F.lit()
    # round-trips of serial driver time per call. Integer literals and
    # the fold order embed verbatim, so the arithmetic is identical.
    planes = int_hyperplanes(out_dim, dim)
    v = _qid(vec_col)
    cols = [
        F.expr(
            f"aggregate(zip_with({v}, "
            "array(" + ", ".join(str(int(x)) for x in plane) + "), "
            f"(x, y) -> CAST(FLOOR(CAST(x AS DOUBLE) * {RP_SCALE}) AS BIGINT)"
            " * CAST(y AS BIGINT)), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            f" / {_sql_double(float(RP_SCALE * 1000))}"
        ).alias(f"rp{p:02d}")
        for p, plane in enumerate(planes)
    ]
    return df.select(F.col(id_col), *cols)


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    probe_flips: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's sign-bit
    bucket. ``probe_flips=1`` enables multi-probe: each probe also scans
    the ``n_planes`` buckets at Hamming distance 1 (the vectors most
    likely to be near-misses of the quantization), trading n_planes+1×
    the candidate scan for sharply better recall — still a tiny fraction
    of the corpus. The corpus side keeps exactly one bucket per vector
    regardless, so the inverted index never grows.

    Same output shape as brute force. NULL vectors are excluded from
    both sides (the engine-wide vector-NULL convention — see
    :func:`brute_force_topk`).
    """
    planes = hyperplanes(n_planes, dim)
    c = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cand_vec"),
        norm(F.col(vec_col)).alias("cand_norm"),
        signature_bits_sql(_qid(vec_col), planes).alias("cand_bucket"),
    )
    p = probes.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        norm(F.col(vec_col)).alias("probe_norm"),
        signature_bits_sql(_qid(vec_col), planes).alias("b0"),
    )
    if probe_flips >= 1:
        buckets = F.array(
            F.col("b0"),
            *[F.col("b0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
    else:
        buckets = F.array(F.col("b0"))
    p = p.select(
        "probe_id",
        "probe_vec",
        "probe_norm",
        F.explode(buckets).alias("probe_bucket"),
    )
    scored = (
        c.join(
            F.broadcast(p),
            (F.col("cand_bucket") == F.col("probe_bucket"))
            & (F.col("neighbor_id") != F.col("probe_id")),
        )
        # per-row norms hoisted above the pair join — bit-identical,
        # see brute_force_topk
        .withColumn(
            "cos_sim",
            dot(F.col("probe_vec"), F.col("cand_vec"))
            / (F.col("probe_norm") * F.col("cand_norm")),
        )
        .select("probe_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer + bucketed scan
# ---------------------------------------------------------------------------


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """The deterministic coarse quantizer shared by the IVF family:
    centroids are the ``n_centroids`` lowest-id corpus vectors (no RNG,
    reproducible plans); a k-means refinement would drop in without
    changing any query shape. Bounded collect — n_centroids rows.

    NULL vectors are excluded from seeding (a production corpus WILL
    carry rows whose embedding failed upstream; iterating a NULL
    collected row crashed the driver — round-10 NULL-payload audit).
    This is a seeding-side filter only: it runs inside this bounded
    collect query, so callers' returned plans are unchanged."""
    return [
        (int(r[0]), [float(x) for x in r[1]])
        for r in corpus.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    ]


def ivf_nearest_cells(
    centroids: list[tuple[int, list[float]]], vec_sql: str, n: int
) -> Column:
    """Array of the ``n`` closest centroid ids by cosine (descending;
    ties broken by HIGHER cell id, matching the oracles' ``cell DESC``).
    The query vector's own norm is constant across cells, so ranking by
    dot/|centroid| is cosine-equivalent at a third of the cost.
    ``vec_sql`` is a SQL expression string (e.g. ``"embedding"``).

    Built as ONE parsed SQL expression (r11 optimization, guide §1.2
    step 2 / the _nearest_centroid_cell r6 A/B finding): the previous
    Column-API construction issued ~n_centroids x dim F.lit() py4j
    round-trips per call site (~2.4 s of serial DRIVER time per query
    at 16x64 — profiled via tools/profile_query.py: x14 t_build 2.4 s
    with only 2 Spark jobs), which no cluster size can parallelize
    away. One F.expr over an f-string is milliseconds. Arithmetic is
    IEEE-identical: _sql_double embeds the exact shortest-round-trip
    decimal of every Python double (string->double parse is correctly
    rounded), the fold/zip_with element order is unchanged, and the
    (sim, cell) struct sort + reverse + slice is the same tie-break
    (hash-verified at sf0.01/sf0.1 against the unchanged oracles)."""
    structs = ", ".join(
        "named_struct('sim', "
        "aggregate(zip_with({v}, {cb}, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + x) / {nrm}, 'cell', {cid})".format(
            v=vec_sql,
            cb="array("
            + ", ".join(_sql_double(float(x)) for x in cvec)
            + ")",
            nrm=_sql_double(math.sqrt(sum(x * x for x in cvec))),
            cid=int(cid),
        )
        for cid, cvec in centroids
    )
    return F.slice(
        F.reverse(F.array_sort(F.expr(f"array({structs})"))), 1, n
    ).getField("cell")


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an inverted-file index: assign every vector
    to its nearest coarse centroid (:func:`ivf_centroids`), then scan
    only the probe's ``nprobe`` closest cells.

    At 100 TB the corpus is hash-partitioned by ``cell`` (one shuffle at
    build time), probes broadcast, and each probe touches
    nprobe/n_centroids of the data. Same output shape as
    :func:`brute_force_topk`. NULL vectors are excluded from both sides
    (the engine-wide vector-NULL convention).
    """
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    probes = probes.filter(F.col(vec_col).isNotNull())
    centroids = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    if not centroids:
        # empty corpus: no quantizer exists — return a correctly-typed
        # empty result instead of an unresolvable zero-width array plan
        return (
            probes.select(F.col(id_col).alias("probe_id"))
            .crossJoin(
                corpus.select(
                    F.col(id_col).alias("neighbor_id"),
                    F.lit(0.0).alias("cos_sim"),
                    F.lit(0).alias("rank"),
                )
            )
            .select("probe_id", "neighbor_id", "cos_sim", "rank")
        )

    def nearest_cells(n: int) -> Column:
        return ivf_nearest_cells(centroids, _qid(vec_col), n)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cand_vec"),
        norm(F.col(vec_col)).alias("cand_norm"),
        # corpus side: exactly one cell per vector (the inverted file)
        F.element_at(nearest_cells(1), 1).alias("cell"),
    ).persist()
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        norm(F.col(vec_col)).alias("probe_norm"),
        F.explode(nearest_cells(nprobe)).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(p), "cell")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        # per-row norms hoisted above the pair join — bit-identical,
        # see brute_force_topk
        .withColumn(
            "cos_sim",
            dot(F.col("probe_vec"), F.col("cand_vec"))
            / (F.col("probe_norm") * F.col("cand_norm")),
        )
        .select("probe_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: only same-
    bucket pairs are scored (high-cosine pairs collide with high
    probability under sign-bit LSH). NULL vectors are excluded (the
    engine-wide vector-NULL convention)."""
    planes = hyperplanes(n_planes, dim)
    keyed = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("doc"),
        F.col(vec_col).alias("vec"),
        norm(F.col(vec_col)).alias("nrm"),
        signature_bits_sql(_qid(vec_col), planes),
    ).persist()  # self-join: project each vector through the planes once
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        # per-row norms hoisted above the pair self-join — bit-identical,
        # see brute_force_topk
        .withColumn(
            "cos_sim",
            dot(F.col("a.vec"), F.col("b.vec"))
            / (F.col("a.nrm") * F.col("b.nrm")),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            "cos_sim",
        )
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023): group
    embeddings into semantic-duplicate clusters and elect one
    representative per cluster — the end-to-end DECISION the pairwise
    tools feed. Pipeline: sign-bit-LSH-bucketed cosine pairs
    (:func:`embedding_near_dup_pairs`) → connected components
    (large-star/small-star, O(log n) rounds) → representative = min id
    per cluster; vectors in no pair are their own singleton clusters.

    Scale posture: the only all-pairs work happens inside LSH buckets
    (2^n_planes-way partitioned), components shuffle (id, id) edges only,
    and the final labeling is one left join — no step touches raw vectors
    after the pair stage.

    Output: (id, cluster_id, is_representative) for every input vector
    with a non-NULL embedding — NULL vectors are excluded entirely (the
    engine-wide vector-NULL convention: a row with no embedding cannot
    be judged semantically, so it neither pairs nor forms a singleton).
    """
    from .dedup import connected_components

    df = df.filter(F.col(vec_col).isNotNull())
    pairs = embedding_near_dup_pairs(
        df, threshold, n_planes, dim, id_col, vec_col
    )
    labels = connected_components(pairs, "doc_a", "doc_b")
    return (
        df.select(F.col(id_col))
        .join(labels.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("label", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_representative", F.col("cluster_id") == F.col(id_col))
    )


def _sql_double(x: float) -> str:
    """Exact double literal for a Spark SQL string: repr() is the
    shortest round-tripping decimal, and string->double casting is
    correctly rounded, so the embedded constant is bit-identical to the
    Python float (and to DuckDB parsing the same digits)."""
    return f"CAST('{x!r}' AS DOUBLE)"


def _nearest_centroid_cell(
    vec_sql: str, centroids: list[list[float]]
) -> Column:
    """Index of the squared-L2-nearest centroid, deterministic tie-break
    on the lower cell index: argmin ||x-c||^2 = argmin (||c||^2 - 2 x.c),
    so each cell costs one dot product. ``vec_sql`` is a SQL expression
    string (e.g. ``"v"`` or ``"slice(v, 17, 16)"``).

    Formulation (r6 A/B winner — BASELINE.md): the codebook rides as a
    nested array() of literals that Catalyst constant-folds into ONE
    complex Literal carried in the codegen ``references`` table, and the
    per-cell distance is ``ss[c] - 2·(x·centroid[c])`` via
    zip_with/aggregate. Because no centroid double reaches the generated
    source, the source is IDENTICAL across codebooks/training rounds and
    janino compiles once per plan SHAPE — the scalar-literal unroll this
    replaced (in git history) re-generated k x dim constants into the
    source and paid a recompile + giant-expression analysis cost per
    codebook (measured at sf0.1: x35 kmeans 4.9→1.5 s, x83 2.3→0.9 s,
    x38 PQ 7.0→2.8 s median, hashes unchanged). Arithmetic is
    IEEE-identical to the unrolled chain: the fold's 0.0 init is exact
    against the first term and zip_with preserves element order; argmin
    is array_position(d, array_min(d)) — comparisons only, first match
    = lowest index, the same tie-break as a (dist, cell) struct sort.
    Per-row HOF evaluation is interpreted (k x dim multiply-adds), the
    right trade while compile cost dominates; at extreme per-row
    budgets the codegen'd unroll is one `git log` away."""
    cb = (
        "array("
        + ", ".join(
            "array(" + ", ".join(_sql_double(float(x)) for x in c) + ")"
            for c in centroids
        )
        + ")"
    )
    ss = (
        "array("
        + ", ".join(
            _sql_double(sum(x * x for x in c)) for c in centroids
        )
        + ")"
    )
    dists = (
        f"zip_with({ss}, {cb}, (s, c) -> s - 2.0D * "
        f"aggregate(zip_with({vec_sql}, c, (a, b) -> "
        f"CAST(a AS DOUBLE) * b), CAST(0.0 AS DOUBLE), "
        f"(acc, x) -> acc + x))"
    )
    return F.expr(
        f"CAST(array_position({dists}, array_min({dists})) - 1 AS INT)"
    )


def _farthest_point_seeds(
    points: list[tuple[int, list[float]]], k: int
) -> list[list[float]]:
    """Greedy farthest-point initialization over a (small, driver-side)
    sample: start from the lowest id, then repeatedly add the point with
    the maximum min-squared-distance to the chosen seeds (ties -> lowest
    id). Deterministic k-means++ stand-in; O(|sample| * k * dim)."""
    chosen = [points[0][1]]
    best = {
        pid: sum((a - b) ** 2 for a, b in zip(vec, chosen[0]))
        for pid, vec in points
    }
    by_id = dict(points)
    while len(chosen) < min(k, len(points)):
        far_id = max(best, key=lambda pid: (best[pid], -pid))
        far_vec = by_id[far_id]
        chosen.append(far_vec)
        for pid, vec in points:
            d = sum((a - b) ** 2 for a, b in zip(vec, far_vec))
            if d < best[pid]:
                best[pid] = d
    while len(chosen) < k:  # fewer distinct points than k: repeat head
        chosen.append(chosen[0])
    return [list(c) for c in chosen]


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    max_iterations: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]], int]:
    """Distributed Lloyd k-means over an embedding column — the iterative
    refinement that turns :func:`ivf_topk`'s lowest-id seed quantizer into
    real centroids, and the template for iterative ML on DataFrames.

    Determinism, the hard part of distributed k-means, is handled at every
    step: seeding is a deterministic hash-ranked sample (md5 of the id —
    the x16 sampling trick, one scan, ≤256 rows collected) refined by
    greedy farthest-point selection (k-means++ shaped, no RNG, min-id
    tie-breaks), assignment tie-breaks on cell index, and the update step
    integer-sums floor(val*1e6) fixed-point components (the x21 centroid
    trick) so the result is identical at ANY partitioning/parallelism —
    float summation order never leaks into the output. Convergence = the
    quantized sum signature repeating, which implies the centroids (hence
    the next assignment) are a fixpoint.

    Scale posture: centroids travel driver->executors as plan literals
    (k x dim doubles), so each round is one codegen'd assignment
    projection plus one partial-aggregated (cell, pos) shuffle; the
    per-round collect is k x dim rows — bounded, never data-sized. Plan
    depth is CONSTANT per round (each round's plan rebuilds from the
    persisted input + literals, the no-lineage-blowup alternative to
    iterating on a DataFrame).

    Returns (assignments (id, cell), centroids, rounds_run).
    """
    vecs = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v")).persist()
    # NULL vectors never seed (seeding-collect-side filter; the float()
    # loop below crashed the driver on one — round-10 NULL audit)
    sample = (
        vecs.filter(F.col("v").isNotNull())
        .orderBy(F.md5(F.col("vid").cast("string")), "vid")
        .limit(max(k, 256))
        .collect()
    )
    if not sample:
        empty = vecs.select(F.col("vid").alias(id_col), F.lit(0).alias("cell"))
        vecs.unpersist()
        return empty, [], 0
    centroids = _farthest_point_seeds(
        sorted((r.vid, [float(x) for x in r.v]) for r in sample), k
    )
    dim = len(centroids[0])
    prev_sig: list | None = None
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        assigned = vecs.withColumn(
            "cell", _nearest_centroid_cell("v", centroids)
        )
        stats = (
            assigned.select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(
                    F.floor(F.col("val").cast("double") * 1_000_000)
                ).alias("qsum"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        sig = sorted((r.cell, r.pos, int(r.qsum), r.n) for r in stats)
        if sig == prev_sig:
            break
        prev_sig = sig
        by_cell: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for r in stats:
            by_cell.setdefault(r.cell, [0.0] * dim)[r.pos] = float(r.qsum)
            counts[r.cell] = r.n
        centroids = [
            [c / (1_000_000.0 * counts[i]) for c in by_cell[i]]
            if i in by_cell
            else centroids[i]  # empty cell keeps its centroid (standard)
            for i in range(k)
        ]
    # materialize the final assignment BEFORE releasing the input cache —
    # the returned frame is consumed lazily (count + hash passes in the
    # harness), and an unpersisted lineage would re-read the source per
    # pass; localCheckpoint also severs the plan from the cache entry
    assignments = (
        vecs.withColumn("cell", _nearest_centroid_cell("v", centroids))
        .select(F.col("vid").alias(id_col), "cell")
        .localCheckpoint(eager=True)
    )
    vecs.unpersist()
    return assignments, centroids, rounds


def _fixed_rounds_centroids(
    vecs: DataFrame, k: int, rounds: int
) -> list[list[float]]:
    """Closed-form Lloyd trainer shared by :func:`kmeans_fixed_rounds`
    and :func:`pq_train_fixed`: ``vecs`` is a pre-persisted
    (vid, v double-array) frame; seeds are the ``k`` lowest-vid vectors
    and EXACTLY ``rounds`` update iterations run — no data-dependent
    convergence test, so an external engine can replay every step.
    Updates use the fixed-point floor(val*1e6) integer sums (order-free,
    exact at any parallelism); assignment tie-breaks on the lower cell
    index. Returns the final centroids ([] on an empty input).

    NULL vectors never seed (seeding-collect-side filter; crashes the
    driver otherwise — round-10 NULL-payload audit)."""
    seed_rows = (
        vecs.filter(F.col("v").isNotNull()).orderBy("vid").limit(k).collect()
    )
    if not seed_rows:
        return []
    centroids = [[float(x) for x in r.v] for r in seed_rows]
    k = len(centroids)
    dim = len(centroids[0])
    for _ in range(rounds):
        assigned = vecs.withColumn(
            "cell", _nearest_centroid_cell("v", centroids)
        )
        stats = (
            assigned.select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.floor(F.col("val") * 1_000_000)).alias("qsum"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by_cell: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for r in stats:
            by_cell.setdefault(r.cell, [0.0] * dim)[r.pos] = float(r.qsum)
            counts[r.cell] = r.n
        centroids = [
            [q / (1_000_000.0 * counts[i]) for q in by_cell[i]]
            if i in by_cell
            else centroids[i]  # empty cell keeps its centroid
            for i in range(k)
        ]
    return centroids


def kmeans_fixed_rounds(
    df: DataFrame,
    k: int = 4,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hash-verifiable twin of :func:`kmeans_lloyd`: seeds are the ``k``
    lowest-id vectors (no farthest-point greedy) and EXACTLY ``rounds``
    Lloyd iterations run (no data-dependent convergence test), so an
    external engine can replay the whole computation — every step is
    closed-form. Vectors are cast to double up front so both engines do
    identical IEEE arithmetic; updates use the same fixed-point
    floor(val*1e6) integer sums as kmeans_lloyd (order-free, exact),
    assignment tie-breaks on the lower cell index.

    Same scale posture as kmeans_lloyd: literal-centroid assignment
    projection + one partial-aggregated (cell, pos) shuffle per round;
    per-round collect is k x dim rows. Returns (id, cell) after a final
    assignment against the round-``rounds`` centroids.
    """
    vecs = df.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).persist()
    centroids = _fixed_rounds_centroids(vecs, k, rounds)
    if not centroids:
        out = vecs.select(
            F.col("vid").alias(id_col), F.lit(0).cast("int").alias("cell")
        )
        vecs.unpersist()
        return out
    out = (
        vecs.withColumn("cell", _nearest_centroid_cell("v", centroids))
        .select(F.col("vid").alias(id_col), F.col("cell").cast("int").alias("cell"))
        .localCheckpoint(eager=True)
    )
    vecs.unpersist()
    return out


# ---------------------------------------------------------------------------
# product quantization (PQ) — compressed-vector ANN
# ---------------------------------------------------------------------------


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iterations: int = 10,
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al. 2011 shape): split
    each vector into ``m`` contiguous subvectors and run the
    deterministic :func:`kmeans_lloyd` per subspace. Returns ``m``
    codebooks of ``k`` centroids each (sub_dim = dim / m).

    This is the standard memory lever for 100 TB-scale ANN: an m-cell
    code column (one small int per subspace) replaces the dim×4-byte
    float vector, and candidate scanning drops from O(dim) multiplies to
    O(m) table lookups. Training cost is m bounded Lloyd runs whose
    per-round shuffle is (cell, pos) partial aggregates — never
    data-sized collects. Every step inherits kmeans_lloyd's determinism
    (hash-ranked seeds, fixed-point updates), so codebooks are identical
    at any parallelism.
    """
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        return []
    dim = int(first.d)
    if dim % m:
        raise ValueError(f"embedding dim {dim} is not divisible by m={m}")
    sub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        piece = df.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias("embedding"),
        )
        _, centroids, _ = kmeans_lloyd(piece, k=k, max_iterations=max_iterations)
        books.append(centroids)
    return books


def pq_train_fixed(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Hash-verifiable twin of :func:`pq_train`: per subspace, the
    closed-form fixed-rounds Lloyd trainer (k lowest-id subvector
    seeds, exactly ``rounds`` updates) instead of convergence-based
    :func:`kmeans_lloyd` — every arithmetic step is replayable by an
    external SQL engine, which is what lets the x38 catalog entry
    carry a full ADC-ranking oracle.

    All ``m`` subspace trainings are FUSED into one job per round: the
    seeds come from a single lowest-vid collect (the vid ordering is
    subspace-independent), and each round runs ONE assignment
    projection carrying all m cell columns plus ONE partial-aggregated
    (subspace, cell, subpos) shuffle — the per-subspace loop would pay
    m x rounds separate actions for identical arithmetic (measured 9.6
    -> ~3 s at sf0.1: driver-round fixed costs dominate, and they are
    constant in data size, so the fusion matters MORE at 100 TB where
    each extra action is a full scan). Per-round collect is
    m x k x sub_dim rows, never data-sized."""
    # seeds skip NULL vectors (a NULL seed crashed the float() loop —
    # round-10 NULL-payload audit; bounded seeding-side queries only).
    # dim comes from the seed rows themselves (r11: the previous
    # separate first()-probe was one more full driver action per
    # training call for a value the seeds already carry; empty-input
    # behavior unchanged — no seeds ⇒ the same empty return as the
    # old None probe, and the dim % m ValueError fires on the same
    # non-empty inputs as before).
    vecs = df.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).persist()
    seed_rows = (
        vecs.filter(F.col("v").isNotNull()).orderBy("vid").limit(k).collect()
    )
    if not seed_rows:
        vecs.unpersist()
        # same empty contract as the old dim probe: no non-NULL vector
        # anywhere ⇒ [] (the old [[] for _ in range(m)] branch was
        # unreachable — the seeds filter matches exactly the rows the
        # probe matched, and pq_topk's `if not codebooks` guard would
        # crash on that shape anyway)
        return []
    dim = len(seed_rows[0].v)
    if dim % m:
        vecs.unpersist()
        raise ValueError(f"embedding dim {dim} is not divisible by m={m}")
    sub = dim // m
    books = [
        [
            [float(x) for x in r.v[j * sub : (j + 1) * sub]]
            for r in seed_rows
        ]
        for j in range(m)
    ]
    kk = len(seed_rows)
    for _ in range(rounds):
        cells = [
            _nearest_centroid_cell(
                f"slice(v, {j * sub + 1}, {sub})", books[j]
            ).alias(f"c{j}")
            for j in range(m)
        ]
        # the assignment's centroid constants fold into a complex
        # Literal (references table), so every round reuses ONE compiled
        # plan shape — the r6 formulation that removed the old per-round
        # janino recompile (~2-5 s/round, constant in data size); row
        # work is k x dim multiply-adds per assignment
        assigned = vecs.select("v", *cells)
        stats = (
            assigned.select(
                *[f"c{i}" for i in range(m)],
                F.posexplode("v").alias("pos", "val"),
            )
            .select(
                F.expr(f"pos div {sub}").cast("int").alias("j"),
                (F.col("pos") % sub).alias("subpos"),
                F.element_at(
                    F.array(*[F.col(f"c{i}") for i in range(m)]),
                    F.expr(f"pos div {sub}").cast("int") + 1,
                ).alias("cell"),
                "val",
            )
            .groupBy("j", "cell", "subpos")
            .agg(
                F.sum(F.floor(F.col("val") * 1_000_000)).alias("qsum"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        for j in range(m):
            by_cell: dict[int, list[float]] = {}
            counts: dict[int, int] = {}
            for r in stats:
                if r.j != j:
                    continue
                by_cell.setdefault(r.cell, [0.0] * sub)[r.subpos] = float(
                    r.qsum
                )
                counts[r.cell] = r.n
            books[j] = [
                [q / (1_000_000.0 * counts[i]) for q in by_cell[i]]
                if i in by_cell
                else books[j][i]
                for i in range(kk)
            ]
    vecs.unpersist()
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pq_code) — per subspace, the index of the nearest codebook
    centroid (squared-L2, tie-break on the lower index). Pure projection:
    codebooks ride the plan as constant-folded array literals, so
    encoding 100 TB is one map pass with no shuffle and no Python."""
    sub = len(codebooks[0][0])
    codes = F.array(
        *[
            _nearest_centroid_cell(
                f"slice({vec_col}, {j * sub + 1}, {sub})", book
            )
            for j, book in enumerate(codebooks)
        ]
    )
    return df.select(F.col(id_col), codes.alias("pq_code"))


def pq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k: candidates are
    represented ONLY by their PQ codes; a probe's distance to a candidate
    is Σ_j ||q_j − centroid_j[code_j]||² — the probe stays exact, the
    corpus is compressed. Ranking ascends on that squared-L2 estimate
    with an id tie-break, so the k-row cut is total-ordered.

    Scale shape: the code frame (the only corpus-sized thing) is a
    persisted projection; probes broadcast; per-candidate cost is m
    element_at lookups + m×sub_dim literal arithmetic inside codegen. The
    exact re-ranking a production pipeline would add (fetch true vectors
    for the top candidates) is :func:`brute_force_topk` over the cut.

    Output: (probe_id, neighbor_id, adc_dist, rank).
    """
    if not codebooks:
        # empty corpus trains no codebooks (pq_train returns []) — return
        # a correctly-typed empty result instead of indexing into nothing
        return (
            probes.select(F.col(id_col).alias("probe_id"))
            .crossJoin(
                corpus.select(
                    F.col(id_col).alias("neighbor_id"),
                    F.lit(0.0).alias("adc_dist"),
                    F.lit(0).alias("rank"),
                )
            )
            .select("probe_id", "neighbor_id", "adc_dist", "rank")
            .limit(0)
        )
    sub = len(codebooks[0][0])
    codes = (
        pq_encode(corpus, codebooks, id_col, vec_col)
        .select(F.col(id_col).alias("neighbor_id"), "pq_code")
        .persist()
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    # all m codebooks as ONE nested literal (constant-folded into the
    # codegen references table → plan-shape-stable source, janino cache
    # hits across reps — the r6 A/B winner over the scalar-literal
    # unroll, x38 7.0→2.8 s median at sf0.1, hash unchanged); ADC =
    # Σ_j fold over the j-th probe slice vs the coded centroid — same
    # left-to-right order and 0.0-exact inits as an unrolled chain, so
    # every double is bit-identical to the replayed oracle arithmetic
    cb_all = (
        "array("
        + ", ".join(
            "array("
            + ", ".join(
                "array("
                + ", ".join(_sql_double(float(x)) for x in c)
                + ")"
                for c in book
            )
            + ")"
            for book in codebooks
        )
        + ")"
    )
    adc_sql = (
        f"aggregate(zip_with(pq_code, sequence(1, {len(codebooks)}), "
        f"(code, j) -> aggregate(zip_with("
        f"slice(probe_vec, (j - 1) * {sub} + 1, {sub}), "
        f"element_at(element_at({cb_all}, j), code + 1), "
        f"(a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)"
        f"), CAST(0.0 AS DOUBLE), (acc2, x2) -> acc2 + x2)), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    scored = (
        codes.join(
            F.broadcast(p), F.col("neighbor_id") != F.col("probe_id")
        )
        .withColumn("adc_dist", F.expr(adc_sql))
        .select("probe_id", "neighbor_id", "adc_dist")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def knn_graph(
    df: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-NN GRAPH over the whole corpus: for every vector,
    its top-k most-cosine-similar neighbors among vectors in the SAME
    sign-bit LSH bucket. This is the primitive under graph-based
    clustering and kNN-propagation labeling; unlike lsh_topk (few probes,
    broadcast) the probe side here IS the corpus, so the plan is a
    bucket-keyed SELF-join — both sides shuffle once on the bucket id,
    no broadcast, which is the correct 100 TB shape when every row is a
    probe. Ranking is total-ordered (cos desc, neighbor id asc).

    Output: (src_id, dst_id, cos_sim, rank), rank 1..k per src — rows
    exist only for vectors whose bucket holds at least one other vector.
    NULL vectors are excluded (the engine-wide vector-NULL convention).
    """
    planes = hyperplanes(n_planes, dim)
    keyed = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("nrm"),
        signature_bits_sql(_qid(vec_col), planes).alias("bucket"),
    ).persist()
    x, y = keyed.alias("x"), keyed.alias("y")
    scored = (
        x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") != F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("src_id"),
            F.col("y.id").alias("dst_id"),
            # per-row norms hoisted above the bucket self-join —
            # bit-identical, see brute_force_topk
            (
                dot(F.col("x.v"), F.col("y.v"))
                / (F.col("x.nrm") * F.col("y.nrm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("cos_sim"), F.asc("dst_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def power_iteration_top_component(
    df: DataFrame,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-rounds power iteration for the top principal direction of
    the (uncentered) Gram operator A = Σ xᵢxᵢᵀ — the PCA primitive,
    computed WITHOUT materializing the d x d matrix: each round is one
    distributed pass evaluating Av = Σ xᵢ (xᵢ·v), with v riding the
    plan as literals. The replayability recipe is the x83/x84 one:
    start vector 1/sqrt(dim) per component, per-component matvec sums
    accumulate as floor((val*dot)*1e6) fixed-point integers (order-free
    at any parallelism), the squared norm is an exact decimal sum of
    squared qsums, and normalization is the pinned expression
    (q/1e6) / (sqrt(double(nsq))/1e6) — every step closed-form, so the
    x92 oracle unrolls the whole iteration in SQL. Sign is
    deterministic (no RNG anywhere).

    Scale: per round one projection + one partial-aggregated (pos)
    shuffle of dim-sized groups; collects are dim rows. The per-round
    dot folds v as a constant-folded array literal (plan-shape-stable
    codegen source across rounds — see _nearest_centroid_cell), IEEE-
    equal to an unrolled chain.

    Output: (pos, loading, lambda_est) — dim rows, loading the
    normalized component, lambda_est = ||Av|| (the Rayleigh estimate
    under the normalized input v).
    """
    vecs = df.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).persist()
    first = vecs.select(F.size("v").alias("d")).first()
    if first is None:
        vecs.unpersist()
        return df.sparkSession.createDataFrame(
            [], "pos int, loading double, lambda_est double"
        )
    dim = int(first.d)
    v = [1.0 / math.sqrt(dim)] * dim

    def matvec_qsums(vlist: list[float]) -> DataFrame:
        # v rides as ONE constant-folded array literal (references
        # table), so every round reuses the same compiled plan shape —
        # the unrolled chain this replaced regenerated codegen source
        # (64 scalar literals) per round; fold 0.0 init is exact
        # against the first product, so the dot is bit-identical
        vlit = (
            "array("
            + ", ".join(_sql_double(float(x)) for x in vlist)
            + ")"
        )
        d_sql = (
            f"aggregate(zip_with(v, {vlit}, (a, b) -> "
            f"CAST(a AS DOUBLE) * b), CAST(0.0 AS DOUBLE), "
            f"(acc, x) -> acc + x)"
        )
        return (
            vecs.withColumn("d", F.expr(d_sql))
            .select("d", F.posexplode("v").alias("pos", "val"))
            .groupBy("pos")
            .agg(
                F.sum(
                    F.floor(F.col("val") * F.col("d") * F.lit(1000000))
                ).alias("qsum")
            )
        )

    for _ in range(rounds - 1):
        rows = matvec_qsums(v).collect()
        qs = {r.pos: int(r.qsum) for r in rows}
        nsq = sum(q * q for q in qs.values())
        norm_c = math.sqrt(float(nsq)) / 1e6
        v = [(qs[p] / 1e6) / norm_c for p in range(dim)]
    qsf = matvec_qsums(v)
    nsqf = qsf.agg(
        F.sum(F.col("qsum").cast("decimal(19,0)") * F.col("qsum")).alias(
            "nsq"
        )
    )
    # decimal -> string -> double mirrors the oracle's
    # CAST(CAST(nsq AS VARCHAR) AS DOUBLE): the string parse is
    # correctly rounded in both engines by spec (the a8 idiom)
    norm_col = F.sqrt(F.col("nsq").cast("string").cast("double")) / F.lit(
        1000000.0
    )
    out = (
        qsf.crossJoin(F.broadcast(nsqf))
        .select(
            F.col("pos").cast("int").alias("pos"),
            (
                (F.col("qsum").cast("double") / F.lit(1000000.0)) / norm_col
            ).alias("loading"),
            norm_col.alias("lambda_est"),
        )
        .localCheckpoint(eager=True)
    )
    vecs.unpersist()
    return out
