"""Graph analytics over DataFrames (driver extension tier): PageRank on
entity graphs derived from the relational tables.

Connected components (the other iterative graph op) lives in
``ext/dedup.py`` next to its LSH consumers; this module holds the
rank-propagation family.

Determinism is the design center, as in the k-means tier: a naive
PageRank sums double contributions in shuffle order, so two runs of the
same job can disagree in the last ulps. Here the WHOLE iteration is
integer arithmetic — ranks are fixed-point integers (SCALE = 1e12), a
node's contribution is ``rank div out_degree`` (integer division), the
damping is ``(sum * 85) div 100`` (integer), and the teleport term is
``(SCALE * 15 div 100) div N`` — so the result is bit-identical at any
parallelism AND replayable by any engine with 64-bit integers (the
oracle unrolls the rounds in SQL). The deliberate rounding mass-loss is
< N * rounds ulps of SCALE — noise at rank scale, zero at verification
scale.

Scale posture: each round is one (src) equi-join of the edge table with
the rank table plus one partial-aggregated (dst) shuffle — the textbook
distributed PageRank shape; ranks are (node, long) pairs, never
adjacency lists. Plan depth grows linearly with rounds, so for large
round counts truncate lineage every few rounds (``localCheckpoint``)
exactly as ``ext/dedup.connected_components`` documents; the fixed
2-round catalog entry doesn't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000_000  # fixed-point: 1.0 of rank mass = 1e12


def pagerank_fixed_rounds(
    edges: DataFrame,
    rounds: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    check_dangling: bool = True,
) -> DataFrame:
    """Fixed-round integer PageRank over a directed edge list (distinct
    edges; every node must appear as a source — symmetric graphs satisfy
    this trivially, otherwise pre-add self-loops for dangling nodes).

    The precondition is CHECKED, not trusted: a destination-only
    (dangling) node would silently leak its rank mass out of the system
    and skew every other rank, so by default a violating edge list
    raises ValueError naming the count (one anti-join count over the
    distinct key sets — far smaller than the edge table; pass
    ``check_dangling=False`` only when the caller constructs the graph
    symmetric by construction, as the x84 co-supply entry does).

    Returns (node, rank_scaled, rank): the fixed-point integer rank and
    its double rendering rank_scaled / SCALE.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist()
    if check_dangling:
        n_dangling = (
            e.select(F.col("dst").alias("k"))
            .distinct()
            .join(e.select(F.col("src").alias("k")).distinct(), "k", "left_anti")
            .count()
        )
        if n_dangling:
            e.unpersist()
            raise ValueError(
                f"pagerank_fixed_rounds: {n_dangling} dangling node(s) "
                "appear only as destinations — their rank mass would "
                "silently leak; add self-loops (or make the graph "
                "symmetric) before calling"
            )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    nodes = out_deg.select(F.col("src").alias("node"), "out_deg").persist()
    n_nodes = nodes.count()  # one scalar — bounded driver data
    if n_nodes == 0:
        empty = nodes.select(
            "node",
            F.lit(0).cast("long").alias("rank_scaled"),
            F.lit(0.0).alias("rank"),
        )
        e.unpersist()
        nodes.unpersist()
        return empty
    teleport = (PR_SCALE * 15 // 100) // n_nodes
    # ranks CARRIES out_deg through the rounds (r11 optimization, guide
    # §2.4): the previous shape re-joined ranks with nodes every round
    # just to re-attach out_deg — one data-scaled join per round that
    # vanishes when the (node, out_deg, r) triple rides together. Rank
    # values are bit-identical (same arithmetic, same join tree depth
    # on the contribution side).
    ranks = nodes.select(
        "node", "out_deg", F.lit(PR_SCALE // n_nodes).cast("long").alias("r")
    )
    for _ in range(rounds):
        contribs = (
            e.join(
                ranks.select(
                    F.col("node").alias("src"), "r", "out_deg"
                ),
                "src",
            )
            .select("dst", F.expr("r div out_deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            contribs, nodes["node"] == contribs["dst"], "left"
        ).select(
            "node",
            "out_deg",
            (
                F.lit(teleport)
                + F.expr("coalesce(s, 0L) * 85 div 100")
            ).cast("long").alias("r"),
        )
    # materialize before releasing the caches (the caller consumes the
    # result lazily; checkpoint severs the lineage from e/nodes)
    out = ranks.select(
        "node",
        F.col("r").alias("rank_scaled"),
        (F.col("r") / F.lit(float(PR_SCALE))).alias("rank"),
    ).localCheckpoint(eager=True)
    e.unpersist()
    nodes.unpersist()
    return out


def label_propagation_fixed_rounds(
    edges: DataFrame,
    rounds: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-round synchronous label propagation (community detection)
    over a symmetric edge list: every node starts as its own label; each
    round, every node adopts the MOST FREQUENT label among its
    neighbors, ties broken by the smaller label — so with a fixed round
    count the whole computation is closed-form and an external engine
    can replay it (the x91 oracle unrolls the rounds in SQL). This is
    the classic near-linear community detector (Raghavan et al. 2007)
    with the asynchronous/random bits replaced by deterministic
    synchronous updates, the same verifiability trade the k-means and
    PageRank tiers make.

    Scale posture: per round one (dst) equi-join of the edge list with
    the (node, label) frame + ONE src-keyed exchange feeding both
    aggregations (r12, guide §2.4): the joined rows repartition by
    src once, and because HashPartitioning(src) satisfies the
    clustered-distribution requirement of BOTH the (node, label)
    count and the per-node argmax (max over (c, -label) structs — no
    window, no sort), neither aggregate adds an exchange. The r11
    shape paid two exchanges per round (partial-agg by (src, lab),
    then re-shuffle by node); trading the map-side combine for one
    exchange measured 3.52 -> 2.42 s on the x91 pipeline (min-of-5,
    same session, identical labels). Labels are scalar pairs,
    adjacency never ships, and plan depth grows linearly with the
    small fixed round count (localCheckpoint the result, as here,
    for more).

    Returns (node, label) for every node of the symmetric edge list
    (every node is a src of ≥1 edge, so the per-round neighbor-count
    frame covers all of them; isolated nodes cannot occur under the
    symmetric-input contract).

    Contract: node ids must be NUMERIC (all callers pass integer
    keys). The argmax tie-break negates the label (max over
    (c, -label) structs), which has no meaning for string ids — those
    would error under ANSI casting rather than silently mis-break
    ties (ADVICE r11). The symmetric-edge contract is pinned by
    tests/test_properties.py::test_lp_symmetric_contract_*.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist()
    nodes = e.select(F.col("src").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("lab"))
    # r11 optimization (guide §2.4): the per-node top-1 was a
    # row_number window (its own exchange + SORT per round) and each
    # round re-joined `nodes` left to re-cover isolated nodes. In a
    # symmetric edge list (the function's documented contract) every
    # node appears as src of ≥1 edge, so the neighbor-count frame
    # already covers every node each round and the left join +
    # coalesce was structurally a no-op; and argmax-by-(c DESC, lab
    # ASC) ≡ max(struct(c, -lab)) — a partial-aggregable two-phase
    # aggregation with NO sort. Labels are value-identical (same
    # counts, same tie-break; re-verified hash-exact vs the unrolled
    # x91/x180/x233 oracles).
    for _ in range(rounds):
        counts = (
            e.join(labels.withColumnRenamed("node", "dst"), "dst")
            # ONE exchange per round (r12): both grouped aggregates
            # below are src-clustered, so an explicit src repartition
            # lets them run exchange-free (alias-aware partitioning
            # carries hash(src) through node = src). See docstring.
            .repartition("src")
            .groupBy(F.col("src").alias("node"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            counts.groupBy("node")
            .agg(
                F.max(
                    F.struct(
                        F.col("c"), (-F.col("lab")).alias("neg_lab")
                    )
                ).alias("m")
            )
            .select("node", (-F.col("m.neg_lab")).alias("lab"))
        )
    out = labels.select("node", F.col("lab").alias("label")).localCheckpoint(
        eager=True
    )
    e.unpersist()
    return out


def personalized_pagerank_fixed_rounds(
    edges: DataFrame,
    seed: int,
    rounds: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Personalized PageRank with ALL teleport mass on one seed node —
    the 'related to X' variant of :func:`pagerank_fixed_rounds`: random
    walks restart at the seed instead of uniformly, so rank concentrates
    in the seed's neighborhood and the result ranks nodes by proximity
    to it (recommendation / expansion queries). Same fixed-point integer
    arithmetic and one-equi-join-one-partial-agg-per-round shape; the
    initial vector is the seed indicator, teleport is
    ``15% * SCALE`` at the seed and zero elsewhere, so every quantity
    stays an exact int64 and the oracle can replay rounds verbatim.
    Assumes the symmetric-graph no-dangling precondition of the caller
    (co-supply edges are symmetric by construction)."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    nodes = out_deg.select(F.col("src").alias("node"), "out_deg")
    # ranks carries out_deg through the rounds (r11 optimization — same
    # rework as pagerank_fixed_rounds: the per-round ranks⋈nodes join
    # existed only to re-attach out_deg; values are bit-identical)
    ranks = nodes.select(
        "node",
        "out_deg",
        F.when(F.col("node") == seed, F.lit(PR_SCALE))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r"),
    )
    teleport = F.when(
        F.col("node") == seed, F.lit(PR_SCALE * 15 // 100)
    ).otherwise(F.lit(0))
    for _ in range(rounds):
        contribs = (
            e.join(
                ranks.select(
                    F.col("node").alias("src"), "r", "out_deg"
                )
                # r12 (guide §2.3, shuffle fewer bytes): rank mass is
                # non-negative and starts concentrated at the seed, so
                # most nodes carry r == 0 in the early rounds and
                # contribute exactly 0 (integer r DIV out_deg == 0).
                # Dropping them BEFORE the edge join prunes the joined
                # rows to the seed's k-hop neighborhood per round; a
                # dst reached only by zero-rank sources merely vanishes
                # from contribs, which the left join's COALESCE(s, 0)
                # already treats as 0. Values bit-identical (interleaved
                # A/B: old 3.14-3.31 s, new 2.29-2.86 s across 7 pairs).
                .filter(F.col("r") > 0),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("r DIV out_deg")).alias("s"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                "out_deg",
                (
                    teleport
                    + F.expr("COALESCE(s, 0) * 85 DIV 100")
                )
                .cast("long")
                .alias("r"),
            )
        )
    out = ranks.select(
        "node",
        F.col("r").alias("rank_scaled"),
        (F.col("r") / F.lit(float(PR_SCALE))).alias("rank"),
    )
    return out
