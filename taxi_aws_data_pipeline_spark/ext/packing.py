"""Training-sequence preparation operators: fixed-window chunking and
contiguous greedy packing (driver extension tier).

These are the steps between "curated documents" and "training batches":
split long documents into fixed token windows, then pack variable-length
documents into fixed-budget training sequences. Both are native Spark SQL
plans (higher-order lambdas + one window), no Python UDFs.

Scale posture:

- **chunking** is a pure projection + posexplode — no shuffle at all;
  output row count is sum(ceil(len/k)) and each row carries only its own
  window of text.
- **packing** needs a sequential scan by construction (greedy first-fit
  in a fixed document order is inherently order-dependent), so it uses
  the standard distributed compromise: contiguous packing — documents are
  laid out in a deterministic order (id) and a running token total is cut
  into budget-sized bins. One window per partition key (``source``), so
  parallelism is the number of sources/shards; at 100 TB you partition by
  (source, shard) so no single window sees more than a shard. The
  pandas/single-node reference shape for this is a sort + cumsum, which
  is exactly what the window computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import bind_once


def chunk_documents(
    df: DataFrame,
    k: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into consecutive k-word training windows.

    Output: (id, chunk_id, chunk_text, n_words) — chunk_id is 0-based
    position within the doc, n_words ≤ k (the tail window is short, never
    padded: padding is a tokenizer/collator concern, not a corpus one).
    Documents with null text are dropped. Pure projection + posexplode;
    the word array is let-bound so the tokenizing split runs once per row.
    """
    ws = F.split(F.lower(F.col(text_col)), r"\s+")

    def windows(w):
        n_chunks = F.greatest(
            F.ceil(F.size(w) / F.lit(float(k))), F.lit(1)
        ).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_chunks - F.lit(1)),
            lambda i: F.slice(w, i * k + 1, k),
        )

    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.posexplode(bind_once(ws, windows)).alias("chunk_id", "_w"),
        )
        .select(
            F.col(id_col),
            "chunk_id",
            F.concat_ws(" ", "_w").alias("chunk_text"),
            F.size("_w").alias("n_words"),
        )
    )


def contiguous_pack_bins(
    df: DataFrame,
    budget: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    partition_col: str | tuple = "source",
) -> DataFrame:
    """Assign each document to a fixed-token-budget training bin by
    contiguous packing: within each ``partition_col`` group, lay documents
    out in id order and cut the running word-count total into
    ``budget``-sized bins (bin = floor((cumsative_total - n_words) /
    budget) — i.e. the bin the document STARTS in).

    ``partition_col`` may be a single column name or a tuple of names —
    a composite pack key is how a source too large for one window
    partition splits into independently-packed subshards (the
    ``write_training_shards`` ``n_subshards`` lever).

    This is the deterministic, order-based approximation of greedy bin
    packing every large-scale pretraining pipeline uses (exact first-fit
    is sequential; contiguous packing is one window scan and loses only a
    few percent of fill). Output: (id, *partition, n_words, bin_id).
    """
    cols = (
        (partition_col,) if isinstance(partition_col, str)
        else tuple(partition_col)
    )
    w = Window.partitionBy(*cols).orderBy(id_col)
    toks = F.size(F.split(F.lower(F.col(text_col)), r"\s+"))
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            *[F.col(c) for c in cols],
            toks.alias("n_words"),
        )
        .withColumn("_end", F.sum("n_words").over(w))
        .select(
            F.col(id_col),
            *[F.col(c) for c in cols],
            "n_words",
            F.floor((F.col("_end") - F.col("n_words")) / F.lit(budget)).alias(
                "bin_id"
            ),
        )
    )


def pack_bin_stats(
    df: DataFrame,
    budget: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    partition_col: str = "source",
) -> DataFrame:
    """Per-bin packing summary over contiguous_pack_bins: how many docs
    landed in each bin and how full it is. The fill fraction is the
    packing-efficiency number a data loader reads before deciding budget /
    shard sizes. Output: (partition, bin_id, n_docs, total_words,
    fill_fraction) — fill can exceed 1.0 for the bin a long document
    spills out of (contiguous packing never splits a document; the
    chunking operator is the splitter).
    """
    bins = contiguous_pack_bins(df, budget, text_col, id_col, partition_col)
    return bins.groupBy(partition_col, "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        (F.sum("n_words") / F.lit(float(budget))).alias("fill_fraction"),
    )


def global_row_number(
    df: DataFrame,
    order_cols: tuple,
    n_partitions: int = 32,
    out_col: str = "global_idx",
    checkpoint: bool = True,
) -> DataFrame:
    """Contiguous 1-based global row numbers in a total order WITHOUT the
    scale-killer: ``row_number() OVER (ORDER BY ...)`` with no partition
    key collapses the whole dataset into ONE task. The distributed
    pattern instead: range-repartition on the order columns (each
    partition owns a contiguous key range), number rows within each
    partition in parallel, then add per-partition offsets computed from
    the partition COUNTS — a driver-side prefix sum over n_partitions
    integers, never data-sized.

    ``order_cols`` must be a total order (include a unique tie-break
    column) or numbering among ties is partition-placement-dependent.

    r12 shape (guide §1.5/§2.4): ONE pass, ONE action. The per-
    partition counts ride the eager ``localCheckpoint`` of the sorted
    data as ``observe()`` metrics (n_partitions conditional counts —
    the r11 eager-checkpoint/observe platform contract), replacing the
    separate count-collect action; and the in-partition position comes
    from ``monotonically_increasing_id`` evaluated ABOVE the partition
    sort (pid * 2^33 + row index — Spark's documented encoding; the
    sort is total per the order_cols contract, so the index is the
    sorted rank), replacing the per-partition ``row_number`` window.
    The window was not free: its partition-by-_pid clustering
    requirement re-SHUFFLED the whole frame a second time (hash on
    _pid) — the r11 plans show both exchanges. Numbering is identical
    (A/B: x87 0.86 -> 0.72 s, x94 1.89 -> 1.83 s min-of-5, exact row
    sets). Per-partition row counts beyond 2^33 would overflow the
    index encoding — 8.6e9 rows in ONE partition, far past any sane
    task size.

    The training-data uses: stable example ids for shuffled corpora,
    contiguous sample indexing for epoch-order curricula, resumable
    cursor positions.
    """
    base = (
        df.repartitionByRange(n_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    if checkpoint:
        from pyspark.sql import Observation

        obs = Observation()
        ranged = base.observe(
            obs,
            *[
                F.count(F.when(F.col("_pid") == i, True)).alias(f"c{i}")
                for i in range(n_partitions)
            ],
        ).localCheckpoint(eager=True)
        m = obs.get
        counts = {i: m[f"c{i}"] for i in range(n_partitions)}
    else:
        # plan-inspection / no-materialization path (tests assert the
        # distributed shape on the raw plan): counts via a bounded
        # collect over the persisted frame, as before r12
        ranged = base.persist()
        counts = {
            r._pid: r.n
            for r in ranged.groupBy("_pid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }  # n_partitions rows — bounded driver data
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_col = F.coalesce(
        *[
            F.when(F.col("_pid") == pid, F.lit(off))
            for pid, off in sorted(offsets.items())
        ],
        F.lit(0),
    ) if offsets else F.lit(0)
    local = F.col("_mid") - F.shiftleft(F.col("_pid").cast("long"), 33)
    return ranged.withColumn(
        out_col, (offset_col + local + 1).cast("long")
    ).drop("_pid", "_mid")
