"""Corpus-construction operators: mixture sampling and sequence sharding.

The two planning steps a pre-training data build runs after filtering and
dedup: draw an exact per-domain mixture, then lay documents out into
fixed-token-budget shards for sequence packing. Both are deterministic
(seeded, engine-portable md5 ordering) and fully SQL-expressible, so the
DuckDB oracle replays them row-for-row.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    counts: dict[str, int],
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """EXACT-count per-stratum sample (mixture construction).

    ``df.sampleBy`` is Bernoulli — counts fluctuate, which is wrong when a
    mixture spec says "exactly 3M rows of code, 1M of math". This draws
    exactly ``counts[stratum]`` rows (or all, if fewer exist) by ranking
    each stratum with a seeded, engine-portable hash order
    (``md5(seed:id)``, id tiebreak) and keeping the first N.

    Plan: ONE hash-partition shuffle on the stratum column + an
    in-partition sort (the rank window). Strata are processed in parallel;
    a mega-stratum is one sorted partition chain, not a global sort. The
    hash order makes the draw a uniform random sample, reproducible across
    engines and runs.
    """
    if not counts:
        return df.limit(0)
    order_key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(strata_col).orderBy(order_key, F.col(id_col))
    ranked = df.withColumn("_rn", F.row_number().over(w))
    cond = reduce(
        lambda a, b: a | b,
        [
            (F.col(strata_col) == F.lit(k)) & (F.col("_rn") <= int(n))
            for k, n in sorted(counts.items())
        ],
    )
    return ranked.where(cond).drop("_rn")


def _ranged_base_offsets(
    df: DataFrame,
    range_cols: list,
    weight_col: str | None,
    n_ranges: int | None,
) -> tuple[DataFrame, int]:
    """Two-phase prefix-sum scaffold for ARBITRARY orderable keys.
    Returns (rows with ``_pid``/``_base`` columns, grand total).

    Range-partitions on ``range_cols`` (ascending partition ids <=>
    ascending key ranges — Spark's sampler adapts the boundaries to any
    key skew and any orderable type), pins the evaluated rows AND their
    partition ids with an eager localCheckpoint (two later jobs must see
    identical rows/ids; the checkpoint writes only the narrow projection,
    about the same bytes the range shuffle itself moved), sends one
    per-partition total to the driver, cumulates into exclusive base
    offsets, broadcast-joins them back. The caller finishes with a
    WITHIN-partition window.

    Use ``_bucketed_base_offsets`` instead when the key is provably
    uniform (md5) — there the bucket is a pure expression and neither
    the range shuffle nor the checkpoint is needed.
    """
    spark = df.sparkSession
    P = n_ranges or max(2, spark.sparkContext.defaultParallelism)
    parted = (
        df.repartitionByRange(P, *[F.col(c) for c in range_cols])
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin rows + partition ids
    )
    agg = (
        F.sum(weight_col).alias("_tot")
        if weight_col is not None
        else F.count("*").alias("_tot")
    )
    totals = {
        r["_pid"]: r["_tot"] for r in parted.groupBy("_pid").agg(agg).collect()
    }
    base, acc = {}, 0
    for pid in sorted(totals):
        base[pid] = acc
        acc += int(totals[pid] or 0)
    base_df = F.broadcast(
        spark.createDataFrame(sorted(base.items()), "_pid int, _base long")
    )
    # acc is the grand total over the SAME pinned rows the offsets cover —
    # callers needing n (bin boundaries, ntile math) must use this, not an
    # independent re-count of a possibly nondeterministic upstream
    return parted.join(base_df, "_pid"), acc


def _bucketed_base_offsets(
    keyed: DataFrame, weight_col: str | None
) -> DataFrame:
    """Two-phase distributed prefix-sum tail (shared by the sharding and
    shuffle operators; same shape as the engine's gapless id allocation).

    ``keyed`` carries a ``_pid`` bucket column that is a PURE MONOTONE
    EXPRESSION of the global order key — a deterministic function of the
    row, so no partition-id pinning (and no checkpoint materialization)
    is ever needed. One narrow aggregate sends per-bucket totals (row
    count, or the sum of ``weight_col``) to the driver; those cumulate
    into exclusive bucket base offsets which broadcast-join back. The
    caller finishes the prefix sum with a WITHIN-bucket window — the
    only wide exchange in the whole plan.
    """
    spark = keyed.sparkSession
    agg = (
        F.sum(weight_col).alias("_tot")
        if weight_col is not None
        else F.count("*").alias("_tot")
    )
    totals = {
        r["_pid"]: r["_tot"] for r in keyed.groupBy("_pid").agg(agg).collect()
    }
    base, acc = {}, 0
    for pid in sorted(totals):
        base[pid] = acc
        acc += int(totals[pid] or 0)
    base_df = F.broadcast(
        spark.createDataFrame(sorted(base.items()), "_pid int, _base long")
    )
    return keyed.join(base_df, "_pid")


def assign_token_shards(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_ranges: int | None = None,
) -> DataFrame:
    """Contiguous token-offset sharding for sequence packing.

    Lays documents out in deterministic ``id`` order and assigns each a
    global token ``offset`` (exclusive prefix sum of token counts) and a
    ``shard_id = offset // budget`` — the plan a packing job consumes to
    build fixed-budget training sequences.

    A naive global ``Window.orderBy(id)`` computes the prefix sum in ONE
    task — the single-node bottleneck that kills this at 100 TB. Instead
    the scale-safe two-phase shape (same as the engine's gapless id
    allocation) via ``_ranged_base_offsets``: ids may be arbitrarily
    sparse/clustered (filtered corpora, merged id spaces) and of any
    orderable type, so the adaptive range partitioner — not a fixed-
    width bucket expression — assigns balanced partitions, and the
    checkpoint pins rows and partition ids so the totals job and the
    final plan see identical data even over nondeterministic upstreams
    (samples), while also tokenizing/deriving the weights exactly once.
    """
    based, _total = _ranged_base_offsets(
        df.select(F.col(id_col), F.col(tokens_col)),
        [id_col],
        weight_col=tokens_col,
        n_ranges=n_ranges,
    )
    w = Window.partitionBy("_pid").orderBy(id_col)
    local_prefix = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return (
        based
        .select(
            F.col(id_col),
            F.col(tokens_col),
            (F.col("_base") + local_prefix).alias("offset"),
            ((F.col("_base") + local_prefix) / F.lit(int(budget)))
            .cast("long")
            .alias("shard_id"),
        )
    )


def global_shuffle(
    df: DataFrame,
    seed: int = 42,
    id_col: str = "doc_id",
    n_ranges: int | None = None,
) -> DataFrame:
    """Deterministic global training-order shuffle.

    A pre-training run wants documents in uniform-random order, decoupled
    from ingest order (otherwise whole crawls/domains sit adjacent in the
    token stream). Orders rows by the seeded, engine-portable hash
    ``md5(seed:id)`` and assigns each its global position ``pos`` — a
    total, reproducible permutation any engine can replay for the same
    seed.

    Scale shape: the naive ``row_number() over (order by key)`` computes
    the permutation in ONE task. md5 keys are UNIFORM, so the range
    bucket is a pure monotone EXPRESSION — ``floor(prefix(_k) / 16^13 *
    P)`` (uniform-width buckets over the 13-hex-char prefix; bucket
    boundaries can only split prefix TIES, which land in one bucket by
    construction, and within-bucket rank orders by the FULL key). That
    removes both the range-partition shuffle and the eager checkpoint
    the generic scaffold needs to pin partition ids (at corpus scale
    that checkpoint writes the whole projection to local disk): one
    narrow counting aggregate, then ONE hash shuffle for the in-bucket
    rank window — nothing else moves. Callers should pass the narrow
    (id) projection and join payloads back by id afterwards, so corpus
    bytes are never globally sorted.

    PRECONDITION: ``df`` must be deterministic across re-evaluation (the
    counts job and the final plan each evaluate it). A nondeterministic
    upstream (``.sample`` without a pinned materialization, ``rand()``)
    would make the base offsets disagree with the ranked rows; persist
    or checkpoint such inputs first — or use ``assign_token_shards``'s
    scaffold, which pins rows itself.

    Returns the input columns plus ``pos`` (0-based).
    """
    spark = df.sparkSession
    P = n_ranges or max(2, spark.sparkContext.defaultParallelism)
    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    # 13 hex chars = 52 bits: exact as double; float division/multiply are
    # monotone (IEEE round-to-nearest), so the bucket is monotone in _k
    pref = F.conv(F.substring("_k", 1, 13), 16, 10).cast("double")
    bucket = F.least(
        F.lit(P - 1), F.floor(pref / F.lit(float(16 ** 13)) * F.lit(P)).cast("int")
    )
    based = _bucketed_base_offsets(
        df.withColumn("_k", key).withColumn("_pid", bucket), weight_col=None
    )
    w = Window.partitionBy("_pid").orderBy("_k", id_col)
    return (
        based
        .withColumn("pos", (F.col("_base") + F.row_number().over(w) - 1).cast("long"))
        .drop("_pid", "_base", "_k")
    )
