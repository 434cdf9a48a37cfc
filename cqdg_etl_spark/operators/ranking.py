"""Scalable global ranking / deterministic corpus shuffling.

Training pipelines need a reproducible global ORDER over the corpus
(shuffled-but-deterministic example order, resumable by rank range).
A naive ``row_number() OVER (ORDER BY ...)`` has an empty PARTITION BY
— Spark moves the entire dataset to ONE task (the WindowExec warning),
which is exactly the thing that cannot happen at 100 TB.

``global_rank`` computes the same total order with the classic
two-pass recipe: range-repartition + in-partition sort (each output
partition owns a disjoint key range), count rows per partition (a
K-row driver action, K = #partitions — the same class of scalar as an
iterative algorithm's convergence check), broadcast the cumulative
offsets back, and add them to a PER-PARTITION row_number (window
partitioned by ``spark_partition_id()`` — parallel, no single-task
sort). The resulting rank is independent of K and of range-sampling
boundaries because the order columns form a TOTAL order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
) -> DataFrame:
    """Add a 1-based global rank by ``order_cols`` without a
    single-partition sort. ``order_cols`` MUST form a total order
    (add a unique id as the last column) — otherwise ties make the
    rank partition-dependent.

    The range-partitioned frame is PERSISTED before the per-partition
    count action: the counts job and the final job are separate Spark
    jobs, and an unpersisted range exchange re-samples its boundaries
    per job — rows can land in a different partition than the one
    whose offset they get, silently corrupting ranks. (Invisible at
    small SF, where AQE coalesces the exchange to one partition and
    the two jobs trivially agree; caught by the r4 tie-skew stress
    test with coalescing disabled.) The cache pins the physical
    partitions both jobs read; MEMORY_AND_DISK spills at corpus scale
    rather than recomputing."""
    from pyspark import StorageLevel

    parted = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    with_pid = parted.withColumn("_pid", F.spark_partition_id())
    counts = (
        with_pid.groupBy("_pid").agg(F.count("*").alias("_n")).collect()
    )
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["_n"]
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(p, o) for p, o in offsets.items()], "_pid int, _off long"
        )
    )
    w = W.partitionBy("_pid").orderBy(*order_cols)
    return (
        with_pid.join(off_df, "_pid")
        .withColumn(rank_col, F.row_number().over(w) + F.col("_off"))
        .drop("_pid", "_off")
    )


def per_domain_rank(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    salt: str = "shuffle",
    rank_col: str = "src_rank",
) -> DataFrame:
    """1-based deterministic md5-shuffle rank WITHIN each domain,
    computed scalably: one global_rank over (domain, hash, id) —
    domains occupy contiguous global-rank ranges, so the in-domain
    rank is the global rank minus a broadcast per-domain offset
    (#domains rows). NEVER a window partitioned by the domain column:
    a window partition cannot be split, so at corpus scale a big
    domain would sort on one task.

    The building block for per-group sampling (filter rank ≤ k) and
    weighted interleave (rank → stream position)."""
    from cqdg_etl_spark.operators.sampling import hash_bucket

    keyed = df.withColumn("_hk", hash_bucket(F.col(id_col), salt))
    ranked = global_rank(
        keyed,
        [F.col(domain_col), F.col("_hk"), F.col(id_col)],
        rank_col="_grank",
    )
    base = F.broadcast(
        ranked.groupBy(domain_col).agg(F.min("_grank").alias("_base"))
    )
    return (
        ranked.join(base, domain_col)
        .withColumn(rank_col, F.col("_grank") - F.col("_base") + 1)
        .drop("_hk", "_grank", "_base")
    )


def interleave_by_weight(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weights: dict[str, float],
    salt: str = "interleave",
) -> DataFrame:
    """Deterministic weighted interleave of sources into ONE training
    order (the data-mixing step after mixture sampling): each domain is
    shuffled independently (md5 rank), then example ``r`` of a domain
    with weight ``w`` lands at position ``(r - 0.5) / w`` — domains
    stream in proportion to their weights instead of concatenating,
    so a training run sees the target mixture in every window of the
    stream, not just in aggregate. Rows whose domain has no entry in
    ``weights`` are dropped (inner join with the weight table).

    Scale shape: per-domain ranks come from ONE global_rank over
    (domain, hash, id) — domains occupy contiguous rank ranges, so the
    in-domain rank is the global rank minus a broadcast per-domain
    offset (#domains rows), not a per-domain single-task window. The
    final order is a second global_rank. Two range shuffles + two
    K-row driver actions total, independent of domain count/skew.
    """
    w_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(k, float(v)) for k, v in weights.items()],
            f"{domain_col} string, _w double",
        )
    )
    ranked = per_domain_rank(
        df.join(w_df, domain_col), id_col, domain_col, salt
    )
    positioned = ranked.withColumn(
        "pos", (F.col("src_rank") - F.lit(0.5)) / F.col("_w")
    )
    out = global_rank(
        positioned,
        [F.col("pos"), F.col(domain_col), F.col(id_col)],
        rank_col="train_order",
    )
    return out.drop("_w", "pos")


def deterministic_shuffle(
    df: DataFrame, id_col: str, salt: str = "shuffle"
) -> DataFrame:
    """Reproducible pseudo-random global order: rank rows by
    md5(salt || id) with the id as tiebreaker — the engine-portable
    corpus shuffle every training run can re-derive (and resume from
    any rank offset). Changing ``salt`` redraws the permutation."""
    from cqdg_etl_spark.operators.sampling import hash_bucket

    keyed = df.withColumn("_hk", hash_bucket(F.col(id_col), salt))
    return global_rank(
        keyed, [F.col("_hk"), F.col(id_col)], rank_col="shuffle_rank"
    ).drop("_hk")


def global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str | list[str],
    out_col: str | list[str] = "cum",
    total_col: str | list[str] | None = None,
) -> DataFrame:
    """Global cumulative sum of one OR SEVERAL value columns in
    ``order_cols`` order without a single-partition sort — same
    two-pass recipe as ``global_rank`` (range-repartition,
    per-partition prefix sums, ONE K-row driver action for the
    per-partition totals, broadcast offsets), but the offset carried
    is the SUM of all earlier partitions rather than their row count.
    Multiple columns share the single repartition + totals action +
    window pass (e.g. the two ECDF counts of a KS statistic) — N
    running sums cost ONE pass, not N.

    ``total_col`` (r11): the per-partition totals action already
    leaves each column's GRAND total at the driver — naming a total
    column attaches it as a literal (cast to the engine's own SUM
    result type), so callers that need ``sum(v) OVER ()`` alongside
    the running sum stop re-evaluating the input subtree with a
    separate aggregate + crossJoin (a full second pass over ``df``'s
    lineage — for tokenize-derived frames, a second tokenization of
    the corpus).

    ``order_cols`` MUST form a total order. For engine-exact results
    use integer/decimal value columns (token counts, byte sizes); a
    double column makes the cumsum order-dependent in the last ulp.
    """
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(value_cols) != len(out_cols):
        raise ValueError("value_col and out_col lengths differ")
    total_cols = (
        [total_col] if isinstance(total_col, str) else list(total_col)
    ) if total_col is not None else None
    if total_cols is not None and len(total_cols) != len(value_cols):
        raise ValueError("total_col and value_col lengths differ")
    # The broadcast offsets must carry each value column's own
    # arithmetic type: Spark's SUM widens integers to long, decimals
    # to precision 38 (same scale), doubles stay double — hardcoding
    # `long` would make createDataFrame reject the Decimal/float
    # partition sums the decimal/double paths produce.
    sum_probe = df.select(
        *[F.sum(v).alias(f"_s{i}") for i, v in enumerate(value_cols)]
    ).schema
    off_types = [f.dataType.simpleString() for f in sum_probe.fields]
    from pyspark import StorageLevel

    # Persisted for the same two-job partition-consistency reason as
    # global_rank (range boundaries re-sample per job otherwise).
    parted = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    with_pid = parted.withColumn("_pid", F.spark_partition_id())
    sums = (
        with_pid.groupBy("_pid")
        .agg(*[F.sum(v).alias(f"_s{i}") for i, v in enumerate(value_cols)])
        .collect()
    )
    from decimal import Decimal

    zeros = [
        0.0
        if t == "double"
        else Decimal(0)
        if t.startswith("decimal")
        else 0
        for t in off_types
    ]
    offsets = []
    acc = list(zeros)
    for row in sorted(sums, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], *acc))
        for i in range(len(value_cols)):
            acc[i] += row[f"_s{i}"] or zeros[i]
    off_schema = "_pid int, " + ", ".join(
        f"_off{i} {t}" for i, t in enumerate(off_types)
    )
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(offsets, off_schema)
    )
    w = (
        W.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = with_pid.join(off_df, "_pid")
    for i, (v, o) in enumerate(zip(value_cols, out_cols)):
        out = out.withColumn(o, F.sum(v).over(w) + F.col(f"_off{i}"))
    if total_cols is not None:
        # acc now holds each column's grand total (offsets loop ran to
        # the last partition); attach as typed literals — zero jobs.
        for i, t in enumerate(total_cols):
            out = out.withColumn(t, F.lit(acc[i]).cast(off_types[i]))
    return out.drop("_pid", *[f"_off{i}" for i in range(len(value_cols))])
