"""Temporal joins Spark lacks as built-ins: as-of and range (interval).

Both are implemented as compositions of DataFrame operators (no UDFs,
no per-row Python), chosen for their shuffle shape at scale:

- ``asof_join``: union the two sides, one window pass per key carries
  the latest right row forward — exactly ONE shuffle on the key, no
  join at all. The naive alternative (join on key + ts inequality,
  then rank) shuffles both sides AND explodes key-groups into
  per-pair rows before pruning; the union-window form stays linear.
- ``range_join``: Spark plans a no-equi-key inequality join as
  BroadcastNestedLoopJoin — O(|L| * |R|) comparisons. Bucketing time
  into fixed bands and equi-joining on the band id (right rows
  duplicated into the bands their tolerance window covers) turns it
  into a hash join with O(matches) work; the exact predicate filters
  band-edge false positives.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    right_payload: Sequence[str],
    how: str = "inner",
    suffix: str = "_right",
    right_tiebreak: str | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` within the same ``on`` key group.

    Ties: a right row at exactly left's timestamp matches (<=
    semantics, like DuckDB ASOF and pandas merge_asof backward).
    Under duplicate right timestamps the winner is the highest
    ``right_tiebreak`` value (resolved inside the same window pass —
    cheaper than a dedup groupBy, which would cost a second exchange
    since it hashes on (key, ts) while the window hashes on key).

    Returns left columns + right_payload columns renamed with
    ``suffix``. ``how='inner'`` drops left rows with no match;
    ``'left'`` keeps them with nulls. ``tolerance_us`` (like pandas
    merge_asof) voids matches older than the tolerance — the match
    becomes null/dropped, evaluated per-row after the carry (no extra
    shuffle).
    """
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    tb = (
        F.col(right_tiebreak)
        if right_tiebreak is not None
        else F.lit(0)
    )
    r = right.select(
        *on,
        F.col(ts_col),
        payload_struct.alias("_asof_payload"),
        F.lit(0).alias("_asof_side"),
        tb.cast("long").alias("_asof_tb"),
        F.col(ts_col).alias("_asof_rts"),
    )
    left_cols = [c for c in left.columns]
    l = left.select(
        *left_cols,
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
        F.lit(1).alias("_asof_side"),
        F.lit(0).cast("long").alias("_asof_tb"),
        F.lit(None).cast("timestamp").alias("_asof_rts"),
    )
    # Right rows sort before left rows at the same timestamp so an
    # equal-ts right row is visible to the left row (<= semantics);
    # among right rows at the same ts the tiebreak sorts last = wins.
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        W.partitionBy(*on)
        .orderBy(
            F.col(ts_col).asc(), F.col("_asof_side").asc(), F.col("_asof_tb").asc()
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Both carries run over the SAME window before the side filter (a
    # window after the filter would no longer see the right rows);
    # Catalyst evaluates them in one Window operator, no extra pass.
    carried = unioned.withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    if tolerance_us is not None:
        # _asof_rts's last non-null comes from the same row as the
        # payload's (both null exactly on left rows), so this is the
        # matched row's timestamp.
        carried = carried.withColumn(
            "_asof_match_ts", F.last("_asof_rts", ignorenulls=True).over(w)
        )
    carried = carried.filter(F.col("_asof_side") == 1)
    if tolerance_us is not None:
        carried = carried.withColumn(
            "_asof_match",
            F.when(
                F.unix_micros(F.col(ts_col)) - F.unix_micros("_asof_match_ts")
                <= tolerance_us,
                F.col("_asof_match"),
            ),
        )
    out = carried.select(
        *left_cols,
        *[
            F.col("_asof_match")[c].alias(f"{c}{suffix}")
            for c in right_payload
        ],
    )
    if how == "inner":
        out = out.filter(F.col(f"{right_payload[0]}{suffix}").isNotNull())
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance_us: int,
    on: Sequence[str] = (),
    band_us: int | None = None,
) -> DataFrame:
    """All (left, right) pairs with |left.ts - right.ts| <= tolerance,
    optionally also matching equi-keys ``on``.

    Band width defaults to the tolerance: each right row lands in the
    bands covering [ts - tol, ts + tol] (at most 3), each left row
    probes its own band only — every qualifying pair shares a band, so
    an equi hash join + exact filter finds all of them. Band ids are
    epoch-microsecond integers divided by band width: uniform time
    distribution -> uniform partitioning; hot bands fall to AQE skew
    splitting.
    """
    band_us = band_us or tolerance_us
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    # floor division keeps negative epochs on the right band boundary
    l = left.withColumn("_band", F.floor(l_us / band_us))
    lo = F.floor((r_us - tolerance_us) / band_us)
    hi = F.floor((r_us + tolerance_us) / band_us)
    r = right.withColumn("_band", F.explode(F.sequence(lo, hi)))
    cond = l["_band"] == r["_band"]
    for k in on:
        cond = cond & (l[k] == r[k])
    return (
        l.join(r, cond, "inner")
        .filter(
            F.abs(F.unix_micros(l[left_ts]) - F.unix_micros(r[right_ts]))
            <= tolerance_us
        )
        .drop("_band")
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Gap-filled fixed-step resampling with forward fill —
    (key, bucket_ts, value): one row per key per ``step`` between the
    key's first and last observation; empty buckets carry the latest
    earlier observation forward. The time-series densification
    primitive Spark lacks as a built-in (pandas ``resample().ffill()``),
    composed entirely from DataFrame operators.

    Shuffle shape at scale:
      1. groupBy(key, bucket) picks the LAST observation per bucket
         via ``max_by`` with a total-order (ts, *tiebreaks) key —
         map-side partial agg collapses the fact table before the
         exchange, so the shuffle carries ≤ one row per (key, bucket).
      2. per-key bounds are a groupBy(key) over that already-small
         frame; the dense grid is ``sequence()`` + ``explode`` —
         GENERATED rows, never shuffled from the fact.
      3. one (key, bucket) hash join grid←obs (both sides are
         bucket-grain, tiny next to the fact) and one window pass on
         key for the forward fill (``last(ignorenulls)``).
    The raw fact table is read ONCE and never re-joined. Dense-grid
    cardinality is Σ_key span/step — bound it with the step size, not
    with the fact row count.

    Determinism: the per-bucket pick is a selection under a total
    order; the fill copies values — no float arithmetic anywhere.
    """
    bucket = F.date_trunc("hour", F.col(ts_col)) if step == "1 hour" else (
        F.window(F.col(ts_col), step).getField("start")
    )
    ordkey = F.struct(F.col(ts_col), *[F.col(c) for c in tiebreak_cols])
    obs = (
        df.select(
            F.col(key_col).alias("k"),
            bucket.alias("bucket_ts"),
            ordkey.alias("o"),
            F.col(value_col).alias("v"),
        )
        .groupBy("k", "bucket_ts")
        .agg(F.max_by("v", F.col("o")).alias("v_obs"))
        # Persisted (r11): BOTH the per-key bounds and the grid join
        # consume this bucketed aggregate — unpersisted, the corpus
        # scan + max_by shuffle ran twice.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bounds = obs.groupBy("k").agg(
        F.min("bucket_ts").alias("mn"), F.max("bucket_ts").alias("mx")
    )
    grid = bounds.select(
        "k",
        F.explode(F.expr(f"sequence(mn, mx, interval {step})")).alias(
            "bucket_ts"
        ),
    )
    joined = grid.join(obs, ["k", "bucket_ts"], "left")
    w = (
        W.partitionBy("k")
        .orderBy("bucket_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        F.col("k").alias(key_col),
        "bucket_ts",
        F.last("v_obs", ignorenulls=True).over(w).alias(value_col),
    )
