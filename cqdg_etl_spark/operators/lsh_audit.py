"""MinHash-LSH banding parameter audit.

Round 6 made the registered LSH queries derive their banding from the
corpus size (operators/similarity.derive_banding — SCALE_PROBE_r05.md
finding #1). This operator is the measurement side of that decision:
ONE signature pass, every candidate band layout evaluated against it,
so an operator (or a scheduled audit job) can pick the banding from
MEASURED candidate volume instead of the collision-probability model
alone. New module on purpose: published queries must not gain this
module in their verification closure (operators/dedup.py is closure-
shared by the whole dedup fleet; an edit there re-marks ~15 names).

No reference counterpart (Ferlab-Ste-Justine/cqdg-etl has no
analytics); the banding math is the standard OR-amplification analysis
(Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch. 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collision_probability(jaccard: float, bands: int, rows: int) -> float:
    """P[candidate] for a pair at the given true Jaccard under an
    (bands x rows) OR-of-AND banding: 1 - (1 - j^rows)^bands."""
    return 1.0 - (1.0 - jaccard ** rows) ** bands


def lsh_param_audit(
    sig: DataFrame,
    bands_list: tuple[int, ...],
    num_perm: int,
    ref_jaccard: float = 0.8,
) -> DataFrame:
    """One row per candidate band layout: measured distinct candidate-
    pair volume plus the model collision probability at a reference
    Jaccard. The signature frame is built ONCE by the caller (and
    should be persisted); ALL layouts band it in one tagged explode
    (the '-'-joined key construction of
    operators/dedup.minhash_lsh_candidates, reproduced here — not
    imported — so dedup.py stays out of this closure) and share one
    equi-key self-join, never a re-shingle of the corpus and never a
    cartesian. The banding is a static expression tree, not
    ``transform()`` lambdas: bands/rows are plan-time constants, and
    higher-order functions run interpreted outside whole-stage codegen
    (the nested transform/slice form measured 2-3x slower, r11 probe).

    Scale shape: the expensive corpus pass (shingle → hash → 64 mins)
    is shared; each audit arm shuffles only the skinny
    (doc, band_idx, band_key) frame. Auditing L layouts costs L
    equi-joins over candidate volume — exactly the quantity being
    measured, so a layout that is too coarse for the corpus reveals
    itself in its own arm's cost, bounded by the audit's count-only
    output (no vectors, no texts are ever fetched).
    """
    # Nested-layout fast path (r12): when every coarser layout's bands
    # divide the finest's (and all divide num_perm), an 8-row band is
    # exactly 4 aligned contiguous 2-row bands — a pair collides in a
    # coarse band IFF it collides in ALL of that band's fine sub-bands.
    # So ONE self-join on the FINEST banding finds every layout's
    # candidates: group the colliding fine band indices per pair into a
    # bitmask (bit_or is map-side combinable, which also DELETES the
    # pair-distinct exchange the tagged form needed), then each
    # layout's membership is a run-of-set-bits test on the mask and
    # the per-layout counts are conditional sums in one aggregate.
    # Versus the r11 tagged union of arms: banding rows per doc drop
    # from sum(bands_list) to max(bands_list), the two coarser arms'
    # join/distinct streams (supersets re-materialized) disappear, and
    # the whole reduction is partial-aggregated before the shuffle
    # (guide §2.3/§2.4). Non-nested bands_list falls back to the
    # tagged single-pass form.
    sorted_bands = sorted(bands_list)
    nested = (
        all(num_perm % bands == 0 for bands in bands_list)
        and all(
            sorted_bands[i + 1] % sorted_bands[i] == 0
            for i in range(len(sorted_bands) - 1)
        )
        and max(bands_list) <= 63
    )
    if nested:
        fine = max(bands_list)
        fine_rows = num_perm // fine
        structs = [
            F.struct(
                F.lit(i).alias("band_idx"),
                F.concat_ws(
                    "-",
                    *[
                        F.col("signature")
                        .getItem(i * fine_rows + j)
                        .cast("string")
                        for j in range(fine_rows)
                    ],
                ).alias("band_key"),
            )
            for i in range(fine)
        ]
        layout = sig.select(
            "doc", F.explode(F.array(*structs)).alias("band")
        ).select("doc", "band.band_idx", "band.band_key")
        # shuffle_hash for the same ReusedExchange reasoning as
        # minhash_lsh_candidates: broadcast-converting one side would
        # re-compute the banding subtree instead of reusing it.
        a = layout.alias("a").hint("shuffle_hash")
        b = layout.alias("b").hint("shuffle_hash")
        masks = (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .select(
                F.col("a.doc").alias("doc_a"),
                F.col("b.doc").alias("doc_b"),
                F.expr("shiftleft(CAST(1 AS BIGINT), a.band_idx)")
                .alias("bit"),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.bit_or("bit").alias("m"))
        )
        # layout with `bands` bands groups the fine mask into runs of
        # width = fine // bands; membership = any run fully set.
        def _has_full_run(width: int):
            folded = F.col("m")
            for shift in range(1, width):
                folded = folded.bitwiseAND(
                    F.shiftrightunsigned(F.col("m"), shift)
                )
            # run starts at multiples of width: mask of those positions
            starts = sum(1 << (w * width) for w in range(fine // width))
            return folded.bitwiseAND(F.lit(starts)) != 0

        counts_row = masks.agg(
            *[
                F.sum(
                    F.when(
                        _has_full_run(fine // bands), F.lit(1)
                    ).otherwise(F.lit(0))
                ).alias(f"n_{bands}")
                for bands in bands_list
            ]
        )
        counts = counts_row.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bands).alias("bands"),
                            F.coalesce(
                                F.col(f"n_{bands}"), F.lit(0)
                            ).cast("bigint").alias("n_candidate_pairs"),
                        )
                        for bands in bands_list
                    ]
                )
            ).alias("c")
        ).select("c.bands", "c.n_candidate_pairs")
    else:
        # Tagged single-pass form (r11): every layout's
        # (bands, band_idx, band_key) rows explode from the persisted
        # signature frame in one projection; the self-join +
        # pair-distinct + per-layout count run once over the union of
        # arms, the `bands` tag keeping arms apart in the join.
        structs = []
        for bands in bands_list:
            rows_per_band = num_perm // bands
            for i in range(bands):
                structs.append(
                    F.struct(
                        F.lit(bands).alias("bands"),
                        F.lit(i).alias("band_idx"),
                        F.concat_ws(
                            "-",
                            *[
                                F.col("signature")
                                .getItem(i * rows_per_band + j)
                                .cast("string")
                                for j in range(rows_per_band)
                            ],
                        ).alias("band_key"),
                    )
                )
        layout = sig.select(
            "doc", F.explode(F.array(*structs)).alias("band")
        ).select("doc", "band.bands", "band.band_idx", "band.band_key")
        a = layout.alias("a").hint("shuffle_hash")
        b = layout.alias("b").hint("shuffle_hash")
        pairs = a.join(
            b,
            (F.col("a.bands") == F.col("b.bands"))
            & (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        ).select(
            F.col("a.bands").alias("bands"),
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
        )
        counts = pairs.distinct().groupBy("bands").agg(
            F.count(F.lit(1)).alias("n_candidate_pairs")
        )
    # Literal per-layout frame: zero-fills a layout with no candidates
    # (the per-arm form's count-on-empty returned 0, and small-SF
    # oracles rely on the row existing) and carries the model column.
    spark = sig.sparkSession
    meta = spark.createDataFrame(
        [
            (
                pos,
                bands,
                num_perm // bands,
                round(
                    collision_probability(
                        ref_jaccard, bands, num_perm // bands
                    ),
                    6,
                ),
            )
            for pos, bands in enumerate(bands_list)
        ],
        "pos int, bands int, rows_per_band int, collision_p_ref double",
    )
    return (
        meta.join(F.broadcast(counts), "bands", "left")
        .orderBy("pos")
        .select(
            F.col("bands").cast("int").alias("bands"),
            F.col("rows_per_band").cast("int").alias("rows_per_band"),
            F.coalesce(F.col("n_candidate_pairs"), F.lit(0))
            .cast("bigint")
            .alias("n_candidate_pairs"),
            F.col("collision_p_ref").cast("double").alias("collision_p_ref"),
        )
    )
