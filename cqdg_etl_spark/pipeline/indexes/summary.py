"""Per-study / per-donor availability summaries
(reference: indexes/Summary.scala).

Scale fix vs the reference: the reference repartition(1)s both sides of
every domain cross join ("infinite loop" workaround,
Summary.scala:9,23-25) — a driver-choking serialization point. Domains
here are tiny distinct frames, so we BROADCAST them: the cross join
becomes a BroadcastNestedLoopJoin and the big side never moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cqdg_etl_spark.functions.columns import to_boolean


def prepare_summary_frames(
    donor: DataFrame, file: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(donor⋈file, distinct studies, study×donor combinations)
    (reference: Summary.scala:11-28)."""
    donor_per_file = donor.join(file, ["study_id", "submitter_donor_id"])
    studies = donor_per_file.select("study_id").distinct()
    donors = donor.select("submitter_donor_id").distinct()
    combos = F.broadcast(studies).crossJoin(F.broadcast(donors))
    return donor_per_file, studies, combos


def donors_and_files_by_field(
    donor_per_file: DataFrame, studies: DataFrame, field: str
) -> DataFrame:
    """Per-study nested [{key, donors, files}] for one field
    (reference: Summary.scala:30-59)."""
    domain = donor_per_file.select(field).distinct()
    combos = F.broadcast(studies).crossJoin(F.broadcast(domain))
    return (
        donor_per_file.join(combos, ["study_id", field], "full")
        .filter(F.col(field).isNotNull())
        .groupBy("study_id", field)
        .agg(
            F.countDistinct("submitter_donor_id").alias("donors"),
            F.countDistinct("file_name").alias("files"),
        )
        .groupBy("study_id")
        .agg(
            F.collect_list(
                F.struct(F.col(field).alias("key"), F.col("donors"), F.col("files"))
            ).alias(field)
        )
    )


def files_by_field(
    donor_per_file: DataFrame, study_donor_combos: DataFrame, field: str
) -> DataFrame:
    """Per-(study, donor) nested [{key, files}]
    (reference: Summary.scala:61-88)."""
    domain = donor_per_file.select(field).distinct()
    combos = study_donor_combos.crossJoin(F.broadcast(domain))
    return (
        donor_per_file.join(combos, ["study_id", "submitter_donor_id", field], "full")
        .filter(F.col(field).isNotNull())
        .groupBy("study_id", "submitter_donor_id", field)
        .agg(F.countDistinct("file_name").alias("files"))
        .groupBy("study_id", "submitter_donor_id")
        .agg(
            F.collect_list(F.struct(F.col(field).alias("key"), F.col("files"))).alias(
                field
            )
        )
    )


# The 7 clinical frames summarized, in the reference's order
# (Summary.scala:105-111): (inputData key, summary key name)
CLINICAL_FRAMES = [
    ("diagnosisPerDonorAndStudy", "diagnosis"),
    ("phenotypesPerStudyIdAndDonor", "phenotype"),
    ("treatmentsPerDonorAndStudy", "treatment"),
    ("exposuresPerDonorAndStudy", "exposure"),
    ("followUpsPerDonorAndStudy", "follow_up"),
    ("familyHistoryPerDonorAndStudy", "family_history"),
    ("familyRelationshipPerDonorAndStudy", "family"),
]


def clinical_data_available(frames: dict[str, DataFrame]) -> DataFrame:
    """Per-study [{key, donors}] over the 7 clinical frames, merged with
    chained full-outer joins (reference: Summary.scala:90-131)."""
    summaries = [
        frames[k]
        .groupBy("study_id")
        .agg(
            F.lit(name).alias("key"),
            F.countDistinct("submitter_donor_id").alias("donors"),
        )
        for k, name in CLINICAL_FRAMES
    ]
    merged = summaries[0]
    for s in summaries[1:]:
        merged = merged.join(s, ["study_id", "key", "donors"], "full")
    return merged.groupBy("study_id").agg(
        F.collect_list(F.struct("key", "donors")).alias("clinical_data_available")
    )


def clinical_data_available_per_donor(
    study_donor_combos: DataFrame, frames: dict[str, DataFrame]
) -> tuple[DataFrame, DataFrame]:
    """Per-(study, donor) [{key, available:boolean}] and the
    available-only key list (reference: Summary.scala:134-196).

    Availability hinges on COUNT(DISTINCT *) null semantics: rows that
    exist only from the combos side of the full join carry NULL payload
    columns, and multi-column COUNT DISTINCT skips any row containing a
    NULL — so combo-only donors count 0 → toBoolean → false, donors with
    real clinical rows count ≥1 → true (reference: Summary.scala:142-144).
    """
    per_frame = []
    for k, name in CLINICAL_FRAMES:
        df = frames[k]
        per_frame.append(
            df.join(study_donor_combos, ["study_id", "submitter_donor_id"], "full")
            .groupBy("study_id", "submitter_donor_id")
            .agg(
                F.lit(name).alias("key"),
                to_boolean(F.expr("count(DISTINCT *)")).alias("available"),
            )
        )
    keys = ["study_id", "submitter_donor_id", "key", "available"]
    merged = per_frame[0]
    for s in per_frame[1:]:
        merged = merged.join(s, keys, "full")
    available = merged.groupBy("study_id", "submitter_donor_id").agg(
        F.collect_list(F.struct("key", "available")).alias("clinical_data_available")
    )
    available_only = (
        merged.filter(F.col("available"))
        .groupBy("study_id", "submitter_donor_id")
        .agg(F.collect_list(F.struct("key")).alias("clinical_data_available_only"))
    )
    return available, available_only
